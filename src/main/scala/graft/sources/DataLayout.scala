package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Physical data-layout operators: range clustering and small-file
  * compaction. Neither changes query results — they exist purely to
  * shape the files a 100 TB table is stored in, which decides how
  * much of it a scan has to read:
  *
  *   - '''Range clustering''' (`writeRangeClustered`): rows are
  *     range-partitioned AND sorted on the cluster key, so every
  *     output file (and every parquet row group inside it) covers a
  *     narrow, disjoint key range. Parquet footers record per-column
  *     min/max; a pushed-down range predicate then skips whole row
  *     groups/files whose stats exclude it. On an unclustered layout
  *     every file spans the full key range and nothing can be
  *     skipped — same bytes, same query, orders-of-magnitude more IO.
  *     This is the single-column form of Z-ordering (for one key,
  *     linear order IS the optimal clustering; multi-key interleaving
  *     only helps when predicates mix keys).
  *   - '''Compaction''' (`compact`): streaming/hourly ingestion (the
  *     reference's timestamped snapshots — ref `load.py:40-76`)
  *     accretes small files; at scale the per-file open/footer cost
  *     dominates scans and the driver's file index bloats. Compaction
  *     rewrites a directory to ~`targetFileBytes` files, sized from
  *     the actual input bytes.
  *
  * Both are plain `DataFrameWriter` flows — no custom commit
  * protocol — so they compose with S3A committers
  * ([[graft.GraftSession.cluster]]).
  */
object DataLayout {

  /** Write `df` range-clustered on `key` into `numFiles` files.
    * Disjoint per-file key ranges are spec-asserted
    * (`DataLayoutSpec`); `sortWithinPartitions` additionally orders
    * row groups inside each file so intra-file row-group skipping
    * works at parquet-reader level.
    */
  def writeRangeClustered(df: DataFrame, path: String, key: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(key))
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Z-order (Morton) clustering on two numeric keys: each key is
    * bucketed into 256 equal-width bins between its min/max (one tiny
    * broadcast agg — the bucketing itself is map-side), the two 8-bit
    * bucket ids are bit-interleaved into a 16-bit z-value, and rows
    * are range-partitioned + sorted on it. Every output file then
    * covers a small RECTANGLE of the (k1, k2) space, so parquet
    * min/max stats prune scans filtered on EITHER key or both —
    * single-key range clustering can only serve its one key.
    * `DataLayoutSpec` asserts the bounding-box shrinkage vs the
    * unclustered layout.
    */
  def writeZOrdered(df: DataFrame, path: String, k1: String, k2: String, numFiles: Int): Unit = {
    import org.apache.spark.sql.functions.{broadcast, floor, least, lit, max, min, shiftleft}
    val bounds = df.agg(
      min(col(k1)).cast("double").as("min1"), max(col(k1)).cast("double").as("max1"),
      min(col(k2)).cast("double").as("min2"), max(col(k2)).cast("double").as("max2"))
    def bucket(c: Column, lo: Column, hi: Column): Column =
      least(floor((c.cast("double") - lo) / ((hi - lo + lit(1e-9)) / 256)).cast("int"), lit(255))
    // spread the 8 bits of b to even positions: b7..b0 -> bit 2i
    def spread(b: Column): Column =
      (0 until 8).map(i => shiftleft(b.bitwiseAND(lit(1 << i)), i)).reduce(_ + _)
    val z = df.crossJoin(broadcast(bounds))
      .withColumn("__z",
        spread(bucket(col(k1), col("min1"), col("max1"))) +
          spread(bucket(col(k2), col("min2"), col("max2"))) * lit(2))
      .drop("min1", "max1", "min2", "max2")
    z.repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Rewrite the parquet directory at `path` into files of roughly
    * `targetFileBytes` (computed from actual on-disk size — column
    * encoding survives the round trip, so output sizing tracks input
    * sizing closely). Returns the chosen file count.
    *
    * Swap order is crash-safe for the DATA: write tmp → rename the
    * original ASIDE → rename tmp into place → delete the aside copy.
    * A crash mid-swap can leave the table path briefly absent (readers
    * in that window fail and the `_compact_old` dir still holds the
    * data), but no failure point loses rows — recovery is renaming the
    * aside dir back. For fully atomic swaps use a table format with a
    * metadata pointer; this utility is for offline maintenance.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(hPath.getParent, hPath.getName + "_compact_tmp")
    val old = new Path(hPath.getParent, hPath.getName + "_compact_old")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(old)) fs.delete(old, true) // leftover from a prior crash
    if (!fs.rename(hPath, old))
      throw new java.io.IOException(s"compact: could not move $hPath aside")
    if (!fs.rename(tmp, hPath)) {
      fs.rename(old, hPath) // roll back: original data untouched
      throw new java.io.IOException(s"compact: could not move $tmp into place")
    }
    fs.delete(old, true)
    n
  }
}
