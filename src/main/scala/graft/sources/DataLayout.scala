package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** Rewrite the parquet directory at `path` into files of roughly
    * `targetFileBytes` (computed from actual on-disk size — column
    * encoding survives the round trip, so output sizing tracks input
    * sizing closely). Returns the chosen file count.
    */
  def compact(spark: SparkSession, path: String, targetFileBytes: Long): Int = {
    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(hPath).getLength
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new Path(hPath.getParent, hPath.getName + "_compact_tmp")
    spark.read.parquet(path).repartition(n)
      .write.mode("overwrite").parquet(tmp.toString)
    fs.delete(hPath, true)
    fs.rename(tmp, hPath)
    n
  }
}
