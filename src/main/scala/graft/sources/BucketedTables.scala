package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for repeat-join workloads.
  *
  * At 100 TB the dominant cost of a fact⋈fact join (orders⋈lineitem,
  * events⋈events) is the shuffle of both sides. Writing both tables
  * bucketed AND sorted by the join key pays that shuffle once at write
  * time; every subsequent equi-join on the key then planes as a
  * sort-merge join with **zero Exchange and zero Sort** on either side
  * (verified by `BucketedTablesSpec` against the physical plan).
  * Aggregations on the bucket key skip their exchange the same way.
  *
  * Rules that make this work (and that the writer enforces):
  *   - both sides bucketed by the same key into the same bucket count;
  *   - `spark.sql.sources.bucketing.enabled` on (default);
  *   - to also drop the Sort, `spark.sql.legacy.bucketedTableScan
  *     .outputOrdering=true` (safe here because the writer guarantees
  *     one file per bucket; Spark disabled it by default for
  *     multi-file buckets, SPARK-28632);
  *   - bucket count chosen so one bucket ≈ one task's worth of data
  *     (128-256 MB target at the expected table size).
  */
object BucketedTables {

  /** Write `df` as a managed bucketed+sorted table (parquet).
    *
    * The pre-write `repartition(numBuckets, key)` aligns write tasks
    * with buckets (same Murmur3 hash), yielding exactly one file per
    * bucket — required for the planner to trust the per-bucket sort
    * order and drop the join-side Sort (multi-file buckets are only
    * sorted per file).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      numBuckets: Int,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.repartition(numBuckets, df(key))
      .write
      .mode(mode)
      .format("parquet")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Equi-join two tables previously written by [[writeBucketed]] with
    * the same key and bucket count: shuffle-free, sort-free.
    */
  def coLocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String,
      joinType: String = "inner"): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key), joinType)
}
