package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Time-range (interval) join — the join Spark has no native operator
  * for: pair rows whose timestamps fall within `gapMicros` of each
  * other, optionally under equi-keys. The naive formulation
  * (`a.join(b, keys && abs(ta - tb) <= gap)`) plans the time predicate
  * as a join *filter*; without any equi-key it degenerates to a
  * BroadcastNestedLoopJoin/CartesianProduct, and even with keys every
  * same-key pair is enumerated — O(per-key²) regardless of how few
  * pairs are temporally close.
  *
  * Scale path (standard interval bucketing, as in Databricks'
  * range-join optimization and the literature on band joins): quantize
  * time into `gap`-sized buckets; replicate ONE side to its bucket ±1;
  * equi-join on (keys, bucket); re-check the exact predicate. A
  * qualifying pair's buckets differ by at most 1, so the bucket of the
  * un-replicated row always coincides with exactly one replica —
  * complete, duplicate-free, and the join is a plain shuffled
  * equi-join on a well-distributed compound key. Candidate volume is
  * O(pairs within ~3 gap windows), not O(per-key pairs).
  */
object RangeJoin {

  /** Rows of `left` × `right` with equal `keys` and
    * |leftTime − rightTime| ≤ gapMicros. Time columns must be
    * timestamps; all columns of both sides survive (disambiguate
    * before calling if names collide).
    */
  def withinGap(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      gapMicros: Long): DataFrame = {
    require(gapMicros > 0, "gapMicros must be positive")
    val lb = floor(unix_micros(col(leftTime)) / gapMicros)
    val rb = floor(unix_micros(col(rightTime)) / gapMicros)
    val l = left.withColumn("__bucket", lb)
    // the replicated side: one copy per adjacent bucket
    val r = right.withColumn("__bucket", explode(array(rb - 1, rb, rb + 1)))
    l.join(r, keys :+ "__bucket")
      .filter(
        abs(unix_micros(col(leftTime)) - unix_micros(col(rightTime))) <= gapMicros)
      .drop("__bucket")
  }
}
