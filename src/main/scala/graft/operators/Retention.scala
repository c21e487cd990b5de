package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Cluster retention: collapse near-dup PAIRS into a kept corpus.
  * Components via the size-adaptive closure
  * ([[ConnectedComponents.runAdaptive]] — driver union-find under the
  * bounded-collect tier, alternating stars above it), then each
  * cluster keeps exactly one
  * member — the best `scoreCol` (id tiebreak); docs in no pair keep
  * themselves.
  *
  * Pair-source agnostic: q77 drives it with the exact blocked-Jaccard
  * pairs (oracle-expressible), the 100 TB path composes it over
  * [[NearDup.nearDupPairs]] — LSH-bucketed candidates, linear-ish in
  * corpus size where exact enumeration is quadratic per block
  * (measured: 6.2× time at 10× data for the exact pairs vs 1.7× for
  * the LSH pipeline). RetentionSpec pins that composition.
  *
  * Scale: the retention window partitions by component (near-dup
  * clusters are small by construction); the left join broadcasts when
  * the pair graph is sparse — at worst it shuffles on the id.
  */
object Retention {

  /** `pairs`: first two columns are the edge endpoints. `scored`:
    * one row per corpus id with `idCol` and `scoreCol`. Returns
    * (idCol, component, scoreCol, keep 0/1), one row per scored id.
    */
  def retainBest(pairs: DataFrame, scored: DataFrame, idCol: String, scoreCol: String): DataFrame = {
    val comp = ConnectedComponents.runAdaptive(pairs)
    val w = Window.partitionBy(col("component"))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.join(comp, scored(idCol) === comp("node"), "left")
      .select(scored(idCol),
        coalesce(col("label"), scored(idCol)).as("component"),
        col(scoreCol))
      .withColumn("keep", (row_number().over(w) === 1).cast(IntegerType))
  }

  /** Convenience: just the kept rows (the deduplicated corpus ids). */
  def keptIds(pairs: DataFrame, scored: DataFrame, idCol: String, scoreCol: String): DataFrame =
    retainBest(pairs, scored, idCol, scoreCol)
      .filter(col("keep") === 1).select(col(idCol), col("component"))
}
