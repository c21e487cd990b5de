package graft.operators

import graft.TestSpark
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Retention composed over the PRODUCTION pair source
  * ([[NearDup.nearDupPairs]] — LSH-bucketed, the 100 TB path); the
  * oracle-checked exact-pairs composition is q77.
  */
class RetentionSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("retainBest over LSH near-dup pairs: one keeper per cluster, keeper has max quality") {
    val pairs = NearDup.nearDupPairs(spark, dir, 0.6)
      .select(col("doc_a"), col("doc_b")).cache()
    val scored = graft.Tables(spark, dir).documents
      .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
    val out = Retention.retainBest(pairs, scored, "doc_id", "quality").cache()

    // every doc is present exactly once
    assert(out.count() == scored.count())
    assert(out.select("doc_id").distinct().count() == scored.count())

    // exactly one keeper per component
    val perComp = out.groupBy("component")
      .agg(sum("keep").as("kept"), count(lit(1)).as("n"))
    assert(perComp.filter(col("kept") =!= 1).count() == 0)

    // the keeper's quality is the component max
    val best = out.groupBy("component").agg(max("quality").as("best_q"))
    val keepers = out.filter(col("keep") === 1)
      .join(best, "component")
    assert(keepers.filter(col("quality") =!= col("best_q")).count() == 0)

    // multi-member clusters exist in this corpus (the test is not vacuous)
    assert(perComp.filter(col("n") > 1).count() > 0)

    // kept corpus = total docs − collapsed duplicates
    val collapsed = out.filter(col("keep") === 0).count()
    assert(Retention.keptIds(pairs, scored, "doc_id", "quality").count()
      == scored.count() - collapsed)
    out.unpersist(); pairs.unpersist()
  }
}
