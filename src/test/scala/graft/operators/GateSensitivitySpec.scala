package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The q113/q114 certification gates were capped to a deterministic
  * stratum so a full-suite run completes at replica scale — this spec
  * proves the capped gates still CERTIFY: each boolean trips when the
  * defect it guards is injected (dropped pairs → recall, phantom
  * pairs → precision, perturbed scores → jaccard/mae), and the clean
  * inputs pass. A gate that can no longer fail is decoration.
  */
class GateSensitivitySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def incFrame(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("doc_a", "doc_b", "j_lsh")
  }
  private def exFrame(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("doc_a", "doc_b", "j_ex")
  }

  private val truth: Seq[(Long, Long, Double)] =
    (1L to 10L).map(i => (i, i + 100L, 0.6 + i * 0.03))

  private def gate(inc: Seq[(Long, Long, Double)]) =
    TextQueries.incrementalGate(incFrame(inc), exFrame(truth)).collect().head

  test("q113 gate: clean incremental listing passes all booleans") {
    val r = gate(truth)
    assert(r.getAs[Long]("n_expected") == 10L)
    assert(r.getAs[Boolean]("precision_ok"))
    assert(r.getAs[Boolean]("jaccard_ok"))
    assert(r.getAs[Boolean]("recall_ok"))
  }

  test("q113 gate: dropping 2 of 10 pairs (recall 0.8 < 0.9) trips recall_ok only") {
    val r = gate(truth.drop(2))
    assert(!r.getAs[Boolean]("recall_ok"))
    assert(r.getAs[Boolean]("precision_ok"))
    assert(r.getAs[Boolean]("jaccard_ok"))
  }

  test("q113 gate: a pair absent from the exhaustive tier trips precision_ok") {
    val r = gate(truth :+ ((999L, 1999L, 0.95)))
    assert(!r.getAs[Boolean]("precision_ok"))
    assert(r.getAs[Boolean]("recall_ok"))
  }

  test("q113 gate: a perturbed Jaccard on a recalled pair trips jaccard_ok") {
    val r = gate(truth.updated(0, truth.head.copy(_3 = truth.head._3 + 1e-6)))
    assert(!r.getAs[Boolean]("jaccard_ok"))
    assert(r.getAs[Boolean]("precision_ok"))
    assert(r.getAs[Boolean]("recall_ok"))
  }

  test("q114 gate: unbiased estimates pass, a +0.2-shifted estimator trips mae_ok") {
    import spark.implicits._
    val scored = (1 to 50).map(i => (0.6 + (i % 10) * 0.03, 0.6 + (i % 10) * 0.03))
      .toDF("jaccard", "est")
    val ok = TextQueries.estimatorGate(scored).collect().head
    assert(ok.getAs[Long]("n_pairs") == 50L && ok.getAs[Boolean]("mae_ok"))
    val shifted = (1 to 50).map(i => (0.6 + (i % 10) * 0.03, 0.8 + (i % 10) * 0.03))
      .toDF("jaccard", "est")
    val bad = TextQueries.estimatorGate(shifted).collect().head
    assert(!bad.getAs[Boolean]("mae_ok"))
  }

  test("stratum cap keeps gate inputs scale-invariant: replica-shifted ids are excluded") {
    import spark.implicits._
    // ids as make_sfbig shifts them: replica r adds r×1e6
    val ids = Seq(0L, 4999L, 1000000L, 2004999L).toDF("doc_id")
    val kept = ids.filter(org.apache.spark.sql.functions.col("doc_id") <
      TextQueries.GateStratumMaxDocId).collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 4999L))
  }
}
