package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Product-quantization invariants (q105 encode / q106 ADC / q107
  * IVF+PQ). Like the IVF recall spec, what is testable on this
  * ISOTROPIC synthetic corpus is structure, not absolute recall: the
  * vectors have no cluster shape, so a 16-entry-per-subspace codebook
  * is deliberately coarse (measured recall@5 vs exact L2: 0.16 —
  * 16× better than the 0.01 chance floor; clustered real embeddings
  * sit far higher). The oracle hash already certifies cross-engine
  * equality; these pin the algebra.
  */
class PQSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val codes =
    SparkEntry.queries("q105_pq_encode")(spark, sf).collect()

  test("encode is total: 8 codes per vector, every code in [0,16)") {
    val byVec = codes.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.size == 500)
    byVec.values.foreach { rs =>
      assert(rs.map(_.getAs[Int]("m")).sorted.sameElements(0 until 8))
      assert(rs.forall { r =>
        val c = r.getAs[Long]("code"); c >= 0 && c < 16
      })
    }
  }

  test("codebook members snap to distance exactly 0 in every subspace") {
    codes.filter(_.getAs[Long]("vec_id") < 16).foreach { r =>
      assert(r.getAs[Float]("dist") == 0.0f,
        s"codebook vec ${r.getAs[Long]("vec_id")} m=${r.getAs[Int]("m")} dist ${r.getAs[Float]("dist")}")
    }
  }

  test("ADC is a function of codes: same codes ⇒ same adist from every query") {
    val sig = codes.groupBy(_.getAs[Long]("vec_id"))
      .map { case (v, rs) => v -> rs.sortBy(_.getAs[Int]("m")).map(_.getAs[Long]("code")).toSeq }
    val adc = SparkEntry.queries("q106_pq_search")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"), r.getAs[Float]("adist")))
    // group ADC rows by (query, neighbor signature): one distance each
    val byQsig = adc.groupBy { case (q, n, _) => (q, sig(n)) }
    byQsig.values.foreach { rows =>
      assert(rows.map(_._3).distinct.length == 1,
        s"same codes, different adist: $rows")
    }
  }

  test("ADC top-5 beats the chance floor against exact L2 top-5") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).toArray).toMap
    def l2(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => val d = x - y; (d * d).toDouble }.sum
    val queries = emb.keys.filter(_ % 100 == 0)
    val exact = queries.flatMap { q =>
      emb.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(emb(q), emb(n)), n)).take(5).map(q -> _)
    }.toSet
    val got = SparkEntry.queries("q106_pq_search")(spark, sf).collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.08, s"ADC recall $recall below 2x-margin floor (chance ~0.01)")
  }

  test("IVF+PQ results stay inside the probed cells (q107 consistency)") {
    import org.apache.spark.sql.functions._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    val cells = SimilarityOps.ivfAssign(e, 16)
      .select("vec_id", "cell").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cell")).toMap
    val got = SparkEntry.queries("q107_ivf_pq_search")(spark, sf).collect()
    assert(got.nonEmpty)
    // each query's neighbors occupy at most 2 distinct cells (nprobe=2)
    got.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      val used = rs.map(r => cells(r.getAs[Long]("nid"))).toSet
      assert(used.size <= 2, s"query $q neighbors span cells $used")
      assert(rs.forall(_.getAs[Long]("nid") != q))
    }
  }
}
