package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level invariants for the curation stages (the oracle gate
  * pins exact results; these pin the SEMANTICS that must survive any
  * re-implementation): packing conservation/budget, redaction edge
  * cases, decontamination wall integrity, mixture balance.
  */
class CurationSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  test("q75 packing: every document's token slices conserve its token count") {
    val packed = CurationQueries.packedSequences(spark, sf)
    val perDoc = packed.groupBy("doc_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("covered"))
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("ntok"))
    val mismatch = perDoc.join(truth, "doc_id")
      .filter(col("covered") =!= col("ntok")).count()
    assert(mismatch == 0)
  }

  test("q75 packing: every sequence is exactly 256 tokens except the last per source") {
    val packed = CurationQueries.packedSequences(spark, sf)
    val perSeq = packed.groupBy("source", "seq_id")
      .agg(sum(col("tok_to") - col("tok_from")).as("toks"))
    val lastSeq = perSeq.groupBy("source").agg(max("seq_id").as("last"))
    val bad = perSeq.join(lastSeq, "source")
      .filter(col("seq_id") =!= col("last") && col("toks") =!= 256L)
      .count()
    assert(bad == 0)
    // and no sequence ever exceeds the budget
    assert(perSeq.filter(col("toks") > 256L).count() == 0)
  }

  test("q73 redaction: edge cases — boundaries, multiples, near-misses") {
    val cases = Seq(
      ("alice.smith@corp.example.org wrote", "<EMAIL> wrote", 1),
      ("call 555-0123 now", "call <PHONE> now", 1),
      ("ip 192.168.0.1 up", "ip <IP> up", 1),
      ("version 1.2.3 stays", "version 1.2.3 stays", 0),   // 3 octets != IPv4
      ("5550123 stays", "5550123 stays", 0),               // no hyphen
      ("x555-12 stays", "x555-12 stays", 0),               // no word boundary
      ("a@b.io and c@d.net", "<EMAIL> and <EMAIL>", 2),
      ("e@f.org 555-1 7.7.7.7", "<EMAIL> <PHONE> <IP>", 3))
    val df = cases.toDF("t", "want", "wantN")
      .select(col("want"), col("wantN"),
        CurationQueries.redactPii(col("t")).as("got"),
        CurationQueries.piiCount(col("t")).as("gotN"))
    val bad = df.filter(col("got") =!= col("want") || col("gotN") =!= col("wantN"))
      .collect()
    assert(bad.isEmpty, bad.mkString("; "))
  }

  test("q72 decontamination: eval docs never leak into the output; planted near-dups are caught") {
    val out = graft.SparkEntry.queries("q72_decontamination")(spark, sf)
    val rows = out.collect()
    assert(rows.forall(r => r.getLong(0) % 10 != 0))
    // the corpus plants near-duplicates; at least one shares an 8-gram
    // with the eval slice and must be flagged
    assert(rows.count(_.getBoolean(2)) > 0)
    // flag is exactly shared>0
    assert(rows.forall(r => r.getBoolean(2) == (r.getInt(1) > 0)))
  }

  test("q76 mixture sampling: every language lands near the smallest language's count") {
    val out = graft.SparkEntry.queries("q76_mixture_sample")(spark, sf)
    val kept = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    val truth = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val mn = truth.values.min
    // smallest language is kept whole (rate 1 short-circuits the hash)
    val smallest = truth.minBy(_._2)._1
    assert(kept(smallest) == mn)
    // hash-Bernoulli keeps every other language within ±35% of target
    kept.foreach { case (lang, n) =>
      assert(n >= (mn * 0.65).toLong && n <= (mn * 1.35).toLong,
        s"$lang kept $n, target $mn")
    }
  }
}
