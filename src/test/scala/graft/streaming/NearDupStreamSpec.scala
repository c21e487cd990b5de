package graft.streaming

import graft.TestSpark
import graft.operators.NearDup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The continuous near-dup service must emit, across all epochs,
  * EXACTLY the pairs the batch pipeline finds on the full corpus —
  * each pair once, in the epoch its later document arrives.
  */
class NearDupStreamSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private def docs = graft.Tables(spark, dir).documentsSpread
    .select("doc_id", "lang", "source", "text")

  private def pairMap(rows: Seq[org.apache.spark.sql.Row]) =
    rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("service over 3 batches emits the batch pipeline's pairs exactly once") {
    val expected = pairMap(
      NearDup.indexPairs(NearDup.buildIndex(docs)).collect().toSeq)
    assert(expected.nonEmpty)

    val emitted = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    var emittedCount = 0
    val service = new NearDupStream.Service(Seq("lang", "source"), 0.6,
      (pairs, _) => {
        val rows = pairs.collect()
        emitted ++= rows
        emittedCount += rows.length
      })
    (0 until 3).foreach { k =>
      service.processBatch(docs.filter(col("doc_id") % 3 === k), k.toLong)
    }

    // exactly once: no pair may appear in two epochs
    assert(emittedCount == emitted.map(r => (r.getLong(0), r.getLong(1))).distinct.size)
    assert(pairMap(emitted.toSeq) == expected)
  }

  import NearDupStreamSpec.Doc

  test("end-to-end streaming run (MemoryStream, 2 epochs) matches batch truth") {
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[Doc].collect()
    val (first, second) = all.partition(_.doc_id % 2 == 0)
    val expected = pairMap(
      NearDup.indexPairs(NearDup.buildIndex(docs)).collect().toSeq)

    val emitted = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val mem = MemoryStream[Doc]
    val ckpt = java.nio.file.Files.createTempDirectory("neardup_stream").toString
    val q = NearDupStream.start(
      mem.toDF(), ckpt,
      (pairs, _) => emitted ++= pairs.collect(),
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(first.toIndexedSeq: _*)
      q.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      q.processAllAvailable()
      assert(pairMap(emitted.toSeq) == expected)
    } finally q.stop()
  }
}

object NearDupStreamSpec {
  final case class Doc(doc_id: Long, lang: String, source: String, text: String)
}
