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

  // ----------------------------------------------------------------
  // Durable service: exactly-once under kill-and-restart. foreachBatch
  // is at-least-once, so the service's epoch-keyed overwrites must make
  // every replay idempotent and every restart recover the index.

  private def committedPairs(pairsDir: String): Seq[org.apache.spark.sql.Row] = {
    val root = new java.io.File(pairsDir)
    if (!root.exists()) Nil
    else root.listFiles().toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("epoch=") &&
        new java.io.File(f, "_SUCCESS").exists())
      .sortBy(_.getName)
      .flatMap(f => spark.read.parquet(f.toString)
        .select("doc_a", "doc_b", "jaccard").collect().toSeq)
  }

  test("durable service: replayed epoch (at-least-once) emits no duplicate pairs") {
    val expected = pairMap(
      NearDup.indexPairs(NearDup.buildIndex(docs)).collect().toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("neardup_replay").toString
    val service = new NearDupStream.DurableService(
      s"$tmp/state", s"$tmp/pairs", Seq("lang", "source"), 0.6)

    def batch(k: Int) = docs.filter(col("doc_id") % 3 === k)
    service.processBatch(batch(0), 0L)
    service.processBatch(batch(1), 1L)
    // crash after epoch 1 fully wrote but before the stream checkpoint
    // committed: the engine replays epoch 1 — the service must reload
    // epoch 0's snapshot (NOT epoch 1's own) and overwrite in place
    service.processBatch(batch(1), 1L)
    service.processBatch(batch(2), 2L)

    val emitted = committedPairs(s"$tmp/pairs")
    assert(emitted.size == emitted.map(r => (r.getLong(0), r.getLong(1))).distinct.size,
      "a replayed epoch duplicated pairs")
    assert(pairMap(emitted) == expected)
  }

  test("durable service: crash between the pairs write and the state write recovers") {
    val expected = pairMap(
      NearDup.indexPairs(NearDup.buildIndex(docs)).collect().toSeq)
    val tmp = java.nio.file.Files.createTempDirectory("neardup_crash").toString
    val service = new NearDupStream.DurableService(
      s"$tmp/state", s"$tmp/pairs", Seq("lang", "source"), 0.6)

    def batch(k: Int) = docs.filter(col("doc_id") % 3 === k)
    service.processBatch(batch(0), 0L)
    service.processBatch(batch(1), 1L)
    // simulate the crash point: epoch 1's pairs landed but its state
    // snapshot did not — delete it, then replay epoch 1
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(new java.io.File(s"$tmp/state/epoch=1"))
    service.processBatch(batch(1), 1L)
    service.processBatch(batch(2), 2L)

    val emitted = committedPairs(s"$tmp/pairs")
    assert(emitted.size == emitted.map(r => (r.getLong(0), r.getLong(1))).distinct.size)
    assert(pairMap(emitted) == expected)
    // final cluster state equals the batch pipeline's clusters
    val finalState = spark.read.parquet(s"$tmp/state/epoch=2")
    val truth = NearDup.buildIndex(docs)
    assert(finalState.count() == truth.clusters.count())
    truth.unpersist()
  }

  import NearDupStreamSpec.Doc

  test("durable stream: kill after epoch 0, restart with a FRESH service, batch truth still exact") {
    implicit val sqlCtx = spark.sqlContext
    val all = docs.as[Doc].collect()
    val (first, second) = all.partition(_.doc_id % 2 == 0)
    val expected = pairMap(
      NearDup.indexPairs(NearDup.buildIndex(docs)).collect().toSeq)

    val tmp = java.nio.file.Files.createTempDirectory("neardup_restart").toString
    val ckpt = s"$tmp/ckpt"
    val mem = MemoryStream[Doc]
    val q1 = NearDupStream.startDurable(
      mem.toDF(), ckpt, s"$tmp/state", s"$tmp/pairs",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(first.toIndexedSeq: _*)
      q1.processAllAvailable()
    } finally q1.stop() // kill: the in-JVM service object is discarded
    // restart: a brand-new query + service recovers purely from
    // stateDir/checkpoint (this is where the in-memory Service would
    // silently restart from an empty index)
    val q2 = NearDupStream.startDurable(
      mem.toDF(), ckpt, s"$tmp/state", s"$tmp/pairs",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    try {
      mem.addData(second.toIndexedSeq: _*)
      q2.processAllAvailable()
      val emitted = committedPairs(s"$tmp/pairs")
      assert(emitted.size ==
        emitted.map(r => (r.getLong(0), r.getLong(1))).distinct.size)
      assert(pairMap(emitted) == expected)
    } finally q2.stop()
  }

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
