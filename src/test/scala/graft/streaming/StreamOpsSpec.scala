package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Streaming ops driven through MemoryStream; the windowed agg is
  * additionally checked for batch/stream result equality (same logic,
  * two execution modes).
  */
class StreamOpsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(1704067200000L + min * 60000L)

  private val sample = Seq(
    StreamOps.Event(1, ts(0), 1, "click", 1.0),
    StreamOps.Event(2, ts(10), 1, "click", 2.0),
    StreamOps.Event(3, ts(70), 1, "view", 3.0),   // next hour, new session (gap 60m)
    StreamOps.Event(4, ts(75), 2, "click", 4.0),
    StreamOps.Event(5, ts(130), 1, "view", 5.0))  // third session for user 1

  test("windowedEventAgg: stream over MemoryStream equals batch run") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    mem.addData(sample: _*)
    val q = StreamOps.windowedEventAgg(mem.toDF(), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("append").start()
    try {
      mem.addData() // advance
      q.processAllAvailable()
      // append mode emits only watermark-closed windows; run batch for truth
      val batch = StreamOps.windowedEventAgg(sample.toDF(), "1 hour", "2 hours")
        .orderBy("window_start", "event_type").collect()
      assert(batch.length == 4) // (h0 click), (h1 view), (h1 click), (h2 view)
      assert(batch.map(_.getAs[Long]("n")).sum == 5)
      // streamed rows (possibly fewer due to open windows) must be a
      // subset of the batch truth
      val streamed = spark.table("win_agg").collect().map(_.toSeq).toSet
      assert(streamed.subsetOf(batch.map(_.toSeq).toSet))
    } finally q.stop()
  }

  final case class Doc(doc_id: Long, ts: Timestamp, text: String)

  test("distinctUsersStream: registers bit-equal batch; estimates equal exact") {
    implicit val sqlCtx = spark.sqlContext
    // two hour-windows; duplicate users within and across windows
    val ev = Seq(
      (1L, ts(5)), (2L, ts(10)), (1L, ts(20)), (3L, ts(40)),      // h0: users 1,2,3
      (2L, ts(65)), (4L, ts(70)), (4L, ts(80)), (5L, ts(110)))    // h1: users 2,4,5
      .map { case (u, t) => (u, t) }
    val mem = MemoryStream[(Long, Timestamp)]
    mem.addData(ev: _*)
    val q = StreamOps.distinctUsersStream(
        mem.toDF().toDF("user_id", "ts"), "1 hour", "2 hours")
      .writeStream.format("memory").queryName("hll_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hll_win").collect()
        .map(r => r.getAs[Timestamp]("window_start") -> r.getAs[Array[Byte]]("sk")).toMap
      val batch = StreamOps.distinctUsersStream(
          ev.toDF("user_id", "ts"), "1 hour", "2 hours").collect()
        .map(r => r.getAs[Timestamp]("window_start") -> r.getAs[Array[Byte]]("sk")).toMap
      assert(streamed.keySet == batch.keySet && streamed.keySet.size == 2)
      streamed.foreach { case (w, sk) => assert(sk.sameElements(batch(w))) }
      // estimates: h0 = 3 users, h1 = 3 users; union across both = 5
      val ests = streamed.toSeq.sortBy(_._1.getTime)
        .map { case (_, sk) => math.round(graft.functions.HllSketch.estimate(sk)) }
      assert(ests == Seq(3L, 3L))
      val union = streamed.values.reduce(graft.functions.HllSketch.union)
      assert(math.round(graft.functions.HllSketch.estimate(union)) == 5L)
    } finally q.stop()
  }

  test("distinctUsersStream: HLL register state survives a checkpointed restart bit-equal") {
    // the other custom-Aggregator state-store path (binary register
    // buffers, vs windowedQuantiles' counts map): a restart must
    // resume the open window's registers, and the union identity only
    // holds if the resumed sketch is bit-equal to the batch one
    implicit val sqlCtx = spark.sqlContext
    val wave1 = Seq((1L, ts(5)), (2L, ts(10)), (1L, ts(20)))
    val wave2 = Seq((3L, ts(40)), (2L, ts(65)), (4L, ts(70)), (5L, ts(110)))
    val ckpt = java.nio.file.Files.createTempDirectory("hll_restart").toString
    val mem = MemoryStream[(Long, Timestamp)]
    def startQuery(name: String) = StreamOps.distinctUsersStream(
        mem.toDF().toDF("user_id", "ts"), "1 hour", "2 hours")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    mem.addData(wave1: _*)
    val q1 = startQuery("hll_restart_a")
    try q1.processAllAvailable() finally q1.stop()
    mem.addData(wave2: _*) // first window gains user 3 AFTER the restart
    val q2 = startQuery("hll_restart_b")
    try {
      q2.processAllAvailable()
      val streamed = spark.table("hll_restart_b").collect()
        .map(r => r.getAs[Timestamp]("window_start") -> r.getAs[Array[Byte]]("sk")).toMap
      val batch = StreamOps.distinctUsersStream(
          (wave1 ++ wave2).toDF("user_id", "ts"), "1 hour", "2 hours").collect()
        .map(r => r.getAs[Timestamp]("window_start") -> r.getAs[Array[Byte]]("sk")).toMap
      assert(streamed.keySet == batch.keySet && streamed.keySet.size == 2)
      streamed.foreach { case (w, sk) =>
        assert(sk.sameElements(batch(w)), s"resumed registers diverged for window $w") }
    } finally q2.stop()
  }

  test("windowedQuantiles: stream equals batch, and both equal hand-computed ranks") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // two hour-windows with ties and skew; values are "cents"
    val h0 = Seq(100L, 100L, 300L, 200L, 500L, 100L, 400L)      // sorted: 100,100,100,200,300,400,500
    val h1 = Seq(900L, 100L, 900L, 900L)                        // sorted: 100,900,900,900
    val rows = h0.zipWithIndex.map { case (v, i) => (ts(i), v) } ++
      h1.zipWithIndex.map { case (v, i) => (ts(60 + i), v) }
    val mem = MemoryStream[(Timestamp, Long)]
    mem.addData(rows: _*)
    val q = StreamOps.windowedQuantiles(
        mem.toDF().toDF("ts", "v"), Seq(0.5, 0.9), "v", "1 hour", "2 hours")
      .writeStream.format("memory").queryName("quant_win")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("quant_win").collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("n"), r.getAs[Seq[Long]]("qs")))).toMap
      val batch = StreamOps.windowedQuantiles(
          rows.toDF("ts", "v"), Seq(0.5, 0.9), "v", "1 hour", "2 hours").collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("n"), r.getAs[Seq[Long]]("qs")))).toMap
      assert(streamed == batch && streamed.size == 2)
      // hand-computed: h0 n=7 → p50 k=4 → 200, p90 k=7 → 500
      //                h1 n=4 → p50 k=2 → 900, p90 k=4 → 900
      val byTime = streamed.toSeq.sortBy(_._1.getTime).map(_._2)
      assert(byTime == Seq((7L, Seq(200L, 500L)), (4L, Seq(900L, 900L))))
    } finally q.stop()
  }

  test("windowedQuantiles: custom aggregator state survives a checkpointed restart") {
    // the QuantileByCount buffer (a value→count map) lives in the
    // streaming state store; a kill-and-restart must round-trip that
    // buffer through the store's serializer — a regression here would
    // silently corrupt every resumed quantile, which no single-run
    // test can catch
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val h0 = Seq(100L, 100L, 300L, 200L, 500L, 100L, 400L)
    val h1 = Seq(900L, 100L, 900L, 900L)
    val rows0 = h0.zipWithIndex.map { case (v, i) => (ts(i), v) }
    // second wave: 30 min later, SAME first window (state must merge
    // resumed counts with new rows), plus a second window
    val rows1 = h0.zipWithIndex.map { case (v, i) => (ts(30 + i), v * 2) } ++
      h1.zipWithIndex.map { case (v, i) => (ts(60 + i), v) }

    val ckpt = java.nio.file.Files.createTempDirectory("quant_restart").toString
    val mem = MemoryStream[(Timestamp, Long)]
    def startQuery(name: String) = StreamOps.windowedQuantiles(
        mem.toDF().toDF("ts", "v"), Seq(0.5, 0.9), "v", "1 hour", "2 hours")
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()

    mem.addData(rows0: _*)
    val q1 = startQuery("quant_restart_a")
    try q1.processAllAvailable() finally q1.stop()

    mem.addData(rows1: _*)
    val q2 = startQuery("quant_restart_b")
    try {
      q2.processAllAvailable()
      val streamed = spark.table("quant_restart_b").collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("n"), r.getAs[Seq[Long]]("qs")))).toMap
      val batch = StreamOps.windowedQuantiles(
          (rows0 ++ rows1).toDF("ts", "v"), Seq(0.5, 0.9), "v", "1 hour", "2 hours")
        .collect()
        .map(r => r.getAs[Timestamp]("window_start") ->
          ((r.getAs[Long]("n"), r.getAs[Seq[Long]]("qs")))).toMap
      assert(streamed == batch && streamed.size == 2,
        s"restarted stream diverged from batch truth:\n$streamed\nvs\n$batch")
      // the first window must hold BOTH waves' rows (14), proving the
      // resumed buffer merged rather than restarted from empty
      val firstWin = streamed.toSeq.minBy(_._1.getTime)._2
      assert(firstWin._1 == 14L)
    } finally q2.stop()
  }

  test("contaminationScreen: no false negatives streaming, equals batch screen") {
    implicit val sqlCtx = spark.sqlContext
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // tuples, not the inner Doc case class: MemoryStream of an inner
    // class needs its outer scope registered when this test runs alone
    val docs = Seq(
      (1L, ts(0), s"prefix words $evalText suffix words here"), // contains eval 8-gram
      (2L, ts(1), "totally unrelated clean words one two three four five six seven"),
      (3L, ts(2), evalText))
    // bloom over the eval doc's distinct 8-grams (built batch-side)
    val evalGrams = Seq(evalText).toDF("text")
      .select(explode(graft.functions.WordShingles(col("text"), 8)).as("s"))
      .distinct()
    val bloom = evalGrams.stat.bloomFilter("s", 1000, 0.01)
    val bc = spark.sparkContext.broadcast(bloom)

    val mem = MemoryStream[(Long, Timestamp, String)]
    mem.addData(docs: _*)
    val q = StreamOps.contaminationScreen(
        mem.toDF().toDF("doc_id", "ts", "text"), bc)
      .writeStream.format("memory").queryName("contam_screen")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("contam_screen")
        .select("doc_id", "candidate").as[(Long, Boolean)].collect().toMap
      assert(streamed(1L) && streamed(3L)) // true overlaps always flagged
      assert(!streamed(2L)) // clean doc passes (fpp makes this ~certain at n=3)
      val batch = StreamOps.contaminationScreen(
          docs.toDF("doc_id", "ts", "text"), bc)
        .select("doc_id", "candidate").as[(Long, Boolean)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("dedupDocStream: drops in-watermark duplicates, keeps distinct texts") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Doc]
    val q = StreamOps.dedupDocStream(mem.toDF(), "1 hour")
      .writeStream.format("memory").queryName("dedup_docs")
      .outputMode("append").start()
    try {
      mem.addData(
        Doc(1, ts(0), "alpha"), Doc(2, ts(1), "beta"),
        Doc(3, ts(2), "alpha"), // dup of 1 within watermark
        Doc(4, ts(3), "gamma"))
      q.processAllAvailable()
      val out = spark.table("dedup_docs").select("text").as[String].collect().sorted
      assert(out.toSeq == Seq("alpha", "beta", "gamma"))
    } finally q.stop()
  }

  test("enrichStream: stream-static broadcast join enriches per batch") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "pro"), (2L, "free")).toDF("user_id", "tier")
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.enrichStream(mem.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length == sample.length)
      assert(rows.forall(r => !r.isNullAt(r.fieldIndex("tier"))))
    } finally q.stop()
  }

  test("sessionize over the full sf0.01 events equals batch q20 per-user session counts") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.01"
    val events = graft.Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[StreamOps.Event].collect()
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(spark, mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions_full")
      .outputMode("append").start()
    try {
      mem.addData(events.toIndexedSeq: _*)
      q.processAllAvailable()
      // far-future sentinel for a fake user pushes the watermark past
      // every real session's (lastTs + gap) so idle sessions flush via
      // event-time timeout — the streaming analogue of end-of-input
      val maxTs = events.map(_.ts.getTime).max
      mem.addData(StreamOps.Event(-1L, new Timestamp(maxTs + 10L * 24 * 3600 * 1000), -1L, "flush", 0.0))
      q.processAllAvailable()
      mem.addData() // no-data batch: fire remaining timeouts
      q.processAllAvailable()

      val sessions = spark.table("sessions_full").as[StreamOps.SessionOut]
        .collect().filter(_.user_id >= 0)
      // every real event landed in exactly one emitted session
      assert(sessions.map(_.n_events).sum == events.length.toLong)
      val streamed = sessions.groupBy(_.user_id)
        .map { case (u, ss) => u -> ss.length.toLong }
      val batch = graft.SparkEntry.queries("q20_sessionize")(spark, dir)
        .collect().map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_sessions")).toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("intervalJoinStreams equals the batch bucketed range join on real events") {
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.Tables(spark, dir).events
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[StreamOps.Event].collect()
    val memA = MemoryStream[StreamOps.Event]
    val memB = MemoryStream[StreamOps.Event]
    val a = memA.toDF().select(col("event_id").as("ea"), col("user_id").as("ua"), col("ts").as("ta"))
    val b = memB.toDF().select(col("event_id").as("eb"), col("user_id").as("ub"), col("ts").as("tb"))
    val q = StreamOps.intervalJoinStreams(a, b, "ua", "ub", "ta", "tb", gap = "15 minutes")
      .filter(col("ea") < col("eb"))
      .select("ea", "eb")
      .writeStream.format("memory").queryName("interval_join")
      .outputMode("append").start()
    try {
      memA.addData(events.toIndexedSeq: _*)
      memB.addData(events.toIndexedSeq: _*)
      q.processAllAvailable()
      val streamed = spark.table("interval_join").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val e = graft.Tables(spark, dir).events.select(col("event_id"), col("user_id"), col("ts"))
      val batch = graft.operators.RangeJoin.withinGap(
          e.select(col("event_id").as("ea"), col("user_id"), col("ts").as("ta")),
          e.select(col("event_id").as("eb"), col("user_id"), col("ts").as("tb")),
          Seq("user_id"), "ta", "tb", 900L * 1000000)
        .filter(col("ea") < col("eb"))
        .select("ea", "eb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    } finally q.stop()
  }

  test("intervalJoinStreams leftOuter: unmatched rows emit null-padded after watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    val memA = MemoryStream[StreamOps.Event]
    val memB = MemoryStream[StreamOps.Event]
    val a = memA.toDF().select(col("event_id").as("ea"), col("user_id").as("ua"), col("ts").as("ta"))
    val b = memB.toDF().select(col("event_id").as("eb"), col("user_id").as("ub"), col("ts").as("tb"))
    val q = StreamOps.intervalJoinStreams(a, b, "ua", "ub", "ta", "tb",
      gap = "15 minutes", watermark = "30 minutes", joinType = "leftOuter")
      .select("ea", "eb")
      .writeStream.format("memory").queryName("interval_outer")
      .outputMode("append").start()
    try {
      def ev(id: Long, user: Long, minute: Int) =
        StreamOps.Event(id, new Timestamp(minute * 60000L), user, "e", 0.0)
      // user 1: match within gap; user 2: left row with NO right match
      memA.addData(ev(1, 1, 10), ev(2, 2, 10))
      memB.addData(ev(3, 1, 12))
      q.processAllAvailable()
      // push both watermarks far past minute 10 + gap + watermark
      memA.addData(ev(8, 9, 600))
      memB.addData(ev(9, 9, 600))
      q.processAllAvailable()
      memA.addData(ev(10, 9, 1200)); memB.addData(ev(11, 9, 1200))
      q.processAllAvailable()

      val rows = spark.table("interval_outer").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      assert(rows.contains((1L, 3L)), s"matched pair missing: $rows")
      assert(rows.contains((2L, -1L)), s"expired unmatched left row not emitted: $rows")
    } finally q.stop()
  }

  final case class TimedDoc(ts: Timestamp, text: String)

  test("trendingTokens: windowed streaming top-k equals the batch token count exactly") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[TimedDoc]
    val q = StreamOps.trendingTokens(mem.toDF(), k = 2)
      .writeStream.format("memory").queryName("trending")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(min * 60000L)
      // window [0,1): "b" ×3, "a" ×2, "c" ×1 → top2 = b, a
      mem.addData(TimedDoc(t(0), "a b b"), TimedDoc(t(0), "b a c"))
      // window [1,2): tie a=b → tiebreak token asc → a first
      mem.addData(TimedDoc(t(1), "a b"))
      q.processAllAvailable()
      mem.addData(TimedDoc(t(10), "z")) // advance watermark, close both
      q.processAllAvailable()

      val rows = spark.table("trending")
        .collect().map(r => r.getTimestamp(0).getTime / 60000 ->
          r.getSeq[Row](1).map(x => (x.getString(0), x.getLong(1)))).toMap
      assert(rows(0) == Seq(("b", 3L), ("a", 2L)))
      assert(rows(1) == Seq(("a", 1L), ("b", 1L)))
    } finally q.stop()
  }

  final case class QueryVec(qid: Long, ts: Timestamp, embedding: Array[Float])

  test("annStream: windowed streaming ANN equals batch ivfSearch exactly") {
    implicit val sqlCtx = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 8
    val assigned = graft.operators.SimilarityOps.ivfAssign(emb, k).cache()
    assigned.count()
    val centroidRows = graft.operators.SimilarityOps.ivfCentroids(emb, k)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val queriesDf = emb.filter(col("vec_id") % 100 === 0)

    val mem = MemoryStream[QueryVec]
    val q = StreamOps.annStream(
        mem.toDF().select(col("qid"), col("ts"), col("embedding")),
        assigned, centroidRows, topK = 5, nprobe = 2)
      .writeStream.format("memory").queryName("ann_stream")
      .outputMode("append").start()
    try {
      val qvecs = queriesDf.collect()
        .map(r => QueryVec(r.getAs[Long]("vec_id"), ts(0), r.getSeq[Float](1).toArray))
      mem.addData(qvecs.toIndexedSeq: _*)
      q.processAllAvailable()
      // advance the watermark past the window so append emits it
      mem.addData(QueryVec(-1L, ts(600), qvecs.head.embedding))
      q.processAllAvailable()

      val streamed = spark.table("ann_stream")
        .filter(col("qid") >= 0)
        .select(col("qid"), col("neighbors")).collect()
        .map(r => r.getLong(0) ->
          r.getSeq[Row](1).map(n => (n.getLong(0), n.getDouble(1))))
        .toMap
      val batch = graft.operators.SimilarityOps.ivfSearch(
          assigned, queriesDf, topK = 5,
          graft.operators.SimilarityOps.ivfCentroids(emb, k), nprobe = 2)
        .collect()
        .groupBy(_.getAs[Long]("qid"))
        .map { case (qid, rs) =>
          qid -> rs.sortBy(_.getAs[Int]("rn"))
            .map(r => (r.getAs[Long]("nid"), r.getAs[Float]("cos").toDouble)).toSeq
        }
      assert(batch.nonEmpty)
      assert(streamed == batch,
        s"qids streamed=${streamed.keySet} batch=${batch.keySet}")
    } finally q.stop()
  }

  test("sessionize: closes sessions on gap, carries state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[StreamOps.Event]
    val q = StreamOps.sessionize(spark, mem.toDS(), gapMs = 30 * 60000L)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData(sample: _*)
      q.processAllAvailable()
      val closed = spark.table("sessions").as[StreamOps.SessionOut].collect()
      // user 1: sessions (0-10), (70) closed when (130) arrived... the
      // last session per user is still open (no timeout fired yet)
      assert(closed.forall(_.user_id == 1))
      assert(closed.map(_.n_events).sum == 3) // events 1,2 (session A) + 3 (session B)
      val a = closed.minBy(_.session_start.getTime)
      assert(a.session_start == ts(0) && a.session_end == ts(10) && a.n_events == 2)
    } finally q.stop()
  }
}
