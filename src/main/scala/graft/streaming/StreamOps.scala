package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured-Streaming forms of the event analytics: the same logic
  * as the batch queries in [[graft.operators.EventQueries]], expressed
  * incrementally. The reference's "streaming" was an hourly batch
  * re-run (`/root/reference/src/main.py:156`); these are the genuine
  * continuous equivalents.
  *
  * State design for scale: windowed aggs carry O(#open windows × #keys)
  * state bounded by the watermark; sessionization keys state by
  * user_id with an explicit inactivity timeout, so state size tracks
  * *active* users only.
  */
object StreamOps {

  /** Tumbling-window count+sum per event type with a watermark; works
    * on any streaming DataFrame with (ts: timestamp, event_type,
    * value) — batch DataFrames too (same plan, identical results).
    */
  def windowedEventAgg(
      events: DataFrame,
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("win.start").as("window_start"), col("event_type"), col("n"), col("total_value"))

  /** Streaming exact dedup for a document-ingest stream: key =
    * content fingerprint (md5 of the text bytes — same fingerprint as
    * the batch dedup q25), state bounded by the event-time watermark
    * via `dropDuplicatesWithinWatermark`. Unbounded `dropDuplicates`
    * would keep every fingerprint ever seen; the watermark form keeps
    * only the fingerprints inside the late-data horizon — the shape
    * that survives an unbounded 100 TB/day ingest. Duplicates farther
    * apart than the watermark are left to a periodic batch sweep
    * (q25), the standard two-tier design.
    *
    * Input must carry (ts: timestamp, text: string); all columns pass
    * through.
    */
  def dedupDocStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", md5(col("text").cast("binary")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-static enrichment: each micro-batch joins the (small)
    * static dimension — planned as a broadcast hash join per batch, no
    * streaming state at all. The static side is re-read per batch, so
    * a slowly-changing dim is picked up without restarts.
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(broadcast(dim), Seq(key), "left")

  /** Windowed distinct-user SKETCHES: per-window HLL registers (not
    * estimates) over a watermarked stream — the continuous producer
    * for the q111 union algebra. Emitting registers is the point:
    * downstream, any span of windows collapses to one register-wise
    * max (≈4 KB each) for an exact-same-as-batch distinct estimate
    * over that range, with no replay of the stream. Hashing stays in
    * codegen'd SQL; state per open window is one 4 KB buffer
    * (bounded by the watermark), serialized to the state store by the
    * aggregator's BINARY encoder. Works identically on a batch frame
    * (watermark is a no-op there) — the equivalence the spec pins.
    */
  def distinctUsersStream(
      events: DataFrame,
      windowDur: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val hll = udaf(new graft.functions.HllSketch(),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .withColumn("h", xxhash64(col("user_id")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur).as("w"))
      .agg(hll(col("h")).as("sk"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("sk"))
  }

  /** Streaming contamination screen: flags documents whose word
    * 8-grams MIGHT overlap the eval set, by probing every gram
    * against a broadcast bloom filter inside an `exists` higher-order
    * function over the gram array — a pure stateless projection (no
    * explode, no shuffle, no streaming state), so it runs in append
    * mode on an unbounded ingest. The gram array comes from the
    * codegen'd WordShingles kernel; the probes run interpreted inside
    * the HOF (Spark evaluates lambda bodies interpreted) — ~W hash
    * probes per document, still strictly map-side.
    *
    * One-sided error, inherited from the filter: `false` is
    * definitive (provably clean — the overwhelming majority at any
    * real contamination rate, dropped right here), `true` is a
    * candidate for the exact verify join (the batch q99 tail run on
    * the tiny surviving fraction, per epoch or downstream).
    */
  def contaminationScreen(
      docs: DataFrame,
      bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
      : DataFrame =
    docs.withColumn("candidate",
      exists(graft.functions.WordShingles(col("text"), 8),
        g => graft.functions.BloomMightContain(g, bloom)))

  /** Stream-stream interval join: left rows pair with right rows of
    * the same `key` whose event time falls within ±`gap` — the
    * continuous form of the batch [[graft.operators.RangeJoin]].
    * Both sides carry watermarks and the join condition bounds the
    * time difference in BOTH directions, which is what lets Spark
    * evict buffered state once the watermark passes (an unbounded
    * condition would buffer each side forever). Column names: callers
    * pass pre-disambiguated frames; `leftTime`/`rightTime` name the
    * two event-time columns.
    */
  /** `joinType` "inner" (default) or "leftOuter": outer emits the
    * unmatched left row null-padded once the watermark passes its
    * match window — the streaming form of "orders with no payment
    * within the SLA", impossible to answer earlier than the watermark
    * by construction.
    */
  def intervalJoinStreams(
      left: DataFrame,
      right: DataFrame,
      key: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      gap: String = "15 minutes",
      watermark: String = "30 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTime, watermark)
    val r = right.withWatermark(rightTime, watermark)
    l.join(r,
      col(key) === col(rightKey) &&
        col(rightTime) >= col(leftTime) - expr(s"INTERVAL $gap") &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $gap"),
      joinType)
  }

  /** Continuous similarity search: a stream of (qid, ts, embedding)
    * queries searched against a static IVF-assigned corpus, emitting
    * per-window top-k neighbor lists in append mode.
    *
    * Streaming constraints shape the plan: row-number windows are
    * illegal on streams, so (1) probe-cell selection happens INSIDE the
    * row — the k centroids arrive as literals (the "broadcast the
    * trained model" pattern) and an array_sort over k scored structs
    * picks the `nprobe` nearest cells; (2) the final per-query top-k is
    * a watermarked windowed aggregation with the mergeable
    * [[graft.functions.TopKByScore]] UDAF, so state is O(k) per open
    * (window, qid) and append mode fires on watermark close.
    *
    * Cell ranking is the same `cosine` expression the batch path uses
    * (centroid vector as an array literal — its norm constant-folds),
    * so stream and batch probe choices agree bit-for-bit.
    */
  def annStream(
      queries: DataFrame,
      assigned: DataFrame,
      centroids: Array[(Long, Array[Float])],
      topK: Int,
      nprobe: Int,
      window_ : String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    import graft.functions.VectorFunctions
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    // float32-cast before ranking — the identical cross-engine bit-
    // stability contract the batch ivfSearch/q30 path uses, so stream
    // and batch probe choices and ranks agree exactly
    val scored = centroids.map { case (cid, cv) =>
      struct(
        (-VectorFunctions.cosine(col("embedding"), typedlit(cv)).cast(FloatType)).as("neg"),
        lit(cid).as("cid"))
    }
    val probes = queries
      .withColumn("cells",
        slice(array_sort(array(scored: _*)), 1, nprobe))
      .select(col("qid"), col("ts"), col("embedding").as("qv"),
        explode(col("cells.cid")).as("cell"))
    val cands = assigned.select(
      col("cell"), col("vec_id").as("nid"), col("embedding").as("nv"))
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKByScore(topK),
      org.apache.spark.sql.Encoders.product[(Long, Double)])
    probes.join(cands, "cell")
      .filter(col("qid") =!= col("nid"))
      // float32 rounding first (ranking parity with batch), exact
      // widen back to double for the (Long, Double) UDAF encoder
      .withColumn("cos",
        VectorFunctions.cosine(col("qv"), col("nv")).cast(FloatType).cast(DoubleType))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"), col("qid"))
      .agg(topk(col("nid"), col("cos")).as("neighbors"))
      .select(col("win.start").as("window_start"), col("qid"), col("neighbors"))
  }

  /** Trending tokens: per event-time window, the exact top-k most
    * frequent tokens in the document stream — the corpus-monitoring
    * dashboard query, continuously. The mergeable [[graft.functions.
    * TopKByCount]] Aggregator keeps map-side partial counts, so the
    * shuffle carries one count-map per (window, partition), state is
    * watermark-bounded, and append mode emits each window once on
    * close. Batch equivalent: q34 per window.
    */
  def trendingTokens(
      docs: DataFrame,
      k: Int,
      window_ : String = "1 minute",
      watermark: String = "2 minutes"): DataFrame = {
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKByCount(k),
      org.apache.spark.sql.Encoders.STRING)
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(col("text"), " ")).as("token"))
      .groupBy(window(col("ts"), window_).as("win"))
      .agg(topk(col("token")).as("top_tokens"))
      .select(col("win.start").as("window_start"), col("top_tokens"))
  }

  /** Windowed EXACT quantiles of a long-valued column, continuously:
    * per event-time tumbling window, the lower empirical quantile at
    * each requested p (k-th smallest, k = max(1, ceil(p·n)) — the
    * q84/q120 rank convention), via the mergeable
    * [[graft.functions.QuantileByCount]] count-map Aggregator. The
    * shuffle carries one value→count map per (window, partition)
    * (map-side partial agg), state per open window is bounded by the
    * DISTINCT value count — quantized domains only (cents, token
    * counts); sketch (q89) for unbounded reals — and the watermark
    * closes windows for append-mode emission. Batch equivalent:
    * identical results on the same frame (the spec pins it); the
    * batch-side kernel for full data is `DistributedRank.valuesAtRanks`.
    */
  def windowedQuantiles(
      rows: DataFrame,
      quantiles: Seq[Double] = Seq(0.5, 0.9, 0.99),
      valueCol: String = "v",
      window_ : String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val quant = org.apache.spark.sql.functions.udaf(
      new graft.functions.QuantileByCount(quantiles),
      org.apache.spark.sql.Encoders.scalaLong)
    rows
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_).as("win"))
      .agg(count(lit(1)).as("n"), quant(col(valueCol)).as("qs"))
      .select(col("win.start").as("window_start"), col("n"), col("qs"))
  }

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  final case class SessionState(sessionStart: Long, lastTs: Long, nEvents: Long)
  final case class SessionOut(user_id: Long, session_start: Timestamp, session_end: Timestamp, n_events: Long)

  /** Stateful sessionization via flatMapGroupsWithState with an
    * event-time timeout: a session closes either when a later event
    * for the same user arrives past the gap, or when the watermark
    * passes `lastTs + gap` (idle-user flush). State is therefore
    * bounded by the watermark — the shape that holds at 100 TB/day.
    * Batch equivalent: the lag/running-sum form in EventQueries.q20.
    */
  def sessionize(
      spark: SparkSession,
      events: Dataset[Event],
      gapMs: Long = 30L * 60 * 1000): Dataset[SessionOut] = {
    import spark.implicits._

    def flush(userId: Long, st: SessionState): SessionOut =
      SessionOut(userId, new Timestamp(st.sessionStart), new Timestamp(st.lastTs), st.nEvents)

    events.toDF()
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val out = state.getOption.map(flush(userId, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var st = state.getOption.orNull
            val closed = Seq.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              st match {
                case null =>
                  st = SessionState(t, t, 1)
                case s if t - s.lastTs > gapMs =>
                  closed += flush(userId, s)
                  st = SessionState(t, t, 1)
                case s =>
                  st = s.copy(lastTs = t, nEvents = s.nEvents + 1)
              }
            }
            if (st != null) {
              state.update(st)
              state.setTimeoutTimestamp(st.lastTs + gapMs)
            }
            closed.result().iterator
          }
        })
  }
}
