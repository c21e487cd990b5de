package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Exactly-once file sinks for streaming pipelines.
  *
  * Structured Streaming's contract is at-least-once per micro-batch:
  * after a failure the last uncommitted batch REPLAYS with the same
  * `epochId`. A sink is exactly-once iff re-running a batch is
  * idempotent. The file-sink form of that: write each batch to an
  * epoch-keyed directory with overwrite semantics — a replay rewrites
  * `batch=N` in place instead of appending duplicates. (Spark's
  * built-in file sink reaches the same guarantee via its commit log;
  * this shape works for ANY directory layout/committer — e.g. the
  * reference's timestamped snapshot dirs, ref `load.py:40-76` — and
  * composes with the S3A magic committer profile,
  * [[graft.GraftSession.cluster]].)
  *
  * Scale: each epoch directory is written once and never rewritten
  * after commit, so downstream [[graft.sources.DataLayout.compact]]
  * can fold cold epochs into big files while the stream keeps
  * appending new ones.
  */
object StreamSinks {

  /** The idempotent per-batch body (exposed for direct testing of the
    * replay contract).
    */
  def writeEpoch(out: String)(df: DataFrame, epochId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$out/batch=$epochId")

  /** Start `stream` into an epoch-keyed parquet layout under `out`
    * with exactly-once replay semantics.
    */
  def startEpochSink(stream: DataFrame, out: String, checkpoint: String): StreamingQuery =
    stream.writeStream
      .foreachBatch((df: DataFrame, epochId: Long) => writeEpoch(out)(df, epochId))
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .start()
}
