package graft.streaming

import graft.operators.NearDup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous near-duplicate detection: the streaming form of the
  * batch [[graft.operators.NearDup]] pipeline, run as a foreachBatch
  * service over an accumulating index.
  *
  * Per micro-batch: (1) the batch is clustered and banded ONCE
  * (`buildIndex` on the batch only); (2) every near-dup pair involving
  * a batch document — against the accumulated corpus and within the
  * batch — is handed to `onPairs` (this is exactly
  * [[NearDup.incrementalPairs]], so each undirected pair is emitted in
  * exactly one epoch: the epoch its later document arrives in);
  * (3) the batch folds into the index ([[NearDup.mergeIndex]]), whose
  * clusters table is localCheckpointed so lineage stays constant-size
  * across epochs (the iterative-algorithm rule applied to streams).
  *
  * State lives in the persisted canonical-scale cluster/band tables,
  * NOT in Structured Streaming state stores: near-dup state must be
  * joinable (band self-joins), which mapGroupsWithState cannot
  * express, and it is unbounded by design — the dedup horizon is the
  * whole corpus, unlike [[StreamOps.dedupDocStream]]'s
  * watermark-bounded exact dedup. Per-epoch cost scales with the
  * batch, not the corpus (the incremental contract, spec-pinned in
  * NearDupSpec / NearDupStreamSpec).
  *
  * `onPairs` MUST materialize its DataFrame (write/collect) before
  * returning — after it returns, the service advances the index and
  * unpersists the frames the pairs plan reads.
  */
object NearDupStream {

  /** Attach the service to a streaming documents frame (`doc_id`,
    * `text`, blockCols…). `onPairs(pairs, epochId)` receives each
    * epoch's newly found (doc_a, doc_b, jaccard) rows.
    */
  def start(
      docs: DataFrame,
      checkpoint: String,
      onPairs: (DataFrame, Long) => Unit,
      blockCols: Seq[String] = Seq("lang", "source"),
      threshold: Double = 0.6,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val service = new Service(blockCols, threshold, onPairs)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, epochId: Long) =>
        service.processBatch(batch, epochId))
      .start()
  }

  /** [[start]] with DURABLE state: survives kill-and-restart with
    * exactly-once pair emission, where the in-memory [[Service]] loses
    * its accumulated index on restart (a fresh service would both miss
    * corpus-vs-batch pairs and re-emit a replayed epoch's pairs).
    *
    * foreachBatch is at-least-once — after a crash the engine replays
    * the last uncommitted epoch — so both outputs are EPOCH-KEYED
    * OVERWRITES, making the replay idempotent:
    *   - `pairsDir/epoch=N`: the pairs found in epoch N (a replay
    *     recomputes the identical deterministic frame and overwrites
    *     in place; downstream reads committed `_SUCCESS` dirs only);
    *   - `stateDir/epoch=N`: the cluster-table snapshot AFTER folding
    *     epoch N in. An epoch recovers its prior state as the newest
    *     COMMITTED snapshot with epoch < N — a replay of N therefore
    *     reloads N−1's snapshot even if N's own (possibly partial)
    *     snapshot was already written before the crash.
    * Every crash point is covered: before the pairs write (plain
    * rerun), between the writes (pairs overwritten identically, state
    * completed), after both but before the stream checkpoint commits
    * (both overwritten identically). Snapshots older than the two
    * newest are pruned — a replay can only target epochs after the
    * last stream-checkpoint commit, which the newest two bracket.
    */
  def startDurable(
      docs: DataFrame,
      checkpoint: String,
      stateDir: String,
      pairsDir: String,
      blockCols: Seq[String] = Seq("lang", "source"),
      threshold: Double = 0.6,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val service = new DurableService(stateDir, pairsDir, blockCols, threshold)
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .foreachBatch((batch: DataFrame, epochId: Long) =>
        service.processBatch(batch, epochId))
      .start()
  }

  /** The durable per-epoch state machine behind [[startDurable]];
    * public so tests can drive replays (the at-least-once cases)
    * directly with hand-built batches.
    */
  final class DurableService(
      stateDir: String,
      pairsDir: String,
      blockCols: Seq[String],
      threshold: Double) {

    import org.apache.hadoop.fs.Path

    private def fs(spark: org.apache.spark.sql.SparkSession) =
      new Path(stateDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

    /** Epochs with a fully committed (`_SUCCESS`) snapshot, ascending. */
    private def committedEpochs(spark: org.apache.spark.sql.SparkSession): Seq[Long] = {
      val root = new Path(stateDir)
      val f = fs(spark)
      if (!f.exists(root)) Nil
      else f.listStatus(root).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
        .filter(s => f.exists(new Path(s.getPath, "_SUCCESS")))
        .map(_.getPath.getName.stripPrefix("epoch=").toLong)
        .sorted
    }

    def processBatch(batch: DataFrame, epochId: Long): Unit = synchronized {
      val spark = batch.sparkSession
      if (batch.isEmpty) return
      val b = batch.localCheckpoint()
      val prior = committedEpochs(spark).filter(_ < epochId).lastOption
      val old = prior.map(e => NearDup.indexFromClusters(
        spark.read.parquet(s"$stateDir/epoch=$e"), blockCols))
      val fresh = NearDup.buildIndex(b, blockCols)
      val pairs = old match {
        case None => NearDup.indexPairs(fresh, threshold)
        case Some(o) => NearDup.incrementalPairsIndexed(o, fresh, threshold)
      }
      pairs.write.mode("overwrite").parquet(s"$pairsDir/epoch=$epochId")
      val merged = old.map(o => NearDup.mergeIndex(o, fresh))
      merged.map(_.clusters).getOrElse(fresh.clusters)
        .write.mode("overwrite").parquet(s"$stateDir/epoch=$epochId")
      (old.toSeq ++ Seq(fresh) ++ merged.toSeq).foreach(_.unpersist())
      // the localCheckpoint'ed batch holds MEMORY_AND_DISK blocks until
      // the ContextCleaner GCs it — release it now that both writes
      // (pairs + state snapshot) have committed
      b.unpersist(blocking = false)
      // prune: keep the two newest committed snapshots (see scaladoc)
      val committed = committedEpochs(spark)
      committed.dropRight(2).foreach { e =>
        try fs(spark).delete(new Path(s"$stateDir/epoch=$e"), true)
        catch { case _: Throwable => () }
      }
    }
  }

  /** The per-epoch state machine; public so tests can drive it with
    * hand-built batches without a streaming source.
    */
  final class Service(
      blockCols: Seq[String],
      threshold: Double,
      onPairs: (DataFrame, Long) => Unit) {

    private var index: Option[NearDup.Index] = None

    def processBatch(batch: DataFrame, epochId: Long): Unit = synchronized {
      if (batch.isEmpty) return
      // the batch is read by both the pair listing and the merge —
      // materialize it once (foreachBatch frames also cannot be
      // re-evaluated lazily after the epoch ends)
      val b = batch.localCheckpoint()
      val fresh = NearDup.buildIndex(b, blockCols)
      index match {
        case None =>
          onPairs(NearDup.indexPairs(fresh, threshold), epochId)
          index = Some(fresh)
        case Some(old) =>
          onPairs(NearDup.incrementalPairsIndexed(old, fresh, threshold), epochId)
          val merged = NearDup.mergeIndex(old, fresh)
          // cut the union lineage: clusters re-materialized, signatures
          // re-derived from the checkpointed clusters' stored hashes
          val compact = NearDup.indexFromClusters(
            merged.clusters.localCheckpoint(), blockCols)
          Seq(old, fresh, merged).foreach(_.unpersist())
          index = Some(compact)
      }
    }
  }
}
