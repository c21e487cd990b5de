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
