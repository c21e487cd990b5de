package graft.operators

import graft.Tables
import graft.functions.{CharNgramHashesSorted, SortedLongIntersectCount}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}

/** The production near-duplicate pipeline, two-tier:
  *
  *   1. **exact-dedup collapse** — group by content fingerprint, keep
  *      one canonical per distinct (block, text). This must run first:
  *      exact copies agree on *every* MinHash band, so a k-copy
  *      cluster alone creates k² LSH candidate pairs — at 10×
  *      replicated test scale that OOMed the verify join before this
  *      tier existed;
  *   2. **LSH + exact verify on canonicals** — MinHash-LSH candidates,
  *      then exact char-3-gram Jaccard on candidate pairs only
  *      (O(near-dups), not the exhaustive q29's O(n²));
  *   3. **expansion** — verified canonical pairs fan back out to
  *      member pairs (identical texts ⇒ identical gram sets ⇒ the
  *      canonical pair's Jaccard), and every within-cluster pair is
  *      emitted at Jaccard 1.0. Output follows q29's pair convention
  *      (doc_a < doc_b) and, by default, its (lang, source) blocking.
  *
  * Single-pass feature extraction: each document's distinct char
  * 3-grams are hashed and sorted by ONE kernel call
  * ([[graft.functions.CharNgramHashesSorted]]) in the same projection
  * that fingerprints the text — the corpus text is never touched
  * again. Clusters carry (members, hashes) together, so verification
  * and member expansion are two joins against one persisted
  * canonical-scale table. Per-pair verification is a primitive merge
  * walk ([[graft.functions.SortedLongIntersectCount]]); per-pair
  * `array_intersect` on strings was ~90% of pipeline CPU before.
  *
  * Signature design: the LSH hashes the SAME feature family the
  * verifier measures (char 3-grams) — a word-shingle signature has
  * near-zero recall on corpora whose near-dups are character-level
  * edits (measured word-shingle Jaccard of char-Jaccard-0.6 pairs
  * here: 0.01). 16 MinHash functions = per-seed `xxhash64` re-hashes
  * of the per-gram long, banded 8×2: recall ≈ 1-(1-j²)^8 ≈ 0.97 at
  * j = 0.6, →1 as j→1; precision 1.0 by construction. Band keys are
  * single longs, so the candidate self-join shuffles narrow rows.
  */
object NearDup {

  private val bands = 8
  private val rowsPerBand = 2

  /** A built near-dup index: `clusters` is the canonical-scale table
    * (fp, blocks…, canon_id, members, hashes — one row per distinct
    * (block, text)); `bandRows` its exploded LSH band keys
    * (band, bk, canon_id). Both persisted. At 100 TB these are the
    * tables a production dedup service keeps on disk between crawl
    * batches: the corpus TEXT is read once at build time, and every
    * later operation (full pair listing, incremental batch, index
    * merge) runs at canonical scale from the stored gram hashes.
    */
  final case class Index(
      clusters: DataFrame,
      bandRows: DataFrame,
      blockCols: Seq[String])

  /** Near-dup pairs with exact Jaccard ≥ `threshold`, blocked by
    * `blockCols` (pairs are only sought within a block — the standard
    * entity-resolution guard that keeps candidate volume proportional
    * to true duplicates; this template-heavy corpus has ~8M unblocked
    * near-dup pairs among 5k documents vs ~10² within blocks). Pass
    * `Nil` for global cross-block search.
    */
  def nearDupPairs(
      spark: SparkSession,
      dir: String,
      threshold: Double = 0.6,
      blockCols: Seq[String] = Seq("lang", "source")): DataFrame =
    indexPairs(buildIndex(Tables(spark, dir).documentsSpread, blockCols), threshold)

  /** Build the index from a documents frame (`doc_id`, `text`,
    * blockCols…). Tier 1 + feature extraction in ONE pass over the
    * corpus: fingerprint and hashed-sorted gram set per doc, collapsed
    * to canonical clusters (hashes are identical within a cluster —
    * identical text — so `first()` carries them without a
    * canonical-docs join); then the 16×xxhash64-min signature and band
    * keys at canonical scale.
    */
  def buildIndex(
      docs: DataFrame,
      blockCols: Seq[String] = Seq("lang", "source")): Index = {
    val blocks = blockCols.map(col)
    val clusters = docs
      .select(col("doc_id") +: blocks
        :+ md5(col("text").cast(BinaryType)).as("fp")
        :+ CharNgramHashesSorted(col("text"), 3).as("hashes"): _*)
      .groupBy(col("fp") +: blocks: _*)
      .agg(
        min(col("doc_id")).as("canon_id"),
        collect_list(col("doc_id")).as("members"),
        first(col("hashes")).as("hashes"))
      .persist()
    Index(clusters, bandRowsOf(clusters, blockCols), blockCols)
  }

  /** Band keys from a clusters table — no text scan: the signature
    * aggregation explodes the STORED gram hashes. One projection
    * emits every band key (block folded in) from a single scan — no
    * 8-way union re-scanning the signature. Persisted because the
    * candidate join reads it twice (self-join): an unpersisted
    * subtree would re-run the explode + 16×xxhash64-min aggregation
    * per side.
    */
  /** Re-derive an index from a clusters table (e.g. one reloaded from
    * disk or localCheckpointed to cut cross-batch lineage) — band keys
    * come from the stored hashes, no text involved.
    */
  def indexFromClusters(clusters: DataFrame, blockCols: Seq[String]): Index =
    Index(clusters, bandRowsOf(clusters, blockCols), blockCols)

  private def bandRowsOf(clusters: DataFrame, blockCols: Seq[String]): DataFrame = {
    val blocks = blockCols.map(col)
    val nHashes = bands * rowsPerBand
    val sig = clusters
      .select(col("canon_id") +: blocks :+ explode(col("hashes")).as("gh"): _*)
      .groupBy(col("canon_id") +: blocks: _*)
      .agg(
        min(xxhash64(lit(0), col("gh"))).as("h0"),
        (1 until nHashes).map(j => min(xxhash64(lit(j), col("gh"))).as(s"h$j")): _*)
    sig.select(col("canon_id"), posexplode(array(
      (0 until bands).map(b =>
        xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")) ++ blocks: _*)): _*))
      .as(Seq("band", "bk")))
      .persist()
  }

  /** Verify candidate (ca, cb) canonical pairs against the cluster
    * tables and fan verified pairs back out to members: hashes verify
    * the pair (primitive merge walk), members expand it (identical
    * texts ⇒ identical gram sets ⇒ the canonical pair's Jaccard).
    */
  private def verifyExpand(
      candidates: DataFrame,
      aClusters: DataFrame,
      bClusters: DataFrame,
      threshold: Double): DataFrame = {
    val aSide = aClusters.select(col("canon_id").as("ca"),
      col("hashes").as("ga"), col("members").as("ma"))
    val bSide = bClusters.select(col("canon_id").as("cb"),
      col("hashes").as("gb"), col("members").as("mb"))
    candidates
      .join(aSide, "ca").join(bSide, "cb")
      .withColumn("inter", SortedLongIntersectCount(col("ga"), col("gb")))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("ma")).as("da"), col("mb"), col("jaccard"))
      .select(col("da"), explode(col("mb")).as("db"), col("jaccard"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))
  }

  /** Every within-cluster pair (identical texts) at Jaccard 1.0. */
  private def withinCluster(clusters: DataFrame): DataFrame =
    clusters.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("da"), col("members"))
      .select(col("da"), explode(col("members")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"), lit(1.0).as("jaccard"))

  /** All near-dup pairs in an index (the full-corpus listing). */
  def indexPairs(index: Index, threshold: Double = 0.6): DataFrame = {
    val bandRows = index.bandRows
    val candidates = bandRows.select(col("band"), col("bk"), col("canon_id").as("ca"))
      .join(bandRows.select(col("band"), col("bk"), col("canon_id").as("cb")), Seq("band", "bk"))
      .filter(col("ca") < col("cb"))
      .select("ca", "cb").distinct()
    verifyExpand(candidates, index.clusters, index.clusters, threshold)
      .unionAll(withinCluster(index.clusters))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Incremental batch: every near-dup pair INVOLVING a new document —
    * new-vs-corpus and new-vs-new — without touching the corpus text
    * or re-banding the corpus. The new batch is clustered and banded
    * (one scan of the BATCH only); candidates come from the new band
    * rows joined against the stored band table (corpus side) and
    * against themselves (within-batch side). Cost scales with the
    * batch, not the corpus — the daily-crawl shape at 100 TB.
    *
    * Assumes batch doc_ids are disjoint from the corpus. A batch doc
    * identical to a corpus doc shares every band key, so the pair
    * arrives as an LSH candidate and verifies at Jaccard 1.0 — no
    * special exact-dup path needed across the boundary.
    */
  def incrementalPairs(
      index: Index,
      newDocs: DataFrame,
      threshold: Double = 0.6): DataFrame =
    incrementalPairs(index, buildIndex(newDocs, index.blockCols), threshold)

  /** [[incrementalPairs]] with the batch already indexed — callers
    * that both list pairs AND merge (the streaming service) index the
    * batch once and share it.
    */
  def incrementalPairs(
      index: Index,
      fresh: Index,
      threshold: Double): DataFrame = {
    val nb = fresh.bandRows
    val newVsOld = nb.select(col("band"), col("bk"), col("canon_id").as("ca"))
      .join(index.bandRows.select(col("band"), col("bk"), col("canon_id").as("cb")),
        Seq("band", "bk"))
      .select("ca", "cb").distinct()
    val newVsNew = nb.select(col("band"), col("bk"), col("canon_id").as("ca"))
      .join(nb.select(col("band"), col("bk"), col("canon_id").as("cb")), Seq("band", "bk"))
      .filter(col("ca") < col("cb"))
      .select("ca", "cb").distinct()
    verifyExpand(newVsOld, fresh.clusters, index.clusters, threshold)
      .unionAll(verifyExpand(newVsNew, fresh.clusters, fresh.clusters, threshold))
      .unionAll(withinCluster(fresh.clusters))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Fold a new batch into the index for the next round: clusters with
    * the same (block, fingerprint) merge (members concatenate, canon =
    * min doc id), and band keys are re-derived from the merged
    * clusters' STORED hashes — the corpus text is never re-read.
    */
  def mergeIndex(index: Index, newDocs: DataFrame): Index =
    mergeIndex(index, buildIndex(newDocs, index.blockCols))

  /** [[mergeIndex]] with the batch already indexed. */
  def mergeIndex(index: Index, fresh: Index): Index = {
    val blocks = index.blockCols.map(col)
    val merged = index.clusters.unionByName(fresh.clusters)
      .groupBy(col("fp") +: blocks: _*)
      .agg(
        min(col("canon_id")).as("canon_id"),
        flatten(collect_list(col("members"))).as("members"),
        first(col("hashes")).as("hashes"))
      .persist()
    Index(merged, bandRowsOf(merged, index.blockCols), index.blockCols)
  }
}
