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
      blockCols: Seq[String] = Seq("lang", "source")): DataFrame = {
    val blocks = blockCols.map(col)

    // tiers 1+features in one pass over the corpus: fingerprint and
    // hashed-sorted gram set per doc, collapsed to canonical clusters.
    // hashes are identical within a cluster (identical text) — first()
    // carries them without a canonical-docs join.
    val clusters = Tables(spark, dir).documentsSpread
      .select(col("doc_id") +: blocks
        :+ md5(col("text").cast(BinaryType)).as("fp")
        :+ CharNgramHashesSorted(col("text"), 3).as("hashes"): _*)
      .groupBy(col("fp") +: blocks: _*)
      .agg(
        min(col("doc_id")).as("canon_id"),
        collect_list(col("doc_id")).as("members"),
        first(col("hashes")).as("hashes"))
      .persist()

    // tier 2: LSH candidates among canonicals, exact verify
    val nHashes = bands * rowsPerBand
    val sig = clusters
      .select(col("canon_id") +: blocks :+ explode(col("hashes")).as("gh"): _*)
      .groupBy(col("canon_id") +: blocks: _*)
      .agg(
        min(xxhash64(lit(0), col("gh"))).as("h0"),
        (1 until nHashes).map(j => min(xxhash64(lit(j), col("gh"))).as(s"h$j")): _*)
    // one projection: every band key (block folded in) exploded from a
    // single scan — no 8-way union re-scanning the signature. Persisted
    // because the candidate join below reads it TWICE (self-join): an
    // unpersisted subtree would re-run the explode + 16×xxhash64-min
    // aggregation per side.
    val bandRows = sig.select(col("canon_id"), posexplode(array(
      (0 until bands).map(b =>
        xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")) ++ blocks: _*)): _*))
      .as(Seq("band", "bk")))
      .persist()
    val candidates = bandRows.select(col("band"), col("bk"), col("canon_id").as("ca"))
      .join(bandRows.select(col("band"), col("bk"), col("canon_id").as("cb")), Seq("band", "bk"))
      .filter(col("ca") < col("cb"))
      .select("ca", "cb").distinct()

    // verification + expansion share the same two cluster joins:
    // hashes verify the pair, members fan it back out
    val aSide = clusters.select(col("canon_id").as("ca"),
      col("hashes").as("ga"), col("members").as("ma"))
    val bSide = clusters.select(col("canon_id").as("cb"),
      col("hashes").as("gb"), col("members").as("mb"))
    val crossCluster = candidates
      .join(aSide, "ca").join(bSide, "cb")
      .withColumn("inter", SortedLongIntersectCount(col("ga"), col("gb")))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (size(col("ga")) + size(col("gb")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("ma")).as("da"), col("mb"), col("jaccard"))
      .select(col("da"), explode(col("mb")).as("db"), col("jaccard"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("jaccard"))

    // ...plus every within-cluster pair at Jaccard 1.0
    val withinCluster = clusters.filter(size(col("members")) > 1)
      .select(explode(col("members")).as("da"), col("members"))
      .select(col("da"), explode(col("members")).as("db"))
      .filter(col("da") < col("db"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"), lit(1.0).as("jaccard"))

    crossCluster.unionAll(withinCluster)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
