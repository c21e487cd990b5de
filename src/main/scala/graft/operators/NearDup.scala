package graft.operators

import graft.Tables
import graft.functions.CharNgramsDistinct
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType}

/** The production near-duplicate pipeline, two-tier:
  *
  *   1. **exact-dedup collapse** — group by content fingerprint, keep
  *      one canonical per distinct text (q25's operator). This must
  *      run first: exact copies agree on *every* MinHash band, so a
  *      k-copy cluster alone creates k² LSH candidate pairs — at 10×
  *      replicated test scale that OOMed the verify join before this
  *      tier existed;
  *   2. **LSH + exact verify on canonicals** — MinHash-LSH candidates,
  *      then exact char-3-gram Jaccard on candidate pairs only
  *      (O(near-dups), not the exhaustive q29's O(n²));
  *   3. **expansion** — verified canonical pairs fan back out to
  *      member pairs (identical texts ⇒ identical gram sets ⇒ the
  *      canonical pair's Jaccard), and every within-cluster pair is
  *      emitted at Jaccard 1.0. Output matches q29's pair convention
  *      (doc_a < doc_b) without its (lang, source) blocking.
  *
  * Signature design: 16 MinHash functions = native `xxhash64(seed,
  * gram)` over char 3-grams (the SAME feature family the verifier
  * measures — a word-shingle signature has near-zero recall on
  * corpora whose near-dups are character-level edits; measured
  * word-shingle Jaccard of char-Jaccard-0.6 pairs here: 0.01).
  * Banded 8×2: recall ≈ 1-(1-j²)^8 ≈ 0.97 at j = 0.6, →1 as j→1;
  * precision 1.0 by construction. Band keys are single longs, so the
  * candidate self-join shuffles narrow rows.
  */
object NearDup {

  private val bands = 8
  private val rowsPerBand = 2

  /** Near-dup pairs with exact Jaccard ≥ `threshold`. */
  def nearDupPairs(spark: SparkSession, dir: String, threshold: Double = 0.6): DataFrame = {
    val docs = Tables(spark, dir).documentsSpread

    // tier 1: one canonical doc per distinct text. clusters and the
    // canonical gram sets are read by several downstream subtrees
    // (signature, both verify sides, both expansion sides) — persist
    // them once at canonical (deduped) scale or each subtree re-runs
    // the full-corpus fingerprint shuffle.
    val clusters = docs
      .groupBy(md5(col("text").cast(BinaryType)).as("fp"))
      .agg(min(col("doc_id")).as("canon_id"), collect_list(col("doc_id")).as("members"))
      .persist()
    val canonicalDocs = docs.join(
      clusters.select(col("canon_id").as("doc_id")), "doc_id")

    // Features are hashed to sorted longs ONCE per canonical document:
    // per-pair verification is then a primitive merge walk
    // ([[graft.functions.SortedLongIntersectCount]]) instead of
    // array_intersect's per-pair UTF8String hash set (measured ~90% of
    // pipeline CPU on a template-heavy corpus). sz keeps the true
    // distinct-gram count for the Jaccard denominator.
    val gramSets = canonicalDocs
      .select(col("doc_id"), CharNgramsDistinct(col("text"), 3).as("grams"))
      .select(col("doc_id"), size(col("grams")).as("sz"),
        array_sort(transform(col("grams"), g => xxhash64(g))).as("hashes"))
      .persist()

    // tier 2: LSH candidates among canonicals, exact verify. MinHash
    // functions rehash the per-gram long with per-seed xxhash64 —
    // hashing a long, not re-hashing the string.
    val nHashes = bands * rowsPerBand
    val exploded = gramSets.select(col("doc_id"), explode(col("hashes")).as("gh"))
    val sig = exploded.groupBy(col("doc_id")).agg(
      min(xxhash64(lit(0), col("gh"))).as("h0"),
      (1 until nHashes).map(j => min(xxhash64(lit(j), col("gh"))).as(s"h$j")): _*)
    val bandRows = (0 until bands).map { b =>
      sig.select(col("doc_id"), lit(b).as("band"),
        xxhash64((0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}")): _*).as("bk"))
    }.reduce(_ unionAll _)
    val candidates = bandRows.select(col("band"), col("bk"), col("doc_id").as("ca"))
      .join(bandRows.select(col("band"), col("bk"), col("doc_id").as("cb")), Seq("band", "bk"))
      .filter(col("ca") < col("cb"))
      .select("ca", "cb").distinct()
    val verified = candidates
      .join(gramSets.select(col("doc_id").as("ca"), col("hashes").as("ga"), col("sz").as("sz_a")), "ca")
      .join(gramSets.select(col("doc_id").as("cb"), col("hashes").as("gb"), col("sz").as("sz_b")), "cb")
      .withColumn("inter", graft.functions.SortedLongIntersectCount(col("ga"), col("gb")))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("ca"), col("cb"), col("jaccard"))

    // tier 3: fan canonical pairs back out to member pairs...
    val membersByCanon = clusters.select(col("canon_id"), col("members"))
    val crossCluster = verified
      .join(membersByCanon.select(col("canon_id").as("ca"), col("members").as("ma")), "ca")
      .join(membersByCanon.select(col("canon_id").as("cb"), col("members").as("mb")), "cb")
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
