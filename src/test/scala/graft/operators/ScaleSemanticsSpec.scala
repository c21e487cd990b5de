package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

import java.nio.file.Files

/** Pins the round-9 defined-semantics scale bounds — the certification
  * stratum and the two bucket caps — on synthetic corpora built to sit
  * on BOTH sides of each bound. These are semantics tests, not perf
  * tests: the bounds are part of each query's definition (mirrored in
  * its oracle SQL), so what must hold is (a) below the bound, results
  * are the exhaustive ones; (b) above it, the declared reduction —
  * hub-star connectivity, sub-bucket locality, stratum restriction —
  * and nothing else.
  */
class ScaleSemanticsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write a documents.parquet the Tables loader accepts. */
  private def docsDir(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("scale-sem").toString
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"), length(col("text")).cast("long").as("n_chars"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def runQuery(name: String, dir: String) = {
    val d = SparkEntry.queries(name)(spark, dir)
    try d.collect() finally graft.CacheScope.drain()
  }

  // a text long enough that its 3-gram profile is stable and identical
  // copies are certainly near-dups of each other
  private def longText(tag: String) =
    s"alpha bravo charlie delta echo foxtrot golf hotel india $tag " * 4

  test("q27 bucket cap: below the cap every in-bucket pair is listed; above it a hub star") {
    // 10 identical docs < cap(16): identical signatures, one bucket,
    // exhaustive 10*9/2 = 45 pairs
    val under = docsDir((0L until 10L).map(i => (i, longText("same"))))
    val pairsUnder = runQuery("q27_lsh_candidates", under)
    assert(pairsUnder.length == 45, s"expected full enumeration, got ${pairsUnder.length}")

    // 20 identical docs > cap(16): hub star through min doc_id —
    // 19 pairs, all anchored at the hub, connectivity preserved
    val over = docsDir((0L until 20L).map(i => (i, longText("same"))))
    val pairsOver = runQuery("q27_lsh_candidates", over)
    assert(pairsOver.length == 19, s"expected hub star, got ${pairsOver.length}")
    assert(pairsOver.forall(_.getLong(0) == 0L),
      "every capped pair should anchor at the hub (min doc_id)")
  }

  test("q103 retention through a capped mega-bucket still collapses the full dup cluster") {
    // 20 identical docs: capped candidates are a star, but the star
    // keeps the cluster CONNECTED, so components + keep-best retains
    // exactly one doc
    val dir = docsDir((0L until 20L).map(i => (i, longText("dup"))))
    val out = runQuery("q103_retention_lsh", dir)
    assert(out.length == 20)
    val kept = out.filter(_.getInt(3) == 1)
    assert(kept.length == 1, s"one survivor expected, got ${kept.length}")
  }

  test("certification stratum: q29 ignores docs above the replica-shift bound") {
    val below = (0L until 6L).map(i => (i, longText("x")))
    val above = (0L until 6L).map(i => (1000000L + i, longText("x")))
    val mixed = docsDir(below ++ above)
    val pairs = runQuery("q29_ngram_jaccard_pairs", mixed)
    // only the 6 sub-stratum docs pair: 15 pairs, none involving 1e6+
    assert(pairs.length == 15, s"expected stratum-only pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(2) < 1000000L && r.getLong(3) < 1000000L))
  }

  test("the stratum and caps are mirrored in the oracle SQL (both definitions agree)") {
    val sql = SparkEntry.oracleSql
    for (q <- Seq("q29_ngram_jaccard_pairs", "q53_neardup_pipeline",
        "q69_neardup_components", "q77_cluster_retention", "q113_incremental_dedup"))
      assert(sql(q).contains("doc_id < 1000000"), s"$q oracle lost the stratum")
    for (q <- Seq("q30_cosine_topk", "q31_embedding_sim_pairs", "q106_pq_search"))
      assert(sql(q).contains("vec_id < 1000000"), s"$q oracle lost the vec stratum")
    assert(sql("q27_lsh_candidates").contains("16") &&
      sql("q27_lsh_candidates").contains("hub"), "q27 oracle lost the bucket cap")
    assert(sql("q66_simhash_neardup").contains(s"bn <= ${TextQueries.SimhashBucketCap}") &&
      sql("q66_simhash_neardup").contains("hub"), "q66 oracle lost the bucket cap")
    assert(sql("q102_semdedup").contains(s"cn > ${AdvancedQueries.SemDedupCellCap}"),
      "q102 oracle lost the cell cap")
  }

  test("q102 cell cap: an oversized cell of identical vectors still dedups to its hub") {
    val dir = Files.createTempDirectory("scale-sem-emb").toString
    val v = Array.tabulate(64)(i => (math.sin(i + 1)).toFloat)
    val w = Array.tabulate(64)(i => (math.cos(i * 2 + 1)).toFloat) // cos(v,w) far from 1
    // 16 distinct centroid seeds first (vec_id < 16), then 300
    // identical copies of v (cell > cap fires sub-bucketing; identical
    // vectors share every hyperplane sign, so the whole group stays in
    // one sub-bucket and keeps exactly its min member)
    val rows =
      (0L until 16L).map(i => (i, w.map(x => (x + i * 0.05f)).toSeq)) ++
        (100L until 400L).map(i => (i, v.toSeq))
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"), lit(1).as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = runQuery("q102_semdedup", dir)
    val dupGroup = out.filter(_.getLong(0) >= 100L)
    assert(dupGroup.length == 300)
    val kept = dupGroup.filter(_.getBoolean(2))
    assert(kept.map(_.getLong(0)).toSeq == Seq(100L),
      s"the 300-copy cell must keep exactly its min member, kept ${kept.length}")
  }

  test("q66 bucket cap: below the cap every hamming<=1 pair is listed; above it a hub star") {
    // 10 identical docs: identical 32-bit simhash, both half-buckets of
    // size 10 <= cap(512) -> exhaustive 10*9/2 = 45 pairs, hamming 0
    val under = docsDir((0L until 10L).map(i => (i, longText("sim"))))
    val pairsUnder = runQuery("q66_simhash_neardup", under)
    assert(pairsUnder.length == 45, s"expected full enumeration, got ${pairsUnder.length}")
    assert(pairsUnder.forall(_.getInt(2) == 0))

    // 520 identical docs > cap(512): both half-buckets overflow, the
    // listing collapses to the hub (min doc_id) star — 519 pairs, all
    // anchored at doc 0, connectivity to the hub preserved
    val over = docsDir((0L until 520L).map(i => (i, longText("sim"))))
    val pairsOver = runQuery("q66_simhash_neardup", over)
    assert(pairsOver.length == 519, s"expected hub star, got ${pairsOver.length}")
    assert(pairsOver.forall(r => r.getLong(0) == 0L && r.getInt(2) == 0),
      "every capped pair should anchor at the hub (min doc_id)")
  }

  test("q106 certification stratum: vectors above the replica-shift bound are invisible") {
    val dir = Files.createTempDirectory("scale-sem-emb106").toString
    val base = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    def vec(seed: Long) = base.map(x => x + seed * 0.01f).toSeq
    // 16 codebook seeds + 3 stratum queries (vec_id % 100 = 0) + two
    // above-stratum vectors, one of which would itself be a query
    // (1000100 % 100 = 0) if the stratum didn't exclude it
    val rows = (0L until 16L).map(i => (i, vec(i))) ++
      Seq(100L, 200L, 300L).map(i => (i, vec(i))) ++
      Seq(1000000L, 1000100L).map(i => (i, vec(i)))
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>"), lit(1).as("label"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = runQuery("q106_pq_search", dir)
    assert(out.nonEmpty)
    assert(out.forall(r => r.getLong(0) < 1000000L && r.getLong(1) < 1000000L),
      "ADC must neither rank nor emit vectors above the certification stratum")
    assert(!out.exists(_.getLong(0) == 1000100L),
      "an above-stratum vec_id divisible by 100 must not become a query")
  }
}
