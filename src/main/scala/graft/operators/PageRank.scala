package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Fixed-point integer PageRank — damping 0.85, rank mass carried as
  * a scaled integer (`Unit` = 10^12 = one unit of rank) in
  * DECIMAL(38,0) with explicit floor at both division points, so
  * every round is exactly reproducible: integer sums are
  * order-independent where double PageRank drifts in the last ulp
  * with partition order. That determinism is what makes an iterative
  * graph metric regression-testable (and cross-engine hash-checkable
  * — q101 unrolls the same rounds as oracle CTEs, whose HUGEINT `//`
  * is the same floor-division on the same exact integers).
  *
  * Why decimal, not long: a hub with h in-neighbors accumulates
  * S ≈ h·Unit before damping, and the 85·S intermediate overflows
  * Long at h ≈ 10^5 (found by the PageRankScale star probe — the
  * q01 scaled-long overflow lesson, one operator later). DECIMAL(38)
  * holds 10^38 — no realizable graph reaches it.
  *
  * Per round: one equi-join of ranks with degrees (co-partitioned on
  * node), one join onto edge sources, one partial-aggregated sum onto
  * destinations — two hash-partitioned shuffles, nothing
  * node-count-sized ever broadcast by construction (AQE may still
  * choose to at toy scale), so round cost is linear in |E|.
  *
  * Contract: `edges(a, b)` is the directed edge list; nodes without
  * in-edges drop out after round 1 (feed a symmetric edge list for
  * undirected graphs, where min-degree ≥ 1 holds by construction).
  * The damping leak (remainders of the integer divisions) is part of
  * the defined algorithm — both engines truncate identically.
  */
object PageRank {

  val Unit0: Long = 1000000000000L // fixed-point scale: rank 1.0

  def fixedPoint(edges: DataFrame, iters: Int, checkpointEvery: Int = 10): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    // persisted pre-partitioned on the per-round join key: every
    // round's rank⋈edges exchange reuses this one layout instead of
    // re-shuffling |E| each iteration, and the degree aggregate
    // collapses map-side with no exchange of its own
    val dec = DecimalType(38, 0)
    val e = graft.CacheScope.scoped(
      edges.select(col("a"), col("b")).repartition(col("a")))
    val deg = graft.CacheScope.scoped(
      e.groupBy(col("a").as("node")).agg(count(lit(1)).as("d")))
    var v = deg.select(col("node"), lit(Unit0).cast(dec).as("v"))
    for (k <- 1 to iters) {
      v = v.join(deg, "node")
        // floor over the exact rational = integer division for the
        // non-negative operands here; both engines agree exactly
        .select(col("node"), floor(col("v") / col("d")).cast(dec).as("contrib"))
        .join(e, col("node") === col("a"))
        .groupBy(col("b"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("b").as("node"),
          floor((lit(15 * Unit0).cast(dec) + lit(85).cast(dec) * col("s")) / 100)
            .cast(dec).as("v"))
      // deep iteration counts: truncate lineage so round N's plan does
      // not embed rounds 1..N-1 (the q69 components discipline)
      if (k % checkpointEvery == 0 && k < iters) v = v.localCheckpoint()
    }
    // the cached edge/degree frames are CacheScope-registered, so the
    // caller's action runs the remaining rounds exactly once against
    // them and a post-action drain() releases both — no eager tail
    // materialization inside the caller's timed path (it doubled
    // q101's bench time when tried)
    v
  }
}
