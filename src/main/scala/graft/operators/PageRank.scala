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
  * Per round: one equi-join of ranks onto the degree-carrying edge
  * table (co-partitioned on node — the edges persist pre-hashed with
  * their out-degree folded onto each row), one partial-aggregated sum
  * onto destinations — a single hash-partitioned shuffle, nothing
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
    // ONE persisted edge table carrying its out-degree alongside each
    // edge: the degree rides the same hash layout as the edges (an
    // unordered count window over the repartition key — no exchange,
    // no join), so each round is a single co-partitioned rank⋈edges
    // join plus the destination aggregation. r7 ran TWO joins per
    // round (ranks⋈degrees, then ⋈edges); folding d onto the edge row
    // computes the identical floor(v/d) per edge — same exact integer
    // per (node, edge), summed in the same exact DECIMAL arithmetic —
    // while deleting a join stage per iteration (r8 iterative-floor
    // shave: q101 5.3 → 3.9 s at sf0.1).
    val dec = DecimalType(38, 0)
    val sel = edges.select(col("a"), col("b"))
    // The whole iteration executes HERE, inside a TightLoop scope (AQE
    // off + stats-sized partitions), as ONE job ending in an eager
    // localCheckpoint: under AQE the caller's action ran every
    // exchange as its own scheduling round-trip (probe-measured 19
    // jobs for 5 rounds — more wall in stage latency than in compute),
    // and AQE's runtime broadcast conversion is unwanted here anyway
    // (nothing node-count-sized may broadcast). Inside the scope the
    // round join is exchange-free by construction — v comes out of the
    // previous round's groupBy hash-split exactly like the cached edge
    // layout — so the per-round cost is the single destination-sum
    // exchange, at partitions sized to the edge estimate.
    TightLoop.scoped(sel.sparkSession, TightLoop.partsFor(sel)) {
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
      val e = graft.CacheScope.scoped(
        sel.repartition(col("a")).withColumn("d", count(lit(1)).over(w)))
      // init: every node with out-edges starts at rank 1.0; distinct
      // over the cached layout needs no exchange (already hash-split on a)
      var v = e.select(col("a").as("node")).distinct()
        .select(col("node"), lit(Unit0).cast(dec).as("v"))
      var prevCp: DataFrame = null
      for (k <- 1 to iters) {
        v = v.join(e, col("node") === col("a"))
          .groupBy(col("b"))
          // floor over the exact rational = integer division for the
          // non-negative operands here; both engines agree exactly
          .agg(sum(floor(col("v") / col("d")).cast(dec)).as("s"))
          .select(col("b").as("node"),
            floor((lit(15 * Unit0).cast(dec) + lit(85).cast(dec) * col("s")) / 100)
              .cast(dec).as("v"))
        // deep iteration counts: truncate lineage so round N's plan
        // does not embed rounds 1..N-1 (the q69 components discipline)
        if (k % checkpointEvery == 0 && k < iters) {
          v = v.localCheckpoint()
          if (prevCp != null) prevCp.unpersist(blocking = false)
          prevCp = v
        }
      }
      val out = v.localCheckpoint()
      if (prevCp != null) prevCp.unpersist(blocking = false)
      // the checkpointed result's blocks free via ContextCleaner once
      // the caller drops the frame (Bench GCs between queries); the
      // cached edge frame is CacheScope-registered for the caller's
      // post-action drain()
      out
    }
  }
}
