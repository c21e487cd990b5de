package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point integer PageRank — damping 0.85, rank mass carried as
  * a scaled long (`Unit` = 10^12 = one unit of rank) with INTEGER
  * division everywhere, so every round is exactly reproducible: long
  * sums are order-independent where double PageRank drifts in the
  * last ulp with partition order. That determinism is what makes an
  * iterative graph metric regression-testable (and cross-engine
  * hash-checkable — q101 unrolls the same rounds as oracle CTEs).
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
    val e = edges.select(col("a"), col("b")).repartition(col("a")).persist()
    val deg = e.groupBy(col("a").as("node")).agg(count(lit(1)).as("d")).persist()
    var v = deg.select(col("node"), lit(Unit0).as("v"))
    for (k <- 1 to iters) {
      v = v.join(deg, "node")
        .select(col("node"), expr("v div d").as("contrib"))
        .join(e, col("node") === col("a"))
        .groupBy(col("b"))
        .agg(sum(col("contrib")).as("s"))
        .select(col("b").as("node"),
          expr(s"(${15 * Unit0}L + 85L * s) div 100").as("v"))
      // deep iteration counts: truncate lineage so round N's plan does
      // not embed rounds 1..N-1 (the q69 components discipline)
      if (k % checkpointEvery == 0 && k < iters) v = v.localCheckpoint()
    }
    v
  }
}
