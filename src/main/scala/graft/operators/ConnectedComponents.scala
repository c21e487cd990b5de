package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Connected components over an undirected edge list — the cluster-
  * assignment step a dedup pipeline runs after pair generation
  * (near-dup PAIRS say "a ~ b"; retention policy needs "which CLUSTER
  * does every doc belong to", i.e. the transitive closure).
  *
  * Algorithm: hash-min label propagation. Every node starts labeled
  * with itself; each round every node takes the min label among itself
  * and its neighbors; fixpoint = min node id per component. Expressed
  * as DataFrame joins per round with a driver-side convergence loop —
  * the same shape GraphX/GraphFrames use underneath, and the idiomatic
  * Spark form for iterative algorithms (each round is one shuffle; the
  * adjacency list is persisted once and reused). Rounds needed = max
  * component diameter; near-dup graphs are dense little cliques, so
  * this converges in 2-3 rounds. For web-scale graphs with long chains
  * use the alternating small-star/large-star variant (O(log n)
  * rounds) — same per-round plan, different propagation rule.
  *
  * Determinism: min over node ids — no accumulation-order dependence.
  */
object ConnectedComponents {

  /** `edges` must have two columns naming node ids (any integral
    * type); returns (node, component) for every node incident to an
    * edge, component = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    val sym = edges.select(col(ca).as("src"), col(cb).as("dst"))
      .unionAll(edges.select(col(cb).as("src"), col(ca).as("dst")))
      .distinct()
      .persist()

    // Lineage: each round's plan references the previous round's, so
    // raw lineage compounds per iteration and blows the heap by round
    // ~10. localCheckpoint (eager) truncates the plan to the
    // materialized RDD every round, keeping iteration N's plan
    // constant-size — the standard Spark shape for iterative
    // algorithms.
    //
    // Seeding: labels start at min(self, neighbors) — round 1 fused
    // into initialization, so clique-shaped components (the near-dup
    // norm) are already at fixpoint when the loop begins.
    var labels = sym.groupBy("src").agg(min("dst").as("mn"))
      .select(col("src").as("node"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint()

    // Convergence via the label-sum invariant: labels only ever
    // decrease, so the total is strictly monotone and stalls exactly
    // at fixpoint — one tiny aggregate over the checkpointed RDD per
    // round instead of a join+count. DECIMAL(38,0): n × maxId cannot
    // overflow.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      val d = df.agg(sum(col("label").cast(DecimalType(38, 0)))).head().getDecimal(0)
      if (d == null) java.math.BigDecimal.ZERO else d
    }

    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each neighbor offers its label; nodes keep the min seen
      val offers = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val next = labels.unionAll(offers)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      val s = labelSum(next)
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
