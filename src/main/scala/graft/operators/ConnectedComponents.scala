package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

    // each round's plan references the previous round's TWICE (the
    // union and the convergence join), so raw lineage doubles per
    // iteration — 2^rounds plan nodes by round 10. localCheckpoint
    // (eager) truncates the plan to the materialized RDD every round,
    // keeping iteration N's plan constant-size. This is the standard
    // Spark shape for iterative algorithms.
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      // each neighbor offers its label; nodes keep the min seen
      val offers = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val next = labels.unionAll(offers)
        .groupBy("node").agg(min("label").as("label"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") < col("prev")).count()
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}
