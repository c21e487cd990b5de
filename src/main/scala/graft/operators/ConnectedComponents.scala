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
  * use [[runAlternating]] — the small-star/large-star variant whose
  * round count is O(log n) regardless of diameter.
  *
  * Determinism: min over node ids — no accumulation-order dependence.
  */
object ConnectedComponents {

  /** `edges` must have two columns naming node ids (any integral
    * type); returns (node, component) for every node incident to an
    * edge, component = min node id reachable.
    */
  def run(edges: DataFrame, maxIter: Int = 25): DataFrame =
    runWithRounds(edges, maxIter)._1

  /** [[run]] plus the number of propagation rounds executed (the
    * scale-test observable: rounds = component diameter for hash-min).
    */
  def runWithRounds(edges: DataFrame, maxIter: Int = 25): (DataFrame, Int) = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    val sel = edges.select(col(ca).as("src"), col(cb).as("dst"))
    // Persisted pre-partitioned on the per-round join key: the cached
    // scan keeps its hash partitioning, so each round's offers join
    // shuffles only the (small) labels side, never the adjacency.
    // Symmetrized via explode, not self-union — a union of two
    // projections of the same subtree would derive (and scan) the
    // caller's pair pipeline twice at materialization (the q101
    // lesson).
    val sym = sel
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .distinct()
      .repartition(col("src"))
      .persist()
    // Materialize the adjacency cache up front, under the caller's
    // session conf (AQE coalesces its layout sensibly): the exact row
    // count sizes the loop's partitions — byte estimates through the
    // callers' pair pipelines inflate wildly (see partsForRows).
    val symCount = sym.count()
    // The propagation loop runs inside a TightLoop scope (AQE off +
    // count-sized partitions): each round's checkpoint is ONE job of
    // few right-sized tasks instead of AQE's per-exchange scheduling
    // round-trips — the measured iterative floor (see TightLoop).
    TightLoop.scoped(
      sel.sparkSession, TightLoop.partsForRows(sel.sparkSession, symCount)) {

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
    // Convergence via the label-sum invariant: labels only ever
    // decrease, so the total is strictly monotone and stalls exactly
    // at fixpoint. DECIMAL(38,0): n × maxId cannot overflow. The sum
    // rides the checkpoint materialization itself via observe()
    // (CollectMetrics in the checkpointed plan, reported when the
    // eager-checkpoint action's execution ends) — ONE job per round
    // where r7 ran two (checkpoint, then a separate aggregate scan of
    // the materialized blocks); measured ~25% off q69/q77 wall.
    def checkpointWithSum(df: DataFrame): (DataFrame, java.math.BigDecimal) = {
      val obs = org.apache.spark.sql.Observation()
      val cp = df.observe(obs,
        coalesce(sum(col("label").cast(DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))).as("s"))
        .localCheckpoint()
      (cp, obs.get("s").asInstanceOf[java.math.BigDecimal])
    }

    val seeded = checkpointWithSum(
      sym.groupBy("src").agg(min("dst").as("mn"))
        .select(col("src").as("node"), least(col("src"), col("mn")).as("label")))
    var labels = seeded._1
    var prevSum = seeded._2

    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // each neighbor offers its label; nodes keep the min seen
      val offers = sym.join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val (next, s) = checkpointWithSum(
        labels.unionAll(offers)
          .groupBy("node").agg(min("label").as("label")))
      converged = s.compareTo(prevSum) == 0
      prevSum = s
      labels.unpersist()
      labels = next
      iter += 1
    }
    sym.unpersist()
    (labels, iter)
    }
  }

  /** Alternating small-star / large-star connected components — the
    * scale path for graphs with long chains, where hash-min's
    * rounds-=-diameter cost is the killer (a 100k-link chain would
    * need 100k shuffles). Alternation contracts path lengths
    * multiplicatively, converging in O(log n) rounds regardless of
    * diameter (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC'14 — public algorithm, re-derived here as DataFrame
    * plans).
    *
    * One round = large-star then small-star, each a groupBy-min plus
    * an equi-join — two shuffles, same per-round plan shape as
    * hash-min. The edge set only shrinks toward a star forest (every
    * node pointing at its component min), so convergence is detected
    * by an (edge-count, xxhash64-sum) fingerprint going stable — one
    * tiny aggregate per round, no join-based set comparison.
    *
    * Same output contract as [[run]]: (node, component) for every node
    * incident to an input edge, component = min reachable id.
    * [[ConnectedComponentsSpec]] pins equality with [[run]] on chains,
    * cliques, and random graphs.
    */
  def runAlternating(edges: DataFrame, maxIter: Int = 50): DataFrame =
    runAlternatingWithRounds(edges, maxIter)._1

  /** [[runAlternating]] plus rounds executed (expected O(log n)). */
  def runAlternatingWithRounds(edges: DataFrame, maxIter: Int = 50): (DataFrame, Int) = {
    val Seq(ca, cb) = edges.columns.toSeq.take(2)
    // Materialize the raw pairs ONCE before any self-union: the input
    // is scanned a single time, and the checkpoint cuts the caller's
    // plan constraints — self-unions over a constraint-carrying plan
    // (e.g. an upstream filter whose column is pruned on one branch)
    // trip UnionBase.rewriteConstraints ("key not found: <attr>").
    // The checkpoint's materialization also yields the exact edge
    // count (via observe, no extra job) — the loop-partition sizing
    // input; byte estimates through pair pipelines inflate wildly
    // (see TightLoop.partsForRows).
    val rawObs = org.apache.spark.sql.Observation()
    val raw = edges
      .select(col(ca).as("a"), col(cb).as("b"))
      .observe(rawObs, count(lit(1)).as("n"))
      .localCheckpoint()
    val rawCount = rawObs.get("n").asInstanceOf[Long]
    // NO Union operators anywhere below: a Union whose children share
    // lineage (self-union) or sit over a checkpointed plan with
    // preserved constraints trips Catalyst's
    // UnionBase.rewriteConstraints ("key not found: <attr>") on
    // real-world input plans. explode(array(struct…)) emits the same
    // rows with identical shuffle volume and no constraint rewrite.

    // All incident nodes (kept aside: the star loop drops self-loops,
    // but a node whose only edge is a self-loop must still be labeled).
    val nodes = raw
      .select(explode(array(col("a"), col("b"))).as("node"))
      .distinct()
      .persist()

    // Each star needs min-over-neighborhood joined back onto every
    // edge of the neighborhood. A groupBy+join does that in two
    // shuffle subtrees; an unordered window (min over the whole
    // partition) does it in ONE — the rows are already co-located by
    // the partition key, so the min rides along without a second
    // exchange. Measured on q91's chain graph: ~35% less wall per
    // round, identical output (spec pins equality with hash-min).

    // large-star: every neighbor v > u gets pointed at
    // min(Γ(u) ∪ {u}); processing each undirected edge from its
    // smaller endpoint preserves connectivity while hanging big nodes
    // under small ones. No trailing distinct: each input edge emits at
    // most one row (no inflation), and the small-star that follows
    // re-shuffles immediately — duplicate (v, m) rows cannot change
    // its min, so deduping here would buy nothing but a shuffle.
    def largeStar(e: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("a")
      e.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .withColumn("m", least(col("a"), min(col("b")).over(w)))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b"))
    }

    // small-star: orient edges large→small, then link each node and
    // all its smaller neighbors directly to the smallest — the
    // path-halving step. The (u, m) self-link is emitted alongside
    // every (v, m) row and collapsed by the distinct (kept here: it
    // canonicalizes the round's edge set for the fingerprint).
    def smallStar(e: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("u")
      e.select(
        greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
        .withColumn("m", min(col("v")).over(w))
        .select(explode(array(
          struct(col("v").as("a"), col("m").as("b")),
          struct(col("u").as("a"), col("m").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
        .filter(col("a") =!= col("b"))
        .distinct()
    }

    // Set fingerprint: (count, sum(xxhash64(a,b))) — stable across a
    // full round exactly at the star-forest fixpoint (a hash-sum
    // collision masking a real change is negligible, and the oracle
    // gate would catch it). Hashes are full-range 64-bit, so the sum
    // goes through DECIMAL(38,0) — long sum would overflow under ANSI.
    // The fingerprint rides the checkpoint materialization via
    // observe() (one job per round instead of checkpoint + separate
    // aggregate — the r8 iterative-floor shave; the distinct() that
    // canonicalizes the edge set for it stays, same plan as r7).
    def checkpointWithFingerprint(df: DataFrame): (DataFrame, (Long, BigDecimal)) = {
      val obs = org.apache.spark.sql.Observation()
      val cp = df.observe(obs,
        count(lit(1)).as("n"),
        coalesce(
          sum(xxhash64(col("a"), col("b")).cast(DecimalType(38, 0))),
          lit(java.math.BigDecimal.ZERO).cast(DecimalType(38, 0))).as("h"))
        .localCheckpoint()
      val m = obs.get
      (cp, (m("n").asInstanceOf[Long],
        BigDecimal(m("h").asInstanceOf[java.math.BigDecimal])))
    }

    // The star loop runs inside a TightLoop scope (AQE off +
    // count-sized partitions): one job per round instead of AQE's
    // per-exchange scheduling round-trips — the measured iterative
    // floor (see TightLoop). The symmetric closure doubles rows,
    // hence 2× the checkpointed count.
    val loopState = TightLoop.scoped(
      raw.sparkSession,
      TightLoop.partsForRows(raw.sparkSession, 2L * rawCount)) {
      val canon = checkpointWithFingerprint(
        raw.filter(col("a") =!= col("b")).distinct())
      var e = canon._1
      var prev = canon._2
      var converged = prev._1 == 0L
      var iter = 0
      while (!converged && iter < maxIter) {
        // ONE star pair per checkpoint/fingerprint. (Measured: composing
        // two pairs per probe to halve the fixed costs made q91 ~30%
        // SLOWER — the star work itself dominates, and the extra
        // confirmation iteration then costs two rounds, not one.)
        // localCheckpoint per round: same lineage-truncation rationale
        // as the hash-min loop above.
        val (next, fp) = checkpointWithFingerprint(smallStar(largeStar(e)))
        converged = fp == prev
        prev = fp
        e = next
        iter += 1
      }
      (e, iter)
    }
    val e = loopState._1
    val iter = loopState._2
    // Fixpoint is a star forest: every non-root points at its root.
    // Roots (and self-loop-only nodes) label themselves via the
    // left join's coalesce.
    val stars = e.select(col("a").as("node"), col("b").as("label"))
      .groupBy("node").agg(min("label").as("label"))
    val labels = nodes.join(stars, Seq("node"), "left")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    nodes.unpersist()
    (labels, iter)
  }
}
