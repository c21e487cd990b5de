package graft.tools

import graft.operators.ConnectedComponents
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial scale probe for the two connected-components engines
  * (hash-min vs alternating small-star/large-star): a graph ~10× the
  * sf0.1 near-dup corpus with the two shapes that stress each engine —
  *
  *   - a 100k-node CHAIN (diameter 99 999): hash-min needs
  *     rounds = diameter, i.e. it cannot finish; the alternating
  *     variant contracts paths multiplicatively and must stay O(log n);
  *   - 100 dense 50-node CLIQUES (all pairs, ≈122k edges,
  *     diameter 1): hash-min's home turf — its fused min-seed
  *     converges immediately and its 1-shuffle rounds beat
  *     alternating's 2-shuffle rounds;
  *   - 50k deterministic pseudo-random pairs in 500 buckets of 100 ids
  *     (bounded diameter): the mixed regime, used for a full
  *     cross-engine equality check.
  *
  * Prints one summary line per run (engine, graph, rounds, converged,
  * wall seconds, label checks); results are recorded in README
  * §"Connected components at scale". Run:
  *   sbt "runMain graft.tools.ComponentsScale"
  */
object ComponentsScale {

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // chain: 1-2-...-100000, component min = 1
    val chain = spark.range(1L, 100000L)
      .select(col("id").as("a"), (col("id") + 1L).as("b"))
    // 100 dense cliques of 50 nodes each over ids [200000, 205000):
    // all pairs within a node's own 50-id block
    val blockTop = lit(200000L) +
      ((col("id") - 200000L).cast("long") / 50L).cast("long") * 50L + 49L
    val clique = spark.range(200000L, 205000L)
      .select(col("id").as("a"),
        // least() guard: sequence(a, b) with a > b is DESCENDING in
        // Spark, which would leak a cross-block edge at block tops
        explode(sequence(least(col("id") + 1L, blockTop), blockTop)).as("b"))
      .filter(col("a") < col("b"))
    // deterministic pseudo-random pairs inside 100-id buckets over
    // [1000000, 1050000): bounded diameter, no cross-bucket edges
    val rand = spark.range(0L, 50000L).select(
      (lit(1000000L) + (col("id") % 500L) * 100L
        + pmod(xxhash64(col("id")), lit(100L))).as("a"),
      (lit(1000000L) + (col("id") % 500L) * 100L
        + pmod(xxhash64(col("id") + 777L), lit(100L))).as("b"))
      .filter(col("a") =!= col("b"))

    val denseOnly = clique.unionAll(rand)
    val full = chain.unionAll(denseOnly)

    def report(
        engine: String,
        graph: String,
        run: => (DataFrame, Int),
        maxRounds: Int,
        check: DataFrame => String): Unit = {
      val ((labels, rounds), secs) = time {
        val (df, r) = run
        (df.persist(), r) // materialized by the check below
      }
      val converged = rounds < maxRounds
      val chk = check(labels)
      labels.unpersist()
      println(f"$engine%-11s $graph%-14s rounds=$rounds%-3d " +
        f"converged=$converged%-5s wall=$secs%6.1fs  $chk")
    }

    val chainOk = (l: DataFrame) =>
      s"chain_min1=${l.filter(col("node") <= 100000L && col("label") =!= 1L).count() == 0L}"
    val cliqueOk = (l: DataFrame) =>
      s"clique_min=${l.filter(
        col("node") >= 200000L && col("node") < 205000L &&
          col("label") =!= expr("200000 + ((node - 200000) div 50) * 50")).count() == 0L}"

    // With explicit sweep sizes, run ONLY the tier sweep (part 3).
    if (args.isEmpty) {

    // 1. dense regime (hash-min's home turf): both engines, equality
    val (minLabels, _) = ConnectedComponents.runWithRounds(denseOnly, 30)
    report("hash-min", "dense-only",
      ConnectedComponents.runWithRounds(denseOnly, 30), 30, cliqueOk)
    report("alternating", "dense-only",
      ConnectedComponents.runAlternatingWithRounds(denseOnly, 50), 50, { l =>
        val diff = l.join(minLabels.withColumnRenamed("label", "ml"), "node")
          .filter(col("label") =!= col("ml")).count()
        s"${cliqueOk(l)} equal_to_hashmin=${diff == 0L}"
      })

    // 2. full graph with the 100k chain: hash-min capped at 30 rounds
    // (full convergence would take 99 999), alternating to fixpoint
    report("hash-min", "with-chain",
      ConnectedComponents.runWithRounds(full, 30), 30, chainOk)
    report("alternating", "with-chain",
      ConnectedComponents.runAlternatingWithRounds(full, 50), 50,
      l => s"${chainOk(l)} ${cliqueOk(l)}")
    }

    // 3. driver-union-find tier vs the alternating loop across edge
    // counts (q91-shaped graph: many short per-key chains, the dedup
    // norm) — the [[ConnectedComponents.MaxDriverEdges]] sizing sweep.
    // `runAdaptive` takes the driver tier at every size under the
    // bound; sizes above it print alternating twice.
    val sweep =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(130000L, 1000000L, 4000000L)
    for (edges <- sweep) {
      val chains = spark.range(0L, edges)
        .select(col("id").as("a"),
          when(pmod(col("id") + 1L, lit(20L)) === 0L, col("id"))
            .otherwise(col("id") + 1L).as("b"))
        .filter(col("a") =!= col("b"))
      // (count, hash-sum of (node,label)) — a label sum alone is a
      // weak oracle (compensating per-node label errors cancel; r11
      // ADVICE); the xxhash64 multiset fingerprint matches the loop's
      // own convergence-fingerprint style and pins the full mapping
      def sumLabels(df: DataFrame): String = {
        val r = df.agg(
          count(lit(1)).as("n"),
          sum(xxhash64(col("node"), col("label"))
            .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
          .head()
        s"n=${r.getLong(0)} labelhash=${r.getDecimal(1)}"
      }
      val (adaptive, tAdaptive) = time {
        val l = ConnectedComponents.runAdaptive(chains)
        (sumLabels(l), 0)
      }
      println(f"adaptive    chain-${edges}%-8d wall=$tAdaptive%6.1fs  ${adaptive._1}")
      val (alt, tAlt) = time {
        val l = ConnectedComponents.runAlternating(chains)
        (sumLabels(l), 0)
      }
      println(f"alternating chain-${edges}%-8d wall=$tAlt%6.1fs  ${alt._1}")
      assert(adaptive._1 == alt._1, s"tier mismatch at $edges edges")
    }

    spark.stop()
  }
}
