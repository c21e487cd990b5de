package graft.tools

import graft.GraftSession
import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Adversarial scale probe for [[PageRank.fixedPoint]] (the q69/q77
  * ComponentsScale discipline): a star graph — one hub receiving
  * every spoke's contribution, the worst skew for the
  * sum-onto-destination shuffle — against a degree-2 ring control of
  * the same edge count. The star must NOT blow up: the contribution
  * sum is a partial (map-side) aggregate, so the hot key arrives at
  * its reducer as ≤ one row per map partition, and the hub's own
  * rank division fans out through the edge join, not a broadcast.
  * Measured numbers live in README ("PageRank at scale").
  *
  * Usage: runMain graft.tools.PageRankScale [nodes=500000] [iters=5]
  */
object PageRankScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(500000L)
    val iters = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(appName = "pagerank-scale")
    val star = spark.range(1, n).select(col("id").as("a"), lit(0L).as("b"))
      .union(spark.range(1, n).select(lit(0L).as("a"), col("id").as("b")))
    val ring = spark.range(0, n).select(col("id").as("a"), ((col("id") + 1) % n).as("b"))
      .union(spark.range(0, n).select(((col("id") + 1) % n).as("a"), col("id").as("b")))
    for ((name, g) <- Seq("star" -> star, "ring" -> ring)) {
      val t0 = System.nanoTime()
      val out = PageRank.fixedPoint(g, iters)
      val cnt = out.count()
      val hub = out.filter(col("node") === 0L).head().getDecimal(1)
      println(f"$name%-5s n=$n%d nodes=$cnt%d hubRank=$hub%s ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
