package graft.tools

import graft.GraftSession
import graft.operators.DistributedRank
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale probe for the DistributedRank kernel family vs the plain
  * window forms they replace (the ComponentsScale discipline: measure
  * the cliff, don't assert it). Three shapes on an n-row synthetic
  * frame with 3 hot groups (the q84/q95/q118 cardinality):
  *
  *   1. global running sum — plain `SUM OVER (ORDER BY ...)` is ONE
  *      task by construction vs [[DistributedRank.runningSum]];
  *   2. grouped row_number — 3 single-task sorts vs
  *      [[DistributedRank.rowNumber]];
  *   3. median rows only — full rank vs
  *      [[DistributedRank.valuesAtRanks]] (the ≤2-rows-per-group
  *      extraction, the quantile shape).
  *
  * Data is arithmetic from `spark.range` (no RNG): ord scrambles by a
  * Knuth-multiplicative constant so range partitioning actually moves
  * rows; v cycles mod 1000. Measured numbers live in README
  * ("Rank kernels at scale").
  *
  * Usage: runMain graft.tools.RankKernelScale [rows=20000000]
  */
object RankKernelScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val spark = GraftSession.local(appName = "rank-kernel-scale")
    import spark.implicits._
    val df = spark.range(0, n).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 2654435761L) % n).as("ord"),
      col("id").as("id2"),
      (col("id") % 1000).as("v"))
      .persist()
    df.count()

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val out = body
      println(f"$name%-28s n=$n%d out=$out%d ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.catalog.clearCache()
      df.persist(); df.count(): Unit
    }

    time("runningSum/window-1task") {
      val w = Window.orderBy(col("ord"), col("id2"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("cum", sum(col("v")).over(w))
        .agg(max(col("cum"))).as[Long].head()
    }
    time("runningSum/distributed") {
      DistributedRank.runningSum(df, Nil, Seq("ord", "id2"), "v", "cum")
        .agg(max(col("cum"))).as[Long].head()
    }
    time("rowNumber/window-3task") {
      val w = Window.partitionBy(col("g")).orderBy(col("ord"), col("id2"))
      df.withColumn("rn", row_number().over(w))
        .agg(max(col("rn")).cast("long")).as[Long].head()
    }
    time("rowNumber/distributed") {
      DistributedRank.rowNumber(df, Seq("g"), Seq("ord", "id2"))
        .agg(max(col("rn"))).as[Long].head()
    }
    time("median/full-rank") {
      val w = Window.partitionBy(col("g")).orderBy(col("ord"), col("id2"))
      val nPer = df.groupBy(col("g")).agg(count(lit(1)).as("n"))
      df.withColumn("rn", row_number().over(w).cast("long"))
        .join(broadcast(nPer), "g")
        .filter(col("rn") * 2 === col("n") || col("rn") * 2 === col("n") + 1)
        .count()
    }
    time("median/valuesAtRanks") {
      DistributedRank.valuesAtRanks(df, Seq("g"), Seq("ord", "id2"),
        m => Seq(m / 2, (m + 1) / 2).distinct).count()
    }
    // the q46/q115 shape: a single GLOBAL total order (the worst
    // window case — ONE task sorts everything). This pair sizes
    // [[DistributedRank.WindowRankMaxRows]]: sweep n to find where
    // the lines cross.
    time("rowNumber/window-global") {
      val w = Window.orderBy(col("ord"), col("id2"))
      df.withColumn("rn", row_number().over(w))
        .agg(max(col("rn")).cast("long")).as[Long].head()
    }
    time("rowNumber/dist-global") {
      DistributedRank.rowNumber(df, Nil, Seq("ord", "id2"))
        .agg(max(col("rn"))).as[Long].head()
    }
    spark.stop()
  }
}
