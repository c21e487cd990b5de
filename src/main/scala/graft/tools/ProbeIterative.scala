package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: where does the iterative floor (q91/q101) actually go?
  * Prints per-phase wall for the components run — rounds executed,
  * seed time, loop time — so round-fusion/convergence experiments are
  * judged on measurement, not plan aesthetics.
  *
  * Usage: runMain graft.tools.ProbeIterative [sfDir]
  */
object ProbeIterative {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val stageMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        for (t0 <- s.stageInfo.submissionTime; t1 <- s.stageInfo.completionTime)
          stageMs.addAndGet(t1 - t0)
      }
    })

    def timed[A](label: String)(f: => A): A = {
      jobs.set(0); stages.set(0); stageMs.set(0)
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener drain
      println(f"$label%-28s $wall%.2f s  jobs=${jobs.get} stages=${stages.get} stageTime=${stageMs.get / 1e3}%.2f s")
      r
    }

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val edges = graft.Tables(spark, sfDir).orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("o_orderkey").as("a"), col("nxt").as("b"))

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep")
      val (labels, rounds) = timed("runAlternating total") {
        val r = graft.operators.ConnectedComponents.runAlternatingWithRounds(edges)
        r._1.write.format("noop").mode("overwrite").save(); r
      }
      println(s"rounds: $rounds")
      val sym = edges.select(explode(array(
        struct(col("a"), col("b")),
        struct(col("b").as("a"), col("a").as("b")))).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"))
      timed("pagerank 5 iters total") {
        graft.operators.PageRank.fixedPoint(sym, 5)
          .write.format("noop").mode("overwrite").save()
        graft.CacheScope.drain()
      }
    }
    spark.stop()
  }
}
