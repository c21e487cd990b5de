package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-level timing of q91's adaptive path at sf0.1 —
  * where does the wall go after the r11 driver-union-find tier
  * (edges materialization vs collect+union-find vs label emit+sort)?
  */
object ProbeQ91 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "probe-q91")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    // warm up session/codegen like Bench does
    spark.read.parquet(s"$dir/orders.parquet").count()

    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      spark.catalog.clearCache(); System.gc()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val edges = t("build edges plan") {
        graft.Tables(spark, dir).orders
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
          .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("o_orderkey").as("a"), col("nxt").as("b"))
      }
      println(s"statsBytes=${edges.queryExecution.optimizedPlan.stats.sizeInBytes}")
      val (raw, cnt) = t("materialize (checkpoint)") {
        val obs = org.apache.spark.sql.Observation()
        val r = edges.observe(obs, count(lit(1)).as("n")).localCheckpoint()
        (r, obs.get("n").asInstanceOf[Long])
      }
      println(s"edges=$cnt")
      val labels = t("driverUnionFind") {
        graft.operators.ConnectedComponents.driverUnionFind(raw, cnt)
      }
      t("emit+orderBy+noop") {
        labels.select(col("node"), col("label").as("component"))
          .orderBy(col("node"))
          .write.format("noop").mode("overwrite").save()
      }
      graft.CacheScope.drain()
    }
    spark.stop()
  }
}
