package graft.tools

import graft.GraftSession
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

/** Dev probe: where does q67's 100× floor go — candidate generation
  * (the ±1-bucket equi-join), the exact-gap filter, or the final
  * global sort? Prints candidate/true-pair counts and stage walls so
  * the bucket-width question is answered from measurement.
  *
  * Usage: runMain graft.tools.ProbeQ67 [sfDir]
  */
object ProbeQ67 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "probe-q67")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val e = graft.Tables(spark, dir).events
      .select(col("event_id"), col("user_id"), col("ts"))
    println(s"events=${e.count()}  users=${e.select("user_id").distinct().count()}")
    val a = e.select(col("event_id").as("event_a"), col("user_id"), col("ts").as("ts_a"))
    val b = e.select(col("event_id").as("event_b"), col("user_id"), col("ts").as("ts_b"))
    // width sweep: candidates (pre-filter) + join wall per width
    val gap = 900000000L
    for (width <- Seq(gap / 4, gap / 2, gap, 2 * gap)) {
      val joined = RangeJoin.withinGap(a, b, Seq("user_id"), "ts_a", "ts_b",
        gapMicros = gap, bucketMicros = width)
      val candidates = t(s"candidates w=${width / 1000000}s") {
        // count pre-exact-filter candidate volume: same join, no gap
        // filter (re-derive the bucketed join without the filter)
        val lb = floor(unix_micros(col("ts_a")) / width)
        val rb = floor(unix_micros(col("ts_b")) / width)
        val k = ((gap + width - 1) / width).toInt
        a.withColumn("__bucket", lb)
          .join(b.withColumn("__bucket", explode(sequence(rb - k, rb + k))),
            Seq("user_id", "__bucket"))
          .count()
      }
      val truePairs = t(s"join+filter  w=${width / 1000000}s") {
        joined.filter(col("event_a") < col("event_b")).count()
      }
      println(s"width=${width / 1000000}s candidates=$candidates true=$truePairs")
    }
    t("full query (sort+noop), w=gap") {
      val joined = RangeJoin.withinGap(a, b, Seq("user_id"), "ts_a", "ts_b",
        gapMicros = gap)
      joined.filter(col("event_a") < col("event_b"))
        .select(col("event_a"), col("event_b"),
          abs(unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("gap_us"))
        .orderBy(col("event_a"), col("event_b"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
