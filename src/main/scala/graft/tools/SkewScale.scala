package graft.tools

import graft.GraftSession
import graft.operators.SkewOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adversarial skew probe for the UNSALTED fact⋈fact shuffle shapes
  * (q05 lineitem⋈orders, q80 per-key windows, q87 per-user folds):
  * the salted path is oracle-proven (q33), but these rely on AQE
  * skew-split / partial aggregation, which this probe MEASURES
  * instead of assuming.
  *
  * Corpus: two parquet fact tables written to a scratch dir.
  *   facts  — N rows (fk, ts, v): the "lineitem/events" side. In the
  *            skewed variant 50% of rows land on 1% of the keys
  *            (hot-set form of heavy tail); the extreme variant puts
  *            25% of ALL rows on ONE key (the q87 "one bot user"
  *            nightmare).
  *   keyed  — K rows (fk, w): the "orders" side, unique per key.
  *
  * Workloads, each timed on uniform vs skewed input:
  *   join — facts ⋈ keyed on fk + full aggregate (the q05 shape).
  *          Sort-merge under skew is exactly what AQE's
  *          OptimizeSkewedJoin splits; broadcast (the default here,
  *          keyed fits) is skew-immune — both are reported, the SMJ
  *          run with broadcast disabled.
  *   agg  — groupBy(fk) count/sum/min (the q87 funnel fold shape).
  *          Partial aggregation pre-collapses the hot key map-side,
  *          so skew should cost ~nothing.
  *   wind — row_number over (fk order by ts) + filter rn<=3 (the q80
  *          window shape). A hot key IS one task here — the measured
  *          cliff — with [[SkewOps.saltedJoin]] / two-phase forms as
  *          the escape (WindowGroupLimit keeps the per-task work
  *          top-k-sized for rank filters, which is why q07/q56/q96
  *          survive; an unfiltered window would not).
  *
  * Usage: runMain graft.tools.SkewScale [rows=20000000] [keys=1000000] [dir=/tmp/skewprobe]
  */
object SkewScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(20000000L)
    val k = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val dir = args.lift(2).getOrElse("/tmp/skewprobe")
    val spark = GraftSession.local(appName = "skew-scale")
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // AQE skew-split thresholds scaled to probe size (defaults target
    // 256 MB partitions; this corpus's hot partition is ~100 MB)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")

    val hotKeys = math.max(k / 100, 1L) // 1% of the key domain
    def facts(mode: String): DataFrame = {
      val base = spark.range(n)
      val fk = mode match {
        case "uniform" => pmod(xxhash64(col("id")), lit(k))
        // half the rows collapse onto the hot 1% of keys
        case "hotset" => when(col("id") % 2 === 0,
            pmod(xxhash64(col("id")), lit(hotKeys)))
          .otherwise(pmod(xxhash64(col("id")), lit(k)))
        // a quarter of ALL rows on one key — the single bot user
        case "onekey" => when(col("id") % 4 === 0, lit(7L))
          .otherwise(pmod(xxhash64(col("id")), lit(k)))
      }
      base.select(fk.as("fk"), (col("id") % 86400).as("ts"),
        (col("id") % 1000).cast("double").as("v"))
    }
    val keyed = spark.range(k).select(col("id").as("fk"),
      (col("id") % 97).cast("double").as("w"))

    Seq("uniform", "hotset", "onekey").foreach { m =>
      facts(m).write.mode("overwrite").parquet(s"$dir/facts_$m")
    }
    keyed.write.mode("overwrite").parquet(s"$dir/keyed")
    val kd = spark.read.parquet(s"$dir/keyed")

    def time(label: String)(body: => Unit): Double = {
      spark.catalog.clearCache(); System.gc()
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%7.1f s")
      dt
    }

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    Seq("uniform", "hotset", "onekey").foreach { m =>
      val f = spark.read.parquet(s"$dir/facts_$m")
      // q05 shape, sort-merge forced (broadcast off) so AQE's
      // skew-split is what's under test
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      time(s"join-smj[$m]") {
        noop(f.join(kd, "fk").groupBy().agg(sum(col("v") * col("w")), count(lit(1))))
      }
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      // same join, broadcast allowed (the engine's actual q05 plan)
      time(s"join-bcast[$m]") {
        noop(f.join(broadcast(kd), "fk").groupBy().agg(sum(col("v") * col("w")), count(lit(1))))
      }
      // q87 shape: partial agg should flatten the hot key
      time(s"agg[$m]") {
        noop(f.groupBy("fk").agg(count(lit(1)), sum("v"), min("ts"), max("ts")))
      }
      // q80 shape: per-key window; rank filter → WindowGroupLimit
      time(s"window-top3[$m]") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("fk")).orderBy(col("ts"), col("v"))
        noop(f.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3))
      }
      // q80's ACTUAL shape — unfiltered lag() over the key, where a
      // hot key is irreducibly one task (no WindowGroupLimit rescue):
      // the measured cliff the two-phase/salted forms exist for
      time(s"window-lag[$m]") {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("fk")).orderBy(col("ts"), col("v"))
        noop(f.withColumn("prev", lag("v", 1).over(w)))
      }
      // the salted escape on the worst corpus, for comparison
      if (m == "onekey") {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        time(s"join-salted[$m]") {
          noop(SkewOps.saltedJoin(f, kd, "fk", "ts", 32)
            .groupBy().agg(sum(col("v") * col("w")), count(lit(1))))
        }
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
    spark.stop()
  }
}
