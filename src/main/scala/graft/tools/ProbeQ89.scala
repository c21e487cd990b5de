package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r15 verdict item 5: attribute q89's 100× cost (calm floor ~3.5 s vs
  * DuckDB 0.13). The suspicion to test: is the time in the count-table
  * build (one map-side-combined fact scan, shared shape with q41/q84)
  * or in the GkQuantileWeighted merge over the collected table?
  *
  * Context that frames the numbers: the DuckDB 0.13 s "baseline" times
  * q89's ORACLE — `SELECT l_returnflag, COUNT(*) ... GROUP BY` — which
  * is the self-judging gate's trivially-cheap SQL mirror, not the
  * sketch work itself (a GK/percentile_approx has no hash-stable SQL
  * form, so the oracle checks rank bounds the engine recomputes). The
  * honest apples-to-apples DuckDB companion for the WORK is
  * `percentile_cont/approx` over the same column, timed here too by
  * tools/duck_q89_companion.sql if wanted; this probe splits the
  * ENGINE side so the gap is attributed before it's adjudicated.
  *
  * Usage: runMain graft.tools.ProbeQ89 <sfDir> [reps]
  * Prints one JSON line per rep: count-table build+collect seconds,
  * weighted-sketch seconds, driver fold seconds, total.
  */
object ProbeQ89 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.BucketedWarehouse.configureFromEnv(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = 1000
    val ps = Seq(0.25, 0.50, 0.75, 0.95)
    (1 to reps).foreach { rep =>
      spark.catalog.clearCache()
      System.gc()
      val li = graft.Tables(spark, sfDir).lineitem
        .select(col("l_returnflag"), col("l_extendedprice"))
      val t0 = System.nanoTime()
      val vc = graft.CacheScope.scoped(
        li.groupBy(col("l_returnflag"), col("l_extendedprice"))
          .agg(count(lit(1)).as("__cnt")))
      val probe = vc.collect()
      val t1 = System.nanoTime()
      import spark.implicits._
      val skRows = vc.filter(col("l_extendedprice").isNotNull)
        .as[(String, Double, Long)]
        .groupByKey(_._1).mapValues(r => (r._2, r._3))
        .agg(new graft.functions.GkQuantileWeighted(ps, acc)
          .toColumn.name("ap"))
        .collect()
        .map { case (rf, ap) => rf -> ap }.toMap
      val t2 = System.nanoTime()
      // the driver fold q89 runs over the collected table
      val folds = probe.groupBy(_.getString(0)).map { case (rf, rows) =>
        val ap = skRows.get(rf).orNull
        val lt = new Array[Long](ps.size)
        val le = new Array[Long](ps.size)
        if (ap != null) rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val v = r.getDouble(1); val c = r.getLong(2)
            var i = 0
            while (i < ps.size) {
              if (v < ap(i)) lt(i) += c
              if (v <= ap(i)) le(i) += c
              i += 1
            }
          }
        }
        (rf, lt.sum + le.sum)
      }
      val t3 = System.nanoTime()
      graft.CacheScope.drain()
      def s(a: Long, b: Long): String = f"${(b - a) / 1e9}%.3f"
      println(s"""{"rep":$rep,"rows":${probe.length},"folds":${folds.size},""" +
        s""""count_table_sec":${s(t0, t1)},"sketch_sec":${s(t1, t2)},""" +
        s""""fold_sec":${s(t2, t3)},"total_sec":${s(t0, t3)}}""")
    }
    spark.stop()
  }
}
