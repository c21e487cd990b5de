package graft.tools

import org.apache.spark.sql.SparkSession

/** r15 verdict item 6: split an sf0.1 bench slot into its phases for
  * the ~20 queries that pay 1–3 s where DuckDB pays <0.5 — is the gap
  * driver-side plan work (build + analyze/optimize/plan + codegen,
  * all constant per query) or distributed execution?
  *
  *   build_sec  — QueryDef.build(): DataFrame construction, including
  *                resolve-time IO (parquet schema reads, catalog
  *                lookups, any driver pre-actions a query runs)
  *   plan_sec   — queryExecution.executedPlan: analysis, optimization,
  *                physical planning (AQE wrapper construction)
  *   exec_sec   — the noop write: whole-stage codegen compile + all
  *                jobs
  *
  * Each query runs `reps` times in one JVM with the Bench hygiene
  * (clearCache + GC between reps), so rep 1 carries the cold
  * constants and later reps show the floor a warm server would pay.
  *
  * Usage: runMain graft.tools.ProbeSlotSplit <sfDir> <query> [query...]
  * env: GRAFT_PROBE_REPS (default 3)
  */
object ProbeSlotSplit {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbeSlotSplit <sfDir> <query>...")
    val sfDir = args(0)
    val queries = args.drop(1).toSeq
    val reps = sys.env.getOrElse("GRAFT_PROBE_REPS", "3").toInt
    val spark = graft.BenchKernel.buildSession()
    val defs = graft.SparkEntry.defs.map(d => d.name -> d).toMap
    queries.foreach { name =>
      val d = defs.getOrElse(name, sys.error(s"unknown query $name"))
      (1 to reps).foreach { rep =>
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val df = d.build(spark, sfDir)
        val t1 = System.nanoTime()
        val _ = df.queryExecution.executedPlan
        val t2 = System.nanoTime()
        try df.write.format("noop").mode("overwrite").save()
        finally graft.CacheScope.drain()
        val t3 = System.nanoTime()
        def s(a: Long, b: Long): String = f"${(b - a) / 1e9}%.3f"
        println(s"""{"q":"$name","rep":$rep,"build_sec":${s(t0, t1)},""" +
          s""""plan_sec":${s(t1, t2)},"exec_sec":${s(t2, t3)},""" +
          s""""total_sec":${s(t0, t3)}}""")
      }
    }
    spark.stop()
  }
}
