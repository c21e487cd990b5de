package graft.tools

import org.apache.spark.sql.SparkSession

import graft.plans.ScanLedger

/** Dev utility: sweep every registered query, EXECUTE it (noop write),
  * and report the job-level [[graft.plans.ScanLedger]] scan counts —
  * build-time actions included — next to the plan-census budget. This
  * is the sweep that sized the build-action budgets in
  * [[graft.ScanBudgets.buildActionScans]]; PlanQualitySpec enforces
  * them suite-wide.
  *
  * Usage: runMain graft.tools.LedgerAudit [sfDir] [onlyOverBudget=true]
  */
object LedgerAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val onlyOver = args.lift(1).forall(_.toBoolean)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.defs.sortBy(_.name).foreach { d =>
      try {
        spark.catalog.clearCache()
        val (_, counts) = ScanLedger.measure(spark) {
          d.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        }
        val over = counts.filter { case (t, c) => c > d.ledgerBudget(t) }
        if (over.nonEmpty || !onlyOver) {
          val mark = if (over.nonEmpty) "OVER-BUDGET" else ""
          println(f"${d.name}%-28s ${counts.toSeq.sorted
            .map { case (t, c) => s"$t x$c(≤${d.ledgerBudget(t)})" }
            .mkString(", ")} $mark")
        }
      } catch {
        case e: Throwable =>
          println(f"${d.name}%-28s RUN-ERROR ${String.valueOf(e.getMessage).take(80)}")
      } finally graft.CacheScope.drain()
    }
    spark.stop()
  }
}
