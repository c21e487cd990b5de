package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: sweep every registered query's initial physical plan
  * and report per-table FileScan counts alongside cache reads and
  * reused exchanges — the q128 defect class (N consumers of one
  * derived frame whose differing pushed filters defeat exchange
  * canonicalization, silently multiplying scans of the same table).
  * A table scanned >1× with zero InMemoryTableScan/ReusedExchange in
  * the same plan is worth reading by hand; some are legitimate
  * (different column subsets, or a second scan that is genuinely
  * cheaper than caching).
  *
  * Usage: runMain graft.tools.ScanAudit [sfDir] [minScans=2]
  */
object ScanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minScans = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val table = "([a-z_]+)\\.parquet".r
    graft.SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      try {
        val p = graft.SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString
        val scans = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
        val byTable = scans.flatMap(l => table.findFirstMatchIn(l).map(_.group(1)))
          .groupBy(identity).view.mapValues(_.size).toMap
        val cacheReads = p.linesIterator.count(_.contains("InMemoryTableScan"))
        val reused = p.linesIterator.count(_.contains("ReusedExchange"))
        val hot = byTable.filter(_._2 >= minScans)
        if (hot.nonEmpty)
          println(f"$name%-28s ${hot.map { case (t, c) => s"$t x$c" }.mkString(", ")}%-28s cacheReads=$cacheReads reusedEx=$reused")
      } catch {
        case e: Throwable => println(f"$name%-28s BUILD-ERROR ${String.valueOf(e.getMessage).take(80)}")
      } finally graft.CacheScope.drain()
    }
    spark.stop()
  }
}
