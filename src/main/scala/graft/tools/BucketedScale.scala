package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Dev probe: do the 100× relational heads' exchanges pay for a
  * bucketed layout? (r11 verdict item 4 — `sources/BucketedTables`
  * is plan-pinned at fixture scale but was never driven at 100×.)
  *
  * Writes bucketed+sorted copies of the join tables once
  * (lineitem/orders by orderkey, customer/orders by custkey,
  * lineitem/part by partkey — a real deployment keeps one key per
  * table and materializes a second projection for the second key,
  * exactly what this layout models), then runs q05 and q07 with the
  * IDENTICAL DataFrame shape over (a) plain parquet and (b) the
  * bucketed tables, asserting byte-identical collected results and
  * printing min-of-2 walls plus the Exchange count of each executed
  * plan.
  *
  * Usage: runMain graft.tools.BucketedScale [sfDir] [--rewrite]
  */
object BucketedScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf100")
    val rewrite = args.contains("--rewrite")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", "/tmp/graft_bucketed_wh")
      .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.BucketedTables

    def haveTable(t: String): Boolean = spark.catalog.tableExists(t)
    def writeIfAbsent(t: String, df: => DataFrame, key: String, buckets: Int): Unit =
      if (rewrite || !haveTable(t)) {
        val t0 = System.nanoTime()
        BucketedTables.writeBucketed(df, t, key, buckets)
        println(f"wrote $t%-16s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
      } else println(s"reusing $t")

    val T = graft.Tables(spark, sfDir)
    // 64 buckets ≈ 1M rows/bucket on the 100× lineitem — one task's
    // worth; dims get the same count (co-bucketing requirement)
    writeIfAbsent("bk_lineitem_ok", T.lineitem, "l_orderkey", 64)
    writeIfAbsent("bk_orders_ok", T.orders, "o_orderkey", 64)
    writeIfAbsent("bk_orders_ck", T.orders, "o_custkey", 64)
    writeIfAbsent("bk_customer_ck", T.customer, "c_custkey", 64)
    writeIfAbsent("bk_lineitem_pk", T.lineitem, "l_partkey", 64)
    writeIfAbsent("bk_part_pk", T.part, "p_partkey", 64)

    def ts(d: String) = to_timestamp(lit(d + " 00:00:00"))
    def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
    def rate(c: org.apache.spark.sql.Column) = c.cast(DecimalType(4, 2))
    def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

    // q05 shape, parameterized by table source: customer⋈orders on
    // custkey, ⋈lineitem on orderkey — the two exchanges the custkey/
    // orderkey bucketings remove (nation/region broadcast either way)
    def q05(cust: DataFrame, ord: DataFrame, li: DataFrame): DataFrame =
      cust
        .join(ord.filter(col("o_orderdate") >= ts("1996-01-01") &&
          col("o_orderdate") < ts("1998-01-01")), col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(T.supplier), col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(T.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(T.region.filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(dbl(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))

    // q07 shape: lineitem⋈part on partkey, groupBy (brand, partkey) —
    // the partkey bucketing removes both the join exchanges AND the
    // aggregation exchange (HashPartitioning(partkey) satisfies
    // ClusteredDistribution(brand, partkey))
    def q07(li: DataFrame, part: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val pr = li.join(part, col("p_partkey") === col("l_partkey"))
        .groupBy(col("p_brand"), col("p_partkey"))
        .agg(dbl(sum(dec2(col("l_extendedprice")) * (lit(1) - rate(col("l_discount"))))).as("revenue"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("revenue").desc, col("p_partkey"))
      pr.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .orderBy(col("p_brand"), col("rnk"))
    }

    def run(label: String, df: => DataFrame): (Double, Seq[String]) = {
      val exchanges = df.queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("Exchange")).size
      var best = Double.MaxValue
      var rows: Seq[String] = Nil
      for (_ <- 1 to 2) {
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        rows = df.collect().map(_.toString).toSeq
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-22s $best%6.2f s  exchanges=$exchanges rows=${rows.size}")
      (best, rows)
    }

    val (_, p05) = run("q05 plain", q05(T.customer, T.orders, T.lineitem))
    val (_, b05) = run("q05 bucketed", q05(
      spark.table("bk_customer_ck"), spark.table("bk_orders_ck"),
      spark.table("bk_lineitem_ok")))
    assert(p05 == b05, "q05 bucketed results diverge from plain")

    val (_, p07) = run("q07 plain", q07(T.lineitem, T.part))
    val (_, b07) = run("q07 bucketed",
      q07(spark.table("bk_lineitem_pk"), spark.table("bk_part_pk")))
    assert(p07 == b07, "q07 bucketed results diverge from plain")

    println("results identical: q05 " + (p05 == b05) + ", q07 " + (p07 == b07))
    spark.stop()
  }
}
