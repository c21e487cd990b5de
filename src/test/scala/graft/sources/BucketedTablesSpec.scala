package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bucketing contract is a *plan property*: a join of two tables
  * bucketed+sorted on the key must contain no Exchange (shuffle) and
  * no Sort on either input — that is what makes the layout pay off at
  * fact-scale. Checked against the executed plan, not just results.
  */
class BucketedTablesSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("bucketed equi-join has no Exchange and no Sort; results match plain join") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val customer = spark.read.parquet(s"$dir/customer.parquet")
      .withColumnRenamed("c_custkey", "o_custkey")
    // at fixture scale the planner would broadcast the small side and
    // skip bucketing entirely; disable broadcast to get the fact×fact
    // shape this layout exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // trusting the per-bucket sort order needs this opt-in (off by
    // default since SPARK-28632 because multi-file buckets are only
    // sorted per file; writeBucketed guarantees one file per bucket)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    try {
      BucketedTables.writeBucketed(orders, "b_orders", "o_custkey", 8)
      BucketedTables.writeBucketed(customer, "b_customer", "o_custkey", 8)

      val joined = BucketedTables.coLocatedJoin(spark, "b_orders", "b_customer", "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString

      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(!plan.contains("Sort "), s"expected sort-free plan (sorted buckets):\n$plan")

      val expected = orders.join(customer, Seq("o_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("aggregation on the bucket key needs no exchange before the agg") {
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    try {
      BucketedTables.writeBucketed(orders, "b_orders_agg", "o_custkey", 8)
      val agg = spark.table("b_orders_agg")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free agg:\n$plan")
      assert(agg.count() == orders.select("o_custkey").distinct().count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders_agg")
    }
  }
}
