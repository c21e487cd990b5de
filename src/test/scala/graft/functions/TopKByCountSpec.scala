package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKByCountSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("typed top-k aggregator matches groupBy-count top-k on real corpus tokens") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tokens = docs.select(explode(split(col("text"), " ")).as("t")).as[String]

    val viaAggregator = tokens.select(new TopKByCount(10).toColumn).head()

    val viaGroupBy = tokens.groupBy("t").count()
      .orderBy(col("count").desc, col("t"))
      .limit(10)
      .as[(String, Long)].collect().toSeq

    assert(viaAggregator == viaGroupBy)
  }

  test("aggregator is partitioning-invariant") {
    val data = (1 to 500).map(i => s"tok${i % 7}")
    val a = data.toDS().select(new TopKByCount(3).toColumn).head()
    val b = data.toDS().repartition(13).select(new TopKByCount(3).toColumn).head()
    assert(a == b)
  }
}
