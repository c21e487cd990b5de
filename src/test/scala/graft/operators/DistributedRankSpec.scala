package graft.operators

import graft.TestSpark
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DistributedRankSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("rowNumber equals the plain window rank exactly (total order)") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    val plain = li.withColumn("rn", row_number().over(w).cast("long"))
    val dist = DistributedRank.rowNumber(li,
      Seq("l_returnflag"),
      Seq("l_extendedprice", "l_orderkey", "l_linenumber"), "rn",
      numPartitions = 7) // deliberately odd so groups straddle partitions
    assert(dist.count() == li.count())
    assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0)
  }
}
