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

  test("rowNumber == plain window on random data incl. empty groups, skew, and no groupCols") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      // skewed: 80% of rows in one group; values with deliberate ties
      val rows = Seq.tabulate(500 + rng.nextInt(500)) { i =>
        val g = if (rng.nextInt(5) > 0) "hot" else s"g${rng.nextInt(4)}"
        (g, rng.nextInt(20).toLong, i.toLong) // (group, value-with-ties, unique id)
      }
      val df = rows.toDF("g", "v", "id")
      val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
      val plain = df.withColumn("rn", row_number().over(w).cast("long"))
      val dist = DistributedRank.rowNumber(df, Seq("g"), Seq("v", "id"), "rn",
        numPartitions = 3 + trial)
      assert(plain.exceptAll(dist).count() == 0 && dist.exceptAll(plain).count() == 0,
        s"trial $trial mismatch")
      // groupless global rank
      val plainG = df.withColumn("rn",
        row_number().over(Window.orderBy(col("v"), col("id"))).cast("long"))
      val distG = DistributedRank.rowNumber(df, Seq.empty, Seq("v", "id"), "rn",
        numPartitions = 5)
      assert(plainG.exceptAll(distG).count() == 0 && distG.exceptAll(plainG).count() == 0,
        s"trial $trial groupless mismatch")
    }
  }
}
