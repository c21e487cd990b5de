package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format breadth: the engine round-trips parquet, ORC,
  * JSON-lines, and CSV with schema preservation (parquet/ORC) or
  * schema-on-read (JSON/CSV, supplied not inferred — the S3 lesson
  * from the reference, whose headerless re-reads silently stringified
  * every column).
  */
class FormatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val src = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft_fmt_$name").resolve("data").toString

  private def sortedCollect(df: org.apache.spark.sql.DataFrame) =
    df.select(src.columns.map(col).toSeq: _*).orderBy(col("o_orderkey")).collect().toSeq

  test("parquet round-trip preserves schema and rows") {
    val p = tmp("parquet")
    src.write.parquet(p)
    val back = spark.read.parquet(p)
    assert(back.schema == src.schema)
    assert(sortedCollect(back) == sortedCollect(src))
  }

  test("orc round-trip preserves schema and rows") {
    val p = tmp("orc")
    src.write.orc(p)
    val back = spark.read.orc(p)
    assert(back.schema == src.schema)
    assert(sortedCollect(back) == sortedCollect(src))
  }

  test("json-lines round-trip with supplied schema preserves rows") {
    val p = tmp("json")
    src.write.json(p)
    val back = spark.read.schema(src.schema).json(p)
    assert(back.schema == src.schema)
    assert(sortedCollect(back) == sortedCollect(src))
  }

  test("csv round-trip with supplied schema preserves rows (never inferSchema)") {
    val p = tmp("csv")
    src.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX").csv(p)
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .schema(src.schema).csv(p)
    assert(back.schema == src.schema)
    assert(sortedCollect(back) == sortedCollect(src))
  }
}
