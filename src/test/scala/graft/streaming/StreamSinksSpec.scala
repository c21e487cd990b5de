package graft.streaming

import graft.TestSpark
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class StreamSinksSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("epoch sink: batches land in epoch dirs; replaying an epoch is idempotent") {
    implicit val sqlCtx = spark.sqlContext
    val base = Files.createTempDirectory("sink").toString
    val out = s"$base/out"
    val mem = MemoryStream[Long]
    val q = StreamSinks.startEpochSink(
      mem.toDS().toDF("v"), out, s"$base/ckpt")
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      mem.addData(4L, 5L)
      q.processAllAvailable()

      val table = spark.read.parquet(out)
      assert(table.count() == 5)
      assert(table.select(sum("v")).head().getLong(0) == 15L)

      // at-least-once replay: re-running batch 1's body with the same
      // epochId must leave the table unchanged (overwrite, not append).
      // Materialize the replayed rows first — a lazy self-read would
      // race the overwrite of its own input files.
      val batch1Rows = spark.read.parquet(s"$out/batch=1")
        .as[Long].collect().toSeq
      StreamSinks.writeEpoch(out)(batch1Rows.toDF("v"), 1L)
      val after = spark.read.parquet(out)
      assert(after.count() == 5, "epoch replay duplicated rows")
      assert(after.select(sum("v")).head().getLong(0) == 15L)
    } finally q.stop()
  }
}
