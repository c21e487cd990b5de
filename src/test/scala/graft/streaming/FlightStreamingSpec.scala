package graft.streaming

import graft.TestSpark
import graft.flight.FlightModel.Flight
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class FlightStreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bronzeToSilver stream processes backlog incrementally with checkpointing") {
    val base = Files.createTempDirectory("flight-stream").toString
    val bronze = s"$base/bronze"; val silver = s"$base/silver"; val ckpt = s"$base/ckpt"

    def writeBatch(fs: Seq[Flight]): Unit =
      fs.toDF().write.mode("append").csv(bronze)

    writeBatch(Seq(
      Flight("a", "A359", Some(1713453442), Some(1f), Some(2f), "SIN", "JFK", "SQ24", Some(0), "SIA"),
      Flight("a", "A359", Some(1713453442), Some(1f), Some(2f), "SIN", "JFK", "SQ24", Some(0), "SIA"),
      Flight("b", "B738", Some(1713453442), Some(3f), Some(4f), "OSL", "CDG", "DY1", Some(1), "NOZ")))

    val q1 = FlightStreaming.bronzeToSilver(spark, bronze, silver, ckpt)
    q1.awaitTermination()
    val afterFirst = spark.read.parquet(silver)
    assert(afterFirst.count() == 2) // deduped within the batch
    assert(afterFirst.filter($"id" === "a").select("time").as[String].head() == "2024-04-18 17:17:22")

    // second landing: only the new file is processed (checkpoint)
    writeBatch(Seq(
      Flight("c", "A320", Some(1713453442), Some(5f), Some(6f), "CDG", "OSL", "AF1", Some(0), "AFR")))
    val q2 = FlightStreaming.bronzeToSilver(spark, bronze, silver, ckpt)
    q2.awaitTermination()
    assert(spark.read.parquet(silver).count() == 3)
  }
}
