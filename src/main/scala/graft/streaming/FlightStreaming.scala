package graft.streaming

import graft.flight.{FlightEtl, FlightModel}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Continuous variant of the flight pipeline's bronze→silver hop: the
  * reference simulated streaming with an hourly batch re-run
  * (`/root/reference/src/main.py:156`); this is the genuine
  * incremental form — a file-source stream over the bronze CSV
  * landing area, the same silver transform, parquet sink with
  * checkpointed exactly-once progress.
  *
  * Note on dedup: `dropDuplicates` over an unbounded stream would grow
  * state forever; the silver transform is applied per micro-batch via
  * foreachBatch (dedup within each snapshot — matching the reference,
  * whose dedup scope was also one batch run).
  */
object FlightStreaming {

  /** Start the bronze→silver stream. `availableNow` trigger processes
    * the current backlog and stops (the batch-compatible mode used in
    * tests); pass `continuous = true` for a long-running
    * ProcessingTime trigger.
    */
  def bronzeToSilver(
      spark: SparkSession,
      bronzeDir: String,
      silverDir: String,
      checkpointDir: String,
      continuous: Boolean = false): StreamingQuery = {
    val bronze: DataFrame = spark.readStream
      .schema(FlightModel.flightSilverSchema)
      .csv(bronzeDir)

    val writer = bronze.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        FlightEtl.silver(batch).write.mode("append").parquet(silverDir)
      }
      .option("checkpointLocation", checkpointDir)

    (if (continuous) writer.trigger(Trigger.ProcessingTime("1 hour"))
     else writer.trigger(Trigger.AvailableNow())).start()
  }
}
