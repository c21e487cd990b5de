package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        if (si.taskMetrics.executorRunTime > 2000)
          println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d run=${si.taskMetrics.executorRunTime}ms cpu=${si.taskMetrics.executorCpuTime/1000000}ms recs=${si.taskMetrics.inputMetrics.recordsRead}/${si.taskMetrics.shuffleReadMetrics.recordsRead}")
      }
    })
    val t0 = System.nanoTime()
    SparkEntry.queries("q53_neardup_pipeline")(spark, "/tmp/sfbig")
      .write.format("noop").mode("overwrite").save()
    println(f"TOTAL ${(System.nanoTime()-t0)/1e9}%.1f s")
    spark.stop()
  }
}
