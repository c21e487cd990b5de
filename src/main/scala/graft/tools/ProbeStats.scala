package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Prints the optimizer size estimates the size-conditional persists key on. */
object ProbeStats {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    for (dir <- a) {
      val ev = graft.Tables(s, dir).events
      val du125 = ev.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val du111 = ev.filter(col("user_id").isNotNull).select(
        date_format(date_trunc("day", col("ts")), "yyyy-MM-dd").as("day"),
        col("user_id")).distinct()
      println(s"$dir q125-du=" + du125.queryExecution.optimizedPlan.stats.sizeInBytes
        + " q111-du=" + du111.queryExecution.optimizedPlan.stats.sizeInBytes)
    }
    s.stop()
  }
}
