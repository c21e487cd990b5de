package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's defaults: AQE on, shuffle
  * parallelism sized to cores (not the 200 default), UTC session
  * timezone (the oracle-parity convention), custom SQL functions
  * registered. On a real cluster, drop `.master` and submit normally —
  * everything else carries over.
  */
object GraftSession {

  def local(cores: Int = Runtime.getRuntime.availableProcessors(), appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // builder-time extensions don't apply if a session already existed
    GraftExtensions.register(spark)
    spark
  }
}
