package graft.tools

import graft.GraftSession
import graft.flight.{FlightExtract, FlightModel}

/** Dev probe behind the FLIGHTBENCH bronze fix: split the 18 s bronze
  * stage into its parts. Findings (3M rows, this box):
  *   - the CSV write layout was innocent (un-coalesced already);
  *   - `Seq.toDF` alone costs ~5–6 s (single-threaded driver encode
  *     of the LocalRelation) and every consuming action pays ~12 s
  *     more shipping the driver-resident rows into tasks;
  *   - `parallelize(raw)` does NOT help (~equal or worse: the driver
  *     java-serializes 3M case classes at task submission instead);
  *   - executor-side extraction (allFlightsDistributed) removes the
  *     driver from the data path entirely.
  *
  * Usage: runMain graft.tools.ProbeBronze [leafRows]
  */
object ProbeBronze {
  def main(args: Array[String]): Unit = {
    val leafRows = args.headOption.map(_.toInt).getOrElse(1465)
    val spark = GraftSession.local(appName = "probe-bronze")
    import spark.implicits._
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"$name%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val source = new FlightScaleBench.SyntheticSource(leafRows)
    val raw = t("extract (driver)") {
      FlightExtract.allFlights(source, limit = 1500)
    }
    println(s"rows=${raw.size}")
    val base = "/tmp/probe_bronze"
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    for (pass <- 1 to 2) {
      println(s"--- pass $pass")
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
      val local = t("toDF.to(schema) plan") {
        raw.toDF().to(FlightModel.flightSilverSchema)
      }
      t("LocalRelation csv write") {
        local.write.mode("overwrite").csv(s"$base/l")
      }
      val dist = t("distributed extract (fetch+cache)") {
        FlightExtract.allFlightsDistributed(spark, source, limit = 1500)
          .toDF().to(FlightModel.flightSilverSchema)
      }
      t("distributed csv write") {
        dist.write.mode("overwrite").csv(s"$base/d")
      }
      graft.CacheScope.drain()
    }
    spark.stop()
  }
}
