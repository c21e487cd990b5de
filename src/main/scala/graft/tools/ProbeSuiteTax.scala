package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

import graft.{CacheScope, SparkEntry, Tables}

/** Suite-state-tax reproduction harness (r10 task 1). The r9 100×
  * artifact recorded q107 at 554.9 s in-suite vs 99.6 s isolated, and
  * for three rounds the gap was labeled "accumulated JVM state"
  * without a mechanism. The bench order holds the prime suspect:
  * q107 runs IMMEDIATELY after q106, and in the r9 run q106 — the
  * uncapped full-corpus ADC, |Q|×n by definition — didn't just run
  * slow, it FAILED, aborting mid-shuffle over a ~3.2e9-row aggregate.
  *
  * This tool reproduces that exact neighborhood under [[JvmProbe]]
  * snapshots: optionally run a stage-1 workload (the r9-shaped
  * uncapped q106, preserved verbatim below; or today's
  * stratum-scoped q106; or nothing), apply the same between-query
  * hygiene Bench applies (drain, clearCache, System.gc), then time
  * q107 and snapshot before/after. Comparing the three modes
  * separates q107's own plan cost from whatever stage 1 left behind
  * — and the snapshots name the counter that grew (scratch-dir
  * bytes, heap, GC time, live blocks).
  *
  * Usage: env SPARK_GRAFT_SF_DIR (corpus), SPARK_GRAFT_TAX_MODE =
  * old106 | new106 | none (default old106);
  * `GRAFT_MAIN=graft.tools.ProbeSuiteTax tools/run_bench.sh /tmp/sf100`.
  */
object ProbeSuiteTax {

  /** The r9 q106 engine shape (commit 7dc6323), BEFORE the r10
    * certification-stratum re-scope: ADC over the whole replica
    * corpus. Kept here verbatim as the reproduction workload — at
    * 100× it builds a |Q|×n candidate aggregate (~400M groups from
    * 3.2e9 joined rows) whose shuffle writes exceed the box's free
    * disk; the r9 suite recorded it as its only failure.
    */
  private def oldQ106(s: SparkSession, dir: String) = {
    val e = Tables(s, dir).embeddings
    val codebook = e.filter(col("vec_id") < 16)
    def subs(df: org.apache.spark.sql.DataFrame, outId: String, nsq: String) =
      df.select(col("vec_id").as(outId), col("embedding"))
        .withColumn("m", explode(sequence(lit(0), lit(7))))
        .select(col(outId), col("m"),
          slice(col("embedding"), col("m") * 8 + 1, lit(8)).as(s"sub_$outId"))
        .withColumn(nsq, graft.functions.Float32Dot(col(s"sub_$outId"), col(s"sub_$outId")))
    val ev = subs(e, "vec_id", "ensq")
    val cs = subs(codebook, "cid", "cnsq")
    val d = CacheScope.scoped(ev.join(broadcast(cs), "m")
      .withColumn("dist",
        (col("ensq") + col("cnsq")
          - lit(2.0d) * graft.functions.Float32Dot(col("sub_vec_id"), col("sub_cid")))
          .cast(FloatType))
      .select(col("vec_id"), col("m"), col("cid"), col("dist")))
    val w0 = Window.partitionBy(col("vec_id"), col("m"))
      .orderBy(col("dist"), col("cid"))
    val codes = d.withColumn("rn", row_number().over(w0))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("m"), col("cid").as("code"))
    val qd = d.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("qid"), col("m").as("qm"),
        col("cid").as("qcid"), col("dist"))
    val adist = (0 to 7).map(m =>
        max(when(col("qm") === m, col("dist").cast("double"))))
      .reduce(_ + _)
    val a = codes.join(broadcast(qd),
        col("qm") === col("m") && col("qcid") === col("code"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy(col("qid"), col("vec_id").as("nid"))
      .agg(adist.as("adist"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("adist").cast(FloatType), col("nid"))
    a.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("nid"),
        col("adist").cast(FloatType).as("adist"),
        col("rn").cast("int").as("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf100")
    val mode = sys.env.getOrElse("SPARK_GRAFT_TAX_MODE", "old106")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def snap(tag: String): Unit =
      println(s"""PROBE {"tag":"$tag","t":${System.currentTimeMillis()},""" +
        s""""state":${JvmProbe.jsonObject(JvmProbe.snapshot(spark))}}""")
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // same untimed warmup Bench runs
    try noop(SparkEntry.queries("q06_forecast_revenue")(spark, sfDir))
    catch { case _: Throwable => () } finally CacheScope.drain()
    snap("warm")

    val t1 = System.nanoTime()
    mode match {
      case "old106" =>
        try noop(oldQ106(spark, sfDir))
        catch { case t: Throwable =>
          println(f"STAGE1 old106 FAILED after ${(System.nanoTime() - t1) / 1e9}%.1f s: " +
            s"${t.getClass.getSimpleName}: ${String.valueOf(t.getMessage).take(200)}")
        }
      case "new106" =>
        try noop(SparkEntry.queries("q106_pq_search")(spark, sfDir))
        catch { case t: Throwable => println(s"STAGE1 new106 FAILED: ${t.getMessage}") }
      case _ => ()
    }
    CacheScope.drain()
    println(f"STAGE1 mode=$mode done in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    snap("after_stage1")

    // Bench's between-query hygiene, verbatim
    spark.catalog.clearCache()
    System.gc()
    snap("pre_q107")

    val t0 = System.nanoTime()
    val ok = try { noop(SparkEntry.queries("q107_ivf_pq_search")(spark, sfDir)); true }
      catch { case t: Throwable => println(s"q107 FAILED: ${t.getMessage}"); false }
      finally CacheScope.drain()
    val dt = (System.nanoTime() - t0) / 1e9
    snap("after_q107")
    println(f"""RESULT {"mode":"$mode","q107_sec":$dt%.1f,"ok":$ok}""")
    spark.stop()
  }
}
