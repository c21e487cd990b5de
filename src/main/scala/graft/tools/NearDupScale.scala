package graft.tools

import graft.operators.NearDup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Scale probe for the near-dup candidate-stage knobs (run manually,
  * not part of the driver contract):
  *
  * {{{
  * SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.NearDupScale <sfDir> [agreeFloor] [maxBandBucket]"
  * }}}
  *
  * Builds the index, prints the band-bucket size distribution and the
  * cap audit, then runs the full pair listing with the given knobs,
  * reporting verified pairs, wall time, and TOTAL SHUFFLE WRITE BYTES
  * (task-metric sum — the number the 70 GB gray-zone estimate in the
  * README's 100× section is about). Compare a `0 2147483647` run
  * (both knobs off) against defaults to price the knobs.
  */
object NearDupScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val floorArg = if (args.length > 1) args(1).toInt else -1
    val cap = if (args.length > 2) args(2).toInt else Int.MaxValue

    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new AtomicLong
    val shuffleRecords = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })

    val docs = graft.Tables(spark, sfDir).documentsSpread
    val index = NearDup.buildIndex(docs)
    val nCanon = index.clusters.count()

    // bucket-size distribution: the quadratic-inflation diagnostic
    val dist = index.bandRows.groupBy("band", "bk").agg(count(lit(1)).as("n"))
      .groupBy((floor(log2(col("n"))) + 1).cast("int").as("size_pow2"))
      .agg(count(lit(1)).as("buckets"), sum(col("n") * (col("n") - 1) / 2).as("pairs"))
      .orderBy(col("size_pow2")).collect()
    println(s"[neardup-scale] canonicals=$nCanon bucket histogram (2^k size bands):")
    dist.foreach(r => println(
      f"  size<2^${r.getInt(0)}%-2d buckets=${r.getLong(1)}%-8d pairs=${r.getAs[Number](2).longValue()}%d"))
    if (cap != Int.MaxValue) {
      val rep = NearDup.capReport(index, cap).collect().head
      println(s"[neardup-scale] cap=$cap report: buckets_capped=${rep.get(0)} " +
        s"rows_in_capped=${rep.get(1)} pairs_reduced=${rep.get(2)}")
    }

    shuffleBytes.set(0); shuffleRecords.set(0)
    val t0 = System.nanoTime()
    val pairs = NearDup.indexPairs(index, 0.6, floorArg, cap).count()
    val secs = (System.nanoTime() - t0) / 1e9
    // listener events drain asynchronously; settle before reading
    Thread.sleep(3000)
    println(f"""{"probe":"neardup-scale","sf":"$sfDir","agreeFloor":$floorArg,"maxBandBucket":$cap,""" +
      f""""pairs":$pairs,"secs":$secs%.1f,"shuffle_mb":${shuffleBytes.get / 1e6}%.1f,""" +
      f""""shuffle_records":${shuffleRecords.get}}""")

    // SPARK_GRAFT_COMPONENTS=1: does capping change the CLUSTERS?
    // Dense buckets hold redundant intra-cluster edges, so the
    // transitive closure should reconnect what the cap drops — the
    // semantic consumers (retention, SemDeDup) read clusters, not the
    // pair listing. Compares the cluster PARTITIONS (membership-exact,
    // via a sorted-member fingerprint per cluster).
    if (sys.env.get("SPARK_GRAFT_COMPONENTS").contains("1") && cap != Int.MaxValue) {
      def clusterSigs(p: org.apache.spark.sql.DataFrame) =
        graft.operators.ConnectedComponents.run(
          p.select(col("doc_a").as("a"), col("doc_b").as("b")))
          .groupBy(col("label"))
          .agg(md5(concat_ws(",", sort_array(collect_list(col("node"))))).as("sig"))
          .select(col("sig"))
      val capSigs = clusterSigs(NearDup.indexPairs(index, 0.6, floorArg, cap)).persist()
      val unSigs = clusterSigs(NearDup.indexPairs(index, 0.6, floorArg, Int.MaxValue)).persist()
      val same = capSigs.join(unSigs, "sig").count()
      println(s"""{"probe":"neardup-cap-components","clusters_uncapped":${unSigs.count()},""" +
        s""""clusters_capped":${capSigs.count()},"clusters_identical":$same}""")
    }
    spark.stop()
  }
}
