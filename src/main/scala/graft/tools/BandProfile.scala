package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: band-bucket size profile + candidate-pair volume for the
  * two LSH candidate generators (q103's 2×2 word-shingle banding and
  * the NearDup 8×2 index), at any SF dir. Sizes the fixed bucket caps:
  * a cap is admissible iff NO bucket exceeds it at certification SFs
  * (then capping is a provable no-op there) while it bounds the
  * quadratic bucket blowup at replica scale.
  *
  * Usage: runMain graft.tools.BandProfile [sfDir] [which=q103|neardup]
  */
object BandProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = args.lift(1).getOrElse("q103")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val buckets = which match {
      case "q103" =>
        val sig = graft.operators.TextQueries.minhashSigProbe(spark, sfDir)
        sig.select(lit(1).as("band"), concat(col("mh1"), col("mh2")).as("bk"))
          .unionAll(sig.select(lit(2).as("band"), concat(col("mh3"), col("mh4")).as("bk")))
          .groupBy("band", "bk").agg(count(lit(1)).as("n"))
      case "q66" =>
        val sig = graft.operators.TextQueries.simhashSigProbe(spark, sfDir, 32)
        val half = lit(0xFFFFL)
        sig.select(lit(1).as("band"), shiftright(col("simhash"), 16).bitwiseAND(half).as("bk"))
          .unionAll(sig.select(lit(2).as("band"), col("simhash").bitwiseAND(half).as("bk")))
          .groupBy("band", "bk").agg(count(lit(1)).as("n"))
      case "q102" =>
        graft.operators.SimilarityOps
          .ivfAssign(graft.Tables(spark, sfDir).embeddings, 16)
          .groupBy(col("cell").as("bk")).agg(count(lit(1)).as("n"))
          .withColumn("band", lit(0))
      case _ =>
        val idx = graft.operators.NearDup.buildIndex(
          graft.Tables(spark, sfDir).documentsSpread)
        idx.bandRows.groupBy("band", "bk").agg(count(lit(1)).as("n"))
    }
    val prof = buckets.agg(
      count(lit(1)).as("buckets"),
      max(col("n")).as("max_bucket"),
      sum(col("n") * (col("n") - 1) / 2).as("pairs_upper"),
      sum(when(col("n") > 64, col("n") * (col("n") - 1) / 2)).as("pairs_over64"),
      sum(when(col("n") > 16, col("n") * (col("n") - 1) / 2)).as("pairs_over16"),
      count(when(col("n") > 64, 1)).as("buckets_over64"),
      count(when(col("n") > 16, 1)).as("buckets_over16"))
    prof.show(false)
    // residual volume under a hub-star cap: all-pairs below the cap
    // plus one star edge per member above it
    val capCols = Seq(128, 256, 512, 1024).map(c =>
      sum(when(col("n") <= c, col("n") * (col("n") - 1) / 2)
        .otherwise(col("n") - 1)).as(s"capped_vol_$c"))
    val caps = buckets.agg(capCols.head, capCols.tail: _*)
    caps.show(false)
    buckets.orderBy(col("n").desc).show(10, false)
    spark.stop()
  }
}
