package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}

import graft.Tables
import graft.functions.TextFunctions.tokens

/** A/B probe for q78's per-document top-3 selection (r13 verdict
  * item 8): the shipped form ranks the tf table with a window
  * (partition-local sort by (doc_id, tfidf desc, token) — no
  * exchange, documentsSpread already co-locates each doc), the
  * candidate replaces the sort with a bounded top-k aggregate.
  *
  * Forms:
  *   A  window row_number + rk<=3 (shipped)
  *   B  collect_list + array_sort + slice(3) per doc, with the
  *      ObjectHashAggregate sort-fallback threshold raised so the
  *      hash map actually survives (default 128 groups collapses any
  *      object agg to sort-based — the same sort A pays, plus object
  *      overhead)
  *   B0 same as B at the default threshold (what a naive swap ships)
  *
  * Usage: ProbeQ78 <sfDir> [reps]
  * Prints min seconds per form; each rep is a full noop write.
  */
object ProbeQ78 {

  private def tfTable(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir).documentsSpread
    val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
    val tf = graft.CacheScope.scoped(
      tok.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf")))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = Tables(s, dir).documents.agg(count(lit(1)).as("n_docs"))
    tf.join(broadcast(df), "token").crossJoin(broadcast(n))
      .select(col("doc_id"), col("token"),
        (col("tf") * log(col("n_docs").cast(DoubleType) / col("df")))
          .cast(FloatType).as("tfidf"))
  }

  private def formA(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("token"))
    tfTable(s, dir).withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("token"), col("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  private def formB(s: SparkSession, dir: String): DataFrame = {
    // sort key: score desc then token asc == ascending (-tfidf, token)
    val scored = tfTable(s, dir)
      .groupBy(col("doc_id"))
      .agg(slice(array_sort(collect_list(
        struct((-col("tfidf")).as("neg"), col("token")))), 1, 3).as("top"))
      .select(col("doc_id"), posexplode(col("top")).as(Seq("rk0", "t")))
    scored.select(col("doc_id"), (col("rk0") + 1).as("rk"),
        col("t.token").as("token"), (-col("t.neg")).as("tfidf"))
      .orderBy(col("doc_id"), col("rk"))
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = graft.BenchKernel.buildSession()
    def time(tag: String, mk: => DataFrame): Unit = {
      val samples = (1 to reps).map { _ =>
        spark.catalog.clearCache(); System.gc()
        val t0 = System.nanoTime()
        try mk.write.format("noop").mode("overwrite").save()
        finally graft.CacheScope.drain()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-4s min=${samples.min}%7.2f s  all=${samples.map(x => f"$x%.2f").mkString(",")}")
    }
    time("A", formA(spark, dir))
    val prevThresh = spark.conf.getOption(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
    time("B0", formB(spark, dir))
    spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "20000000")
    time("B", formB(spark, dir))
    prevThresh.fold(spark.conf.unset(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"))(
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", _))
    // parity: A and B must agree row-for-row
    val a = formA(spark, dir); val b = formB(spark, dir)
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    println(s"parity exceptAll diff rows: $diff")
    graft.CacheScope.drain()
    spark.stop()
  }
}
