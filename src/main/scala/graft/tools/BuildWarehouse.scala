package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sources.{BucketedTables, BucketedWarehouse}

/** One-time build of the bucketed warehouse a suite run can resolve
  * through `GRAFT_BUCKETED_WH` (see [[graft.sources.BucketedWarehouse]]):
  * writes each join table bucketed+sorted by its key into a
  * self-contained directory (tables + Derby metastore + source
  * marker). Paying the orderkey shuffle once here is the point — every
  * later lineitem⋈orders join or orderkey aggregation reads it back
  * shuffle-free.
  *
  * Usage: runMain graft.tools.BuildWarehouse <sfDir> <whDir>
  * then e.g.  GRAFT_BUCKETED_WH=<whDir> ... graft.Bench
  */
object BuildWarehouse {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: BuildWarehouse <sfDir> <whDir>")
    val Array(sfDir, whDir) = args
    // whDir covers BOTH the env var and its graft.bucketed.wh sysprop
    // twin (r13 ADVICE): either one set would make Tables resolve the
    // source reads from a PREVIOUS warehouse instead of plain parquet
    require(BucketedWarehouse.whDir.isEmpty,
      s"unset ${BucketedWarehouse.EnvKey} (and the ${BucketedWarehouse.PropKey} " +
        "system property) while building: the source reads must come from " +
        "the plain parquet, not a previous warehouse")
    new java.io.File(whDir).mkdirs()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = BucketedWarehouse.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false"),
      whDir).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t = graft.Tables(spark, sfDir)
    val src = Map("lineitem" -> t.lineitem, "orders" -> t.orders,
      "customer" -> t.customer, "part" -> t.part)
    BucketedWarehouse.tables.foreach { case (name, (key, buckets)) =>
      val t0 = System.nanoTime()
      BucketedTables.writeBucketed(src(name), s"bk_$name", key, buckets)
      println(f"bk_$name%-12s by $key%-12s $buckets buckets  " +
        f"${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }
    BucketedWarehouse.writeMarker(whDir, sfDir)
    println(s"warehouse ready: $whDir (source $sfDir)")
    spark.stop()
  }
}
