package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

class DataLayoutSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("writeRangeClustered: per-file key ranges are pairwise disjoint (footer-skippable layout)") {
    val dir = Files.createTempDirectory("layout").toString + "/li"
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    DataLayout.writeRangeClustered(li, dir, "l_shipdate", numFiles = 4)

    // results unchanged by layout
    assert(spark.read.parquet(dir).count() == li.count())

    // every file covers a disjoint l_shipdate range — the property
    // parquet min/max skipping needs to prune a range predicate
    val files = spark.read.parquet(dir).inputFiles.toSeq
    assert(files.size >= 3, s"expected multiple files, got ${files.size}")
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min("l_shipdate"), max("l_shipdate")).head()
      (r.getAs[java.time.LocalDateTime](0), r.getAs[java.time.LocalDateTime](1))
    }.sortBy(_._1)(Ordering.fromLessThan(_ isBefore _))
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(!aMax.isAfter(bMin), s"file ranges overlap: $ranges")
      case _ => ()
    }

    // the range predicate still reaches the scan
    val cutoff = spark.read.parquet(dir)
      .agg(max("l_shipdate")).head().getAs[java.time.LocalDateTime](0)
    val p = spark.read.parquet(dir)
      .filter(col("l_shipdate") < lit(cutoff))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"))
  }

  test("writeZOrdered: per-file 2D bounding boxes shrink vs the unclustered layout") {
    val base = Files.createTempDirectory("zorder").toString
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_partkey", "l_suppkey", "l_quantity")

    def avgBoxArea(dir: String): Double = {
      val files = spark.read.parquet(dir).inputFiles.toSeq
      val areas = files.map { f =>
        val r = spark.read.parquet(f).agg(
          min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
        (r.getLong(1) - r.getLong(0) + 1).toDouble * (r.getLong(3) - r.getLong(2) + 1)
      }
      areas.sum / areas.size
    }

    li.repartition(8).write.parquet(s"$base/naive")
    DataLayout.writeZOrdered(li, s"$base/z", "l_partkey", "l_suppkey", numFiles = 8)

    assert(spark.read.parquet(s"$base/z").count() == li.count())
    val naive = avgBoxArea(s"$base/naive")
    val z = avgBoxArea(s"$base/z")
    // hash layout: every file spans ~the full (partkey × suppkey)
    // rectangle; z-order files cover small sub-rectangles. 4× is a
    // loose floor — measured shrinkage is ~8-16× at 8 files.
    assert(z * 4 < naive, s"z-order boxes not smaller: z=$z naive=$naive")
  }

  test("compact: rewrites a many-small-file directory to the size-derived file count") {
    val dir = Files.createTempDirectory("compact").toString + "/t"
    val df = spark.range(0, 10000).toDF("id")
    df.repartition(20).write.parquet(dir) // 20 small files
    val before = spark.read.parquet(dir).inputFiles.length
    assert(before >= 20)

    val bytes = {
      val p = new org.apache.hadoop.fs.Path(dir)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
    }
    val n = DataLayout.compact(spark, dir, targetFileBytes = bytes / 2 + 1)
    assert(n == 2)
    val after = spark.read.parquet(dir)
    assert(after.inputFiles.length <= 3) // n tasks, maybe an empty one dropped
    assert(after.count() == 10000)
    assert(after.agg(sum("id")).head().getLong(0) == 10000L * 9999 / 2)
  }
}
