package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The weighted GK sketch must honor the same rank contract as
  * percentile_approx (it IS the same QuantileSummaries machinery):
  * every output value's exact rank interval overlaps
  * [(p − 1/acc)·n − 1, (p + 1/acc)·n + 1] — verified over a skewed
  * multiset fed as a (value, count) table across several partitions,
  * which exercises insert, head compression, and cross-partition
  * merge.
  */
class GkQuantileWeightedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("weighted sketch outputs satisfy the GK rank bound on a skewed multiset") {
    val rng = new scala.util.Random(89)
    val counts: Seq[(Double, Long)] = (1 to 4000).map { i =>
      (math.floor(rng.nextGaussian() * 500) / 10.0,
        1L + (if (i % 97 == 0) 500L else rng.nextInt(20).toLong))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
    val n = counts.map(_._2).sum
    val ps = Seq(0.25, 0.5, 0.75, 0.95)
    val acc = 1000
    val got = counts.toDF("v", "c").repartition(7)
      .as[(Double, Long)]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(new GkQuantileWeighted(ps, acc).toColumn.name("ap"))
      .collect().head._2
    assert(got.size == ps.size)
    val sorted = counts.sortBy(_._1)
    ps.zip(got).foreach { case (p, v) =>
      val lt = sorted.iterator.takeWhile(_._1 < v).map(_._2).sum
      val le = lt + sorted.find(_._1 == v).map(_._2).getOrElse(0L)
      val lo = (p - 1.0 / acc) * n - 1
      val hi = (p + 1.0 / acc) * n + 1
      assert(lt + 1 <= hi && le >= lo,
        s"p=$p v=$v rank interval [${lt + 1}, $le] outside [$lo, $hi] (n=$n)")
    }
  }

  test("deterministic for a fixed partitioning; empty input yields null") {
    val counts = (1 to 500).map(i => (i.toDouble, (i % 7 + 1).toLong))
    def once() = counts.toDF("v", "c").repartition(4).as[(Double, Long)]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(new GkQuantileWeighted(Seq(0.5), 1000).toColumn).collect().head._2
    assert(once() == once())
    val empty = spark.emptyDataset[(Double, Long)]
      .groupByKey(_ => 0).mapValues(identity)
      .agg(new GkQuantileWeighted(Seq(0.5), 1000).toColumn).collect()
    assert(empty.isEmpty || empty.head._2 == null)
  }
}
