package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[DistributedRank.ntileByCuts]] forced directly (the r12 ADVICE: it
  * was reachable only above q46's 64 MB stats gate, so no fixture ever
  * exercised it): multiset equality against the literal
  * `ntile(k) OVER (ORDER BY value, key)` window on clean, tied, and
  * adversarial inputs — and None (fall back to the rank form) exactly
  * when the cut structure cannot be expressed as a per-row predicate.
  */
class NtileCutsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df(rows: Seq[(Long, Double)]): DataFrame =
    rows.toDF("k", "v").repartition(5)

  private def windowForm(d: DataFrame, k: Int): Set[(Long, Int)] =
    d.select(col("k"),
      ntile(k).over(Window.orderBy(col("v"), col("k"))).as("b"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet

  private def cutsForm(d: DataFrame, k: Int): Option[Set[(Long, Int)]] =
    try DistributedRank.ntileByCuts(d, "v", "k", k, "b")
      .map(_.collect().map(r => (r.getLong(0), r.getInt(1))).toSet)
    finally graft.CacheScope.drain()

  test("distinct values: cuts == window, every k") {
    val rows = (1L to 103L).map(i => i -> (((i * 37) % 103) + 0.25))
    for (k <- Seq(2, 4, 7)) {
      val got = cutsForm(df(rows), k)
      assert(got.contains(windowForm(df(rows), k)), s"k=$k diverged")
    }
  }

  test("heavy ties with distinct keys: mid-block cuts resolve exactly") {
    // three fat value blocks; every quartile boundary lands mid-block
    val rows = (1L to 90L).map(i => i -> (i % 3).toDouble)
    for (k <- Seq(4, 5)) {
      val got = cutsForm(df(rows), k)
      assert(got.contains(windowForm(df(rows), k)), s"k=$k diverged")
    }
    // bucket sizes within 1 (ntile's contract), directly
    val sizes = cutsForm(df(rows), 4).get.groupBy(_._2).view.mapValues(_.size).values.toSet
    assert(sizes.max - sizes.min <= 1)
  }

  test("duplicated (value, key) rows straddling a cut: None, not a wrong split") {
    // one tie block, two distinct keys x8 copies each: the k=4 cut at
    // offset 4 falls INSIDE the run of key 1 — key <= keyCut would put
    // all 8 copies in bucket 1
    val rows = (1 to 8).map(_ => 1L -> 1.0) ++ (1 to 8).map(_ => 2L -> 1.0)
    assert(cutsForm(df(rows), 4).isEmpty)
    // same duplicated keys, but cuts land ON block edges: safe, equal
    // to the window's bucket SIZES (within-tie row identity is
    // indistinguishable here, so compare the multiset of buckets)
    val aligned = (1 to 4).map(_ => 1L -> 1.0) ++ (1 to 4).map(_ => 2L -> 2.0) ++
      (1 to 4).map(_ => 3L -> 3.0) ++ (1 to 4).map(_ => 4L -> 4.0)
    val got = cutsForm(df(aligned), 4)
    assert(got.isDefined)
    assert(got.get == windowForm(df(aligned), 4))
  }

  test("NULL values and tiny inputs: None") {
    val withNull = Seq((1L, java.lang.Double.valueOf(1.0)), (2L, null.asInstanceOf[java.lang.Double]),
      (3L, java.lang.Double.valueOf(3.0)))
      .toDF("k", "v")
    assert({ try DistributedRank.ntileByCuts(withNull, "v", "k", 2, "b")
      finally graft.CacheScope.drain() }.isEmpty)
    val tiny = df((1L to 7L).map(i => i -> i.toDouble))
    assert(cutsForm(tiny, 4).isEmpty) // n < 4k
  }
}
