package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CountMinTopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // skewed stream: 5 heavy keys well above a 200-key tail
  private def data: Seq[String] = {
    val heavy = (0 until 5).flatMap(i => Seq.fill(500 + 100 * i)(s"heavy$i"))
    val tail = (0 until 200).flatMap(i => Seq.fill(1 + i % 3)(s"tail$i"))
    new scala.util.Random(3).shuffle(heavy ++ tail)
  }

  test("sketch top-k equals exact top-k on a heavy-hitter distribution; estimates never undercount") {
    val ds = data.toDS()
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case (v, c) => (-c, v) }.take(5)
    val got = ds.select(udaf(new CountMinTopK(5), org.apache.spark.sql.Encoders.STRING)
      .apply(col("value")).as("topk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.map(_._1) == exact.map(_._1), s"got=$got exact=$exact")
    // CMS never undercounts; overcount bounded by n/width
    val exactMap = exact.toMap
    got.foreach { case (v, est) =>
      assert(est >= exactMap(v), s"$v undercounted: $est < ${exactMap(v)}")
      assert(est <= exactMap(v) + data.size.toLong / 512 + 1, s"$v overcounted far: $est")
    }
  }

  test("mergeable: arbitrary partition splits give the same top-k") {
    val a = data.toDS().repartition(13)
    val b = data.toDS().repartition(2)
    def run(ds: org.apache.spark.sql.Dataset[String]) =
      ds.select(udaf(new CountMinTopK(5), org.apache.spark.sql.Encoders.STRING)
        .apply(col("value")).as("topk"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => (r.getString(0), r.getLong(1)))
    assert(run(a) == run(b))
  }

  test("deterministic across runs") {
    val ds = data.toDS()
    def once() = ds.select(udaf(new CountMinTopK(3), org.apache.spark.sql.Encoders.STRING)
      .apply(col("value"))).head().getSeq[org.apache.spark.sql.Row](0).toSeq
    assert(once() == once())
  }

  test("candidate buffer stays bounded under the lazy prune (2x cap accumulating, cap after merge)") {
    val agg = new CountMinTopK(5) // cap = max(8*5, 16) = 40
    var b = agg.zero
    (1 to 5000).foreach(i => b = agg.reduce(b, s"k$i"))
    assert(b.cand.size <= 80, s"accumulating buffer grew to ${b.cand.size}")
    val merged = agg.merge(b, agg.zero)
    assert(merged.cand.size <= 40, s"merged buffer grew to ${merged.cand.size}")
    // heavy hitters still surface through the lazy prune
    var h = agg.zero
    val rng = new scala.util.Random(5)
    val stream = rng.shuffle(
      (1 to 2000).map(i => s"t$i") ++ (1 to 5).flatMap(i => Seq.fill(300 + i)(s"H$i")))
    stream.foreach(s => h = agg.reduce(h, s))
    assert(agg.finish(h).map(_._1).toSet == Set("H1", "H2", "H3", "H4", "H5"))
  }

  test("weighted partials sketch == row-by-row sketch (additive updates), top-k identical") {
    // the q90 premise: feeding map-side-combined (value, partial count)
    // rows produces the SAME merged counters as the raw expansion, so
    // estimates — and the candidate top-k — agree exactly
    val plain = new CountMinTopK(5)
    val weighted = new CountMinTopKWeighted(5)
    var a = plain.zero
    data.foreach(s => a = plain.reduce(a, s))
    // partials: split the stream in 7 chunks, pre-combine each
    var b = weighted.zero
    data.grouped(math.max(1, data.size / 7)).foreach { chunk =>
      chunk.groupBy(identity).foreach { case (v, occ) =>
        b = weighted.reduce(b, (v, occ.size.toLong))
      }
    }
    assert(a.counts.toSeq == b.counts.toSeq, "merged CMS counters diverge")
    assert(plain.finish(a) == weighted.finish(b))
    // and through the full Spark agg path over a weighted table
    val exact = data.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val got = exact.toDF("value", "c").repartition(5)
      .as[(String, Long)]
      .select(udaf(new CountMinTopKWeighted(5),
        org.apache.spark.sql.Encoders.product[(String, Long)])
        .apply(col("value"), col("c")).as("topk"))
      .head().getSeq[org.apache.spark.sql.Row](0)
      .map(r => (r.getString(0), r.getLong(1)))
    val top5 = exact.sortBy { case (v, c) => (-c, v) }.take(5)
    assert(got.map(_._1) == top5.map(_._1), s"got=$got exact=$top5")
  }
}
