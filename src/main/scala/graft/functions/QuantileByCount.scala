package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]`: EXACT quantiles of a long-valued
  * column via a mergeable value→count map — the streaming-compatible
  * form of the quantile family (`DistributedRank.valuesAtRanks` needs
  * a rewindable frame; this needs only a mergeable buffer, so it runs
  * under a watermark in append mode).
  *
  * For each requested quantile p the result is the k-th smallest
  * value with `k = max(1, ceil(p·n))` — the lower empirical quantile,
  * the same deterministic rank convention as q84/q120 (no
  * interpolation, so the answer is always a value that occurred, and
  * engine-exact). Empty input → empty output.
  *
  * Memory contract: the buffer holds one (value, count) entry per
  * DISTINCT value — bounded by the value domain, not the row count.
  * Right for quantized domains (prices in cents, token counts,
  * latency buckets); for unbounded real domains quantize first or
  * use the KLL-style sketch (q89) — the standard two-tier split.
  * Buffer is an object-encoded mutable map with a fresh instance per
  * `zero` call (the binary-encoder shared-zero hazard does not apply;
  * same pattern as [[TopKByCount]]).
  */
class QuantileByCount(ps: Seq[Double])
    extends Aggregator[Long, mutable.Map[Long, Long], Seq[Long]] {

  require(ps.nonEmpty && ps.forall(p => p > 0.0 && p <= 1.0),
    s"quantiles must be in (0, 1], got $ps")

  override def zero: mutable.Map[Long, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[Long, Long], v: Long): mutable.Map[Long, Long] = {
    b.update(v, b.getOrElse(v, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.Map[Long, Long], b2: mutable.Map[Long, Long]): mutable.Map[Long, Long] = {
    b2.foreach { case (v, c) => b1.update(v, b1.getOrElse(v, 0L) + c) }
    b1
  }

  override def finish(b: mutable.Map[Long, Long]): Seq[Long] = {
    if (b.isEmpty) return Seq.empty
    val sorted = b.toArray.sortBy(_._1)
    val n = sorted.iterator.map(_._2).sum
    ps.map { p =>
      val k = math.max(1L, math.ceil(p * n).toLong)
      var acc = 0L
      var i = 0
      while (acc < k && i < sorted.length) { acc += sorted(i)._2; i += 1 }
      sorted(i - 1)._1
    }
  }

  override def bufferEncoder: Encoder[mutable.Map[Long, Long]] =
    Encoders.kryo[mutable.Map[Long, Long]]

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
