package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Approximate heavy hitters: count-min sketch + capped candidate
  * set, as a mergeable typed `Aggregator`. The sketch bounds memory
  * at depth×width longs per partition REGARDLESS of key cardinality —
  * the promised "same API slot" scale fallback for
  * [[TopKByCount]], whose exact per-partition maps grow with the
  * vocabulary.
  *
  * Guarantees (standard CMS): estimates never undercount; overcount
  * ≤ n/width with probability 1 − (1/2)^depth. Top-k output is exact
  * when the true k-th count exceeds the (k+1)-th by the error bound —
  * the heavy-hitter regime this exists for. Deterministic: fixed
  * seeded hash family, (estimate desc, value asc) tiebreak.
  *
  * Candidate tracking keeps ≤ 16k entries per buffer during
  * accumulation (lazily trimmed back to 8k — an eager per-row prune
  * would sort the map on EVERY row once saturated) and ≤ 8k after a
  * merge, so the driver never sees more than a bounded set per group.
  */
abstract class CountMinTopKBase[IN](k: Int, depth: Int, width: Int)
  extends Aggregator[IN, CountMinTopK.Buf, Seq[(String, Long)]] {

  import CountMinTopK._

  /** Key and non-negative weight of one input row: the plain form is
    * (value, 1); the weighted form consumes pre-combined
    * (value, partial count) rows — CMS updates are additive, so the
    * merged sketch (and therefore every estimate) is IDENTICAL to
    * feeding the expansion row by row (pinned in CountMinTopKSpec).
    */
  protected def keyOf(a: IN): String
  protected def weightOf(a: IN): Long

  private val cap = math.max(8 * k, 16)

  override def zero: Buf = Buf(new Array[Long](depth * width), mutable.Map.empty)

  private def rowHash(s: String, d: Int): Int = {
    // two independent 32-bit mixes combined per row (Kirsch–
    // Mitzenmacher): h1 + d*h2, reduced mod width
    val h1 = scala.util.hashing.MurmurHash3.stringHash(s, 0x9747b28c)
    val h2 = scala.util.hashing.MurmurHash3.stringHash(s, 0x85ebca6b) | 1
    val h = h1 + d * h2
    math.floorMod(h, width)
  }

  private def add(b: Buf, s: String, c: Long): Unit = {
    var d = 0
    while (d < depth) { b.counts(d * width + rowHash(s, d)) += c; d += 1 }
  }

  private def estimate(b: Buf, s: String): Long = {
    var est = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = b.counts(d * width + rowHash(s, d))
      if (v < est) est = v
      d += 1
    }
    est
  }

  // Trim back to `cap` once `limit` is exceeded. reduce() passes
  // limit = 2*cap so the O(size log size) sort amortizes to O(log cap)
  // per row instead of firing on every row past saturation; merge()
  // passes `cap` so a finished buffer is always at the documented bound.
  private def prune(b: Buf, limit: Int): Unit =
    if (b.cand.size > limit) {
      val keep = b.cand.toSeq.sortBy { case (v, c) => (-c, v) }.take(cap)
      b.cand.clear(); b.cand ++= keep
    }

  override def reduce(b: Buf, a: IN): Buf = {
    val s = keyOf(a)
    add(b, s, weightOf(a))
    b.cand.update(s, estimate(b, s))
    prune(b, 2 * cap)
    b
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    var i = 0
    while (i < b1.counts.length) { b1.counts(i) += b2.counts(i); i += 1 }
    // re-estimate every candidate against the MERGED sketch
    val keys = b1.cand.keySet ++ b2.cand.keySet
    b1.cand.clear()
    keys.foreach(s => b1.cand.update(s, estimate(b1, s)))
    prune(b1, cap)
    b1
  }

  override def finish(b: Buf): Seq[(String, Long)] =
    b.cand.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}

/** Unweighted heavy hitters over a raw value stream. */
class CountMinTopK(k: Int, depth: Int = 4, width: Int = 512)
  extends CountMinTopKBase[String](k, depth, width) {
  override protected def keyOf(a: String): String = a
  override protected def weightOf(a: String): Long = 1L
}

/** Weighted heavy hitters over (value, partial count) rows — the form
  * a map-side-combined token stream feeds (q90): the sketch still
  * bounds memory at depth×width counters regardless of vocabulary,
  * it just ingests each partition's pre-summed counts instead of the
  * row-by-row expansion.
  */
class CountMinTopKWeighted(k: Int, depth: Int = 4, width: Int = 512)
  extends CountMinTopKBase[(String, Long)](k, depth, width) {
  override protected def keyOf(a: (String, Long)): String = a._1
  override protected def weightOf(a: (String, Long)): Long = a._2
}

object CountMinTopK {
  final case class Buf(counts: Array[Long], cand: mutable.Map[String, Long])
}
