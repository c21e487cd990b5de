package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Typed `Aggregator[IN, BUF, OUT]`: top-k most frequent strings with
  * a deterministic tiebreak (count desc, value asc). The buffer keeps
  * full counts per partition and prunes at merge/finish — exact (not
  * a sketch), mergeable, and usable both as a typed Dataset aggregate
  * and (via `.toColumn`) in untyped `agg(...)`.
  *
  * This is the heavy-hitters primitive for corpus vocabularies; for
  * cardinalities where exact per-partition maps don't fit, switch to
  * [[CountMinTopK]] — same API slot, memory bounded by the sketch
  * size instead of the vocabulary.
  */
class TopKByCount(k: Int) extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(b: mutable.Map[String, Long], a: String): mutable.Map[String, Long] = {
    b.update(a, b.getOrElse(a, 0L) + 1L)
    b
  }

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b2.foreach { case (v, c) => b1.update(v, b1.getOrElse(v, 0L) + c) }
    b1
  }

  override def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(String, Long)]]()
}
