package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable.ArrayBuffer

/** Typed `Aggregator`: top-k (id, score) pairs by score desc, id asc —
  * the neighbor-list reducer for similarity search. The buffer holds
  * at most 2k entries between prunes, so partial (map-side) aggregates
  * stay O(k) regardless of candidate volume; merge is concatenate +
  * prune. Exact and deterministic (total order on (−score, id)).
  *
  * Usable typed (`.toColumn`) or untyped via
  * `functions.udaf(new TopKByScore(k), Encoders.product)` — the form
  * streaming windowed aggregations need.
  */
class TopKByScore(k: Int)
    extends Aggregator[(Long, Double), ArrayBuffer[(Long, Double)], Seq[(Long, Double)]] {

  private def prune(b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    val kept = b.sortBy { case (id, s) => (-s, id) }.take(k)
    b.clear()
    b ++= kept
  }

  override def zero: ArrayBuffer[(Long, Double)] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[(Long, Double)], a: (Long, Double)): ArrayBuffer[(Long, Double)] = {
    b += a
    if (b.length >= 2 * k) prune(b) else b
  }

  override def merge(b1: ArrayBuffer[(Long, Double)], b2: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] = {
    b1 ++= b2
    prune(b1)
  }

  override def finish(b: ArrayBuffer[(Long, Double)]): Seq[(Long, Double)] =
    b.sortBy { case (id, s) => (-s, id) }.take(k).toSeq

  override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
    Encoders.kryo[ArrayBuffer[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Double)]]()
}
