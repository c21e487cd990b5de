package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable HyperLogLog sketch over PRE-HASHED 64-bit values (feed it
  * `xxhash64(col)` — hashing stays in codegen'd SQL, the Aggregator
  * only does register bookkeeping).
  *
  * The point of carrying the SKETCH (not the estimate) is the merge
  * algebra `union(sketch(A), sketch(B)) == sketch(A ∪ B)` — REGISTER-
  * BIT-EQUAL, not approximately (HllSpec pins it): per-day sketches
  * union into any date range's distinct count without rescanning
  * facts, the sketch twin of q109's exact partial-aggregate merge.
  * Spark's own `approx_count_distinct` emits only the final number,
  * which is why this Aggregator exists.
  *
  * Layout: p=12 → 4096 byte registers (~4 KB per group); standard
  * bias-corrected estimator with linear-counting small-range
  * correction. Estimate error ~1.04/√4096 ≈ 1.6%.
  */
final class HllSketch extends Aggregator[Long, Array[Byte], Array[Byte]] {
  import HllSketch._

  /** Zero is an EMPTY-ARRAY SENTINEL, not a register block: Spark
    * reuses one deserialized zero object as the incoming buffer for
    * every new group in a partition, so a mutable zero silently
    * unions all groups together (observed: every per-day sketch
    * became the global sketch). The sentinel is never mutated —
    * reduce/merge allocate the real 4 KB block per group on first
    * touch and mutate only that.
    */
  override def zero: Array[Byte] = Array.emptyByteArray

  override def reduce(regs: Array[Byte], hash: Long): Array[Byte] = {
    val r = if (regs.length == 0) new Array[Byte](M) else regs
    val idx = (hash >>> (64 - P)).toInt
    // rank = leading-zero count of the remaining 52 bits, +1; the cap
    // (52 zeros) maps to rank 53
    val rest = hash << P
    val rank = (if (rest == 0L) (64 - P) else java.lang.Long.numberOfLeadingZeros(rest)) + 1
    if (rank > r(idx)) r(idx) = rank.toByte
    r
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.length == 0) b
    else if (b.length == 0) a
    else {
      var i = 0
      while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

  override def finish(regs: Array[Byte]): Array[Byte] =
    if (regs.length == 0) new Array[Byte](M) else regs

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object HllSketch {
  val P = 12
  val M: Int = 1 << P // 4096 registers
  private val Alpha = 0.7213 / (1.0 + 1.079 / M) // αm for m ≥ 128

  /** Register-wise max — the union. Commutative, associative,
    * idempotent; bit-equal to sketching the concatenated input.
    */
  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](M)
    var i = 0
    while (i < M) { out(i) = if (a(i) > b(i)) a(i) else b(i); i += 1 }
    out
  }

  /** Standard HLL estimate with the linear-counting small-range
    * correction (large-range correction omitted: 64-bit hashes make
    * collisions irrelevant below ~2^57 distincts).
    */
  def estimate(regs: Array[Byte]): Double = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      invSum += java.lang.Math.scalb(1.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = Alpha * M.toDouble * M.toDouble / invSum
    if (e <= 2.5 * M && zeros > 0) M * math.log(M.toDouble / zeros) else e
  }
}
