package graft.operators

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Overflow discipline for the scaled-long money paths (q01/q33/q44).
  *
  * Per-row cent products are primitive longs for codegen speed, but any
  * column whose per-row magnitude × worst-case group row count
  * approaches 2^63 must be summed into a Decimal(38,0) buffer: under
  * Spark 4's default ANSI mode sum(long) overflow KILLS the query
  * (ARITHMETIC_OVERFLOW), and with ansi off it wraps silently — either
  * way a 100 TB failure. These tests pin (a) the overflow hazard and
  * the decimal-buffer fix, and (b) the headroom arithmetic behind the
  * comments that keep the scale-2 sums primitive.
  */
class ScaledLongSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ~7e11 lineitem rows at 100 TB (SF ~1e5, 6e6 rows/SF, ~15% slack).
  private val rowsAt100TB = 7e11

  test("sum(long) overflow fails the query where the Decimal(38,0) buffer stays exact") {
    // Three rows of 4.1e18 exceed 2^63 ~ 9.22e18.
    val big = 4100000000000000000L
    val df = Seq(big, big, big).toDF("pdt6")
    // ANSI (Spark 4 default): the primitive sum is a hard query failure.
    val ex = intercept[Exception] { df.agg(sum(col("pdt6"))).head() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("ARITHMETIC_OVERFLOW")), msgs(ex).mkString(" | "))
    // The decimal buffer absorbs it exactly.
    val exact = df.agg(sum(col("pdt6").cast(DecimalType(38, 0)))).head().getDecimal(0)
    assert(exact == new java.math.BigDecimal("12300000000000000000"))
  }

  test("decimal-buffer sum of long cents equals the long sum below the wrap point") {
    val rng = new scala.util.Random(7)
    val df = Seq.fill(5000)(math.abs(rng.nextLong()) % 130000000000L).toDF("pdt6")
    val row = df.agg(
      sum(col("pdt6")).as("long_sum"),
      sum(col("pdt6").cast(DecimalType(38, 0))).as("dec_sum")).head()
    assert(java.math.BigDecimal.valueOf(row.getLong(0)).compareTo(row.getDecimal(1)) == 0)
  }

  test("split-long sums recombine to the exact decimal sum (q01 hybrid path)") {
    // q01's hot path sums (div, mod) long parts instead of a decimal
    // buffer: hi·M + lo recombined per group must equal the direct
    // decimal sum bit-for-bit, including at magnitudes where a single
    // primitive sum would already have wrapped
    val rng = new scala.util.Random(11)
    val m = 1000000L
    val df = Seq.fill(5000)(math.abs(rng.nextLong()) % 130000000000L).toDF("pdt6")
    val row = df
      .select(expr("pdt6 div 1000000").as("hi"), (col("pdt6") % m).as("lo"), col("pdt6"))
      .agg(
        (sum(col("hi")).cast(DecimalType(38, 0)) * lit(m)
          + sum(col("lo")).cast(DecimalType(38, 0))).as("split_sum"),
        sum(col("pdt6").cast(DecimalType(38, 0))).as("dec_sum")).head()
    assert(row.getDecimal(0).compareTo(row.getDecimal(1)) == 0)
  }

  test("headroom arithmetic behind the q01 split-part sums") {
    val longMax = BigDecimal(Long.MaxValue)
    // pdt6 split at 1e6: lo < 1e6 wraps past ~9.2e12 rows/group; hi ≤
    // 1.3e5 wraps past ~7e13 — both clear total 100 TB lineitem rows
    // (~7e11) even with every row in one group
    assert(BigDecimal(1e6) * rowsAt100TB < longMax)
    assert(BigDecimal(1.3e5) * rowsAt100TB < longMax)
    // pd4 split at 1e4: lo < 1e4, hi ≤ 1.2e5 — same conclusion
    assert(BigDecimal(1e4) * rowsAt100TB < longMax)
    assert(BigDecimal(1.2e5) * rowsAt100TB < longMax)
  }

  test("headroom arithmetic behind which sums stay primitive") {
    val longMax = BigDecimal(Long.MaxValue)
    // q01 pdt6 (price*disc*tax cents, scale 6): ≤ ~1.3e11/row. Wraps
    // well below a 100 TB group → MUST use the decimal buffer.
    assert(BigDecimal(1.3e11) * rowsAt100TB > longMax)
    // q01 pd4 (scale 4): ≤ ~1.2e9/row — also unsafe at 100 TB.
    assert(BigDecimal(1.2e9) * rowsAt100TB > longMax)
    // q01/q33 p2 (price cents): ≤ 1.1e7/row. Degenerate single group of
    // ALL 100 TB rows still fits, but with <2x headroom in q33's
    // 1/7th-of-lineitem labels only because of the smaller group — q33
    // uses the decimal buffer; q01's 6-way group split leaves >3.7x.
    assert(BigDecimal(1.1e7) * (rowsAt100TB / 6) * 3.7 < longMax)
    // q44 q2 (quantity cents): ≤ 5.1e3/row — >2000x headroom even in
    // the CUBE's ALL cell; primitive long sum is safe.
    assert(BigDecimal(5.1e3) * rowsAt100TB * 2000 < longMax)
  }
}
