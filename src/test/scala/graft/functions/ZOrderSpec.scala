package graft.functions

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class ZOrderSpec extends AnyFunSuite {

  private def naive(a: Long, b: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 32) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("magic-mask interleave equals the per-bit definition") {
    val rng = new scala.util.Random(3)
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (0xffffffffL, 0L),
      (0L, 0xffffffffL), (0xffffffffL, 0xffffffffL)) ++
      Seq.fill(2000)((math.abs(rng.nextLong()) & 0xffffffffL,
        math.abs(rng.nextLong()) & 0xffffffffL))
    cases.foreach { case (a, b) =>
      assert(ZOrderKernel.interleave(a, b) == naive(a, b), s"($a, $b)")
    }
    // inputs above 32 bits are masked, matching the documented domain
    assert(ZOrderKernel.interleave(0x100000001L, 0L) == naive(1L, 0L))
  }

  test("z-sorting clusters both dimensions (the pruning property)") {
    // 64×64 grid sorted by z: every aligned run of 64 rows must span
    // at most an 8×8 rectangle (Morton quadrant property) — a
    // row-major sort would give runs spanning the full 64 of one dim
    val grid = for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)
    val sorted = grid.sortBy { case (x, y) => ZOrderKernel.interleave(x, y) }
    sorted.grouped(64).foreach { run =>
      val xs = run.map(_._1); val ys = run.map(_._2)
      assert(xs.max - xs.min <= 7 && ys.max - ys.min <= 7,
        s"run spans ${xs.max - xs.min} x ${ys.max - ys.min}")
    }
  }

  test("zorder64 is callable from SQL and codegen agrees with eval") {
    val spark = TestSpark.spark
    graft.GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT zorder64(5L, 3L) AS z").head()
    // 5 = 101 at even positions -> 10001; 3 = 11 at odd -> 1010; or = 11011 = 27
    assert(r.getLong(0) == 27L)
  }
}
