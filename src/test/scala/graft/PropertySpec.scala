package graft

import graft.flight.FlightModel.Zone
import graft.flight.FlightExtract
import graft.functions.Geo
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based invariants (SURVEY.md §5.3): haversine metric
  * properties, quadtree tiling, dedup idempotence. ScalaCheck driven
  * directly (no scalatest bridge in the offline dependency set).
  */
class PropertySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def check(prop: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val latGen = Gen.chooseNum(-89.0, 89.0)
  private val lonGen = Gen.chooseNum(-179.0, 179.0)

  test("haversine: zero at identity, symmetric, bounded by half circumference") {
    check(Prop.forAll(latGen, lonGen, latGen, lonGen) { (la1, lo1, la2, lo2) =>
      val df = Seq((la1, lo1, la2, lo2)).toDF("la1", "lo1", "la2", "lo2")
      val row = df.select(
        Geo.haversineKm(col("la1"), col("lo1"), col("la2"), col("lo2")),
        Geo.haversineKm(col("la2"), col("lo2"), col("la1"), col("lo1")),
        Geo.haversineKm(col("la1"), col("lo1"), col("la1"), col("lo1")))
        .head()
      val (dAB, dBA, dAA) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      dAA == 0.0 && math.abs(dAB - dBA) < 1e-6 &&
        dAB >= 0 && dAB <= math.Pi * 6371 + 1
    }, n = 15)
  }

  test("divideZone: children tile the parent and halve each dimension") {
    val zoneGen = for {
      tlY <- Gen.chooseNum(-80.0, 80.0)
      brY <- Gen.chooseNum(-89.0, -81.0)
      tlX <- Gen.chooseNum(-170.0, 160.0)
      w <- Gen.chooseNum(0.1, 19.0)
    } yield Zone(tlY, tlX, brY, tlX + w)
    check(Prop.forAll(zoneGen) { z =>
      val subs = FlightExtract.divideZone(z)
      subs.size == 4 &&
        subs.map(_.tlY).max == z.tlY && subs.map(_.brY).min == z.brY &&
        subs.map(_.tlX).min == z.tlX && subs.map(_.brX).max == z.brX &&
        subs.forall(s =>
          math.abs((s.tlY - s.brY) - (z.tlY - z.brY) / 2) < 1e-9 &&
            math.abs((s.brX - s.tlX) - (z.brX - z.tlX) / 2) < 1e-9)
    }, n = 50)
  }

  test("dropDuplicates is idempotent and keys are unique after dedup") {
    check(Prop.forAll(Gen.listOfN(60, Gen.chooseNum(0, 15))) { keys =>
      val df = keys.zipWithIndex.map { case (k, i) => (s"id$k", i) }.toDF("id", "v")
      val once = df.dropDuplicates("id")
      once.count() == keys.distinct.size.toLong &&
        once.dropDuplicates("id").count() == once.count() &&
        once.select("id").distinct().count() == once.count()
    }, n = 10)
  }

  // --- text/array kernels: JVM-direct properties against pure-Scala
  // reference models (hundreds of samples, no Spark job per case) ---

  import graft.functions.{ArrayKernels, TextKernels}
  import org.apache.spark.unsafe.types.UTF8String

  private val wordGen = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(5).mkString)
  private val textGen = Gen.listOfN(12, wordGen).map(_.mkString(" "))
    .flatMap(t => Gen.oneOf(t, t + " ", " " + t, t.replace(" ", "  ")))

  private def longs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[Long] =
    (0 until a.numElements()).map(a.getLong)
  private def strs(a: org.apache.spark.sql.catalyst.util.ArrayData): Seq[String] =
    (0 until a.numElements()).map(i => a.getUTF8String(i).toString)

  test("wordShingles kernel == split/sliding/mkString model on arbitrary spacing") {
    check(Prop.forAll(textGen) { t =>
      val toks = t.split(" ", -1).toSeq
      val expected = if (toks.size < 3) Seq.empty
        else toks.sliding(3).map(_.mkString(" ")).toSeq
      strs(TextKernels.wordShingles(UTF8String.fromString(t), 3)) == expected
    }, n = 200)
  }

  test("charNgramsDistinct kernel == sliding.distinct model incl. multi-byte chars") {
    val uniGen = Gen.listOfN(10, Gen.oneOf("a", "é", "日", " ", "b")).map(_.mkString)
    check(Prop.forAll(uniGen) { t =>
      val expected = if (t.length < 3) Seq.empty
        else t.sliding(3).toSeq.distinct
      strs(TextKernels.charNgramsDistinct(UTF8String.fromString(t), 3)) == expected
    }, n = 200)
  }

  test("stopwordHits kernel == count of member tokens") {
    val words = Seq("the", "a", "of")
    val set = new java.util.HashSet[UTF8String]()
    words.foreach(w => set.add(UTF8String.fromString(w)))
    check(Prop.forAll(textGen) { t =>
      val expected = t.split(" ", -1).count(words.contains)
      TextKernels.stopwordHits(UTF8String.fromString(t), set) == expected
    }, n = 200)
  }

  test("charNgramHashesSorted: sorted, distinct, cardinality matches distinct grams") {
    check(Prop.forAll(textGen) { t =>
      val hs = longs(ArrayKernels.charNgramHashesSorted(UTF8String.fromString(t), 3))
      val expectedCard = if (t.length < 3) 0 else t.sliding(3).toSeq.distinct.size
      hs == hs.sorted && hs.distinct == hs && hs.size == expectedCard
    }, n = 200)
  }

  test("sortedLongIntersectCount == set-intersection cardinality") {
    val setGen = Gen.listOf(Gen.chooseNum(-50L, 50L)).map(_.distinct.sorted)
    check(Prop.forAll(setGen, setGen) { (a, b) =>
      val ad = new org.apache.spark.sql.catalyst.util.GenericArrayData(a.toArray[Any])
      val bd = new org.apache.spark.sql.catalyst.util.GenericArrayData(b.toArray[Any])
      ArrayKernels.sortedLongIntersectCount(ad, bd) == a.toSet.intersect(b.toSet).size
    }, n = 300)
  }
}
