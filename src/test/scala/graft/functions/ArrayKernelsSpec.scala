package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[OrderedLongPairs]] must emit exactly the multiset of pairs the
  * explode×explode + `pa < pb` form it replaces produced (q128's
  * r7–r13 plan) — verified over every real basket of the sf0.01
  * lineitem, plus handcrafted edge cases the corpus can't cover.
  */
class ArrayKernelsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("OrderedLongPairs == explode×explode + filter over all sf0.01 baskets") {
    val baskets = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))
    def key(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("c"))
    val kernel = key(baskets
      .select(explode(OrderedLongPairs(col("parts"))).as("p"))
      .select(col("p.pa").as("pa"), col("p.pb").as("pb")))
    val ref = key(baskets
      .select(explode(col("parts")).as("pa"), col("parts"))
      .select(col("pa"), explode(col("parts")).as("pb"))
      .filter(col("pa") < col("pb")))
    assert(kernel.exceptAll(ref).isEmpty && ref.exceptAll(kernel).isEmpty,
      "kernel pair multiset diverges from the explode×explode reference")
  }

  test("OrderedLongPairs edge cases: empty, singleton, unsorted input, nulls") {
    def pairs(arr: Seq[java.lang.Long]): Seq[(Long, Long)] =
      Seq(arr).toDF("parts")
        .select(explode(OrderedLongPairs(col("parts"))).as("p"))
        .select(col("p.pa"), col("p.pb")).as[(Long, Long)].collect().toSeq
    assert(pairs(Seq.empty) == Seq.empty)
    assert(pairs(Seq(7L)) == Seq.empty)
    // sorts internally: collect_set order is partition-dependent
    assert(pairs(Seq(5L, 1L, 3L)) == Seq((1L, 3L), (1L, 5L), (3L, 5L)))
    assert(pairs(Seq(null, 2L, null, 9L)) == Seq((2L, 9L)))
    // null array -> null result (UnaryExpression null propagation)
    val n = Seq(Option.empty[Seq[Long]]).toDF("parts")
      .select(OrderedLongPairs(col("parts")).as("p"))
      .filter(col("p").isNull).count()
    assert(n == 1L)
  }
}
