package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the custom expressions (session-level
  * registry path; the builder-time `withExtensions(new
  * GraftExtensions)` wiring injects the identical factory).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("float32_dot is callable from SQL after registration") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT float32_dot(
        |  array(cast(1.0 as float), cast(2.0 as float)),
        |  array(cast(3.0 as float), cast(4.0 as float))) AS d""".stripMargin)
      .head().getDouble(0)
    assert(r == 11.0)
  }

  test("float32_dot rejects wrong arity and wrong types") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    intercept[Exception] {
      spark.sql("SELECT float32_dot(array(cast(1.0 as float)))").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT float32_dot(array(1.0), array(2.0))").collect() // double arrays
    }
  }

  test("every custom kernel is callable from SQL") {
    val spark = TestSpark.spark
    GraftExtensions.register(spark)
    // text kernels
    assert(spark.sql("SELECT size(char_ngrams_distinct('abcabc', 3)) AS n")
      .head().getInt(0) == 3) // abc, bca, cab (later repeats collapse)
    assert(spark.sql("SELECT size(word_shingles('a b c d', 2)) AS n")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT stopword_hits('the cat and the hat', 'the', 'and') AS n")
      .head().getInt(0) == 3)
    assert(spark.sql("SELECT rolling_hash64('abc') = rolling_hash64('abc') AS eq")
      .head().getBoolean(0))
    // array kernels: intersect of a text's gram hashes with itself = gram count
    val r = spark.sql(
      """SELECT sorted_long_intersect_count(
        |  char_ngram_hashes_sorted('abcdef', 3),
        |  char_ngram_hashes_sorted('abcdef', 3)) AS n,
        |  size(char_ngram_hashes_sorted('abcdef', 3)) AS sz""".stripMargin).head()
    assert(r.getInt(0) == r.getInt(1))
    // positionwise agreement: identical arrays agree everywhere,
    // disjoint ones nowhere
    assert(spark.sql(
      "SELECT long_pos_agree_count(array(1L,2L,3L), array(1L,9L,3L)) AS n")
      .head().getInt(0) == 2)
  }
}
