package graft.functions

import graft.TestSpark
import graft.functions.TextFunctions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The byte-level kernels must be bit-identical to the composable
  * higher-order forms they replace — verified over the whole real
  * corpus, not samples, plus handcrafted edge cases.
  */
class TextKernelsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")

  test("CharNgramsDistinct == array_distinct(transform(substr)) on the full corpus") {
    val mismatches = docs.select(
      CharNgramsDistinct(col("text"), 3).as("kernel"),
      array_distinct(charNgrams(col("text"), 3)).as("ref"))
      .filter(col("kernel") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("WordShingles == concat_ws over element_at windows on the full corpus") {
    val mismatches = docs
      .select(col("text"), tokens(col("text")).as("toks"))
      .select(
        WordShingles(col("text"), 3).as("kernel"),
        shinglesFromTokens(col("toks"), 3).as("ref"))
      .filter(col("kernel") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("StopwordHits == size(filter(tokens, isInCollection)) on the full corpus") {
    val words = langStopwords.toMap.apply("en")
    val mismatches = docs.select(
      StopwordHits(col("text"), words).as("kernel"),
      stopwordHits(col("text"), words).as("ref"))
      .filter(col("kernel") =!= col("ref"))
      .count()
    assert(mismatches == 0)
  }

  test("RollingHash64 == pure-Scala Rabin–Karp model; injective on the corpus") {
    def model(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => h * 31L + (b & 0xffL))
    val cases = Seq("", "a", "ab", "a b", "héllo wörld", "日本語", "x" * 5000)
    val got = cases.toDF("text")
      .select(RollingHash64(col("text")).as("h")).as[Long].collect()
    assert(got.toSeq == cases.map(model))
    // injectivity cross-check, the q64 oracle premise: distinct hashes
    // == distinct texts over the full sf0.01 corpus
    val texts = docs.select(countDistinct(col("text"))).head().getLong(0)
    val hashes = docs.select(countDistinct(RollingHash64(col("text")))).head().getLong(0)
    assert(hashes == texts)
    // null flows through (UnaryExpression null-safety)
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(RollingHash64(col("text")).as("h"))
    assert(nulls.head().isNullAt(0))
  }

  test("edge cases: empty, short, consecutive spaces, multi-byte chars") {
    val cases = Seq("", "a", "ab", "abc", "a b", "a b c", "a b c d",
      "a  b c", " leading", "trailing ", "héllo wörld déjà", "日本 語 テスト 文")
    val df = cases.toDF("text").select(col("text"), tokens(col("text")).as("toks"))
    val bad = df.select(
      CharNgramsDistinct(col("text"), 3).as("k1"),
      array_distinct(charNgrams(col("text"), 3)).as("r1"),
      WordShingles(col("text"), 3).as("k2"),
      shinglesFromTokens(col("toks"), 3).as("r2"))
      .filter(col("k1") =!= col("r1") || col("k2") =!= col("r2"))
      .count()
    assert(bad == 0)
  }

  test("CharNgramHashesSorted: sorted, distinct, count matches the string kernel") {
    val bad = docs.select(
      CharNgramHashesSorted(col("text"), 3).as("h"),
      CharNgramsDistinct(col("text"), 3).as("g"))
      .filter(size(col("h")) =!= size(col("g")) ||
        col("h") =!= array_sort(array_distinct(col("h"))))
      .count()
    assert(bad == 0)
  }

  test("SortedLongIntersectCount == size(array_intersect) on hashed corpus grams") {
    val hashed = docs.select(
      array_sort(transform(CharNgramsDistinct(col("text"), 3), g => xxhash64(g))).as("h"))
    val pairs = hashed.limit(50).crossJoin(
      hashed.limit(50).select(col("h").as("h2")))
    val bad = pairs.select(
      SortedLongIntersectCount(col("h"), col("h2")).as("kernel"),
      size(array_intersect(col("h"), col("h2"))).as("ref"))
      .filter(col("kernel") =!= col("ref"))
      .count()
    assert(bad == 0)
  }

  test("SubwordCount == size(regexp_extract_all) on the full corpus; SpaceTokenCount == size(split)") {
    val pat = lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
    val mismatches = docs.select(
      SubwordCount(col("text")).as("k1"),
      size(regexp_extract_all(col("text"), pat, lit(0))).as("r1"),
      SpaceTokenCount(col("text")).as("k2"),
      size(split(col("text"), " ")).as("r2"))
      .filter(col("k1") =!= col("r1") || col("k2") =!= col("r2"))
      .count()
    assert(mismatches == 0)
  }

  test("SubwordCount fuzz vs java.util.regex, ASCII + multi-byte + supplementary") {
    val rng = new scala.util.Random(46513)
    val alphabet: Array[String] =
      (('a' to 'e') ++ ('A' to 'C') ++ ('0' to '3')).map(_.toString).toArray ++
        Array(" ", "  ", ".", ",", "!", "-", "é", "ß", "日", "語", "\t", "\n",
          new String(Character.toChars(0x1F600)), // supplementary: one code point
          new String(Character.toChars(0x10348)))
    val pattern = java.util.regex.Pattern.compile("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]")
    def model(s: String): Int = {
      val m = pattern.matcher(s)
      var c = 0
      while (m.find()) c += 1
      c
    }
    val cases = ("" +: "a" +: " " +: "é" +: (1 to 400).map { _ =>
      (0 until rng.nextInt(60)).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
    }).distinct
    val got = cases.toDF("text")
      .select(col("text"), SubwordCount(col("text")).as("k"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    cases.foreach { s =>
      assert(got(s) == model(s), s"subwordCount mismatch on ${s.getBytes("UTF-8").mkString(",")}")
    }
    // null flows through
    val nulls = Seq[Option[String]](None).toDF("text")
      .select(SubwordCount(col("text")).as("k"), SpaceTokenCount(col("text")).as("t"))
    assert(nulls.head().isNullAt(0) && nulls.head().isNullAt(1))
  }

  test("kernels are callable from SQL after registration") {
    graft.GraftExtensions.register(spark)
    docs.limit(5).createOrReplaceTempView("tk_docs")
    val n = spark.sql(
      "SELECT size(char_ngrams_distinct(text, 3)) AS a, size(word_shingles(text, 3)) AS b FROM tk_docs")
      .collect()
    assert(n.forall(r => r.getInt(0) > 0 && r.getInt(1) > 0))
  }
}
