package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PiiStats must be byte-identical to the composed Column form q73
  * first shipped: three sequential regexp_replace passes for the
  * redaction, three regexp_count legs over the ORIGINAL text for the
  * count — including inputs where the patterns overlap or where an
  * earlier replace destroys a later pattern's match.
  */
class PiiStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def composed(df: org.apache.spark.sql.DataFrame) = df.select(
    col("id"),
    regexp_replace(regexp_replace(regexp_replace(col("t"),
      lit(PiiStats.EmailRe), lit("<EMAIL>")),
      lit(PiiStats.PhoneRe), lit("<PHONE>")),
      lit(PiiStats.Ipv4Re), lit("<IP>")).as("redacted"),
    (regexp_count(col("t"), lit(PiiStats.EmailRe))
      + regexp_count(col("t"), lit(PiiStats.PhoneRe))
      + regexp_count(col("t"), lit(PiiStats.Ipv4Re))).cast("int").as("n_pii"))

  private def fused(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), PiiStats(col("t")).as("p"))
    .select(col("id"), col("p.redacted").as("redacted"), col("p.n_pii").as("n_pii"))

  test("identical to the composed regexp form on adversarial and random text") {
    import spark.implicits._
    val rng = new scala.util.Random(59)
    val words = Vector("alpha", "beta", "10.0.3.7", "x@y.zz", "555-01",
      "user.name+tag@mail.example.com", "1.2.3.4.5", "555-12345", "a@b",
      "contact", "999.999.999.999", "@@", "call", ".com", "a@b.c", "a@b.cd")
    val rows = Seq.tabulate(400) { i =>
      val n = rng.nextInt(30)
      (i.toLong, Seq.fill(n)(words(rng.nextInt(words.size))).mkString(" "))
    } ++ Seq(
      // email whose host contains an IP-shaped substring: the email
      // replace destroys the IP match, but the count leg still sees it
      (1000L, "mail me at bob@10.0.0.1.example.com now"),
      // phone adjacent to an IP, both countable on the original text
      (1001L, "555-1.2.3.4 and 5.6.7.8"),
      // multiple emails in one line
      (1002L, "a@b.cc c@d.ee"),
      (1003L, ""),
      (1004L, "no pii here at all"))
    val df = rows.toDF("id", "t")
    val a = composed(df)
    val b = fused(df)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // the adversarial row really exercises the original-text-count
    // contract: redaction removed the IP but the count still has it
    val r = b.filter(col("id") === 1000L).head()
    assert(r.getString(1).contains("<EMAIL>") && !r.getString(1).contains("<IP>"))
    assert(r.getInt(2) == 2) // email + the IP inside its host
  }

  test("stays inside whole-stage codegen over a real scan") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text").as("t"))
    val plan = fused(df).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("piistats") && l.trim.stripPrefix("+- ").startsWith("*(")), plan)
    assert(fused(df).count() > 0)
  }
}
