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

  test("hand-rolled scanners replicate java.util.regex on 20k fuzzed strings") {
    // pure-JVM fuzz against the regex engine the kernel replaced in
    // r11: sequential replace and original-text counts, byte-for-byte.
    // The alphabet is stacked with boundary/backtracking hazards:
    // digit runs, dots, '@'s, '<EMAIL>'-adjacent word chars, hosts
    // that force TLD backtracking, >4-digit phones, >3-digit octets.
    import java.util.regex.Pattern
    val email = Pattern.compile(PiiStats.EmailRe)
    val phone = Pattern.compile(PiiStats.PhoneRe)
    val ipv4 = Pattern.compile(PiiStats.Ipv4Re)
    def reference(s: String): (String, Int) = {
      var n = 0
      val me = email.matcher(s)
      while (me.find()) n += 1
      val mp = phone.matcher(s)
      while (mp.find()) n += 1
      val mi = ipv4.matcher(s)
      while (mi.find()) n += 1
      val r = ipv4.matcher(
        phone.matcher(
          email.matcher(s).replaceAll("<EMAIL>"))
          .replaceAll("<PHONE>"))
        .replaceAll("<IP>")
      (r, n)
    }
    def kernel(s: String): (String, Int) = {
      val row = PiiStats.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(s))
      (row.getUTF8String(0).toString, row.getInt(1))
    }
    val rng = new scala.util.Random(173)
    val atoms = Vector(
      "555-", "555-1", "555-12345", "a555-9", "555-0x",
      "1.2.3.4", "12.34.56.78", "1234.5.6.7", "1.2.3.4567", "1.2.3",
      "9.9.9.9.9", "...", ".", "-", "@", "@@", "_", "%", "+",
      "a", "zz", "A", "5", "999", "com", ".com", "x.com",
      "a@b.cd", "a@b.c", "x@y.com555-12", "bob@10.0.0.1.example.com",
      "555-1.2.3.4", "a@_b@c.dd", "x@b.c@d.ee", "1.2.3.4@host.com",
      "user.name+tag@mail.example.com", "<EMAIL>", ">", "<",
      "a@b.cde9", "a@b.cd.ef", "a@-.cd", "a@.cd", "@x.cd", "p@q.")
    var trial = 0
    while (trial < 20000) {
      val k = 1 + rng.nextInt(8)
      val sep = if (rng.nextBoolean()) " " else ""
      val s = Seq.fill(k)(atoms(rng.nextInt(atoms.size))).mkString(sep)
      assert(kernel(s) == reference(s), s"fuzz mismatch on: '$s'")
      trial += 1
    }
    // a few fixed shapes fuzz may miss
    for (s <- Seq("", " ", "555-5550", "1.2.1.2.3.4", "ab@c@d.ef",
        "x 555-99@mail.com", "2555-12@x.com", "m@x.com555-1.2.3.4"))
      assert(kernel(s) == reference(s), s"fixed-case mismatch on: '$s'")
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
