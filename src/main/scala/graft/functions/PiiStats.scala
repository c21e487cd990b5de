package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII redaction + match count for q73 — the same THREE
  * patterns, applied in the same order (email → phone → IPv4, so an
  * email's host part can't be half-eaten by the IP rule), with all
  * counts taken on the ORIGINAL text exactly like the oracle's three
  * `regexp_extract_all` legs. Byte-identical to the composed Column
  * form `regexp_replace(regexp_replace(regexp_replace(t, …)))` +
  * `regexp_count(t, …)×3` ([[PiiStatsSpec]] pins it on overlapping,
  * adversarial, AND fuzzed inputs) — but one expression instead of
  * six, and since r11 the five passes run as HAND-ROLLED scanners
  * that replicate the java.util.regex/RE2 match semantics of these
  * specific patterns (leftmost-first attempts, greedy quantifiers
  * with the exact backtracking each pattern admits, ASCII \b) with
  * none of the generic engine's per-char interpreter overhead or
  * Matcher allocations. The patterns are simple enough that the
  * backtracking is closed-form: a maximal digit/class run either
  * satisfies the following literal or the whole attempt fails (see
  * each scanner's notes) — so every scanner is one linear pass.
  * Measured at 100× (6M documents): 17.3 s isolated with
  * java.util.regex → 2.7 s with the scanners (DuckDB's RE2 runs the
  * same corpus in 2.6 s — the generic regex interpreter WAS the
  * floor, not the plan).
  *
  * Null text → null struct (UnaryExpression default).
  */
case class PiiStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = PiiStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"PiiStats requires string input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    PiiStats.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PiiStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): PiiStats =
    copy(child = newChild)
}

object PiiStats {

  /** The q73 pattern set — RE2 ∩ java.util.regex common dialect, so
    * the DuckDB oracle applies the identical expressions (kept in
    * lock-step with the literals in q73's oracle SQL).
    */
  val EmailRe = """[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val PhoneRe = """\b555-[0-9]{1,4}\b"""
  val Ipv4Re = """\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"""

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_pii", IntegerType, nullable = false)))

  // ASCII \b word class ([a-zA-Z0-9_] — java.util.regex default and
  // RE2's \b, so both engines' boundaries agree)
  private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'
  private def isLower(c: Char): Boolean = c >= 'a' && c <= 'z'
  // email local-part class [a-z0-9._%+-] (lowercase only, like the
  // pattern) and host class [a-z0-9.-]
  private def isLocal(c: Char): Boolean =
    isLower(c) || isDigit(c) || c == '.' || c == '_' || c == '%' ||
      c == '+' || c == '-'
  private def isHost(c: Char): Boolean =
    isLower(c) || isDigit(c) || c == '.' || c == '-'

  /** Growable (start, end) span list — primitive ints, no boxing. */
  private final class Spans {
    var a: Array[Int] = new Array[Int](16)
    var n: Int = 0
    def add(s: Int, e: Int): Unit = {
      if (n + 2 > a.length) a = java.util.Arrays.copyOf(a, a.length * 2)
      a(n) = s; a(n + 1) = e; n += 2
    }
    def count: Int = n / 2
  }

  /** `[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}` — exact semantics notes:
    * the local run is maximal (its class excludes '@', so greedy
    * backtracking can never expose the required '@' anywhere but at
    * the run's end), the host run is maximal, and host backtracking
    * reduces to "rightmost '.' inside the host run followed by ≥2
    * lowercase letters" (the TLD's greedy letter run then ends the
    * match). A failed attempt at a local run's start fails for every
    * later start inside the same run (same '@', same host), so the
    * scan resumes after the '@' — exactly where the regex engine's
    * next productive attempt lands.
    */
  private def scanEmails(s: String, out: Spans): Unit = {
    val len = s.length
    var i = 0
    while (i < len) {
      if (isLocal(s.charAt(i))) {
        var runEnd = i + 1
        while (runEnd < len && isLocal(s.charAt(runEnd))) runEnd += 1
        if (runEnd < len && s.charAt(runEnd) == '@') {
          val hostStart = runEnd + 1
          var hostEnd = hostStart
          while (hostEnd < len && isHost(s.charAt(hostEnd))) hostEnd += 1
          // rightmost '.' with ≥2 lowercase letters after it, all
          // inside the host run (letters are host chars, so the
          // letter run cannot cross hostEnd)
          var matched = false
          var d = hostEnd - 1
          while (!matched && d > hostStart) {
            if (s.charAt(d) == '.') {
              var t = d + 1
              while (t < hostEnd && isLower(s.charAt(t))) t += 1
              if (t - d - 1 >= 2) { out.add(i, t); i = t; matched = true }
            }
            if (!matched) d -= 1
          }
          if (!matched) i = hostStart
        } else i = runEnd + 1
      } else i += 1
    }
  }

  /** `\b555-[0-9]{1,4}\b` — the digit run after "555-" is maximal;
    * taking fewer than all of it leaves a digit (a word char) at the
    * boundary, so the only viable take is the full run, viable iff
    * its length is 1..4 and the next char is non-word.
    */
  private def scanPhones(s: String, out: Spans): Unit = {
    val len = s.length
    var i = s.indexOf("555-")
    while (i >= 0) {
      var next = i + 1
      if (i == 0 || !isWord(s.charAt(i - 1))) {
        var j = i + 4
        while (j < len && isDigit(s.charAt(j))) j += 1
        val digits = j - (i + 4)
        if (digits >= 1 && digits <= 4 && (j == len || !isWord(s.charAt(j)))) {
          out.add(i, j)
          next = j
        }
      }
      i = s.indexOf("555-", next)
    }
  }

  /** `\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b` — each
    * octet's digit run is maximal (shorter takes leave a digit where
    * '.' or \b is required), so an attempt either consumes exactly
    * (run, '.', run, '.', run, '.', run) with every run 1–3 digits
    * and a non-word char after, or fails. Failed attempts resume at
    * the next \b-preceded digit, same as the engine's leftmost scan.
    */
  private def scanIpv4(s: String, out: Spans): Unit = {
    val len = s.length
    var i = 0
    while (i < len) {
      if (isDigit(s.charAt(i)) && (i == 0 || !isWord(s.charAt(i - 1)))) {
        var ok = true
        var p = i
        var oct = 0
        while (ok && oct < 4) {
          var j = p
          while (j < len && isDigit(s.charAt(j))) j += 1
          val digits = j - p
          if (digits < 1 || digits > 3) ok = false
          else if (oct < 3) {
            if (j < len && s.charAt(j) == '.') p = j + 1 else ok = false
          } else {
            if (j == len || !isWord(s.charAt(j))) p = j else ok = false
          }
          oct += 1
        }
        if (ok) { out.add(i, p); i = p } else i += 1
      } else i += 1
    }
  }

  /** Splice `token` over every span (spans are disjoint, ascending). */
  private def replaceSpans(s: String, spans: Spans, token: String): String = {
    if (spans.n == 0) return s
    val sb = new java.lang.StringBuilder(
      s.length + spans.count * (token.length + 2))
    var prev = 0
    var k = 0
    while (k < spans.n) {
      sb.append(s, prev, spans.a(k)).append(token)
      prev = spans.a(k + 1)
      k += 2
    }
    sb.append(s, prev, s.length)
    sb.toString
  }

  def compute(t: UTF8String): InternalRow = {
    val s = t.toString
    // email: count and replace from the same scan (counts are over
    // the original text, and this pass IS over the original text)
    val em = new Spans
    scanEmails(s, em)
    var n = em.count
    // phone/IP counts must scan the ORIGINAL text (the oracle's
    // regexp_extract_all legs do), not the post-email-replace string
    val pc = new Spans
    scanPhones(s, pc)
    n += pc.count
    val ic = new Spans
    scanIpv4(s, ic)
    n += ic.count
    // sequential replacement passes — phone over the email-redacted
    // text, IP over the phone-redacted text, boundary effects of the
    // inserted tokens included, exactly like the composed regex form
    val r1 = replaceSpans(s, em, "<EMAIL>")
    val ph = new Spans
    scanPhones(r1, ph)
    val r2 = replaceSpans(r1, ph, "<PHONE>")
    val ip = new Spans
    scanIpv4(r2, ip)
    val r3 = replaceSpans(r2, ip, "<IP>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(r3), n))
  }

  /** Column-facing constructor (Spark 4 classic Column↔Expression bridge). */
  def apply(a: Column): Column =
    ColumnBridge.column(PiiStats(ColumnBridge.expression(a)))
}
