package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII redaction + match count for q73 — the same THREE
  * java.util.regex patterns, applied in the same order (email →
  * phone → IPv4, so an email's host part can't be half-eaten by the
  * IP rule), with all counts taken on the ORIGINAL text exactly like
  * the oracle's three `regexp_extract_all` legs. Byte-identical to
  * the composed Column form
  * `regexp_replace(regexp_replace(regexp_replace(t, …)))` +
  * `regexp_count(t, …)×3` ([[PiiStatsSpec]] pins it on overlapping
  * and adversarial inputs) — but one expression instead of six: the
  * text converts UTF8String→String ONCE instead of six times, the
  * email pass counts while it replaces, and no intermediate
  * UTF8String results materialize between passes. Five regex scans
  * instead of six, and none of the per-expression conversion /
  * allocation overhead — the difference at 100× (6M documents) is
  * the bulk of q73's isolated floor.
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

  private val Email = Pattern.compile(EmailRe)
  private val Phone = Pattern.compile(PhoneRe)
  private val Ipv4 = Pattern.compile(Ipv4Re)

  val schema: StructType = StructType(Seq(
    StructField("redacted", StringType, nullable = false),
    StructField("n_pii", IntegerType, nullable = false)))

  def compute(t: UTF8String): InternalRow = {
    val s = t.toString
    var n = 0
    // email: count and replace in the same scan (counts are over the
    // original text, and this pass IS over the original text)
    val me = Email.matcher(s)
    val sb = new java.lang.StringBuilder(s.length + 16)
    while (me.find()) { n += 1; me.appendReplacement(sb, "<EMAIL>") }
    me.appendTail(sb)
    val r1 = sb.toString
    // phone/IP counts must scan the ORIGINAL text (the oracle's
    // regexp_extract_all legs do), not the post-email-replace string
    val mp = Phone.matcher(s)
    while (mp.find()) n += 1
    val mi = Ipv4.matcher(s)
    while (mi.find()) n += 1
    val r2 = Phone.matcher(r1).replaceAll("<PHONE>")
    val r3 = Ipv4.matcher(r2).replaceAll("<IP>")
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(r3), n))
  }

  /** Column-facing constructor (Spark 4 classic Column↔Expression bridge). */
  def apply(a: Column): Column =
    ColumnBridge.column(PiiStats(ColumnBridge.expression(a)))
}
