package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Set-similarity kernels over pre-hashed, pre-sorted feature arrays.
  *
  * `array_intersect` on string arrays builds a hash set of UTF8Strings
  * per row — per *pair* in a similarity join, which at millions of
  * candidate pairs dominates the whole pipeline (measured ~90% of
  * near-dup verify CPU). Hashing each document's features to sorted
  * longs ONCE (per document, not per pair) turns per-pair work into a
  * primitive merge walk inside whole-stage codegen.
  */
object ArrayKernels {

  /** Count of common elements of two SORTED long arrays (duplicates
    * counted min-wise, like multiset intersection; inputs from
    * `array_sort` of distinct hashes are duplicate-free in practice).
    */
  def sortedLongIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

/** See [[ArrayKernels.sortedLongIntersectCount]]. */
case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint> inputs, got $l / $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.sortedLongIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ArrayKernels.sortedLongIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedLongIntersectCount {
  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(
      SortedLongIntersectCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
