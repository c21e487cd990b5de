package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Position-ordered double sum over an `array<struct<pos: int,
  * v: double>>` — the per-document ordered-fold contract (q86/q110:
  * double sums must not depend on partition order, so each document
  * folds its values in token-position order) in ONE primitive pass.
  *
  * Byte-identical to the composable form
  * `aggregate(sort_array(arr), 0d, (acc, x) -> acc + x.v)` when `pos`
  * is unique within the array (it is: positions come from posexplode)
  * — sort_array orders the structs by (pos, v) and the fold adds
  * left-to-right; this kernel sorts (pos, index) as packed longs and
  * adds in exactly that order. The composable chain costs an
  * interpreted struct comparator per sort step plus a lambda frame
  * per element; here both collapse into a JIT-compiled loop called
  * from whole-stage codegen, and the caller drops its `sort_array`
  * entirely (the unsorted `collect_list` feeds `size()` just as
  * well). [[PosOrderedSumSpec]] pins the equality on shuffled inputs.
  *
  * Empty array → 0.0 (the fold's zero); null array → null.
  */
case class PosOrderedSum(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(Array(
      StructField(_, IntegerType, _, _), StructField(_, DoubleType, _, _))), _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"PosOrderedSum requires array<struct<int, double>> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    PosOrderedSum.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PosOrderedSum.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): PosOrderedSum =
    copy(child = newChild)
}

object PosOrderedSum {

  def compute(arr: ArrayData): Double = {
    val n = arr.numElements()
    if (n == 0) return 0.0
    // (pos << 32 | index) sorts by pos with the original index riding
    // along; pos is unique per array, so ties never reach the index
    val keys = new Array[Long](n)
    val vs = new Array[Double](n)
    var i = 0
    while (i < n) {
      val st = arr.getStruct(i, 2)
      keys(i) = (st.getInt(0).toLong << 32) | (i.toLong & 0xffffffffL)
      vs(i) = st.getDouble(1)
      i += 1
    }
    java.util.Arrays.sort(keys)
    var sum = 0.0
    i = 0
    while (i < n) {
      sum += vs((keys(i) & 0xffffffffL).toInt)
      i += 1
    }
    sum
  }

  /** Column-facing constructor (Spark 4 classic Column↔Expression bridge). */
  def apply(a: Column): Column =
    ColumnBridge.column(PosOrderedSum(ColumnBridge.expression(a)))
}
