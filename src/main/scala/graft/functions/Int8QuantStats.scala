package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Int8 symmetric quantization statistics over one `array<float>`
  * embedding, in a single primitive pass: per vector scale =
  * 127/max|x| (0 when the vector is all-zero), q_i =
  * floor(x_i·scale + 0.5) clamped to ±127, returning
  * (n_dims, q_sum, q_min, q_max, n_sat).
  *
  * Semantically identical to the composable higher-order-function
  * chain q93 first shipped —
  * `array_max(transform(x, abs(cast double)))` → scale →
  * `transform(...)` → `aggregate`/`array_min`/`array_max`/`aggregate`
  * — with the same double arithmetic per element (float widened to
  * double, floor(·+0.5), clamp in the long domain), but those five
  * expressions each re-traverse the array with per-element lambda
  * frames and materialize the intermediate `qv` array per row; at
  * 100× (12M × 64 dims) the chain measured 34.8 s where this kernel's
  * one JIT-compiled pass needs no intermediate allocation at all.
  * [[Int8QuantStatsSpec]] pins element-for-element equality against
  * the HOF form, including all-zero vectors and saturation edges.
  *
  * The loop lives in [[Int8QuantStats.compute]] — a static helper the
  * generated code calls — so the expression stays inside whole-stage
  * codegen without pasting the loop into Janino source.
  *
  * Nulls: null array → null struct (UnaryExpression default); empty
  * array → (0, 0, null, null, 0), matching `aggregate(empty, 0, …)` /
  * `array_min(empty) = NULL`. Element nulls are not expected in
  * embedding data (primitive float accessor, the Float32Dot
  * contract).
  */
case class Int8QuantStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = Int8QuantStats.schema

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"Int8QuantStats requires array<float> input, got $t")
  }

  override protected def nullSafeEval(a: Any): Any =
    Int8QuantStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.Int8QuantStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Int8QuantStats =
    copy(child = newChild)
}

object Int8QuantStats {

  val schema: StructType = StructType(Seq(
    StructField("n_dims", IntegerType, nullable = false),
    StructField("q_sum", LongType, nullable = false),
    StructField("q_min", LongType, nullable = true),
    StructField("q_max", LongType, nullable = true),
    StructField("n_sat", LongType, nullable = false)))

  def compute(x: ArrayData): InternalRow = {
    val n = x.numElements()
    if (n == 0)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](0, 0L, null, null, 0L))
    var mx = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(x.getFloat(i).toDouble)
      if (a > mx) mx = a
      i += 1
    }
    val scale = if (mx > 0) 127.0 / mx else 0.0
    var sum = 0L
    var mn = Long.MaxValue
    var mxq = Long.MinValue
    var sat = 0L
    i = 0
    while (i < n) {
      val q0 = math.floor(x.getFloat(i).toDouble * scale + 0.5).toLong
      val q = if (q0 < -127L) -127L else if (q0 > 127L) 127L else q0
      sum += q
      if (q < mn) mn = q
      if (q > mxq) mxq = q
      if (q == 127L || q == -127L) sat += 1L
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, sum, mn, mxq, sat))
  }

  /** Column-facing constructor (Spark 4 classic Column↔Expression bridge). */
  def apply(a: Column): Column =
    ColumnBridge.column(Int8QuantStats(ColumnBridge.expression(a)))
}
