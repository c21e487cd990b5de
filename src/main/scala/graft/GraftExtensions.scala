package graft

import graft.functions.Float32Dot
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions as SQL functions so `spark.sql(...)` users get
  * them too.
  *
  * Usage:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)
  *     // or: .config("spark.sql.extensions", "graft.GraftExtensions")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("float32_dot"),
      new ExpressionInfo(classOf[Float32Dot].getName, "float32_dot"),
      GraftExtensions.mkFloat32Dot))
  }
}

object GraftExtensions {
  private val mkFloat32Dot: Seq[Expression] => Expression = { children =>
    require(children.size == 2, "float32_dot(a, b) takes exactly 2 arguments")
    Float32Dot(children.head, children(1))
  }

  /** Register on an already-running session (builder-time extensions
    * are impossible once a session exists, e.g. shared test sessions
    * or notebooks).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float32_dot", mkFloat32Dot, "built-in")
}
