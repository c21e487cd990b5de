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
}
