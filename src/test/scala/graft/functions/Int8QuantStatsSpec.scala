package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Int8QuantStats must be element-for-element identical to the
  * composable higher-order-function chain it replaces (q93's original
  * form) — same double arithmetic, same floor(·+0.5) rounding, same
  * clamp-in-long-domain, same empty/zero-vector degenerates.
  */
class Int8QuantStatsSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def hofForm(df: org.apache.spark.sql.DataFrame) = df
    .withColumn("mx",
      array_max(transform(col("embedding"), x => abs(x.cast("double")))))
    .withColumn("scale",
      when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
    .withColumn("qv", transform(col("embedding"), x =>
      greatest(lit(-127L), least(lit(127L),
        floor(x.cast("double") * col("scale") + 0.5).cast("long")))))
    .select(
      col("id"),
      size(col("embedding")).as("n_dims"),
      aggregate(col("qv"), lit(0L), (acc, v) => acc + v).as("q_sum"),
      array_min(col("qv")).as("q_min"),
      array_max(col("qv")).as("q_max"),
      aggregate(col("qv"), lit(0L),
        (acc, v) => acc + when(abs(v) === 127L, 1L).otherwise(0L)).as("n_sat"))

  private def kernelForm(df: org.apache.spark.sql.DataFrame) = df
    .select(col("id"), Int8QuantStats(col("embedding")).as("s"))
    .select(col("id"),
      col("s.n_dims").as("n_dims"), col("s.q_sum").as("q_sum"),
      col("s.q_min").as("q_min"), col("s.q_max").as("q_max"),
      col("s.n_sat").as("n_sat"))

  test("identical to the HOF chain on random vectors, all-zero, negatives, and saturation edges") {
    import spark.implicits._
    val rng = new scala.util.Random(53)
    val rows = Seq.tabulate(300) { i =>
      val n = 1 + rng.nextInt(8)
      val v = Array.fill(n)((rng.nextGaussian() * (i % 7 + 0.1)).toFloat)
      (i.toLong, v)
    } ++ Seq(
      (1000L, Array(0f, 0f, 0f)), // all-zero: scale 0, everything quantizes to 0
      (1001L, Array(-3.5f)), // single negative element: |q| saturates at -127
      (1002L, Array(1e-30f, -1e-30f)), // denormal-scale magnitudes
      (1003L, Array(64f, -64f, 127f, -127f, 1f)))
    val df = rows.toDF("id", "embedding")
    val a = hofForm(df)
    val b = kernelForm(df)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    // saturation sanity on the known row: max-magnitude elements hit ±127
    val r = b.filter(col("id") === 1001L).head()
    assert(r.getLong(2) == -127L && r.getLong(3) == -127L && r.getLong(5) == 1L)
  }

  test("empty array matches aggregate(empty)=0 / array_min(empty)=NULL; null array yields null struct") {
    import spark.implicits._
    val df = Seq((1L, Some(Array.empty[Float])), (2L, None))
      .toDF("id", "embedding")
    val b = kernelForm(df).collect().sortBy(_.getLong(0))
    assert(b(0).getInt(1) == 0 && b(0).getLong(2) == 0L &&
      b(0).isNullAt(3) && b(0).isNullAt(4) && b(0).getLong(5) == 0L)
    assert(b(1).isNullAt(1) && b(1).isNullAt(2))
  }

  test("stays inside whole-stage codegen over a real scan") {
    // a local Seq constant-folds to LocalTableScan (evaluated at plan
    // time), so assert over the parquet-backed shape q93 actually runs
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding"))
    // the simple-string plan marks whole-stage-codegen'd operators
    // with the `*(n)` prefix; the expression must sit in a starred
    // Project, not an interpreted one
    val plan = kernelForm(df).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("int8quantstats") && l.trim.stripPrefix("+- ").startsWith("*(")), plan)
    assert(kernelForm(df).count() > 0)
  }
}
