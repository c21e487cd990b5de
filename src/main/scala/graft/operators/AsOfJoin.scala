package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: for each left row, attach the payload of the
  * right row with the greatest `rightTime <= leftTime` within the same
  * key (the time-series "latest state at event time" primitive; DuckDB
  * spells it `ASOF JOIN`, which is exactly what the oracle uses).
  *
  * Spark has no built-in as-of join; rather than a custom physical
  * operator, this composes existing ones — union-tag the two sides,
  * then one window pass per key ordered by (time, side-tag) carrying
  * the last non-null right payload forward. Cost: a single shuffle on
  * the key + one sort, the same work a dedicated merge-based as-of
  * operator would do, and it inherits AQE/skew handling for free —
  * the right shape at 100 TB.
  *
  * Requirement: the right side must be unique per (key, time) — ties
  * there are the caller's semantic choice; pre-aggregate first (as
  * the oracle query does with max()).
  */
object AsOfJoin {

  /** @param left      probe side
    * @param right     state side, unique per (key, time)
    * @param leftKey   join key column on `left`
    * @param rightKey  join key column on `right`
    * @param leftTime  event-time column on `left`
    * @param rightTime state-time column on `right`
    * @param payload   right columns to carry (joined as `asof_<name>`)
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // tag 0 sorts state rows before probe rows at equal time → `<=`
    val l = left
      .withColumn("__k", col(leftKey)).withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
    val lPadded = payload.foldLeft(l)((df, p) => df.withColumn(s"__p_$p", lit(null)))
    val r0 = right
      .withColumn("__k", col(rightKey)).withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
    val rPayload = payload.foldLeft(r0)((df, p) => df.withColumn(s"__p_$p", col(p)))
    val unionCols = Seq("__k", "__t", "__tag") ++ leftCols.map(c => c) ++ payload.map(p => s"__p_$p")
    val rPadded = leftCols.foldLeft(rPayload)((df, c) =>
      if (right.columns.contains(c)) df else df.withColumn(c, lit(null)))

    val unioned = lPadded.selectExpr(unionCols: _*)
      .unionByName(rPadded.selectExpr(unionCols: _*))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = payload.foldLeft(unioned)((df, p) =>
      df.withColumn(s"asof_$p", last(col(s"__p_$p"), ignoreNulls = true).over(w)))

    carried.filter(col("__tag") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }
}
