package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, TimestampType}

/** Dev probe (r13): which q81 profiler shape is fastest at 100×?
  *   a) per-column scan, mixed distinct+plain agg (the r8 form; the
  *      single distinct makes the planner Expand ×2)
  *   b) per-column scan, count-table two-level agg (no Expand at all)
  *   c) one-scan typed-slot explode (the 8eea13e form, measured 9.8 s)
  * Usage: GRAFT_MAIN=graft.tools.ProbeQ81 tools/run_bench.sh /tmp/sf100
  */
object ProbeQ81 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf100")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = graft.Tables(spark, sfDir).lineitem

    def profA(c: String) =
      li.select(col(c)).agg(
        (count(lit(1)) - count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        min(col(c)).cast(StringType).as("min_s"),
        max(col(c)).cast(StringType).as("max_s"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("min_s"), col("max_s"))

    def profB(c: String) =
      li.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(when(col(c).isNull, col("cnt"))), lit(0L)).as("n_nulls"),
          count(when(col(c).isNotNull, 1)).as("n_distinct"),
          min(col(c)).cast(StringType).as("min_s"),
          max(col(c)).cast(StringType).as("max_s"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("min_s"), col("max_s"))

    def union3(f: String => DataFrame) =
      f("l_orderkey").unionByName(f("l_returnflag")).unionByName(f("l_shipdate"))
        .orderBy(col("column_name"))

    def slotForm: DataFrame = {
      val nullL = lit(null).cast(LongType)
      val nullS = lit(null).cast(StringType)
      val nullT = lit(null).cast(TimestampType)
      val slots = explode(array(
        struct(lit("l_orderkey").as("cn"),
          col("l_orderkey").as("vl"), nullS.as("vs"), nullT.as("vt")),
        struct(lit("l_returnflag").as("cn"),
          nullL.as("vl"), col("l_returnflag").as("vs"), nullT.as("vt")),
        struct(lit("l_shipdate").as("cn"),
          nullL.as("vl"), nullS.as("vs"), col("l_shipdate").as("vt"))))
      val perValue = li.select(slots.as("s"))
        .select(col("s.cn").as("cn"), col("s.vl").as("vl"),
          col("s.vs").as("vs"), col("s.vt").as("vt"))
        .groupBy(col("cn"), col("vl"), col("vs"), col("vt"))
        .agg(count(lit(1)).as("cnt"))
      val isNullVal = col("vl").isNull && col("vs").isNull && col("vt").isNull
      perValue.groupBy(col("cn").as("column_name"))
        .agg(sum(when(isNullVal, col("cnt")).otherwise(0L)).as("n_nulls"),
          count(when(!isNullVal, 1)).as("n_distinct"),
          min(col("vl")).as("min_l"), max(col("vl")).as("max_l"),
          min(col("vs")).as("min_v"), max(col("vs")).as("max_v"),
          min(col("vt")).as("min_t"), max(col("vt")).as("max_t"))
        .select(col("column_name"), col("n_nulls"), col("n_distinct"),
          coalesce(col("min_l").cast(StringType), col("min_v"),
            col("min_t").cast(StringType)).as("min_s"),
          coalesce(col("max_l").cast(StringType), col("max_v"),
            col("max_t").cast(StringType)).as("max_s"))
        .orderBy(col("column_name"))
    }

    def time(label: String, df: => DataFrame): Seq[String] = {
      var best = Double.MaxValue
      var rows: Seq[String] = Nil
      for (_ <- 1 to 2) {
        System.gc()
        val t0 = System.nanoTime()
        rows = df.collect().map(_.toString).toSeq
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"$label%-28s $best%6.2f s")
      rows
    }

    val a = time("A per-col mixed-distinct", union3(profA))
    val b = time("B per-col count-table", union3(profB))
    val c = time("C one-scan typed slots", slotForm)
    println(s"identical: A==B ${a == b}, A==C ${a == c}")
    spark.stop()
  }
}
