package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second ring of relational coverage beyond the reference's surface:
  * distinct aggregation, pivot via conditional aggregation, exact
  * moment-based stddev, JSON field extraction, string functions,
  * scalar subqueries, and bucketed histograms — each with a DuckDB
  * oracle under the same determinism contract as
  * [[RelationalQueries]].
  */
object ExtendedQueries {

  private def dec2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(12, 2))
  private def dbl(c: org.apache.spark.sql.Column) = c.cast(DoubleType)

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q35 — distinct aggregation (expands to a two-phase aggregate).
    QueryDef.sql(
      "q35_distinct_agg",
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps,
        |  COUNT(*) AS n_lines
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q36 — pivot as conditional aggregation (wide status × priority).
    QueryDef.sql(
      "q36_pivot_status_priority",
      """SELECT o_orderstatus,
        |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent,
        |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS high,
        |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS medium,
        |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS not_specified,
        |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS low
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      def cnt(p: String) = count(when(col("o_orderpriority") === p, 1))
      Tables(s, dir).orders
        .groupBy(col("o_orderstatus"))
        .agg(
          cnt("1-URGENT").as("urgent"), cnt("2-HIGH").as("high"),
          cnt("3-MEDIUM").as("medium"), cnt("4-NOT SPECIFIED").as("not_specified"),
          cnt("5-LOW").as("low"))
        .orderBy(col("o_orderstatus"))
    },

    // ------------------------------------------------------------------
    // q37 — sample stddev from exact decimal moments: sums are exact
    // decimals, so sqrt((n·Σx² − (Σx)²)/(n·(n−1))) is one deterministic
    // double computation — no order-dependent float accumulation.
    QueryDef.sql(
      "q37_price_stddev",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
        |  SQRT((COUNT(*) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
        |        - CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE))
        |       / (COUNT(*) * (COUNT(*) - 1))) AS stddev_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      val p = dec2(col("l_extendedprice"))
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          dbl(sum(p)).as("sum_price"),
          sqrt((count(lit(1)) * dbl(sum(p * p)) - dbl(sum(p)) * dbl(sum(p)))
            / (count(lit(1)) * (count(lit(1)) - 1))).as("stddev_price"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q38 — JSON field extraction from the events props column.
    QueryDef.sql(
      "q38_json_extract",
      """SELECT event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
        |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      val k = get_json_object(col("props"), "$.k").cast(LongType)
      Tables(s, dir).events
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(k).as("sum_k"), min(k).as("min_k"), max(k).as("max_k"))
        .orderBy(col("event_type"))
    },

    // ------------------------------------------------------------------
    // q39 — string functions: upper/substr/concat/LIKE filter chain.
    QueryDef.sql(
      "q39_string_funcs",
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  substr(p_name, 1, 8) AS name_prefix,
        |  p_brand || ':' || p_type AS brand_type,
        |  CAST(length(p_name) AS INTEGER) AS name_len
        |FROM part
        |WHERE p_type LIKE '%ECO%' OR p_name LIKE 'red%'
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      Tables(s, dir).part
        .filter(col("p_type").like("%ECO%") || col("p_name").like("red%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_uc"),
          substring(col("p_name"), 1, 8).as("name_prefix"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          length(col("p_name")).as("name_len"))
        .orderBy(col("p_partkey"))
    },

    // ------------------------------------------------------------------
    // q40 — scalar subquery + bucketed histogram: order-value decile
    // buckets relative to the global max.
    QueryDef.sql(
      "q40_price_buckets",
      """SELECT CAST(floor(o_totalprice * 10 / (SELECT MAX(o_totalprice) + 0.01 FROM orders)) AS INTEGER) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
        |FROM orders
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      // scalar subquery as a broadcast single-row cross join (keeps the
      // whole plan lazy/distributed — no driver-side action)
      val orders = Tables(s, dir).orders
      val mx = orders.agg((max(col("o_totalprice")) + 0.01).as("mx"))
      orders.crossJoin(broadcast(mx))
        .groupBy(floor(col("o_totalprice") * 10 / col("mx")).cast(IntegerType).as("bucket"))
        .agg(count(lit(1)).as("n"), dbl(sum(dec2(col("o_totalprice")))).as("total"))
        .orderBy(col("bucket"))
    },

    // ------------------------------------------------------------------
    // q41 — exact median (type-2 / midpoint of the two middle order
    // statistics) computed structurally with window row numbers — no
    // engine-specific percentile interpolation semantics involved.
    QueryDef.sql(
      "q41_exact_median",
      """WITH ranked AS (
        |  SELECT l_returnflag, l_extendedprice,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS median_price
        |FROM ranked
        |WHERE 2 * rn = n OR 2 * rn = n + 1 OR 2 * rn = n + 2
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
      val wAll = Window.partitionBy(col("l_returnflag"))
      Tables(s, dir).lineitem
        .select(col("l_returnflag"), col("l_extendedprice"),
          row_number().over(w).as("rn"), count(lit(1)).over(wAll).as("n"))
        .filter(col("rn") * 2 === col("n") || col("rn") * 2 === col("n") + 1 ||
          col("rn") * 2 === col("n") + 2)
        .groupBy(col("l_returnflag"))
        .agg((dbl(sum(dec2(col("l_extendedprice")))) / count(lit(1))).as("median_price"))
        .orderBy(col("l_returnflag"))
    }
  )
}
