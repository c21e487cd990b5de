package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** Operators beyond plain relational algebra: as-of join (oracled via
  * DuckDB's native ASOF JOIN) and sketch-based approximate distinct
  * (rows-only check — sketches differ across engines by design; the
  * accuracy contract is tested in ScalaTest against exact counts).
  */
object AdvancedQueries {

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q42 — left as-of join: per event, the most recent order (by
    // order date) of the matching customer. Right side pre-aggregated
    // unique per (key, time) so tie semantics are explicit.
    QueryDef.sql(
      "q42_asof_join",
      """WITH o AS (
        |  SELECT o_custkey AS k, o_orderdate AS t, MAX(o_orderkey) AS okey
        |  FROM orders GROUP BY o_custkey, o_orderdate)
        |SELECT e.event_id, e.user_id, o.okey AS asof_okey, o.t AS asof_t
        |FROM events e ASOF LEFT JOIN o ON e.user_id = o.k AND o.t <= e.ts
        |ORDER BY e.event_id""".stripMargin) { (s, dir) =>
      val t = Tables(s, dir)
      val o = t.orders.groupBy(col("o_custkey").as("k"), col("o_orderdate").as("t"))
        .agg(max(col("o_orderkey")).as("okey"))
      val e = t.events.select(col("event_id"), col("user_id"), col("ts"))
      AsOfJoin.leftAsOf(e, o,
        leftKey = "user_id", rightKey = "k",
        leftTime = "ts", rightTime = "t",
        payload = Seq("okey", "t"))
        .select(col("event_id"), col("user_id"),
          col("asof_okey"), col("asof_t"))
        .orderBy(col("event_id"))
    },

    // ------------------------------------------------------------------
    // q43 — HLL-sketch approximate distinct: engines' sketches differ,
    // so the driver records rows-only; the exact companion columns are
    // hash-checked as q62, and sketch accuracy vs exact is covered in
    // AdvancedOpsSpec.
    QueryDef.rowsOnly("q43_approx_distinct") { (s, dir) =>
      // sketch and exact as two separate aggregations joined on the
      // tiny group key: mixing a distinct agg with non-distinct ones
      // in a single agg forces Expand (2× every input row before the
      // shuffle) — measured 1.6× slower at sf0.1 than two passes over
      // the pruned single-column scan
      val li = Tables(s, dir).lineitem
      val sketch = li.groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
          count(lit(1)).as("n_lines"))
      val exact = li.groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      sketch.join(exact, "l_returnflag")
        .select(col("l_returnflag"), col("approx_parts"), col("exact_parts"), col("n_lines"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q62 — q43's oracled companion: the exact distinct count the
    // sketch approximates, hash-checked against DuckDB. Two-phase
    // distinct aggregation (partial per-key dedup map-side); at scale
    // the sketch path (q43) replaces this when exactness isn't needed.
    QueryDef.sql(
      "q62_distinct_exact",
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(*) AS BIGINT) AS n_lines
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_partkey")).as("exact_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag"))
    },

    // ------------------------------------------------------------------
    // q54 — ANN scale path: IVF cell assignment + top-5 search over
    // each query's 2 nearest cells (nprobe=2 lifts recall at cell
    // boundaries; recall vs the brute-force q30 baseline is asserted
    // in SimilaritySpec). Rows-only (approximate by design).
    QueryDef.rowsOnly("q54_ann_ivf") { (s, dir) =>
      val e = Tables(s, dir).embeddings
      val assigned = SimilarityOps.ivfAssign(e, 16)
      val queries = e.filter(col("vec_id") % 100 === 0)
      SimilarityOps.ivfSearch(assigned, queries, 5,
        SimilarityOps.ivfCentroids(e, 16), nprobe = 2)
        .orderBy(col("qid"), col("rn"))
    },

    // ------------------------------------------------------------------
    // q60 — multimodal featurize end-to-end: corpus wrapped as opaque
    // media rows, partition-local decode stub → fixed-size feature
    // vectors, aggregated per byte-length bucket. Rows-only (the
    // decode stub is engine-internal); the plumbing contracts are
    // specced in MultimodalSpec.
    QueryDef.rowsOnly("q60_multimodal_features") { (s, dir) =>
      val media = graft.multimodal.MultimodalOps.asMedia(Tables(s, dir).documents)
      val feats = graft.multimodal.MultimodalOps.featurize(s, media)
      feats.toDF()
        .groupBy((col("byte_len") / 100).cast("int").as("len_bucket"))
        .agg(
          count(lit(1)).as("n"),
          avg(element_at(col("features"), 1)).as("avg_f1"))
        .orderBy(col("len_bucket"))
    },

    // ------------------------------------------------------------------
    // q61 — embedding near-dup at scale: random-hyperplane LSH buckets
    // → intra-bucket cosine verification (≥ 0.35, the corpus' top
    // tail). The O(n²) form is q31; this is its bucketed scale path.
    // Rows-only (bucket boundaries are engine-internal); recall vs the
    // exhaustive pairs is asserted in SimilaritySpec.
    QueryDef.rowsOnly("q61_embedding_neardup_lsh") { (s, dir) =>
      SimilarityOps.lshNearDupPairs(Tables(s, dir).embeddings, bits = 8, minCos = 0.35)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ------------------------------------------------------------------
    // q55 — GROUPING SETS through the engine's SQL surface: the Spark
    // side runs the IDENTICAL SQL text as the DuckDB oracle over a
    // registered temp view (spark.sql is a first-class entry point,
    // not just the DataFrame API).
    QueryDef.sql(
      "q55_grouping_sets",
      """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY rf, ls""".stripMargin) { (s, dir) =>
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem")
      s.sql(
        """SELECT COALESCE(l_returnflag,'ALL') AS rf, COALESCE(l_linestatus,'ALL') AS ls,
          |  CAST(COUNT(*) AS BIGINT) AS n,
          |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
          |FROM lineitem
          |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
          |ORDER BY rf, ls""".stripMargin)
    }
  )
}
