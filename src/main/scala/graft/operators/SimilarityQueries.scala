package graft.operators

import graft.{QueryDef, Tables}
import graft.functions.VectorFunctions
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.FloatType

/** Embedding similarity search over `embeddings` (`array<float>`,
  * 64-dim). The oracle-checked baseline is brute-force cosine; the
  * scale paths (IVF partitioned search, random-hyperplane LSH) live in
  * [[graft.operators.SimilarityOps]] and are validated by recall
  * tests against this baseline rather than an oracle.
  *
  * Determinism: element products are float32-exact, widened to double
  * and summed sequentially on both engines; the final cosine is cast
  * to FLOAT so a last-ulp double difference cannot flip a hash or a
  * rank (rank tiebreak on neighbor id).
  */
object SimilarityQueries {

  private val dim = 64

  /** DuckDB mirror of [[graft.functions.Float32Dot]]: per-element
    * float32 product (REAL×REAL) widened to DOUBLE, summed
    * left-to-right. Shared with the ANN scale-path oracles
    * ([[AdvancedQueries]] q54/q61).
    */
  private[operators] def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,${dim + 1}), i -> CAST($a[i]*$b[i] AS DOUBLE)))"

  private[operators] def cosSql(a: String, b: String): String =
    s"CAST(${dotSql(a, b)} / sqrt(${dotSql(a, a)} * ${dotSql(b, b)}) AS REAL)"

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // q30 — brute-force cosine top-5 for a deterministic query subset.
    QueryDef.sql(
      "q30_cosine_topk",
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id % 100 = 0),
         |n AS (SELECT vec_id AS nid, embedding AS nv FROM embeddings),
         |s AS (SELECT qid, nid, ${cosSql("qv", "nv")} AS cos
         |      FROM q JOIN n ON qid <> nid)
         |SELECT qid, nid, cos FROM (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, nid) AS rn FROM s)
         |WHERE rn <= 5 ORDER BY qid, rn""".stripMargin) { (s, dir) =>
      // norms computed once per vector, not once per pair (arithmetic
      // identical: dot/sqrt(nsq_q * nsq_n))
      val e = Tables(s, dir).embeddings
        .withColumn("nsq", VectorFunctions.normSq(col("embedding")))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"), col("nsq").as("qnsq"))
      val n = e.select(col("vec_id").as("nid"), col("embedding").as("nv"), col("nsq").as("nnsq"))
      val scored = q.join(n, col("qid") =!= col("nid"))
        .select(col("qid"), col("nid"),
          (VectorFunctions.dot(col("qv"), col("nv")) / sqrt(col("qnsq") * col("nnsq")))
            .cast(FloatType).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
      scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .select("qid", "nid", "cos")
        .orderBy(col("qid"), col("rn"))
    },

    // ------------------------------------------------------------------
    // q31 — all high-similarity pairs (cos ≥ 0.35, the top tail of
    // this corpus): the embedding near-dup primitive.
    QueryDef.sql(
      "q31_embedding_sim_pairs",
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |  ${cosSql("a.embedding", "b.embedding")} AS cos
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.35
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      val e = Tables(s, dir).embeddings
        .withColumn("nsq", VectorFunctions.normSq(col("embedding")))
      val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"), col("nsq").as("ansq"))
      val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"), col("nsq").as("bnsq"))
      a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          (VectorFunctions.dot(col("va"), col("vb")) / sqrt(col("ansq") * col("bnsq")))
            .cast(FloatType).as("cos"))
        .filter(col("cos") >= 0.35)
        .orderBy(col("id_a"), col("id_b"))
    },

    // ------------------------------------------------------------------
    // q79 — one k-means refinement step: assign every vector to its
    // nearest centroid (the q54 IVF assignment), then recompute each
    // centroid as the per-dimension mean of its members. The mean is
    // order-deterministic: member values are collected per (cell, dim)
    // sorted by vec_id and summed left-to-right in double (the same
    // contract DuckDB's ordered list(...) + list_sum has), one final
    // division, float32 cast. This is the "train the IVF model"
    // iteration [[SimilarityOps.ivfCentroids]] stands in for.
    //
    // Scale: assignment is a broadcast cross join against k centroids;
    // the update aggregates (cell, dim) groups — k×dim cells, each a
    // bounded list. At real scale the ordered-collect becomes a
    // two-phase decimal/Kahan mergeable aggregate; the demo working
    // set is capped at vec_id < 5000 (flat cost across SF) so the
    // ordered form stays cheap — the PLAN (broadcast assign +
    // map-side-combinable update) is the 100 TB shape.
    QueryDef.sql(
      "q79_kmeans_step", {
        val k = 8
        s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5000),
           |cen AS (SELECT vec_id AS cid, embedding AS cv FROM e WHERE vec_id < $k),
           |asg AS (
           |  SELECT vec_id, embedding, cell FROM (
           |    SELECT e.vec_id, e.embedding, cen.cid AS cell, ROW_NUMBER() OVER (
           |      PARTITION BY e.vec_id
           |      ORDER BY ${cosSql("e.embedding", "cen.cv")} DESC, cen.cid) AS rn
           |    FROM e CROSS JOIN cen) WHERE rn = 1),
           |x AS (
           |  SELECT cell, vec_id, CAST(i - 1 AS INTEGER) AS dim, embedding[i] AS v
           |  FROM asg CROSS JOIN (SELECT unnest(range(1, $dim + 1)) AS i)),
           |g AS (SELECT cell, dim, list(v ORDER BY vec_id) AS vals FROM x GROUP BY cell, dim)
           |SELECT cell, dim, CAST(len(vals) AS INTEGER) AS n,
           |  CAST(list_sum(list_transform(vals, y -> CAST(y AS DOUBLE))) / len(vals) AS REAL) AS c
           |FROM g ORDER BY cell, dim""".stripMargin
      }) { (s, dir) =>
      val e = Tables(s, dir).embeddings.filter(col("vec_id") < 5000)
      val assigned = SimilarityOps.ivfAssign(e, 8)
      assigned
        .select(col("cell"), col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cell"), col("dim"))
        .agg(sort_array(collect_list(struct(col("vec_id"), col("v")))).as("vals"))
        .select(col("cell"), col("dim"),
          size(col("vals")).as("n"),
          (aggregate(col("vals"), lit(0.0),
            (acc, x) => acc + x.getField("v").cast("double")) / size(col("vals")))
            .cast(FloatType).as("c"))
        .orderBy(col("cell"), col("dim"))
    },

    // ------------------------------------------------------------------
    // q93 — int8 symmetric vector quantization (the compression step a
    // 100 TB ANN index runs before storage: 4× smaller than float32,
    // SIMD-friendly integer dot products). Per vector: scale =
    // 127/max|x|, q_i = floor(x_i·scale + 0.5) clamped to ±127 —
    // floor(·+0.5) instead of round() so both engines share one
    // rounding rule. Output is integer-only (sum/min/max/saturation
    // count) so the cross-engine hash is exact; reconstruction
    // fidelity (cosine ≥ 0.999 vs float32) is pinned in
    // SimilaritySpec. Pure map-side projection — no shuffle.
    QueryDef.sql(
      "q93_int8_quantize",
      """WITH m AS (SELECT vec_id, embedding AS v,
        |  list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS mx
        |  FROM embeddings),
        |q AS (SELECT vec_id, v,
        |  CASE WHEN mx > 0 THEN 127.0/mx ELSE 0.0 END AS scale FROM m),
        |z AS (SELECT vec_id, len(v) AS n_dims,
        |  list_transform(v, x -> greatest(-127, least(127,
        |    CAST(floor(CAST(x AS DOUBLE)*scale + 0.5) AS BIGINT)))) AS qv
        |  FROM q)
        |SELECT vec_id, CAST(n_dims AS INTEGER) AS n_dims,
        |  CAST(list_aggregate(qv, 'sum') AS BIGINT) AS q_sum,
        |  CAST(list_aggregate(qv, 'min') AS BIGINT) AS q_min,
        |  CAST(list_aggregate(qv, 'max') AS BIGINT) AS q_max,
        |  CAST(len(list_filter(qv, x -> abs(x) = 127)) AS BIGINT) AS n_sat
        |FROM z ORDER BY vec_id""".stripMargin) { (s, dir) =>
      Tables(s, dir).embeddings
        .withColumn("mx",
          array_max(transform(col("embedding"), x => abs(x.cast("double")))))
        .withColumn("scale",
          when(col("mx") > 0, lit(127.0) / col("mx")).otherwise(lit(0.0)))
        .withColumn("qv", transform(col("embedding"), x =>
          greatest(lit(-127L), least(lit(127L),
            floor(x.cast("double") * col("scale") + 0.5).cast("long")))))
        .select(
          col("vec_id"),
          size(col("embedding")).as("n_dims"),
          aggregate(col("qv"), lit(0L), (acc, v) => acc + v).as("q_sum"),
          array_min(col("qv")).as("q_min"),
          array_max(col("qv")).as("q_max"),
          aggregate(col("qv"), lit(0L),
            (acc, v) => acc + when(abs(v) === 127L, 1L).otherwise(0L)).as("n_sat"))
        .orderBy(col("vec_id"))
    }
  )
}
