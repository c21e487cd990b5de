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
    }
  )
}
