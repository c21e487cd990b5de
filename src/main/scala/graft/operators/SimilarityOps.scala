package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor scale paths over an embedding column.
  * The oracle-checked brute-force baseline lives in
  * [[SimilarityQueries]]; these operators trade exactness for the
  * shapes that survive 100 TB, and are validated by recall tests
  * against the baseline ([[graft.operators.SimilaritySpec]]).
  *
  * Both paths avoid the O(n²) cross join: candidates are co-located
  * by a bucketing key (IVF centroid id / LSH signature), so the join
  * is an equi-join that shuffles each side once on a well-distributed
  * key — broadcastable probe sides stay broadcast.
  */
object SimilarityOps {

  /** IVF-flat: take the `k` vectors with the lowest ids as fixed
    * deterministic centroids (stand-in for a k-means fit, which would
    * just refine the same structure), assign every vector to its
    * nearest centroid, and answer queries by scanning only the
    * query's cell (`nprobe` = 1 here).
    *
    * At scale: `assign` is a broadcast join against k centroids (no
    * shuffle of the big side beyond the final groupBy), and search
    * becomes an equi-join on `cell`.
    */
  def ivfAssign(embeddings: DataFrame, k: Int): DataFrame = {
    val centroids = embeddings.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
    embeddings.crossJoin(broadcast(centroids))
      .withColumn("sim", cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** Top-k neighbors for `queries` (vec_id, embedding) searching only
    * each query's IVF cell.
    */
  def ivfSearch(assigned: DataFrame, queries: DataFrame, topK: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val qCells = assigned.select(col("vec_id").as("qid"), col("cell"))
    val probes = q.join(qCells, "qid")
    val cands = assigned.select(col("cell"), col("vec_id").as("nid"), col("embedding").as("nv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    probes.join(cands, "cell")
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("qv"), col("nv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /** Random-hyperplane LSH signature: `bits` pseudo-random hyperplanes
    * derived deterministically from the coordinate index (no RNG —
    * reproducible across runs/engines), signature bit = sign of the
    * projection. Vectors sharing a signature land in one bucket;
    * near-dup candidates are intra-bucket pairs.
    */
  def lshSignature(embeddings: DataFrame, bits: Int): DataFrame = {
    // hyperplane h_j has components cos(j * i + j) over coordinates i —
    // fixed, dense, and cheap to express as a column expression.
    def proj(j: Int) = aggregate(
      zip_with(
        col("embedding"),
        transform(sequence(lit(0), lit(63)), i => cos(i * (j + 1) + j)),
        (x, h) => x.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)
    val sig = (0 until bits)
      .map(j => when(proj(j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    embeddings.withColumn("lsh_bucket", sig)
  }

  /** Intra-bucket candidate pairs with verified cosine ≥ `minCos`. */
  def lshNearDupPairs(embeddings: DataFrame, bits: Int, minCos: Double): DataFrame = {
    val sig = lshSignature(embeddings, bits)
    val a = sig.select(col("lsh_bucket"), col("vec_id").as("id_a"), col("embedding").as("va"))
    val b = sig.select(col("lsh_bucket"), col("vec_id").as("id_b"), col("embedding").as("vb"))
    a.join(b, Seq("lsh_bucket")).filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("va"), col("vb")))
      .filter(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
