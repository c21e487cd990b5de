package graft.operators

import graft.functions.Float32Dot
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

  /** The fixed deterministic centroid set: the `k` vectors with the
    * lowest ids (stand-in for a k-means fit, which would just refine
    * the same structure). Tiny by construction — always broadcast.
    */
  def ivfCentroids(embeddings: DataFrame, k: Int): DataFrame =
    embeddings.filter(col("vec_id") < k)
      .select(col("vec_id").as("cid"), col("embedding").as("cv"))

  /** IVF-flat: assign every vector to its nearest centroid; queries
    * then scan only their `nprobe` nearest cells.
    *
    * At scale: `assign` is a broadcast join against k centroids (no
    * shuffle of the big side beyond the final groupBy), and search
    * becomes an equi-join on `cell`.
    */
  def ivfAssign(embeddings: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("vec_id")).orderBy(col("sim").desc, col("cid"))
    embeddings.crossJoin(broadcast(ivfCentroids(embeddings, k)))
      .withColumn("sim", cosine(col("embedding"), col("cv")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid").as("cell"))
  }

  /** Top-k neighbors for `queries` (vec_id, embedding), searching each
    * query's `nprobe` nearest IVF cells (the standard recall lever at
    * cell boundaries: a query near the edge of its own cell probes the
    * adjacent ones too). `centroids` must be the set `assigned` was
    * built from; probing is a broadcast cross join against it, so
    * raising `nprobe` multiplies only the candidate equi-join volume,
    * never adds a shuffle.
    */
  def ivfSearch(
      assigned: DataFrame,
      queries: DataFrame,
      topK: Int,
      centroids: DataFrame,
      nprobe: Int = 1): DataFrame = {
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val pw = Window.partitionBy(col("qid")).orderBy(col("csim").desc, col("cid"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("csim", cosine(col("qv"), col("cv")))
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= nprobe)
      .select(col("qid"), col("qv"), col("cid").as("cell"))
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
  /** Embedding dimensionality of the corpus (TESTDATA embeddings are
    * 64-dim float32); [[Float32Dot]] truncates to the shorter operand,
    * so a shorter vector simply projects onto the hyperplane prefix.
    */
  private val Dim = 64

  def lshSignature(embeddings: DataFrame, bits: Int): DataFrame = {
    // hyperplane h_j has components cos(i * (j+1) + j) over coordinates
    // i — fixed, dense, no RNG. Materialized once as array<float>
    // literals so each projection is ONE codegen'd Float32Dot over the
    // row (the interpreted aggregate(zip_with(...)) form of the same
    // sum measured ~100× slower per row — see VectorFunctions.dotHof).
    def plane(j: Int): Array[Float] =
      Array.tabulate(Dim)(i => math.cos(i.toDouble * (j + 1) + j).toFloat)
    def proj(j: Int) = Float32Dot(col("embedding"), typedlit(plane(j)))
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
