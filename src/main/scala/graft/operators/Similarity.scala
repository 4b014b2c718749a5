package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id,
  * embedding: Array[Float], label).
  *
  * Two paths, mirroring how ANN is deployed:
  *   - `knnBrute`: exact cosine top-k — the small-query-set baseline.
  *     The query side is broadcast (a handful of vectors), so the big
  *     side streams through one map stage: no shuffle of the corpus.
  *   - `knnLsh`: random-hyperplane LSH — the scale path. Signatures are
  *     one map stage; the join is an equi-join on the bucket key, so
  *     only bucket-mates ever meet.
  *   - `nearDupPairs`: embedding-cosine near-duplicate pairs via the
  *     same LSH buckets (all-pairs within a bucket + threshold).
  */
object Similarity {

  val DefaultK = 5
  val DefaultQueries = 10L
  val NPlanes = 8

  /** Corpus with precomputed squared norms (computed once, not per
    * pair).
    */
  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"), norm2(col("embedding")).as("n2"))

  /** Exact top-k cosine neighbors for query vectors vec_id < nQueries,
    * self excluded. Deterministic order: (cosine desc, neighbor asc).
    */
  def knnBrute(emb: DataFrame, k: Int = DefaultK, nQueries: Long = DefaultQueries): DataFrame = {
    val corpus = withNorm(emb)
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val scored = corpus.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFrom(dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2"))
          .as("cosine"))
    topK(scored, k)
  }

  /** Approximate top-k via nPlanes-bit random-hyperplane signatures:
    * candidates = same bucket. May return fewer than k rows per query —
    * the accuracy/recall trade LSH makes by construction.
    */
  def knnLsh(emb: DataFrame, k: Int = DefaultK, nQueries: Long = DefaultQueries): DataFrame = {
    val sig = withNorm(emb)
      .withColumn("sig", lshSignature(col("embedding"), NPlanes))
    val queries = sig.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"), col("sig").as("q_sig"))
    val scored = sig.join(broadcast(queries),
        col("sig") === col("q_sig") && col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFrom(dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2"))
          .as("cosine"))
    topK(scored, k)
  }

  /** Embedding near-dup pairs: cosine ≥ threshold, candidates bucketed
    * by LSH signature (vec_a < vec_b). The sf0.01 corpus's planted
    * clusters peak near cosine 0.5, so the default threshold sits below
    * that — high enough to be selective, low enough to return pairs.
    */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.30): DataFrame = {
    // sig pipeline (8 fold-projections per vector) feeds both join
    // sides — compute once.
    val sig = withNorm(emb)
      .withColumn("sig", lshSignature(col("embedding"), NPlanes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig.as("a").join(sig.as("b"),
        col("a.sig") === col("b.sig") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        cosineFrom(dot(col("a.embedding"), col("b.embedding")),
          col("a.n2"), col("b.n2")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ---- IVF (inverted-file) ANN ----

  val IvfCentroidStride = 40L // centroids := vec_id % stride == 0
  val IvfNProbe = 2

  /** IVF top-k: the corpus is partitioned into Voronoi cells around a
    * centroid set (here: a deterministic subsample — real deployments
    * train k-means; the *plumbing* is identical and stays
    * oracle-checkable). Each vector is assigned to its nearest centroid
    * (broadcast argmax — one map stage over the corpus); a query probes
    * only the `nProbe` cells nearest to it. Join keys are cell ids, so
    * the search meets |corpus|·nProbe/|cells| candidates instead of the
    * whole corpus.
    *
    * Deterministic ordering everywhere: cosine desc, then id asc — and
    * cosines are bit-identical with the oracle (sequential fold), so
    * cell assignment ties break identically too.
    */
  def knnIvf(emb: DataFrame, k: Int = DefaultK, nQueries: Long = DefaultQueries,
      nProbe: Int = IvfNProbe, centroidStride: Long = IvfCentroidStride): DataFrame = {
    val corpus = withNorm(emb)
    val cents = corpus.filter(col("vec_id") % centroidStride === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("c_emb"),
        col("n2").as("c_n2"))
    // score every (vector, centroid) pair — one broadcast map stage
    val ranked = corpus.join(broadcast(cents), lit(true))
      .select(col("vec_id"), col("cent_id"),
        cosineFrom(dot(col("embedding"), col("c_emb")), col("n2"), col("c_n2"))
          .as("c_cos"))
    // cell ASSIGNMENT is an argmax — a partial-aggregating min over
    // struct(-cos, cent_id), NOT a row_number window (a global sort of
    // |corpus|·|cells| rows; measured 18 s vs 2 s at 20k×500 locally).
    // Tie-break identical to the window form: highest cos, then lowest
    // centroid id (negation of a double is exact, so order is
    // bit-stable vs the oracle's ORDER BY c_cos DESC, cent_id ASC).
    // tiny (one row per vector) but its input is the full scoring pass —
    // pin it so downstream consumers don't recompute the scoring
    val best = ranked.groupBy("vec_id")
      .agg(min(struct((-col("c_cos")).as("nc"), col("cent_id"))).as("b"))
      .select(col("vec_id"), col("b.cent_id").as("cell"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val assigned = corpus.join(best, "vec_id")
      .select(col("cell"), col("vec_id"), col("embedding"), col("n2"))
    // probe ranking only runs over the (tiny) query set
    val w = Window.partitionBy("vec_id")
      .orderBy(col("c_cos").desc, col("cent_id").asc)
    val probes = ranked.filter(col("vec_id") < nQueries)
      .withColumn("crank", row_number().over(w))
      .filter(col("crank") <= nProbe)
      .select(col("cent_id").as("cell"), col("vec_id").as("query_id"))
    val queries = corpus.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("n2").as("q_n2"))
    val scored = assigned
      .join(broadcast(probes), "cell")
      .join(broadcast(queries), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        cosineFrom(dot(col("q_emb"), col("embedding")), col("q_n2"), col("n2"))
          .as("cosine"))
    topK(scored, k)
  }

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "cosine")
  }
}
