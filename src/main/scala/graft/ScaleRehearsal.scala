package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev drive: exercise the core operators well beyond sf0.1 with
  * deterministic synthetic data (10M skewed edges; 50k documents built
  * as 10 replicas of sf0.1's 5k; 20k embeddings) — a local rehearsal of
  * the 100 TB posture: does anything OOM, explode, or fall off a
  * performance cliff when the input grows ~20×?
  *
  * Notably: replicating documents 10× makes every doc an exact
  * near-dup of its 9 clones — a worst-case stress for candidate
  * generation (every LSH band bucket holds ≥ 10 docs).
  */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SCALE $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  -> $r")
      Caches.clear(spark) // each phase measured against a clean cache
    }

    // 10M directed edges over 2M vertices, skewed dst (celebrities)
    val edges = spark.range(10000000L).select(
      pmod(hash(col("id")), lit(2000000)).cast("long").as("src"),
      pmod(hash(col("id") * 31 + 7), lit(20000)).cast("long").as("dst"))
    t("path2_total 10M edges")(
      operators.GraphOps.path2Total(edges).collect()(0).getLong(0))
    t("triangles_rs 10M max=2000")(
      operators.GraphOps.trianglesRS(edges, max = 2000).collect()(0).getLong(0))
    t("triangles_rep 10M max=1500")(
      operators.GraphOps.trianglesRep(edges, max = 1500).collect()(0).getLong(0))

    // 50k documents: 10 replicas of sf0.1 (every doc has 9 exact dups)
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("text"))
    val docs = spark.range(10).crossJoin(docs0)
      .select((col("doc_id") + col("id") * 1000000L).as("doc_id"), col("text"))
    t("dedup_exact 50k docs")(operators.Dedup.exact(docs).count())
    t("ngram_jaccard 50k docs")(operators.Dedup.ngramJaccard(docs).count())
    t("minhash_lsh 50k docs")(operators.Dedup.minhashLsh(docs).count())
    t("dup_clusters from lsh")(
      operators.Dedup.dupClusters(operators.Dedup.minhashLsh(docs)).count())

    // 20k / 80k embeddings: replicas of sf0.1's 2k. The centroid count
    // caps at IvfMaxCells for both sizes, so the 80k run should take
    // ~4× the 20k run (linear assignment), NOT 16× (the old quadratic
    // vec_id-stride design).
    val emb0 = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    def embX(copies: Int) = spark.range(copies).crossJoin(emb0)
      .select((col("vec_id") + col("id") * 1000000L).as("vec_id"), col("embedding"))
    val emb = embX(10)
    t("knn_brute 20k vectors")(operators.Similarity.knnBrute(emb).count())
    t("knn_ivf 20k vectors")(operators.Similarity.knnIvf(emb).count())
    t("knn_ivf 80k vectors")(operators.Similarity.knnIvf(embX(40)).count())
    t("knn_lsh 20k vectors")(operators.Similarity.knnLsh(emb,
      bandBits = operators.Similarity.bandBitsFor(20000L)).count())
    t("neardup 20k vectors")(operators.Similarity.nearDupPairs(emb,
      bandBits = operators.Similarity.bandBitsFor(20000L)).count())
    spark.stop()
  }
}
