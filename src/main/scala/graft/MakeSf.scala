package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only generator of an "sf1-CARDINALITY" dataset: K (default 10)
  * key-shifted replicas of every sf0.1 fact table, written as the same
  * one-parquet-per-table layout Verify/Tables read. No sf1.0 testdata
  * exists in this environment (the driver's generator is not
  * reproducible here — TESTDATA.md), so the off-scale ORACLE
  * cross-check of the overflow-risk gates runs on this synthetic
  * scale-up instead: every integer that grows with the corpus (global
  * edge count m and the m² modularity/Louvain numerators, fixed-point
  * rank magnitudes at 10× N, tf/df/N text statistics, sketch counters)
  * is exercised at 10× the proven sf0.1 scale, and DuckDB recomputes
  * the same queries over the same files — the full CORRECTNESS_r*
  * pipeline, just bigger.
  *
  * Shape honesty: replicas are key-DISJOINT (each foreign key shifted
  * by copy · (max+1), so joins land only within a copy) — the graph
  * becomes 10 disjoint sf0.1-sized islands, not one 10× denser graph.
  * That is exactly what the headroom check needs (global sums and
  * counts grow 10×; per-key densities stay realistic) without
  * inventing cross-copy structure the driver's real sf1 would not
  * have. Dimension tables (region, nation) are copied unshifted —
  * TPC-H does not scale them and the nationkey references stay valid.
  */
object MakeSf {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeSf <srcDir> <outDir> [factor]")
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    require(k >= 1 && k <= 100, s"factor must be in [1, 100], got $k")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // Per-LOGICAL-KEY stride = max+1 taken from the key's HOME table —
    // a foreign key must shift by the SAME stride as the primary key
    // it references (orders.o_custkey by customer's stride, not by
    // orders' own max o_custkey, which can be smaller when not every
    // customer ordered) or copy-i joins would dangle.
    def stride(t: String, c: String): Long =
      read(t).agg(max(col(c))).collect()(0).getLong(0) + 1L
    // customers and suppliers SHARE the graph gates' vertex-id space
    // (edges = (o_custkey, l_suppkey) — vertex 500 is legitimately
    // both, as at every base SF), so both shift by ONE shared stride:
    // copy-i vertex ids then occupy [i·vS, i·vS + 15k) exactly like an
    // sf0.1 island, instead of copy-1 suppliers colliding into copy-0
    // customers and stitching the replicas together.
    val vS = math.max(stride("customer", "c_custkey"),
      stride("supplier", "s_suppkey"))
    val custS = vS
    val suppS = vS
    val partS = stride("part", "p_partkey")
    val ordS = stride("orders", "o_orderkey")
    val evS = stride("events", "event_id")
    val userS = stride("events", "user_id")
    val docS = stride("documents", "doc_id")
    val vecS = stride("embeddings", "vec_id")

    // K key-shifted replicas: every (column -> stride) key gets
    // + copy · stride, so primary keys stay unique and every foreign
    // key resolves within its own copy — referential integrity per
    // replica by construction.
    def scaled(df: DataFrame, keys: (String, Long)*): DataFrame =
      (0 until k).map { i =>
        keys.foldLeft(df) { case (d, (c, s)) =>
          d.withColumn(c, col(c) + lit(i * s))
        }
      }.reduce(_ unionByName _)

    def write(t: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[makesf] $t: ${spark.read.parquet(s"$out/$t.parquet").count()} rows")
    }

    write("region", read("region"))
    write("nation", read("nation"))
    write("customer", scaled(read("customer"), "c_custkey" -> custS))
    write("supplier", scaled(read("supplier"), "s_suppkey" -> suppS))
    write("part", scaled(read("part"), "p_partkey" -> partS))
    write("orders", scaled(read("orders"),
      "o_orderkey" -> ordS, "o_custkey" -> custS))
    write("lineitem", scaled(read("lineitem"),
      "l_orderkey" -> ordS, "l_partkey" -> partS, "l_suppkey" -> suppS))
    write("events", scaled(read("events"),
      "event_id" -> evS, "user_id" -> userS))
    write("documents", scaled(read("documents"), "doc_id" -> docS))
    write("embeddings", scaled(read("embeddings"), "vec_id" -> vecS))
    spark.stop()
  }
}
