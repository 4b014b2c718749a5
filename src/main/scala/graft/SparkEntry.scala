package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.GraphOps

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query result is order-insensitive at the value level and is
  * additionally sorted for deterministic dumps; all ids/counts are
  * LongType to stay bit-stable against the DuckDB oracle.
  */
object SparkEntry {

  /** Shared SQL prelude: the derived edge relation (SURVEY.md §7.1) —
    * bag semantics, NO DISTINCT.
    */
  private val EdgesCte =
    "SELECT o_custkey AS src, l_suppkey AS dst " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey"

  /** Degree relation in oracle SQL — mirrors GraphOps.degrees (tagged
    * union + conditional sums).
    */
  private val DegCte =
    "SELECT vertex, SUM(in_c) AS m, SUM(out_c) AS n FROM (" +
      "SELECT src AS vertex, 0 AS in_c, 1 AS out_c FROM edges " +
      "UNION ALL " +
      "SELECT dst AS vertex, 1 AS in_c, 0 AS out_c FROM edges) t " +
      "GROUP BY vertex"

  /** MAX-id constants, scaled from the reference's 50,000 / 40,000 /
    * 7,812,500 to the testdata id range (custkey 0..1500·sf·100,
    * suppkey 0..100·sf·100) so each filter keeps a nonempty proper
    * subset at every sf. Same constants MUST appear in oracleSql.
    */
  val MaxRS = 50L // SocialTriangle_RS.java:32 — strict <
  val MaxRep = 40L // ReplicatedJoinDriver.java:31 — inclusive <=
  val MaxApprox = 78L // ApproxCardinality.java:24 — strict <

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("triangles_rs")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "edges" -> ((s, d) => GraphOps.edges(s, d).orderBy("src", "dst")),
    "path2_exact" -> ((s, d) =>
      GraphOps.path2PerVertex(GraphOps.edges(s, d)).orderBy("vertex")),
    "path2_exact_total" -> ((s, d) =>
      GraphOps.path2Total(GraphOps.edges(s, d))),
    "path2_approx" -> ((s, d) =>
      GraphOps.path2PerVertex(
        GraphOps.filterMaxId(GraphOps.edges(s, d), MaxApprox)).orderBy("vertex")),
    "path2_approx_total" -> ((s, d) =>
      GraphOps.path2Total(
        GraphOps.filterMaxId(GraphOps.edges(s, d), MaxApprox))),
    "path2_triples" -> ((s, d) =>
      GraphOps.path2Triples(
        GraphOps.filterMaxId(GraphOps.edges(s, d), MaxRS))
        .orderBy("x", "y", "z")),
    "triangles_rs" -> ((s, d) => GraphOps.trianglesRS(GraphOps.edges(s, d), MaxRS)),
    "triangles_rep" -> ((s, d) => GraphOps.trianglesRep(GraphOps.edges(s, d), MaxRep)),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "edges" ->
      s"SELECT src, dst FROM ($EdgesCte)",
    "path2_exact" ->
      (s"WITH edges AS ($EdgesCte), deg AS ($DegCte) " +
        "SELECT vertex, CAST(m * n AS BIGINT) AS paths FROM deg"),
    "path2_exact_total" ->
      (s"WITH edges AS ($EdgesCte), deg AS ($DegCte) " +
        "SELECT CAST(COALESCE(SUM(m * n), 0) AS BIGINT) AS total_paths FROM deg"),
    "path2_approx" ->
      (s"WITH edges AS (SELECT * FROM ($EdgesCte) WHERE src < $MaxApprox AND dst < $MaxApprox), " +
        s"deg AS ($DegCte) " +
        "SELECT vertex, CAST(m * n AS BIGINT) AS paths FROM deg"),
    "path2_approx_total" ->
      (s"WITH edges AS (SELECT * FROM ($EdgesCte) WHERE src < $MaxApprox AND dst < $MaxApprox), " +
        s"deg AS ($DegCte) " +
        "SELECT CAST(COALESCE(SUM(m * n), 0) AS BIGINT) AS total_paths FROM deg"),
    "path2_triples" ->
      (s"WITH e AS (SELECT * FROM ($EdgesCte) WHERE src < $MaxRS AND dst < $MaxRS) " +
        "SELECT a.src AS x, a.dst AS y, b.dst AS z " +
        "FROM e a JOIN e b ON a.dst = b.src AND a.src <> b.dst"),
    "triangles_rs" ->
      (s"WITH e AS (SELECT * FROM ($EdgesCte) WHERE src < $MaxRS AND dst < $MaxRS), " +
        "p AS (SELECT a.src AS x, b.dst AS z FROM e a " +
        "JOIN e b ON a.dst = b.src AND a.src <> b.dst) " +
        "SELECT CAST(COALESCE(COUNT(*), 0) // 3 AS BIGINT) AS triangles " +
        "FROM p JOIN e c ON c.dst = p.x AND c.src = p.z"),
    "triangles_rep" ->
      (s"WITH e AS (SELECT * FROM ($EdgesCte) WHERE src <= $MaxRep AND dst <= $MaxRep), " +
        "p AS (SELECT a.src AS x, b.dst AS z FROM e a JOIN e b ON a.dst = b.src) " +
        "SELECT CAST(COUNT(*) // 3 AS BIGINT) AS triangles FROM p " +
        "WHERE EXISTS (SELECT 1 FROM e c WHERE c.dst = p.x AND c.src = p.z)"),
  )
}
