package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table loaders for the harness parquet testdata (TESTDATA.md) and the
  * reference's raw CSV edge format.
  */
object Tables {

  /** Load one harness table (`region nation customer supplier part orders
    * lineitem events documents embeddings`) from an sf directory.
    * Parquet scans get column pruning + predicate pushdown from Catalyst.
    */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** The events table stores ts as parquet TIMESTAMP(NANOS), which
    * Spark's vectorized reader rejects. Read nanos as a long and rebuild
    * a (microsecond) TimestampType column — exact for any sub-second
    * aggregation granularity we use.
    *
    * SIDE EFFECT, session-wide and deliberate: this sets
    * `spark.sql.legacy.parquet.nanosAsLong=true` on the shared session
    * and does NOT restore it. The flag is consulted again at EXECUTION
    * time (each file footer's schema conversion), so a set/read/restore
    * scope would make the returned — lazy — DataFrame fail once the
    * scope closed. Consequence for other reads in the same session:
    * nanos-typed parquet columns load as raw longs instead of raising
    * AnalysisException; micro/milli timestamp columns are unaffected.
    * Callers that need the default behavior back must re-set the flag
    * after their LAST action on this table.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Schema of the reference's edge list: two integer ids per line,
    * comma-separated, no header; column 0 follows column 1
    * (reference: ExactCardinality.java:35-40, split at
    * SocialTriangle_RS.java:44). Ids are LongType — the reference parses
    * with Integer.parseInt but accumulates counts in longs.
    */
  val edgeCsvSchema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = false),
    StructField("dst", LongType, nullable = false)))

  /** Read an edges.csv in the reference's format. Explicit schema (never
    * inferSchema — that is an extra full scan) and no header, matching
    * TextInputFormat + split(",") (SocialTriangle_RS.java:44-46).
    */
  def edgesCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(edgeCsvSchema).option("header", "false").csv(path)

  /** Persist an edge relation as a BUCKETED table — the co-located-join
    * path for repeated graph queries at scale: both sides of a
    * self-join on the bucket key read pre-shuffled files, so the join
    * plans with zero Exchange (verified in SourcesSpec). At 100 TB,
    * bucketing the canonical edge table once amortizes the dominant
    * shuffle across every subsequent triangle/path query.
    */
  def writeBucketedEdges(edges: org.apache.spark.sql.DataFrame, table: String,
      buckets: Int, key: String = "dst"): Unit =
    edges.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
