package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def t[A](name: String)(f: => A): A = { val t0=System.nanoTime(); val r=f; println(f"PROF $name ${(System.nanoTime()-t0)/1e9}%.2f s"); r }
    val hs = graft.operators.Dedup.shingleHashArrays(docs)
    t("hs pipeline")(hs.selectExpr("sum(size(hs))").collect())
    val sigs = graft.operators.Dedup.minhashSignatures(docs)
    t("signatures")(sigs.count())
    val full = graft.operators.Dedup.minhashLsh(docs)
    t("minhashLsh full")(full.count())
    val ng = graft.operators.Dedup.ngramJaccard(docs)
    t("ngram full")(ng.count())
    // salted-join drive on the real (skewed) edge relation
    val e = graft.operators.GraphOps.edges(spark, "/root/testdata/sf0.1")
    val probe = e
    val build = e.select(col("dst").as("bsrc"), col("src").as("bdst")).limit(5000)
    val plain = t("plain join")(probe.join(build, probe("dst") === build("bsrc")).count())
    val salted = t("salted join")(graft.operators.Skew.saltedJoin(probe, build, "dst", "bsrc", 8).count())
    println(s"PROF salted==plain: ${salted == plain} ($salted)")
    // candidate count
    spark.stop()
  }
}
