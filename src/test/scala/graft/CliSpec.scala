package graft

import java.nio.file.Files

/** End-to-end runs of the four reference-equivalent CLI programs on a
  * golden edges.csv (tri3 + a duplicate edge — FIXTURES.md §4).
  */
class CliSpec extends SparkSpec {

  def tempDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  lazy val edgesCsv: String = {
    val dir = tempDir("graft-edges")
    // reference format: src,dst — ids small enough for every MAX filter
    Files.writeString(java.nio.file.Paths.get(s"$dir/edges.csv"),
      "1,2\n2,3\n3,1\n1,2\n")
    s"$dir/edges.csv"
  }

  def readTsv(dir: String): Seq[Array[String]] = {
    import scala.jdk.CollectionConverters._
    Files.list(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala)
      .map(_.split("\t")).toSeq
  }

  test("ExactCardinalityApp writes per-vertex counts and prints total") {
    spark // ensure shared session exists before app calls getOrCreate
    val out = tempDir("graft-exact")
    graft.cli.ExactCardinalityApp.main(Array(edgesCsv, out))
    val rows = readTsv(out).map(r => r(0).toLong -> r(1).toLong).toMap
    // degrees: v1 in=1(3→1) out=2(dups), v2 in=2 out=1, v3 in=1 out=1
    assert(rows === Map(1L -> 2L, 2L -> 2L, 3L -> 1L))
  }

  test("SocialTriangleRSApp with intermediate dir writes triples and count") {
    val mid = tempDir("graft-mid")
    val out = tempDir("graft-rs")
    graft.cli.SocialTriangleRSApp.main(Array(edgesCsv, mid, out))
    assert(readTsv(out).map(_(0).toLong) === Seq(2L)) // 6/3 with dup edge
    import scala.jdk.CollectionConverters._
    val triples = Files.list(java.nio.file.Paths.get(mid)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(triples.size === 5) // 2+1+2 with the duplicated 1→2
  }

  test("ReplicatedJoinApp counts with EXISTS closing-edge semantics") {
    val out = tempDir("graft-rep")
    graft.cli.ReplicatedJoinApp.main(Array(edgesCsv, out))
    assert(readTsv(out).map(_(0).toLong) === Seq(1L)) // 5/3 = 1
  }

  test("PipelineApp writes all seven relations with a consistent survivor set") {
    spark
    val out = tempDir("graft-pipeline")
    graft.cli.PipelineApp.main(
      Array("/root/testdata/sf0.001/documents.parquet", out))
    val names = Seq("tokens", "quality", "langid", "dedup_exact",
      "neardup_pairs", "dup_clusters", "survivors")
    names.foreach { n =>
      assert(spark.read.parquet(s"$out/$n").count() > 0, n)
    }
    val docs = spark.read.parquet(s"$out/tokens").count()
    val survivors = spark.read.parquet(s"$out/survivors").count()
    val clusters = spark.read.parquet(s"$out/dup_clusters")
    val losers = clusters.filter("doc_id != cluster_id").count()
    assert(survivors === docs - losers)
    // cache discipline: the end-to-end pipeline must not leak persisted
    // blocks into the (shared, long-lived) session — beyond the
    // PlanMemo checkpoints, which are session-lived BY DESIGN and
    // release on demand (the audit drains them first)
    graft.PlanMemo.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked persistent RDDs: ${spark.sparkContext.getPersistentRDDs.size}")
  }

  test("Caches.clear releases graft caches but NEVER a host session's own") {
    val s = spark
    import s.implicits._
    val hostDf = Seq((1L, "host")).toDF("id", "tag")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    hostDf.count()
    // a graft operator that persists internally (tracked)
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    graft.operators.Dedup.ngramJaccard(docs).count()
    graft.Caches.clear(spark)
    graft.PlanMemo.releaseAll() // memo checkpoints are session-lived, not leaked
    // the host's cache survives; graft's tracked caches are gone
    assert(hostDf.storageLevel.useMemory, "host cache was evicted")
    assert(spark.sparkContext.getPersistentRDDs.size === 1,
      s"expected only the host cache, got ${spark.sparkContext.getPersistentRDDs.size}")
    hostDf.unpersist(blocking = false)
  }

  test("Caches.scoped isolates a lease from clear() and releases on exit") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d"), (2L, "a b c d")).toDF("doc_id", "text")
    graft.Caches.scoped {
      graft.operators.Dedup.ngramJaccard(docs).count()
      // caches are leased to THIS scope: a concurrent consumer's
      // clear() (default lease) must not unpersist them
      graft.Caches.clear(spark)
      assert(spark.sparkContext.getPersistentRDDs.nonEmpty,
        "scoped caches were drained by a foreign clear()")
    }
    // scope exit released everything it tracked (memo checkpoints are
    // session-lived by design — drain them before the audit)
    graft.PlanMemo.releaseAll()
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"scoped lease leaked: ${spark.sparkContext.getPersistentRDDs.size}")
  }

  test("writeTsv with empty separator concatenates columns (R:128 parity)") {
    val s = spark
    import s.implicits._
    val out = tempDir("graft-emptysep")
    graft.cli.CliSupport.writeTsv(
      Seq((7L, 21L)).toDF("vertex", "paths"), out, sep = "")
    import scala.jdk.CollectionConverters._
    val lines = Files.list(java.nio.file.Paths.get(out)).iterator().asScala
      .filter(_.getFileName.toString.startsWith("part-"))
      .flatMap(p => Files.readAllLines(p).asScala).toSeq
    assert(lines === Seq("721")) // key and value, no separator between
  }

  test("ApproxCardinalityApp filters above MAX") {
    val dir = tempDir("graft-edges-big")
    Files.writeString(java.nio.file.Paths.get(s"$dir/edges.csv"),
      "1,2\n2,1\n9999999,1\n") // third edge dropped by MAX=7,812,500
    val out = tempDir("graft-approx")
    graft.cli.ApproxCardinalityApp.main(Array(s"$dir/edges.csv", out))
    val rows = readTsv(out).map(r => r(0).toLong -> r(1).toLong).toMap
    assert(rows === Map(1L -> 1L, 2L -> 1L))
  }
}
