package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Source-layer behaviors: CSV edge format, events ts normalization
  * (TIMESTAMP_NANOS or MICROS-NTZ testdata generations), bucketed
  * co-located joins.
  */
class SourcesSpec extends SparkSpec {

  test("edgesCsv parses the reference format with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.writeString(dir.resolve("edges.csv"), "10,20\n30,40\n")
    val df = Tables.edgesCsv(spark, dir.toString + "/edges.csv")
    assert(df.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("src", "long"), ("dst", "long")))
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ===
      Set((10L, 20L), (30L, 40L)))
  }

  test("events loader normalizes ts to TimestampType instants") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName === "timestamp")
    assert(ev.count() > 0)
  }

  test("JSONL documents round-trip exactly; FAILFAST raises, PERMISSIVE quarantines") {
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    Tables.writeDocumentsJsonl(docs, dir)
    val back = Tables.documentsJsonl(spark, dir)
    assert(back.schema === Tables.documentsJsonlSchema)
    val a = docs.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a === b)
    // corruption contract: one malformed line among good ones
    val badDir = java.nio.file.Files.createTempDirectory("graft-jsonl-bad")
    java.nio.file.Files.writeString(badDir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |this is not json
        |{"doc_id": 2, "text": "ok2", "lang": "en", "source": "s", "n_chars": 3}
        |""".stripMargin)
    intercept[org.apache.spark.SparkException] {
      Tables.documentsJsonl(spark, badDir.toString).collect()
    }
    // cache before filtering on the corrupt column — Spark disallows
    // queries whose only referenced column is _corrupt_record on raw
    // file scans (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
    val quarantined = Tables.documentsJsonl(spark, badDir.toString,
      permissive = true).cache()
    try {
      assert(quarantined.filter(col("_corrupt_record").isNotNull).count() === 1L)
      assert(quarantined.filter(col("_corrupt_record").isNull).count() === 2L)
    } finally quarantined.unpersist()
  }

  test("bucketed edges self-join plans without a shuffle Exchange") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val e = edgeDf((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
    Tables.writeBucketedEdges(e, "edges_bucketed", 4, key = "dst")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // force the sort-merge path (broadcast would win on a 4-row table
    // and prove nothing about bucketing)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = spark.table("edges_bucketed")
      // co-located join: both sides bucketed+sorted on dst
      val joined = t.as("a").join(t.as("b"), col("a.dst") === col("b.dst"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
        s"unexpected shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join reading bucketed files:\n$plan")
      assert(joined.count() === 6L) // per-dst squares: 1+1+4
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS edges_bucketed")
    }
  }

  test("writeRangeClustered: disjoint per-file key spans, pushed range filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft-layout").toString
    val df = spark.range(10000).select(col("id").as("doc_id"),
      (col("id") * 7L % 1000L).as("payload"))
    graft.sources.Layout.writeRangeClustered(df, dir, "doc_id", 8)
    val ranges = graft.sources.Layout.fileKeyRanges(spark, dir, "doc_id")
    assert(ranges.length === 8)
    // pairwise disjoint, covering the full domain
    ranges.sliding(2).foreach {
      case Seq((fa, _, maxA), (fb, minB, _)) =>
        assert(maxA < minB, s"$fa span overlaps $fb")
      case _ => ()
    }
    assert(ranges.head._2 === 0L && ranges.last._3 === 9999L)
    // the range read: pushed to the scan, exact rows back
    val q = spark.read.parquet(dir)
      .filter(col("doc_id") >= 2500L && col("doc_id") < 2600L)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(doc_id,2500)")
      && plan.contains("LessThan(doc_id,2600)"), plan)
    assert(q.count() === 100L)
  }

  test("compact: fewer files, identical content, clustering restorable") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val df = spark.range(20000).select(col("id").as("doc_id"),
      concat(lit("payload-"), col("id")).as("text"))
    // 40 arrival-order files (each spans the whole key domain)
    df.repartition(40).write.mode("overwrite").parquet(dir)
    val before = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val total = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val (nBefore, nAfter) = graft.sources.Layout.compact(spark, dir,
      targetBytes = total / 4, key = Some("doc_id"))
    assert(nBefore === 40 && nAfter <= 6 && nAfter >= 3,
      s"expected ~4-5 files, got $nAfter")
    // content exactly preserved
    val after = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(after === before)
    // keyed compaction RESTORES disjoint clustering
    val ranges = graft.sources.Layout.fileKeyRanges(spark, dir, "doc_id")
    ranges.sliding(2).foreach {
      case Seq((_, _, maxA), (_, minB, _)) => assert(maxA < minB)
      case _ => ()
    }
  }

  test("zorder zone maps: both dims narrow per file; the pruning " +
      "verdict beats the time-clustered control on a user predicate") {
    val s = spark
    import s.implicits._
    // a (user, ts) grid with NO correlation between the dims — the
    // adversarial case for single-dim clustering
    val ev = (0 until 4096).map { i =>
      val u = i % 64
      val t = i / 64
      (i.toLong, new java.sql.Timestamp(1700000000000L + t * 60000L),
        u.toLong, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    val zm = graft.sources.Layout.zorderZoneMap(ev).collect()
    assert(zm.map(_.getLong(1)).sum === 4096L)
    // every z-file spans at most half of EACH dimension's domain —
    // the property a single-dim layout cannot give you
    zm.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) <= 32L,
        s"bucket ${r.getLong(0)} user span too wide")
      assert(r.getLong(5) - r.getLong(4) <= 32L * 60000000L,
        s"bucket ${r.getLong(0)} time span too wide")
    }
    val p = graft.sources.Layout.zorderPruning(ev).collect()(0)
    val (zf, zt, tf, tt, sel) = (p.getLong(0), p.getLong(1),
      p.getLong(2), p.getLong(3), p.getLong(4))
    assert(zf === 64L && tf > 0L)
    // time-clustered control: every time-file sees every user →
    // touches everything; z-order skips at least half
    assert(tt === tf, "control layout unexpectedly pruned")
    assert(zt * 2 <= zf, s"z-order touched $zt of $zf")
    assert(sel === (ev.filter($"user_id".between(16L, 32L)).count()))
  }
}
