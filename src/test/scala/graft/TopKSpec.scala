package graft

import graft.plans.TopK
import org.apache.spark.sql.functions._

/** The custom TopKPerKey operator (logical node + strategy + heap-based
  * physical node): result parity with the window row_number form, plan
  * shape (no Sort/Window), and edge cases.
  */
class TopKSpec extends SparkSpec {

  private def windowForm(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy(col("score").desc, col("id").asc)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("key", "rank", "id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet

  test("heap top-k == window row_number top-k on random data") {
    val s = spark
    import s.implicits._
    val rng = new scala.util.Random(17)
    (1 to 4).foreach { _ =>
      // duplicate scores within keys stress the tie-break (id asc)
      val data = List.fill(300)((rng.nextInt(7).toLong, rng.nextInt(1000).toLong,
        rng.nextInt(20).toDouble))
        .distinct // unique (key,id) so the total order is unambiguous
        .map { case (key, id, score) => (key, id, score) }
      val df = data.toDF("key", "id", "score")
      val viaHeap = TopK.perKey(df, Seq("key"),
        Seq(col("score").desc, col("id").asc), 5)
      assert(rows(viaHeap) === rows(windowForm(df, 5)))
    }
  }

  test("groups smaller than k emit all their rows, ranked") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 2.0), (1L, 11L, 3.0), (2L, 20L, 1.0))
      .toDF("key", "id", "score")
    val got = rows(TopK.perKey(df, Seq("key"),
      Seq(col("score").desc, col("id").asc), 5))
    assert(got === Set((1L, 1L, 11L, 3.0), (1L, 2L, 10L, 2.0), (2L, 1L, 20L, 1.0)))
  }

  test("physical plan: hash Exchange, TopKPerKey node, NO Sort/Window") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 2.0), (2L, 20L, 1.0)).toDF("key", "id", "score")
    val plan = TopK.perKey(df, Seq("key"),
      Seq(col("score").desc, col("id").asc), 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("sortexec") && !plan.contains("+- Sort"), plan)
  }

  test("order resolution: attribute orders resolve directly, no throwaway plan") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 2.0), (2L, 20L, 1.0)).toDF("key", "id", "score")
    val (ord, usedFallback) = TopK.resolveOrders(df,
      Seq(col("score").desc_nulls_last, col("id").asc, col("key")))
    assert(!usedFallback, "plain attribute orders must not need the analyzer")
    assert(ord.forall(_.resolved))
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsLast}
    assert(ord.map(_.direction) === Seq(Descending, Ascending, Ascending))
    assert(ord.head.nullOrdering === NullsLast)
  }

  test("order resolution: function orders take the analyzer fallback, parity holds") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, -2.0), (1L, 11L, 1.0), (1L, 12L, 3.0), (2L, 20L, -9.0),
      (2L, 21L, 4.0)).toDF("key", "id", "score")
    // abs() is an UnresolvedFunction until the analyzer runs — the
    // direct path must hand it off instead of failing or mis-resolving
    val (ord, usedFallback) = TopK.resolveOrders(df,
      Seq(abs(col("score")).desc, col("id").asc))
    assert(usedFallback && ord.forall(_.resolved))
    val got = TopK.perKey(df, Seq("key"),
        Seq(abs(col("score")).desc, col("id").asc), 2)
      .select("key", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("key")
      .orderBy(abs(col("score")).desc, col("id").asc)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 2).select("key", "rank", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === want)
  }

  test("key names resolve with the session's (case-insensitive) resolver") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 2.0), (1L, 11L, 3.0)).toDF("Key_Id", "id", "score")
    val got = TopK.perKey(df, Seq("key_id"),
      Seq(col("score").desc, col("id").asc), 1)
    assert(got.count() === 1L)
  }

  test("memory-contract guard fails fast when retained rows exceed the cap") {
    val s = spark
    import s.implicits._
    s.conf.set("spark.graft.topk.maxRowsPerPartition", "10")
    try {
      // 100 distinct keys × k=1 > 10 retained rows in some partition
      val df = (0L until 100L).map(i => (i, i, i.toDouble)).toDF("key", "id", "score")
        .coalesce(1)
      val e = intercept[org.apache.spark.SparkException] {
        TopK.perKey(df, Seq("key"), Seq(col("score").desc), 1).count()
      }
      assert(e.getMessage.contains("maxRowsPerPartition") ||
        Option(e.getCause).exists(_.getMessage.contains("maxRowsPerPartition")),
        e.getMessage)
    } finally s.conf.unset("spark.graft.topk.maxRowsPerPartition")
  }

  test("downstream operations compose over the custom node") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 10L, 2.0), (1L, 11L, 3.0), (2L, 20L, 1.0))
      .toDF("key", "id", "score")
    val top = TopK.perKey(df, Seq("key"),
      Seq(col("score").desc, col("id").asc), 1)
    // filter + aggregate above the custom operator
    assert(top.filter(col("rank") === 1).count() === 2L)
    assert(top.groupBy("key").agg(max("score")).count() === 2L)
  }
}
