package graft

import graft.plans.CountJoinToDegreeProduct
import org.apache.spark.sql.functions._

/** The count-over-equi-join → degree-product optimizer rule: result
  * parity (bag semantics, duplicates, empties) + plan-shape assertions.
  */
class ExtensionRuleSpec extends SparkSpec {

  def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(CountJoinToDegreeProduct)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("rewrite preserves count on a duplicate-heavy join") {
    val e = edgeDf((1L, 2L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    val a = e.select(col("dst").as("k"))
    val b = e.select(col("src").as("j"))
    val joined = a.join(b, col("k") === col("j"))
    val naive = joined.count()
    val (opt, plan) = withRule {
      val df = joined.groupBy().count()
      (df.collect()(0).getLong(0), df.queryExecution.optimizedPlan.toString)
    }
    assert(opt === naive)
    assert(plan.contains("cl") && plan.contains("cr"),
      s"rule did not fire:\n$plan")
  }

  test("rewrite preserves count on empty and non-matching joins") {
    val a = edgeDf((1L, 10L)).select(col("dst").as("k"))
    val b = edgeDf((2L, 20L)).select(col("src").as("j"))
    val cnt = withRule {
      a.join(b, col("k") === col("j")).groupBy().count().collect()(0).getLong(0)
    }
    assert(cnt === 0L)
  }

  test("rewrite matches naive count on random multigraph 2-path joins") {
    val rng = new scala.util.Random(11)
    (1 to 5).foreach { _ =>
      val pairs = List.fill(rng.nextInt(30))(
        (rng.nextInt(6).toLong, rng.nextInt(6).toLong))
      val e = edgeDf(pairs: _*)
      val a = e.select(col("dst").as("k"))
      val b = e.select(col("src").as("j"))
      val naive = a.join(b, col("k") === col("j")).count()
      val opt = withRule(a.join(b, col("k") === col("j")).count())
      assert(opt === naive, s"pairs=$pairs")
    }
  }

  test("rule fires on the triangle-closing TWO-key join (the J3 shape)") {
    val e = edgeDf((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 1L), (2L, 1L))
    val paths = graft.operators.GraphOps.path2Triples(e).select("x", "z")
    val closing = e.select(col("dst").as("x"), col("src").as("z"))
    val naive = paths.join(closing, Seq("x", "z")).count()
    val (opt, plan) = withRule {
      val df = paths.join(closing, Seq("x", "z")).groupBy().count()
      (df.collect()(0).getLong(0), df.queryExecution.optimizedPlan.toString)
    }
    assert(opt === naive)
    assert(plan.contains("cl") && plan.contains("cr"),
      s"two-key rewrite did not fire:\n$plan")
  }

  test("rule bails on joins with a residual non-equi conjunct") {
    val e = edgeDf((1L, 2L), (2L, 3L), (2L, 1L))
    val a = e.select(col("src").as("x"), col("dst").as("y"))
    val b = e.select(col("src").as("y2"), col("dst").as("z"))
    withRule {
      // the x≠z guard makes the count irreducible to degree products
      val df = a.join(b, col("y") === col("y2") && col("x") =!= col("z"))
        .groupBy().count()
      assert(!df.queryExecution.optimizedPlan.toString.contains("cl"))
      assert(df.collect()(0).getLong(0) ===
        a.join(b, col("y") === col("y2") && col("x") =!= col("z")).count())
    }
  }

  test("rule does NOT fire on grouped aggregates or distinct counts") {
    val e = edgeDf((1L, 2L), (2L, 3L))
    val a = e.select(col("dst").as("k"))
    val b = e.select(col("src").as("j"))
    withRule {
      val grouped = a.join(b, col("k") === col("j")).groupBy("k").count()
      assert(!grouped.queryExecution.optimizedPlan.toString.contains("cl"))
      val distinct = a.join(b, col("k") === col("j"))
        .agg(countDistinct(col("k")))
      assert(!distinct.queryExecution.optimizedPlan.toString.contains("cl"))
    }
  }
}
