package graft

import org.apache.spark.sql.functions._

/** Regression guards on PHYSICAL PLAN properties — the scale contract:
  * pushdown reaching the scans, broadcast semi-join on the replicated
  * path, pruned read schemas. These break loudly if a refactor
  * accidentally de-optimizes a plan while keeping results correct.
  */
class PlanSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  def executedPlan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("max-id filters are pushed into BOTH parquet scans (path2_approx)") {
    val plan = executedPlan("path2_approx_total")
    assert(plan.contains("PushedFilters: [IsNotNull(o_custkey), LessThan(o_custkey,78)")
      || plan.contains("LessThan(o_custkey,78)"), plan)
    assert(plan.contains("LessThan(l_suppkey,78)"), plan)
  }

  test("scans read only the referenced columns (edges)") {
    val plan = executedPlan("edges")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint>"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint>"), plan)
  }

  test("triangles_rep uses broadcast joins incl. a LeftSemi closing check") {
    val plan = executedPlan("triangles_rep")
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"), plan)
  }

  test("text ops are shuffle-free projections") {
    val plan = executedPlan("text_fingerprint")
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("poly_hash is SQL-callable after runtime registration") {
    graft.plans.GraftSql.register(spark)
    assert(spark.sql("SELECT poly_hash('abc') AS h").collect()(0).getLong(0)
      === 1677554L)
  }
}
