package graft.plans

import graft.functions.PolyHash
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** COUNT-over-equi-join → degree-product rewrite.
  *
  * The reference's ExactCardinality/ApproxCardinality never enumerate
  * the 2-path join: their reducers count m incoming × n outgoing per
  * vertex and emit m·n (ExactCardinality.java:56-82) — the join's
  * cardinality without the join. SocialTriangle_RS Job2 plays the same
  * trick per (x,z) key (S:168-182). This rule generalizes that insight
  * as an automatic Catalyst optimization:
  *
  *   Aggregate [count(1)] (Join Inner (l.k = r.j) L R)
  *   ==>
  *   Aggregate [sum(cl·cr)] (Join Inner (k = j)
  *     (Aggregate k [count(1) as cl] L)
  *     (Aggregate j [count(1) as cr] R))
  *
  * Identical result under bag semantics (count of an inner equi-join =
  * Σ_key n_L(key)·n_R(key); null keys never match, and the per-side
  * aggregates only produce keys that exist). At scale this turns a
  * shuffle of ALL rows + a potentially exploding join output into a
  * pre-aggregated shuffle bounded by distinct keys per side — the
  * count-only plan every OLAP engine wants but Spark does not do by
  * itself.
  */
object CountJoinToDegreeProduct extends Rule[LogicalPlan] {

  private def isCountStar(e: Expression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) => true
    case _ => false
  }

  /** Strip Projects that cannot change a count(1) result. */
  private def stripProject(p: LogicalPlan): LogicalPlan = p match {
    case Project(exprs, child) if exprs.forall(_.deterministic) => stripProject(child)
    case other => other
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, Seq(alias @ Alias(cnt, name)), child, _)
        if isCountStar(cnt) =>
      stripProject(child) match {
        case Join(left, right, Inner, Some(EqualTo(lk: Attribute, rk: Attribute)), _)
            if left.outputSet.contains(lk) && right.outputSet.contains(rk) =>
          val cl = Alias(Count(Literal(1)).toAggregateExpression(), "cl")()
          val cr = Alias(Count(Literal(1)).toAggregateExpression(), "cr")()
          val lAgg = Aggregate(Seq(lk), Seq(lk, cl), left)
          val rAgg = Aggregate(Seq(rk), Seq(rk, cr), right)
          val join = Join(lAgg, rAgg, Inner,
            Some(EqualTo(lk, rk)), JoinHint.NONE)
          val sum = Sum(Multiply(cl.toAttribute, cr.toAttribute))
            .toAggregateExpression()
          // count over an empty join is 0, sum over no rows is null →
          // coalesce; keep the original exprId so parents still resolve.
          val out = Alias(Coalesce(Seq(sum, Literal(0L))), name)(
            exprId = alias.exprId, qualifier = alias.qualifier)
          Aggregate(Nil, Seq(out), join)
        case Join(left, right, Inner,
            Some(EqualTo(rk: Attribute, lk: Attribute)), _)
            if left.outputSet.contains(lk) && right.outputSet.contains(rk) =>
          // same, keys written right-side-first
          apply(Aggregate(Nil, Seq(alias),
            Join(left, right, Inner, Some(EqualTo(lk, rk)), JoinHint.NONE)))
        case _ => agg
      }
  }
}

/** Session extensions: the degree-product rule + SQL-visible engine
  * functions (`poly_hash`). Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CountJoinToDegreeProduct)
    e.injectFunction((
      FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (exprs: Seq[Expression]) => PolyHash(exprs.head)))
  }
}

/** Runtime registration for sessions built WITHOUT the extensions
  * config (notebooks, tests): `GraftSql.register(spark)` makes the
  * engine's SQL functions available immediately.
  */
object GraftSql {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.graft.ColumnBridge.registerFunction(
      spark, "poly_hash", exprs => PolyHash(exprs.head))
}
