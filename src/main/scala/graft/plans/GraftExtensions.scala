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
object CountJoinToDegreeProduct extends Rule[LogicalPlan] with PredicateHelper {

  private def isCountStar(e: Expression): Boolean = e match {
    case AggregateExpression(Count(Seq(Literal(1, _))), Complete, false, None, _) => true
    case _ => false
  }

  /** Strip Projects that cannot change a count(1) result — including
    * Projects whose aliases are consumed by the join keys above them
    * (the count reads no columns, so any deterministic projection is
    * count-transparent).
    */
  private def stripProject(p: LogicalPlan): LogicalPlan = p match {
    case Project(exprs, child) if exprs.forall(_.deterministic) => stripProject(child)
    case other => other
  }

  /** The join condition as aligned per-side key lists — defined only
    * when EVERY conjunct is an attribute equality across the two sides
    * (a single residual non-equi conjunct, e.g. the x≠z guard, makes
    * the count irreducible to degree products, so we bail).
    */
  private def equiKeys(cond: Expression, left: LogicalPlan, right: LogicalPlan)
      : Option[Seq[(Attribute, Attribute)]] = {
    val pairs = splitConjunctivePredicates(cond).map {
      case EqualTo(a: Attribute, b: Attribute)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => Some((a, b))
      case EqualTo(b: Attribute, a: Attribute)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => Some((a, b))
      case _ => None
    }
    if (pairs.nonEmpty && pairs.forall(_.isDefined)) Some(pairs.flatten.distinct)
    else None
  }

  def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg @ Aggregate(Nil, Seq(alias @ Alias(cnt, name)), child, _)
        if isCountStar(cnt) =>
      stripProject(child) match {
        case Join(left, right, Inner, Some(cond), _) =>
          equiKeys(cond, left, right) match {
            case Some(pairs) =>
              // composite keys: group each side on ITS key tuple; the
              // rejoined per-key counts multiply exactly as in the
              // single-key case (Σ_key n_L(key)·n_R(key); a null in any
              // key component never matches, and the per-side
              // aggregates only produce keys that exist)
              val lks = pairs.map(_._1).distinct
              val rks = pairs.map(_._2).distinct
              val cl = Alias(Count(Literal(1)).toAggregateExpression(), "cl")()
              val cr = Alias(Count(Literal(1)).toAggregateExpression(), "cr")()
              val lAgg = Aggregate(lks, lks :+ cl, left)
              val rAgg = Aggregate(rks, rks :+ cr, right)
              val join = Join(lAgg, rAgg, Inner,
                Some(pairs.map { case (a, b) => EqualTo(a, b): Expression }
                  .reduce(And)), JoinHint.NONE)
              val sum = Sum(Multiply(cl.toAttribute, cr.toAttribute))
                .toAggregateExpression()
              // count over an empty join is 0, sum over no rows is null →
              // coalesce; keep the original exprId so parents still resolve.
              val out = Alias(Coalesce(Seq(sum, Literal(0L))), name)(
                exprId = alias.exprId, qualifier = alias.qualifier)
              Aggregate(Nil, Seq(out), join)
            case None => agg
          }
        case _ => agg
      }
  }
}

/** The engine's SQL function surface — every custom expression the
  * Column API offers, reachable from pure SQL with the same names the
  * Scaladoc uses. Integer parameters must be literals (they shape the
  * generated code); array-parameterized MinHash uses the engine's
  * fixed 16-hash bank so SQL callers get the exact signatures the
  * dedup operators (and the DuckDB oracle) compute.
  */
object GraftFunctions {
  import graft.functions._

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _: org.apache.spark.sql.types.IntegerType) => v
    case Literal(v: Long, _: org.apache.spark.sql.types.LongType) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal integer argument, got $other")
  }

  /** (name, implementing expression class — for DESCRIBE FUNCTION —
    * and builder) per SQL function.
    */
  val builders: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("poly_hash", classOf[PolyHash],
      (exprs: Seq[Expression]) => PolyHash(exprs.head)),
    ("poly_hash2", classOf[PolyHash],
      (exprs: Seq[Expression]) =>
        PolyHash(exprs.head, PolyHashUtil.Mult2, PolyHashUtil.Mod2)),
    ("shingle_hash", classOf[ShingleHash],
      (exprs: Seq[Expression]) =>
        ShingleHash(exprs.head, intLit(exprs(1), "shingle_hash"))),
    ("simhash", classOf[SimHash],
      (exprs: Seq[Expression]) => SimHash(exprs.head,
        if (exprs.length > 1) intLit(exprs(1), "simhash")
        else graft.operators.Dedup.SimBits)),
    ("minhash_sig", classOf[MinHashSig],
      (exprs: Seq[Expression]) => MinHashSig(exprs.head,
        graft.operators.Dedup.MinhashAB.map(_._1),
        graft.operators.Dedup.MinhashAB.map(_._2),
        graft.operators.Dedup.MinhashP)),
    ("dot_d", classOf[DotProduct],
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))),
    ("lsh_sig", classOf[HyperplaneSig],
      (exprs: Seq[Expression]) =>
        HyperplaneSig(exprs.head, intLit(exprs(1), "lsh_sig"))),
    ("nfc_norm", classOf[NfcNormalize],
      (exprs: Seq[Expression]) => NfcNormalize(exprs.head)),
    ("char_gram_hash", classOf[CharGramHash],
      (exprs: Seq[Expression]) =>
        CharGramHash(exprs.head, intLit(exprs(1), "char_gram_hash"))),
    // PRECONDITION: both arguments must be SORTED-ASCENDING DISTINCT
    // array<long> — the kernel is a single merge pass that does not
    // check order and silently undercounts on unsorted input. Sort
    // once per row (sort_array), not per pair. See SortedIntersectUtil.
    ("sorted_intersect_size", classOf[SortedIntersectSize],
      (exprs: Seq[Expression]) => SortedIntersectSize(exprs(0), exprs(1))))
}

/** Session extensions: the degree-product rule + the full SQL function
  * surface (GraftFunctions). Enable with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CountJoinToDegreeProduct)
    e.injectPlannerStrategy(_ => TopKStrategy)
    GraftFunctions.builders.foreach { case (name, clazz, builder) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name),
        builder))
    }
  }
}

/** Runtime registration for sessions built WITHOUT the extensions
  * config (notebooks, tests): `GraftSql.register(spark)` makes the
  * engine's SQL functions available immediately.
  */
object GraftSql {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    GraftFunctions.builders.foreach { case (name, _, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerFunction(
        spark, name, builder)
    }
}
