package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.LongType

/** Materialized-view rollup rewrite — a Catalyst optimizer
  * `Rule[LogicalPlan]` that answers fact-table aggregates from a
  * pre-aggregated mart when the mart covers them: grouping keys a
  * subset of the MV's keys, aggregates drawn from the MV's measures
  * (SUM/MIN/MAX re-aggregate; COUNT(*) rolls up as SUM of the stored
  * counts). The dbt-style "aggregate mart" ([[graft.sources
  * .Materialize.aggIncremental]] maintains one) becomes transparent:
  * queries keep addressing the fact table and the optimizer plans the
  * scan against the mart.
  *
  * Reference basis: the reference's marts ARE pre-aggregations of its
  * staging models (`/root/reference/models/example/` SQL models); this rule
  * is the engine-side counterpart that makes them answer fact queries.
  *
  * 100 TB posture: the rewrite replaces a full fact scan + shuffle with
  * a scan of a table that is smaller by the rollup factor (days ×
  * types vs raw events — typically 10³-10⁶×). Filters whose
  * predicates reference only MV key expressions are COVERED: they map
  * onto the mart's grouping columns and ride the rewrite (`WHERE
  * month >= X GROUP BY month`). Matching is otherwise strictly
  * conservative: any join, unknown expression, distinct aggregate,
  * unmatched column, or filter that touches a non-key column, is
  * nondeterministic (`rand()` samples GROUPS post-rollup), or carries
  * a subquery aborts the rewrite and the query runs against the fact
  * table unchanged. When several registered MVs cover the same
  * aggregate, the fewest-keys (coarsest, hence smallest) mart answers,
  * ties on table name — deterministic in registration order.
  * Freshness is the caller's
  * contract (register the MV only while it is current — same as any
  * MV system with manual refresh).
  *
  * Installed via `spark.experimental.extraOptimizations` (the standard
  * post-hoc injection point; `SparkSessionExtensions
  * .injectOptimizerRule` offers the same at session build).
  */
object Mv {

  /** One registered MV: where its rows live, which relation it
    * pre-aggregates, and the expression each column stores. */
  private final case class Registered(
      mvTable: String,
      sourcePath: String,
      keys: Seq[(String, Expression)], // mv col -> source-level expr
      sums: Seq[(String, Expression)],
      mins: Seq[(String, Expression)],
      maxs: Seq[(String, Expression)],
      countStar: Option[String])

  @volatile private var registered: Map[String, Registered] = Map.empty
  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register `mvTable` (already materialized, current w.r.t.
    * `source`) as the rollup of `source` by `keys` storing the given
    * measures. Key/measure expressions are given as the SAME Column
    * expressions used to build the MV; they are normalized through a
    * probe plan so the rule recognizes them inside future queries. */
  def register(spark: SparkSession, mvTable: String, source: DataFrame,
      keys: Seq[(String, Column)], sums: Seq[(String, Column)],
      countStar: Option[String],
      mins: Seq[(String, Column)] = Nil,
      maxs: Seq[(String, Column)] = Nil): Unit = {
    val all = keys ++ sums ++ mins ++ maxs
    val probe = source.select(all.map { case (n, c) => c.as(n) }: _*)
    val (exprByName, path) = probe.queryExecution.optimizedPlan match {
      case Project(list, rel: LogicalRelation) =>
        (list.map(ne => ne.name -> strip(ne)).toMap, relPath(rel))
      case other => sys.error(
        s"MV probe must reduce to Project over a file relation, got:\n$other")
    }
    def resolve(cols: Seq[(String, Column)]) =
      cols.map { case (n, _) => n -> exprByName(n) }
    val r = Registered(mvTable,
      path.getOrElse(sys.error("MV source has no file path")),
      resolve(keys), resolve(sums), resolve(mins), resolve(maxs), countStar)
    registered += mvTable -> r
    installed.synchronized {
      if (installed.add(spark))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ new MvRewrite(spark)
    }
  }

  /** Forget an MV (e.g. before its source moves on). */
  def deregister(mvTable: String): Unit = registered -= mvTable

  private def strip(ne: NamedExpression): Expression = ne match {
    case a: Alias => a.child
    case e => e
  }

  private def relPath(rel: LogicalRelation): Option[String] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.headOption.map(_.toString)
      case _ => None
    }

  /** Structural equality up to attribute exprIds (compared by NAME —
    * both sides are expressed over the same relation's output, whose
    * names are unique). Conservative: unknown shapes compare false. */
  private def structEq(a: Expression, b: Expression): Boolean = (a, b) match {
    case (x: AttributeReference, y: AttributeReference) => x.name == y.name
    case _ if a.getClass != b.getClass => false
    case _ =>
      val (ac, bc) = (a.children, b.children)
      def nonChildArgs(e: Expression): List[Any] =
        e.productIterator.filter {
          case _: Expression => false
          case s: Iterable[_] if s.exists(_.isInstanceOf[Expression]) => false
          case _ => true
        }.toList
      ac.length == bc.length &&
        ac.zip(bc).forall { case (x, y) => structEq(x, y) } &&
        nonChildArgs(a) == nonChildArgs(b)
  }

  /** The rule. One instance per session; reads the shared registry. */
  private final class MvRewrite(spark: SparkSession)
      extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registered.isEmpty) plan
      else plan.transformUp {
        case agg: Aggregate =>
          // when several registered MVs cover the same aggregate, the
          // one with the FEWEST key columns answers — the coarsest
          // covering rollup is the smallest mart (each extra key
          // multiplies stored groups); ties break on table name. The
          // choice is a sort, not registry iteration order, so a later
          // registrant can never silently change which MV answers an
          // existing query (spec: "smallest covering MV wins").
          registered.values.toSeq
            .sortBy(d => (d.keys.size, d.mvTable))
            .iterator
            .flatMap(d => tryRewrite(agg, d))
            .nextOption().getOrElse(agg)
      }

    private def tryRewrite(agg: Aggregate, d: Registered)
        : Option[LogicalPlan] = {
      // unwrap: Aggregate over (Project over)? (Filter over)? the
      // source relation. A Filter is COVERED when its condition maps
      // entirely onto MV key expressions — such a predicate is
      // constant within every MV group, so filtering pre-aggregated
      // rows commutes with the rollup (the `WHERE month >= X GROUP BY
      // month` consumer). Any other child (Join, uncovered filter, …)
      // means the MV cannot answer
      def aliases(list: Seq[NamedExpression]) =
        list.collect { case a: Alias => a.exprId -> a.child }
          .toMap[ExprId, Expression]
      val none = Map.empty[ExprId, Expression]
      val (subst, rel, srcFilter) = agg.child match {
        case Project(list, r: LogicalRelation) => (aliases(list), r, None)
        case r: LogicalRelation => (none, r, None)
        case Filter(c, r: LogicalRelation) => (none, r, Some(c))
        case Filter(c, Project(list, r: LogicalRelation)) =>
          (aliases(list), r, Some(c))
        case Project(list, Filter(c, r: LogicalRelation)) =>
          (aliases(list), r, Some(c))
        case _ => return None
      }
      if (!relPath(rel).contains(d.sourcePath)) return None
      def resolve(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if subst.contains(a.exprId) =>
          subst(a.exprId)
      }
      val mvPlan =
        try spark.table(d.mvTable).queryExecution.optimizedPlan
        catch { case _: Exception => return None }
      val mvAttr = mvPlan.output.map(a => a.name -> a).toMap
      val mvOut = AttributeSet(mvPlan.output)

      def keyFor(e: Expression): Option[Attribute] = {
        val re = resolve(e)
        d.keys.collectFirst {
          case (n, ke) if structEq(re, ke) => mvAttr(n)
        }
      }
      def measure(kind: Seq[(String, Expression)], se: Expression)
          : Option[Attribute] = {
        val re = resolve(se)
        kind.collectFirst { case (n, me) if structEq(re, me) => mvAttr(n) }
      }
      def aggExpr(f: AggregateFunction): Expression =
        AggregateExpression(f, Complete, isDistinct = false, None)
      def rollup(ae: AggregateExpression): Option[Expression] = {
        if (ae.isDistinct || ae.filter.nonEmpty) return None
        val rolled = ae.aggregateFunction match {
          case s: Sum => measure(d.sums, s.child).map(a => aggExpr(Sum(a)))
          case m: Min => measure(d.mins, m.child).map(a => aggExpr(Min(a)))
          case m: Max => measure(d.maxs, m.child).map(a => aggExpr(Max(a)))
          case c: Count
              if c.children.forall(e => resolve(e) match {
                case Literal(v, _) => v != null
                case _ => false
              }) =>
            d.countStar.map(n =>
              Coalesce(Seq(aggExpr(Sum(mvAttr(n))), Literal(0L))))
          case _ => None
        }
        rolled.map(r =>
          if (r.dataType == ae.dataType) r else Cast(r, ae.dataType))
      }

      // the covered-filter gate: every piece of the condition must map
      // to MV key expressions (the keys need not be in the QUERY's
      // grouping set — a key-expression predicate is constant within
      // each MV group either way). A NONDETERMINISTIC predicate (e.g.
      // `WHERE rand() < 0.1`) carries no column references, so the
      // reference-subset check alone would pass it — but evaluating it
      // over pre-aggregated rows samples GROUPS instead of raw rows.
      // Subqueries hide arbitrary plans the coverage check cannot see.
      // Both abort the rewrite.
      val newFilter = srcFilter.map { cond =>
        if (!cond.deterministic ||
            cond.exists(_.isInstanceOf[SubqueryExpression])) return None
        val mapped = resolve(cond).transformDown {
          case e if keyFor(e).isDefined => keyFor(e).get
        }
        if (!mapped.references.subsetOf(mvOut)) return None
        mapped
      }
      val newGroupings = agg.groupingExpressions.map { g =>
        keyFor(g).getOrElse(return None)
      }
      var ok = true
      val newResult = agg.aggregateExpressions.map { ne =>
        val t = (ne: Expression).transformDown {
          // the guard keeps transformDown from re-entering its own
          // replacement (the rolled-up aggregate reads MV attributes)
          case ae: AggregateExpression
              if !ae.references.exists(mvOut.contains) =>
            rollup(ae).getOrElse { ok = false; ae }
          case e if keyFor(e).isDefined => keyFor(e).get
        }
        if (!ok || !t.references.subsetOf(mvOut)) return None
        t match {
          case a: Alias => a // transform preserves the original exprId
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      Some(Aggregate(newGroupings, newResult,
        newFilter.map(c => Filter(c, mvPlan)).getOrElse(mvPlan)))
    }
  }

  /** Count(star)'s rollup result type — exposed for tests. */
  private[plans] val CountType = LongType
}
