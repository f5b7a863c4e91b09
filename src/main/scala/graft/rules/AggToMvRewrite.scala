package graft.rules

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** MATERIALIZED-VIEW QUERY REWRITE — the Calcite / Snowflake /
  * BigQuery-MV feature on the library's maintained rollup layouts: an
  * aggregate over the registered FACT table whose grouping columns are
  * a SUBSET of the MV's dimensions and whose aggregates are all
  * DECOMPOSABLE over the MV's measures is answered from the
  * (dimension-cardinality-sized) MV instead of the fact scan —
  * rollup subsumption: the MV is kept at finer grain than any one
  * query, and coarser GROUP BYs re-aggregate it (`sum(x)` →
  * `sum(mv.sum_x)`, `count(*)` → `sum(mv.cnt)`).
  *
  * Matching is deliberately conservative (every guard is a refusal,
  * never a wrong answer):
  *   - the aggregate's child must be the registered fact scan, under
  *     nothing but attribute-only Projects, SubqueryAliases, and
  *     Filters whose predicates reference MV DIMENSIONS only (those
  *     filters transfer to the MV verbatim — same dims, same rows of
  *     the rollup);
  *   - grouping expressions must be plain dimension attributes;
  *   - every aggregate must be `sum(measure)` / `sum(cast(measure as
  *     int/long))` / `count(*)` / `count(lit)` — non-decomposable
  *     aggregates (avg is decomposable but deliberately left to the
  *     caller to express as sum/cnt; distinct counts are NOT
  *     decomposable) pass through untouched.
  *
  * Output attribute ids are preserved through a restoring Project, so
  * downstream plan nodes keep resolving.
  *
  * FRESHNESS is the registrar's contract, exactly as in every MV
  * system: [[register]] binds a fact path to an MV path the caller
  * maintains (build: q226; incremental refresh: the q131 delta-merge
  * discipline). Like [[WindowToAggJoin]], the rule is applied per-plan
  * by callers (`rewrite`) rather than injected session-wide by
  * default; the registry is process-local test/query state, not a
  * catalog.
  */
object AggToMvRewrite {

  /** One registered rollup MV.
    *
    * @param factTag substring identifying the fact scan's file location
    * @param dims    MV dimension column names (fact and MV share them)
    * @param sums    fact measure column → MV pre-summed column
    * @param cntCol  MV column holding the per-group row count
    * @param mvPath  parquet location of the maintained rollup
    * @param sumCast how each measure's MV partial was built: a measure
    *                mapped to a type here was pre-summed as
    *                `sum(cast(measure AS t))` — PER-ROW truncation,
    *                which for a fractional measure is NOT the same
    *                number as `sum(measure)` — so only a query summing
    *                with the IDENTICAL per-row cast may be answered
    *                from it; an unmapped measure's partial is the raw
    *                `sum(measure)` and answers only uncast sums.
    *                Refusal-over-wrong-answer: mismatched cast shape
    *                never rewrites, even where the types happen to make
    *                the two equal (integral measures).
    */
  final case class MvDef(factTag: String, dims: Set[String],
      sums: Map[String, String], cntCol: String, mvPath: String,
      sumCast: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)

  @volatile private var registry: Seq[MvDef] = Seq.empty

  def register(mv: MvDef): Unit = synchronized {
    registry = registry.filterNot(_.factTag == mv.factTag) :+ mv
  }
  def clear(): Unit = synchronized { registry = Seq.empty }

  val ConfKey = "spark.graft.mvRewrite.enabled"

  /** Config-gated `Rule` form (default OFF) for session-wide
    * installation — `spark.experimental.extraOptimizations` or the
    * [[graft.GraftExtensions]] injection — mirroring
    * [[WindowToAggJoin]]'s lever: inert until
    * `spark.graft.mvRewrite.enabled=true` AND an MV is registered.
    */
  object Installed
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty ||
          !conf.getConfString(ConfKey, "false").toBoolean) plan
      else rewrite(SparkSession.active, plan)
  }

  /** Does any file-source leaf of `plan` read a location containing
    * `substr`? (Plan-shape assertion for rewrite certification.) */
  def scansPath(plan: LogicalPlan, substr: String): Boolean =
    plan.collectLeaves().exists(isFactScan(_, substr))

  private def isFactScan(p: LogicalPlan, tag: String): Boolean = p match {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        h.location.rootPaths.exists(_.toString.contains(tag))
      case _ => false
    }
    // a DataSourceV2 fact (the graft-kv lakehouse table): its name()
    // embeds the table path — `graft-kv(<dir>)` — so the same path
    // registration covers file facts and connector facts (q261: the MV
    // maintained from the kv CHANGELOG answers aggregates over the kv
    // table itself). EXACT current-snapshot names only: a substring
    // match would also catch `graft-kv-changelog(<dir>)`,
    // `graft-kv-history(<dir>)` and time-travel `graft-kv(<dir>)@k`
    // reads of the same path, silently answering a changelog or as-of
    // aggregate from the full-table MV — wrong rows, violating the
    // refusal-over-wrong-answer contract
    case d: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation =>
      val n = d.table.name()
      n == s"graft-kv($tag)" || n == s"graft-rest($tag)"
    case _ => false
  }

  /** Strip attribute-only Projects / aliases / dims-only Filters above
    * the fact scan; collect the filter conditions (they transfer to
    * the MV). None = the subtree is not a rewritable fact read. */
  private def factRead(p: LogicalPlan, mv: MvDef)
      : Option[Seq[Expression]] = p match {
    case _ if isFactScan(p, mv.factTag) => Some(Seq.empty)
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      factRead(child, mv)
    case SubqueryAlias(_, child) => factRead(child, mv)
    case Filter(cond, child)
        if cond.deterministic &&
          cond.references.forall(a => mv.dims.contains(a.name)) =>
      factRead(child, mv).map(cond +: _)
    case _ => None
  }

  /** The measure column under sum(x) / sum(cast(x as int/long)), with
    * the per-row cast (None = uncast) so matching can require the MV
    * partial was built with the IDENTICAL shape — `sum(cast(x AS
    * BIGINT))` truncates per row and differs from `sum(x)` on any
    * fractional measure. */
  private def summedMeasure(e: Expression)
      : Option[(String, Option[org.apache.spark.sql.types.DataType])] =
    e match {
      case a: AttributeReference => Some(a.name -> None)
      case Cast(a: AttributeReference, t @ (IntegerType | LongType), _, _) =>
        Some(a.name -> Some(t))
      case _ => None
    }

  /** Apply to one plan; returns the plan untouched when no registered
    * MV subsumes it. Callers opt single plans in (the q197 pattern). */
  def rewrite(s: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case agg @ Aggregate(groupExprs, aggExprs, child, _) =>
        registry.view.flatMap(mv => tryRewrite(s, agg, groupExprs,
          aggExprs, child, mv)).headOption.getOrElse(agg)
    }

  private def tryRewrite(s: SparkSession, agg: Aggregate,
      groupExprs: Seq[Expression], aggExprs: Seq[NamedExpression],
      child: LogicalPlan, mv: MvDef): Option[LogicalPlan] = {
    val filters = factRead(child, mv).getOrElse(return None)
    val groupAttrs = groupExprs.map {
      case a: AttributeReference if mv.dims.contains(a.name) => a
      case _ => return None
    }
    // every output: a grouping dim, or a decomposable aggregate
    sealed trait Out
    case class Dim(name: String) extends Out
    case class SumOf(mvCol: String) extends Out
    val outs: Seq[(NamedExpression, Out)] = aggExprs.map {
      case a: AttributeReference if mv.dims.contains(a.name) =>
        a -> Dim(a.name)
      case al @ Alias(AggregateExpression(Sum(e, _), Complete, false, None, _), _) =>
        val (m, qCast) = summedMeasure(e).getOrElse(return None)
        // the query's per-row cast shape must equal the MV build's: a
        // truncating partial never answers an uncast sum (and vice
        // versa) — exactness over a fractional measure depends on it
        if (!mv.sums.contains(m) || mv.sumCast.get(m) != qCast) return None
        al -> SumOf(mv.sums(m))
      // non-null literals only: count(NULL) is 0 per group, not the
      // group row count — answering it from mv.cnt would be WRONG, and
      // this rule's contract is refusal-over-wrong-answer
      case al @ Alias(AggregateExpression(Count(args), Complete, false, None, _), _)
          if args.forall {
            case Literal(v, _) => v != null
            case _ => false
          } =>
        al -> SumOf(mv.cntCol)
      case _ => return None
    }
    // fresh MV scan; resolve its attributes by name
    val mvScan = s.read.parquet(mv.mvPath).queryExecution.analyzed
    val mvAttr: Map[String, Attribute] =
      mvScan.output.map(a => a.name -> a).toMap
    if (!(mv.dims ++ mv.sums.values + mv.cntCol)
        .forall(mvAttr.contains)) return None
    val mvFiltered = filters.foldRight(mvScan) { (cond, p) =>
      Filter(cond.transform {
        case a: AttributeReference => mvAttr(a.name)
      }, p)
    }
    val newGroup = groupAttrs.map(a => mvAttr(a.name))
    val newAggs: Seq[NamedExpression] = outs.map {
      case (orig, Dim(n))   => Alias(mvAttr(n), orig.name)()
      case (orig, SumOf(c)) => Alias(AggregateExpression(
        Sum(mvAttr(c)), Complete, isDistinct = false), orig.name)()
    }
    val newAgg = Aggregate(newGroup, newAggs, mvFiltered)
    // restore the original output ids so parents keep resolving; sums
    // over the MV's BIGINT partials widen nothing, but sum() itself
    // returns the same type family — cast back defensively where the
    // original type differs
    Some(Project(agg.output.zip(newAgg.output).map { case (o, n) =>
      val e: Expression = if (n.dataType == o.dataType) n else Cast(n, o.dataType)
      Alias(e, o.name)(exprId = o.exprId)
    }, newAgg))
  }
}
