package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.Metadata

/** Transparent MATERIALIZED-VIEW REWRITE — the warehouse serving
  * optimization Catalyst doesn't ship: a query aggregating the BASE
  * table is rewritten to re-aggregate a registered rollup MV when the
  * MV can answer it, cutting the scan from fact-table rows to
  * MV-group rows (at 100 TB: from terabytes to megabytes for
  * dashboard-grade aggregates).
  *
  * Matching contract (deliberately narrow — a rewrite must never be
  * approximately right):
  *   - the Aggregate's child scans the registered base path (optional
  *     attribute-only Project in between — the shape column pruning
  *     leaves);
  *   - every grouping expression is a plain column contained in the
  *     MV's dimension set (GROUPING SUBSETS of the MV's grain roll up
  *     for free because SUM/COUNT are re-aggregable);
  *   - every aggregate is SUM(measure) where the measure expression's
  *     canonical fingerprint was registered, or COUNT(<non-null
  *     literal>), which re-aggregates as SUM(mv count column);
  *   - rewritten output types must equal the original's exactly, or
  *     the match is abandoned.
  *
  * The rewrite rebuilds the Aggregate over the MV relation, aliasing
  * every output to the ORIGINAL exprIds so parent operators resolve
  * unchanged. Measure identity uses canonicalized expression
  * fingerprints with normalized attributes — registration feeds the
  * measure through the same optimizer (constant folding etc.) that
  * shaped the query side, so `CAST(CAST(x AS DECIMAL(18,2)) * 100 AS
  * BIGINT)` matches its folded query-time form. Exactness at any
  * scale: the MV stores exact BIGINT partials, and SUM/COUNT are
  * associative, so base-vs-MV results are bit-identical — which the
  * q210 oracle (plain SQL over the BASE table) verifies end to end.
  *
  * Staleness is the registrar's contract: register an MV only while
  * its base is immutable or maintained through it (the q133/q189 IVM
  * queries are the maintenance half of that story).
  */
final case class MvDescriptor(
    basePath: String,
    mvPath: String,
    dims: Set[String],
    measures: Map[String, String],
    cntCol: String)

/** Session-wide registry the rule consults; keyed by MV path. */
object MvRegistry {
  private val views = scala.collection.concurrent.TrieMap[String, MvDescriptor]()
  def register(d: MvDescriptor): Unit = views.put(d.mvPath, d)
  def unregister(mvPath: String): Unit = views.remove(mvPath)
  def clear(): Unit = views.clear()
  def all: Seq[MvDescriptor] = views.values.toSeq
}

object MvRewrite {

  /** Canonical identity of a measure expression: attributes normalized
    * to lowercase-name-only (exprIds and nullability carry no
    * semantic weight for matching), then Catalyst canonicalization.
    */
  def fingerprint(e: Expression): String =
    e.transform {
      case a: AttributeReference =>
        AttributeReference(a.name.toLowerCase, a.dataType, nullable = true,
          Metadata.empty)(ExprId(0), Nil)
    }.canonicalized.toString

  /** Fingerprint of a measure as the OPTIMIZER will see it at query
    * time: run the expression through analysis + optimization over the
    * base relation, then fingerprint the surviving projection.
    */
  def measureFingerprint(base: DataFrame, measureSql: String): String = {
    val plan = base.select(expr(measureSql).as("__m")).queryExecution.optimizedPlan
    val e = plan.collectFirst { case Project(projectList, _) => projectList.head }
      .getOrElse(throw new IllegalStateException(
        s"measure '$measureSql' did not optimize to a projection"))
    fingerprint(e match { case Alias(child, _) => child; case other => other })
  }

  /** Install the rewrite rule into an already-running session (the
    * runtime-injection path; [[graft.GraftExtensions]] carries the
    * config-line path for sessions built with the extensions conf).
    */
  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MvRewriteRule(spark)
}

final case class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val views = MvRegistry.all
    if (views.isEmpty) plan
    else plan.transformDown {
      case agg @ Aggregate(_, _, child, _) =>
        scanPaths(child)
          .flatMap(paths => views.find(d => paths.exists(_.endsWith(d.basePath))))
          // rule interaction (the JoinElimination lesson): a row
          // policy on the BASE table means the query must NOT read
          // pre-aggregated MV rows that include policy-hidden data —
          // and rule order could redirect the scan before the policy
          // Filter appears. Back off whenever a policy targets the base.
          .filterNot(d => PolicyRegistry.all.exists(pol =>
            d.basePath.endsWith(pol.path) || pol.path.endsWith(d.basePath)))
          .flatMap(d => rewrite(agg, d))
          .getOrElse(agg)
    }
  }

  /** The base-scan shape the rewrite accepts: LogicalRelation over a
    * file source, optionally under attribute-only Projects.
    */
  private def scanPaths(p: LogicalPlan): Option[Seq[String]] = p match {
    case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      scanPaths(child)
    case lr: LogicalRelation =>
      lr.relation match {
        case fs: HadoopFsRelation => Some(fs.location.rootPaths.map(_.toString))
        case _ => None
      }
    case _ => None
  }

  private def rewrite(agg: Aggregate, d: MvDescriptor): Option[Aggregate] = {
    val groupsOk = agg.groupingExpressions.forall {
      case a: AttributeReference => d.dims.contains(a.name.toLowerCase)
      case _ => false
    }
    if (!groupsOk) return None
    // fresh attribute ids per rewrite — two rewritten queries in one
    // plan must not collide
    val mvPlan = spark.read.parquet(d.mvPath).queryExecution.analyzed
    val mvOut = mvPlan.output.map(a => a.name.toLowerCase -> a).toMap
    val translated = agg.aggregateExpressions.map(translate(_, mvOut, d))
    if (translated.exists(_.isEmpty)) return None
    val newAggExprs = translated.map(_.get)
    // type parity is non-negotiable: abandon the rewrite on any drift
    val typesOk = newAggExprs.zip(agg.aggregateExpressions)
      .forall { case (n, o) => n.dataType == o.dataType }
    if (!typesOk) return None
    val newGroups = agg.groupingExpressions
      .map { case a: AttributeReference => mvOut(a.name.toLowerCase) }
    Some(Aggregate(newGroups, newAggExprs, mvPlan))
  }

  private def translate(
      ne: NamedExpression,
      mvOut: Map[String, Attribute],
      d: MvDescriptor): Option[NamedExpression] = ne match {
    case a: AttributeReference if d.dims.contains(a.name.toLowerCase) =>
      mvOut.get(a.name.toLowerCase)
        .map(mva => Alias(mva, a.name)(exprId = a.exprId))
    case al @ Alias(AggregateExpression(Sum(child, _), _, false, None, _), name) =>
      d.measures.get(MvRewrite.fingerprint(child))
        .flatMap(c => mvOut.get(c.toLowerCase))
        .map(mva => Alias(Sum(mva).toAggregateExpression(), name)(exprId = al.exprId))
    case al @ Alias(AggregateExpression(Count(children), _, false, None, _), name)
        if children.forall(c => c.foldable && c.eval() != null) =>
      mvOut.get(d.cntCol.toLowerCase).map { mva =>
        // COUNT over the base = SUM of the MV's per-group counts;
        // count is non-nullable, so pin the empty-relation case to 0
        Alias(Coalesce(Seq(Sum(mva).toAggregateExpression(), Literal(0L))),
          name)(exprId = al.exprId)
      }
    case _ => None
  }
}
