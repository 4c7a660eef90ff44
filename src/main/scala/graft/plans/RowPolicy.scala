package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** ROW-LEVEL SECURITY — the third registry-driven optimizer rule
  * (MvRewrite: answer faster; JoinElimination: do less; RowPolicy:
  * see less): a policy predicate registered against a table path is
  * injected as a Filter ON EVERY SCAN of that table, no matter who
  * wrote the query or whether they remembered the WHERE clause —
  * multi-tenant isolation and compliance filtering enforced in the
  * optimizer, where it composes with pushdown (the predicate reaches
  * the parquet reader as a PushedFilter like any user filter; at
  * 100 TB the policy is partition/row-group pruning, not a
  * post-scan veil).
  *
  * Fixed-point safety: injection must be idempotent under Catalyst's
  * rule batches — after PushDownPredicates merges the policy into a
  * user filter, a naive "wrap every scan" rule would re-wrap forever.
  * Each scan's resolved policy references THAT scan's attribute ids,
  * so a scan counts as guarded iff its own resolved predicate appears
  * as a conjunct of ANY Filter in the plan (semanticEquals) — which
  * also keys self-joins correctly (each instance carries distinct
  * exprIds and is guarded independently).
  */
final case class PolicyDescriptor(path: String, predicateSql: String)

object PolicyRegistry {
  private val pols = scala.collection.concurrent.TrieMap[String, PolicyDescriptor]()
  def register(p: PolicyDescriptor): Unit = pols.put(p.path, p)
  def clear(): Unit = pols.clear()
  def all: Seq[PolicyDescriptor] = pols.values.toSeq
}

object RowPolicy {
  def ensureInjected(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[RowPolicyRule.type]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RowPolicyRule
}

object RowPolicyRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (PolicyRegistry.all.isEmpty) return plan
    // every conjunct of every Filter in the plan, for the guard check
    val conjuncts = plan.collect {
      case Filter(c, _) => splitConjunctivePredicates(c)
    }.flatten
    plan.transformUp {
      case lr: LogicalRelation =>
        policyFor(lr) match {
          case Some((pred, missing)) =>
            // analyze FIRST (type coercion), then guard on the
            // coerced form — the plan only ever contains coerced
            // conjuncts, so guarding on the raw parse would re-inject
            // every fixed-point pass
            val child = if (missing.isEmpty) lr else lr.copy(output = lr.output ++ missing)
            val analyzed = resolveFilter(pred, child)
            val cond = analyzed.collectFirst {
              case Filter(c, _) => c
            }.getOrElse(pred)
            if (conjuncts.exists(_.semanticEquals(cond))) lr
            else if (missing.isEmpty) analyzed
            else {
              // column pruning already narrowed this scan past the
              // policy column — RESTORE it on the relation, filter,
              // then project the original shape back (never fail
              // open: a policy must filter even columns the query
              // doesn't read)
              org.apache.spark.sql.catalyst.plans.logical.Project(lr.output, analyzed)
            }
          case _ => lr
        }
    }
  }

  /** The injected Filter must be FULLY analyzed (the optimizer
    * validates that rules keep plans resolved): attribute
    * substitution alone leaves type-coercion holes (e.g. bigint %
    * int-literal), so run the assembled Filter through the catalyst
    * SimpleAnalyzer before splicing it in.
    */
  private def resolveFilter(pred: Expression, child: LogicalPlan): LogicalPlan =
    org.apache.spark.sql.catalyst.analysis.SimpleAnalyzer.execute(Filter(pred, child))

  /** Resolve the registered predicate against this scan's own output
    * attributes (exprId-correct per scan instance); policy columns
    * the scan no longer carries resolve to FRESH attributes over the
    * relation schema and are returned as `missing` so the caller can
    * restore them — failing closed, never skipping the policy.
    */
  private def policyFor(
      lr: LogicalRelation): Option[(Expression, Seq[AttributeReference])] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        PolicyRegistry.all
          .find(p => fs.location.rootPaths.exists(_.toString.endsWith(p.path)))
          .map { p =>
            val added = scala.collection.mutable.ArrayBuffer.empty[AttributeReference]
            val pred = CatalystSqlParser.parseExpression(p.predicateSql).transformUp {
              case u: UnresolvedAttribute =>
                lr.output.find(_.name.equalsIgnoreCase(u.name))
                  .orElse(added.find(_.name.equalsIgnoreCase(u.name)))
                  .getOrElse {
                    val f = fs.schema.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
                      throw new IllegalArgumentException(
                        s"policy column '${u.name}' not in table schema ${fs.schema.fieldNames.toSeq}"))
                    val a = AttributeReference(f.name, f.dataType, f.nullable)()
                    added += a
                    a
                  }
            }
            (pred, added.toSeq)
          }
      case _ => None
    }
}
