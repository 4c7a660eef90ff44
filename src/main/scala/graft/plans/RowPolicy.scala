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
          case Some(pred) if !conjuncts.exists(_.semanticEquals(pred)) => Filter(pred, lr)
          case _ => lr
        }
    }
  }

  /** Resolve the registered predicate against this scan's own output
    * attributes (exprId-correct per scan instance).
    */
  private def policyFor(lr: LogicalRelation): Option[Expression] =
    lr.relation match {
      case fs: HadoopFsRelation =>
        PolicyRegistry.all
          .find(p => fs.location.rootPaths.exists(_.toString.endsWith(p.path)))
          .map { p =>
            CatalystSqlParser.parseExpression(p.predicateSql).transformUp {
              case u: UnresolvedAttribute =>
                lr.output.find(_.name.equalsIgnoreCase(u.name)).getOrElse(
                  throw new IllegalArgumentException(
                    s"policy column '${u.name}' not in ${lr.output.map(_.name)}"))
            }
          }
      case _ => None
    }
}
