package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** COLUMN-LEVEL LINEAGE extraction — the governance/provenance
  * feature (OpenLineage, Spline) a warehouse needs before anyone may
  * delete, mask, or trust a column: for every output column of a
  * query, which physical (table, column) pairs feed it. Computed by
  * a post-order walk of the ANALYZED logical plan propagating, per
  * attribute ExprId, the set of leaf scan columns it transitively
  * references — aliases union their references, scan attributes seed
  * with their own (table, column), every other operator passes
  * attribute identity through. Pure metadata: the extraction never
  * touches data, so it costs the same on 100 TB as on 100 rows —
  * which is exactly why the lineage QUERY (q240) is allowed its
  * driver-side construction.
  */
object ColumnLineage {

  /** (output column, source table, source column) triples, sorted. */
  def lineage(df: DataFrame): Seq[(String, String, String)] = {
    val plan = df.queryExecution.analyzed
    val sources = scala.collection.mutable.Map.empty[ExprId, Set[(String, String)]]

    def tableName(lr: LogicalRelation): String = lr.relation match {
      case fs: HadoopFsRelation =>
        val base = fs.location.rootPaths.head.getName
        base.replaceAll("\\.parquet$", "")
      case other => other.toString.takeWhile(_ != '(')
    }

    def refsOf(e: Expression): Set[(String, String)] =
      e.references.toSeq.flatMap(a => sources.getOrElse(a.exprId, Set.empty)).toSet

    def visit(p: LogicalPlan): Unit = {
      p.children.foreach(visit)
      p match {
        case lr: LogicalRelation =>
          val t = tableName(lr)
          lr.output.foreach(a => sources(a.exprId) = Set((t, a.name)))
        case other =>
          other.expressions.foreach { e =>
            e.foreach {
              case al: Alias => sources(al.exprId) = refsOf(al.child)
              case _ => ()
            }
          }
      }
    }
    visit(plan)

    plan.output.flatMap { a =>
      val srcs = sources.getOrElse(a.exprId, Set.empty)
      if (srcs.isEmpty) Seq((a.name, "<literal>", "<none>"))
      else srcs.toSeq.map { case (t, c) => (a.name, t, c) }
    }.sortBy(identity).toSeq
  }
}
