package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.SparkBridge

/** Whole-operator custom plan (the (c) rung of the custom-op ladder:
  * `LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * the session): top-k rows PER KEY GROUP.
  *
  * Why a custom operator when `row_number().over(window) <= k`
  * already expresses the semantics: the window formulation must
  * shuffle and sort EVERY input row — at 100 TB the exchange carries
  * the full table. Top-k is algebraic (top-k of a union = top-k of
  * per-part top-k's), so this operator runs in two phases like an
  * aggregate: a PARTIAL pass keeps at most k rows per key per input
  * partition with a bounded heap — no sort, O(n·log k), constant
  * memory per key — and only those survivors cross the exchange; a
  * FINAL pass merges per key after clustering. Shuffle volume drops
  * from |input| to ≤ k·|keys|·|partitions| — the same partial-agg
  * trick `groupBy.max` gets for free and windows never do.
  *
  * Determinism: ties are broken by the caller supplying a total
  * order (e.g. balance DESC, id ASC), same contract as the window
  * form.
  */
case class TopKPerKey(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

/** Physical node; `partial = true` is the pre-shuffle combine. */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** The final phase demands clustering by key — EnsureRequirements
    * inserts the hash exchange between the two phases, exactly like
    * partial/final aggregation.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  override def nodeName: String =
    if (partial) "TopKPerKeyPartial" else "TopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val order = sortOrder
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      // codegen'd projections/orderings are created executor-side,
      // once per partition (the TakeOrderedAndProject pattern)
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd: Ordering[InternalRow] = RowOrdering.create(order, childOutput)
      // per-key bounded heap: worst row at the head, evicted when a
      // better (rowOrd-smaller) row arrives — memory is O(keys · k),
      // never O(rows), and nothing is ever fully sorted
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val heap = heaps.getOrElseUpdate(
          keyProj(row).copy(),
          mutable.PriorityQueue.empty[InternalRow](rowOrd))
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (rowOrd.lt(row, heap.head)) { heap.dequeue(); heap.enqueue(row.copy()) }
      }
      heaps.valuesIterator.flatMap(_.toSeq)
    }, preservesPartitioning = true)
  }
}

/** Planner strategy: logical TopKPerKey → partial + final execs. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial = TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Column-API entry point. */
object TopK {

  /** Idempotently attach the strategy to a live session
    * (`spark.experimental.extraStrategies` is the sanctioned hook for
    * sessions built without the extensions config line;
    * [[graft.GraftExtensions]] injects the same strategy at build
    * time).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies = cur :+ TopKPerKeyStrategy
  }

  /** Top `k` rows per `keys` group under `orders` (pass
    * `col.desc`/`col.asc` columns; bare columns mean ascending —
    * supply a total order for deterministic output).
    *
    * Column→Expression note: Spark 4's Column holds a lazy ColumnNode
    * that only becomes a (serializable, resolved) catalyst expression
    * through analysis — so instead of converting directly, the sort
    * and key columns are run through throwaway `df.sort`/`df.select`
    * plans and the RESOLVED `SortOrder`s/attributes are lifted out of
    * the analyzed nodes.
    */
  def topKPerKey(df: DataFrame, keyCols: Seq[Column], orders: Seq[Column], k: Int): DataFrame = {
    ensureRegistered(df.sparkSession)
    val sortPlan = SparkBridge.analyzed(df.sort(orders: _*))
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Sort]
    val keyPlan = SparkBridge.analyzed(df.select(keyCols: _*))
      .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Project]
    val keys = keyPlan.projectList.map {
      case al: org.apache.spark.sql.catalyst.expressions.Alias => al.child
      case e => e
    }
    SparkBridge.ofRows(df.sparkSession,
      TopKPerKey(keys, sortPlan.order, k, sortPlan.child))
  }
}
