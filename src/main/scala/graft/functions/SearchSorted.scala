package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Bucket index of a BIGINT key against a SORTED DISTINCT literal cut
  * array: returns #{cuts(i) < key} via binary search — the
  * range-bucket assignment [[graft.scale.DistributedRank]] builds on.
  * A fold of chained `WHEN key > cut` comparisons is semantically
  * identical but LINEAR in the cut count and, worse, two such chains
  * in one projection blow past the JIT's method-size limits and
  * deoptimize the whole stage (measured on q242: 0.9s → 8s with two
  * 63-deep chains; see DistributedRankSpec's depth note). This
  * expression is O(log cuts) per row, codegen'd as one
  * `Arrays.binarySearch` call against a referenced long[], so bucket
  * counts can scale to the thousands a 100 TB rank needs.
  */
case class SearchSortedLong(child: Expression, cuts: Seq[Long])
    extends UnaryExpression {
  require(cuts == cuts.distinct.sorted, "cuts must be sorted and distinct")

  private val cutsArray: Array[Long] = cuts.toArray

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"search_sorted requires bigint, got ${child.dataType}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "search_sorted"

  override protected def nullSafeEval(k: Any): Any =
    SearchSortedLong.bucketOf(cutsArray, k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("cuts", cutsArray, "long[]")
    defineCodeGen(ctx, ev, k =>
      s"graft.functions.SearchSortedLong.bucketOf($arr, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): SearchSortedLong =
    copy(child = newChild)
}

object SearchSortedLong {
  /** #{cuts(i) < k} for sorted distinct cuts. */
  def bucketOf(cuts: Array[Long], k: Long): Int = {
    val pos = java.util.Arrays.binarySearch(cuts, k)
    if (pos >= 0) pos else -(pos + 1)
  }
}
