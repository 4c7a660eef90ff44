package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ArrayType

/** Parity + plan-shape checks for the native
  * [[graft.functions.LshBuckets]] expression that replaced the
  * interpreted hyperplane lambdas in q49/q51b.
  */
class LshBucketsSpec extends SparkSpec {

  private def vecs = graft.Tables.embeddings(spark, sf)
    .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("ve"))

  test("native lsh_buckets matches the interpreted formulation bit-for-bit") {
    // both LSH configs actually in use: q49 (4×6) and q51b (12×3)
    for ((nt, pp) <- Seq((4, 6), (12, 3))) {
      val native = vecs
        .select(col("vec_id"), graft.functions.lsh_buckets(col("ve"), nt, pp).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      val interp = vecs
        .select(col("vec_id"), Similarity.lshBucketsInterpreted(col("ve"), nt, pp).as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
      assert(native.keySet == interp.keySet)
      val diff = native.keys.filter(k => native(k) != interp(k))
      assert(diff.isEmpty, s"($nt,$pp): buckets differ for vec_ids ${diff.take(5)}")
      // keys are pp-bit bucket ids
      assert(native.values.forall(_.forall(b => b >= 0 && b < (1 << pp))))
    }
  }

  test("q49 dedups candidates on id pairs: no Aggregate groups on an array column") {
    // the multi-table `.distinct()` must carry only (qid, vec_id) —
    // a grouping key of array type means embeddings ride the exchange
    val plan = SparkEntry.queries("q49_ann_lsh")(spark, sf)
      .queryExecution.optimizedPlan
    val arrayGroups = plan.collect {
      case a: Aggregate if a.groupingExpressions.exists(_.dataType.isInstanceOf[ArrayType]) => a
    }
    assert(arrayGroups.isEmpty,
      s"q49 aggregates on array columns:\n${arrayGroups.mkString("\n")}")
  }
}
