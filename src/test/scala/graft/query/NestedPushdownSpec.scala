package graft.query

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** q236: the nested parquet scan must prune to exactly the referenced
  * nested fields (schema pruning through array<struct>), and the
  * document assembly must be byte-deterministic.
  */
class NestedPushdownSpec extends SparkSpec {

  test("q236: nested-field pruning reaches the scan; array order is total") {
    // materialize the documents the query writes
    graft.SparkEntry.queries("q236_nested_pushdown")(spark, sf).collect()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_nested_orders_$tag").getAbsolutePath

    val pruned = spark.read.parquet(path)
      .select(col("o_orderpriority"),
        expr("aggregate(items.qty, 0L, (acc, x) -> acc + x)").as("tq"))
    val scans = pruned.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val read = scans.head.requiredSchema.catalogString
    assert(read.contains("qty"), s"qty not in ReadSchema: $read")
    assert(!read.contains("price_cents") && !read.contains("pk") && !read.contains("o_orderdate"),
      s"unreferenced nested fields not pruned: $read")

    // deterministic assembly: two independent builds are identical
    val a = RelationalQueries.nestedOrders(spark, sf).orderBy("o_orderkey").collect()
    val b = RelationalQueries.nestedOrders(spark, sf).orderBy("o_orderkey").collect()
    assert(a.toSeq == b.toSeq, "document assembly must be deterministic")
    // items sorted ascending by the full struct
    a.take(50).foreach { r =>
      val items = r.getAs[collection.Seq[org.apache.spark.sql.Row]]("items")
      val keys = items.map(i => (i.getAs[Int]("ln"), i.getAs[Long]("pk"),
        i.getAs[Long]("qty"), i.getAs[Long]("price_cents")))
      assert(keys == keys.sorted, s"items not sorted for order ${r.get(0)}")
    }
  }
}
