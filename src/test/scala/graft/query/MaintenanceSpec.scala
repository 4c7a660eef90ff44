package graft.query

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantic invariants of the snapshot-diff and erasure audits —
  * properties the oracle hash can't articulate (it only proves both
  * engines agree on the same derivation).
  */
class MaintenanceSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q105: diff statuses reconcile with the snapshot definitions") {
    val byStatus = run("q105_corpus_diff").collect()
      .groupBy(_.getAs[String]("status"))
      .view.mapValues(_.map(_.getAs[Long]("n_docs")).sum).toMap
    val docs = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0))
    val added = docs.count(id => id % 11 == 5 && id % 13 != 2)
    val removed = docs.count(id => id % 11 != 5 && id % 13 == 2)
    // changed = in both snapshots with revised text
    val changed = docs.count(id => id % 11 != 5 && id % 13 != 2 && id % 7 == 0)
    assert(byStatus.getOrElse("added", 0L) == added)
    assert(byStatus.getOrElse("removed", 0L) == removed)
    assert(byStatus.getOrElse("changed", 0L) == changed)
    // every doc present in at least one snapshot is accounted for once
    val inEither = docs.count(id => id % 11 != 5 || id % 13 != 2)
    assert(byStatus.values.sum == inEither)
  }

  test("q106: erasure cascade is consistent across tables") {
    val rows = run("q106_gdpr_erasure").collect()
      .map(r => r.getAs[String]("table_name") ->
        ((r.getAs[Long]("rows_before"), r.getAs[Long]("rows_erased"),
          r.getAs[Long]("rows_after")))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    // before = erased + after on every table
    rows.values.foreach { case (b, e, a) => assert(b == e + a) }
    // the cascade erases every order of every forgotten customer
    val expOrders = Tables.orders(spark, sf)
      .filter(col("o_custkey") % 53 === 7).count()
    assert(rows("orders")._2 == expOrders)
    // and exactly the lineitems belonging to those orders
    val expLi = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_custkey") % 53 === 7)
        .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(rows("lineitem")._2 == expLi)
    // erasure is non-trivial on this data: something is actually erased
    assert(rows.values.forall(_._2 > 0))
  }
}
