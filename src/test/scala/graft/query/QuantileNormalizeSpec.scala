package graft.query

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q193 quantile normalization: exact per-row recompute (the global
  * sorted-value lookup) plus the order-preservation contract.
  */
class QuantileNormalizeSpec extends SparkSpec {

  private lazy val docs = graft.Tables.documents(spark, sf)
    .select(col("doc_id"), col("source"), col("n_chars"))
    .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

  private lazy val rows =
    SparkEntry.queries("q193_quantile_normalize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  test("every row maps to the global sorted value at its quantile index") {
    val globalSorted = docs.map(_._3).sorted
    val n = globalSorted.length.toLong
    val bySource = docs.groupBy(_._2)
    val expected = bySource.toSeq.flatMap { case (_, members) =>
      val ranked = members.sortBy(t => (t._3, t._1)).zipWithIndex
      val sn = members.length.toLong
      ranked.toSeq.map { case ((id, _, v), i) =>
        val qppm = i.toLong * 1000000L / math.max(sn - 1, 1)
        val g = 1 + qppm * (n - 1) / 1000000L
        id -> (v, qppm, globalSorted((g - 1).toInt))
      }
    }.toMap
    assert(rows.length == docs.length, "normalization must be row-preserving")
    rows.foreach { case (id, _, v, qppm, nv) =>
      val (ev, eq, env) = expected(id)
      assert(v == ev && qppm == eq && nv == env, s"doc $id mismatch")
    }
  }

  test("within every source the mapping preserves order") {
    rows.groupBy(_._2).foreach { case (_, rs) =>
      val byV = rs.sortBy(r => (r._3, r._1)).map(_._5)
      assert(byV.zip(byV.drop(1)).forall { case (a, b) => a <= b },
        "norm_v must be monotone in v within a source")
    }
  }
}
