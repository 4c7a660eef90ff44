package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q191 priority sampling: selection and estimator recomputed
  * driver-side from the raw documents with independent md5/double
  * arithmetic.
  */
class PrioritySampleSpec extends SparkSpec {

  private def priority(docId: Long, w: Long): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$docId:q191".getBytes("UTF-8")).map("%02x".format(_)).mkString
    val u48 = java.lang.Long.parseLong(h.substring(0, 12), 16) + 1
    w.toDouble * 281474976710656.0 / u48.toDouble
  }

  test("kept rows are exactly the top-k priorities per source; estimator is max(w, tau)") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySource = docs.groupBy(_._2)
    val rows = SparkEntry.queries("q191_priority_sample")(spark, sf).collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getInt(3), r.getDouble(4)))
    val kept = rows.groupBy(_._1)
    assert(kept.keySet == bySource.keySet)
    bySource.foreach { case (src, members) =>
      val ranked = members.map { case (id, _, w) => (id, w, priority(id, w)) }
        .sortBy(t => (-t._3, t._1))
      val expectIds = ranked.take(10).map(_._1).toSeq
      val gotRows = kept(src).sortBy(_._4)
      assert(gotRows.map(_._2).toSeq == expectIds, s"source $src selection mismatch")
      val tau = ranked(10)._3 // the (k+1)-th priority
      gotRows.foreach { case (_, id, w, _, est) =>
        assert(est == math.max(w.toDouble, tau), s"doc $id estimator mismatch")
        assert(est >= w.toDouble)
      }
    }
  }
}
