package graft.ext

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Independent re-implementation check for q108: the BM25 top-k is
  * recomputed driver-side from raw token counts with the same exact
  * integer formula — a second implementation, not a replay of the
  * Spark plan — and must agree rank-for-rank and score-for-score.
  */
class Bm25Spec extends SparkSpec {

  test("q108: distributed BM25 matches a driver-side reference implementation") {
    val query = Seq("fast", "hash", "join", "dup")
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
    val n = docs.size.toLong
    val t = docs.values.map(_.size.toLong).sum
    val dfm = query.map(q => q -> docs.values.count(_.contains(q)).toLong).toMap
    val scores = docs.map { case (id, toks) =>
      val dl = toks.size.toLong
      val s = query.map { q =>
        val tf = toks.count(_ == q).toLong
        if (tf == 0) 0L
        else {
          val df = dfm(q)
          val idf = (2 * (n - df) + 1) * 1000000L / (2 * df + 1)
          val sat = 44 * tf * t * 1000000L / (20 * tf * t + 6 * t + 18 * dl * n)
          idf * sat / 1000000L
        }
      }.sum
      val matched = query.count(toks.contains(_)).toLong
      (id, s, matched)
    }.filter(_._3 > 0).toSeq
    val expected = scores.sortBy { case (id, s, _) => (-s, id) }.take(20)
    val got = SparkEntry.queries("q108_bm25_retrieval")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micro"),
        r.getAs[Long]("n_terms_matched")))
    assert(got.toSeq == expected,
      s"BM25 mismatch:\n got=${got.toSeq}\n exp=$expected")
    // the rare term dominates: top-ranked docs must contain 'dup'
    assert(got.take(3).forall { case (id, _, _) => docs(id).contains("dup") })
  }
}
