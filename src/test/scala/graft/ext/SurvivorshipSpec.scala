package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q194 survivorship: every field rule recomputed driver-side from
  * the q59 cluster assignments, and the defining property — different
  * fields donated by different member rows — actually exercised.
  */
class SurvivorshipSpec extends SparkSpec {

  test("each golden-record field obeys its own survivorship rule") {
    val members = SparkEntry.queries("q59_dup_clusters")(spark, sf)
      .select(col("doc_id"), col("comp_id"))
      .join(graft.Tables.documents(spark, sf)
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3), r.getLong(4)))
    val byComp = members.groupBy(_._2)
    val got = SparkEntry.queries("q194_survivorship")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getString(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == byComp.keySet)
    byComp.foreach { case (comp, ms) =>
      val (n, lang, source, textFrom, maxChars) = got(comp)
      assert(n == ms.length)
      assert(maxChars == ms.map(_._5).max)
      assert(textFrom == ms.sortBy(m => (-m._5, m._1)).head._1, s"comp $comp text donor")
      assert(source == ms.minBy(_._1)._4, s"comp $comp provenance donor")
      val mode = ms.groupBy(_._3).toSeq.map { case (l, g) => (l, g.length) }
        .sortBy { case (l, c) => (-c, l) }.head._1
      assert(lang == mode, s"comp $comp consensus lang")
    }
  }

  test("some cluster's text donor differs from its provenance donor") {
    // the property that distinguishes survivorship from keep-one-row
    // dedup: fields fused from DIFFERENT member rows
    val rows = SparkEntry.queries("q194_survivorship")(spark, sf).collect()
      .filter(_.getLong(1) > 1)
    assert(rows.nonEmpty, "near-dup clusters must exist at sf0.001")
    val members = SparkEntry.queries("q59_dup_clusters")(spark, sf)
      .select(col("doc_id"), col("comp_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val minByComp = members.groupBy(_._2).map { case (c, ms) => c -> ms.map(_._1).min }
    assert(rows.exists(r => r.getLong(4) != minByComp(r.getLong(0))),
      "at least one cluster should take text from a non-earliest member")
  }
}
