package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q279's delete algebra on the real corpus split (sf0.001): MIN has
  * no inverse, so the delete path must (a) carry untouched sources'
  * signatures through UNCHANGED, (b) refold touched sources from
  * their surviving doc-level sketch rows to exactly the from-scratch
  * survivor signature, and (c) drop a source whose docs all die.
  * (a)+(b) run against the real corpus; (c) needs a planted frame
  * (no real source dies at any SF).
  */
class MinHashDeleteSpec extends SparkSpec {

  private def sigMap(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.collect().map(r => r.getString(0) ->
      (1 until r.length).map(r.getLong).toSeq).toMap

  test("kept sources unchanged; touched sources equal the survivor scratch") {
    import graft.SparkEntry
    val bucket = TrainPrep.md5Bucket(col("doc_id"), 100)
    val docs = graft.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"), (bucket >= 90).as("doomed"))
    val touched = docs.filter(col("doomed")).select(col("source")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(touched.nonEmpty, "fixture drift: no source loses a doc at sf0.001")
    val full = sigMap(Dedup.sourceSignature(docs.select(col("source"), col("text"))))
    val scratch = sigMap(Dedup.sourceSignature(
      docs.filter(!col("doomed")).select(col("source"), col("text"))))
    val got = sigMap(SparkEntry.queries("q279_minhash_delete_maintenance")(spark, sf))
    // every source must equal the survivor scratch (the oracle's bar)…
    assert(got == scratch, "maintained != survivor scratch")
    // …and untouched sources must equal the PRE-delete state too: a
    // delete elsewhere cannot move their min (the kept-by-reference leg)
    got.filterNot { case (s, _) => touched(s) }.foreach { case (s, sig) =>
      assert(full(s) == sig, s"untouched source $s changed: ${full(s)} vs $sig")
    }
    // at least one touched source must genuinely CHANGE, or the
    // refold leg is untested (a min can survive a delete by luck)
    assert(touched.exists(s => scratch.get(s) != full.get(s)),
      "fixture drift: no touched source's signature moved")
  }

  test("a source whose docs all die leaves the table") {
    import spark.implicits._
    val docs = Seq(
      ("keepme", 1L, "alpha beta gamma delta epsilon", false),
      ("doomed_src", 2L, "one two three four five", true),
      ("doomed_src", 3L, "six seven eight nine ten", true))
      .toDF("source", "doc_id", "text", "doomed")
    val state = Dedup.sourceSignature(docs.select(col("source"), col("text")))
    val sigs = Dedup.docSignature(docs.select(col("source"), col("doc_id"), col("text")))
    val doomedIds = docs.filter(col("doomed")).select(col("doc_id"))
    val touched = sigs.join(doomedIds, Seq("doc_id"), "leftsemi")
      .select(col("source")).distinct()
    val kept = state.join(touched, Seq("source"), "left_anti")
    val refolded = sigs.join(touched, Seq("source"), "leftsemi")
      .join(doomedIds, Seq("doc_id"), "left_anti")
      .groupBy(col("source"))
      .agg(min(col("mh0")).as("mh0"),
        (1 until 8).map(k => min(col(s"mh$k")).as(s"mh$k")): _*)
    val out = kept.unionByName(refolded).select(col("source")).collect().map(_.getString(0))
    assert(out.toSet == Set("keepme"), s"dead source must vanish: ${out.toSeq}")
  }
}
