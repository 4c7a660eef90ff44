package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q152 prefix-filter similarity join: the candidate generator is
  * provably LOSSLESS at the threshold (see the q152 scaladoc proof),
  * so the final pair set must equal the brute-force all-pairs answer —
  * checked here literally against a crossJoin over sf0.001 (500 docs,
  * 124,750 pairs; fine in a test, never in a registered query). Also
  * pins the two structural claims: q152 ⊇ q45 (the DF-capped
  * generator can only lose candidates) and the prefix index is
  * genuinely smaller than the full inverted index.
  */
class PrefixFilterSpec extends SparkSpec {

  private def pairs(name: String): Set[(Long, Long)] =
    SparkEntry.queries(name)(spark, sf).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet

  test("q152 equals brute-force all-pairs Jaccard >= 0.5 (completeness + precision)") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.word_shingles(col("text"), 3).as("sh"))
    val brute = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
      .crossJoin(d.select(col("doc_id").as("b_id"), col("sh").as("b_sh")))
      .filter(col("a_id") < col("b_id"))
      .withColumn("inter", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("inter") / (size(col("a_sh")) + size(col("b_sh")) - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val got = pairs("q152_prefix_filter_join")
    assert(got == brute, s"prefix-filter join must be exact: got ${got.size}, brute ${brute.size}")
    assert(got.size >= 28) // the planted near-dup pairs are all present
  }

  test("q152 is a superset of q45's DF-capped pairs") {
    val p45 = pairs("q45_ngram_jaccard")
    val p152 = pairs("q152_prefix_filter_join")
    assert(p45.subsetOf(p152),
      s"q45 \\ q152 = ${p45.diff(p152)} — the lossless generator lost a pair")
  }

  test("prefix index is smaller than the full inverted index") {
    val d = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), graft.functions.word_shingles(col("text"), 3).as("sh"))
    val sh = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val full = sh.count()
    // reproduce the registered query's prefix stage row count
    import org.apache.spark.sql.expressions.Window
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val pref = sh.join(dfreq, "s")
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .join(d.select(col("doc_id"), size(col("sh")).as("nsh")), "doc_id")
      .filter(col("rn") <= expr("nsh - ((nsh + 1) div 2) + 1"))
      .count()
    // prefix length is |A| - ceil(|A|/2) + 1 ≈ |A|/2 + 1: allow slack
    // for short docs but require real pruning
    assert(pref < full * 6 / 10, s"prefix rows $pref vs full index $full")
  }
}
