package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Focused equivalence test for the round-16 q152 rewrite (guide
  * §2.3/§2.4): the candidate self-join now keys on xxhash64(shingle)
  * instead of the shingle string, and the dedup + re-spread fused
  * into one keyed exchange. Both are result-invariant — a hash
  * collision can only ADD a candidate pair, and every candidate goes
  * through the exact-Jaccard verify — so the registered query must
  * emit exactly the rows of the pre-rewrite construction (string-key
  * join + distinct), replayed here inline.
  */
class PrefixFilterRewriteSpec extends SparkSpec {

  private val sfd = "/root/testdata/sf0.001"

  test("q152 rewrite emits exactly the pre-rewrite rows") {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, sfd)
      .select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .localCheckpoint(false)
    val sh = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
    val pref = sh.join(dfreq, "s")
      .withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id")).orderBy(col("df"), col("s"))))
      .join(d.select(col("doc_id"), size(col("sh")).as("nsh")), "doc_id")
      .filter(col("rn") <= expr("nsh - ((nsh + 1) div 2) + 1"))
      .select(col("doc_id"), col("s"))
    // the PRE-rewrite candidate construction: string join key, distinct
    val cand = pref.select(col("s"), col("doc_id").as("a_id"))
      .join(pref.select(col("s"), col("doc_id").as("b_id")), "s")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val da = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val db = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    val reference = cand.join(da, "a_id").join(db, "b_id")
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
        size(col("a_sh")).as("na"), size(col("b_sh")).as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .orderBy("a_id", "b_id")
      .collect().map(_.toSeq).toSeq

    val rewritten = graft.SparkEntry.queries("q152_prefix_filter_join")(spark, sfd)
      .collect().map(_.toSeq).toSeq

    assert(reference.nonEmpty, "fixture corpus must produce pairs")
    assert(rewritten == reference,
      "hash-keyed fused-exchange candidates must verify to the identical pair set")
  }
}
