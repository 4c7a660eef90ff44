package graft.ext

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** q200 capstone: the fused pipeline must agree stage-by-stage with a
  * driver-side replay of the four rules.
  */
class CapstoneSpec extends SparkSpec {

  test("fused DAG equals the stage-by-stage replay") {
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text"), col("n_chars"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    // dedup: min doc_id per exact text
    val kept = docs.groupBy(_._3).map { case (_, g) => g.minBy(_._1) }
    // quality: >= 5 tokens, >= 30% distinct
    val q = kept.filter { case (_, _, text, _) =>
      val w = text.split(" ", -1)
      w.length >= 5 && w.distinct.length * 10 >= w.length * 3
    }
    def bucket(id: Long): Long = {
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 100
    }
    val expected = q.groupBy { case (id, lang, _, _) =>
      val b = bucket(id)
      (if (b < 80) "train" else if (b < 90) "val" else "test", lang)
    }.map { case (k, g) =>
      k -> (g.size.toLong,
        g.map(_._3.split(" ", -1).length.toLong).sum,
        g.map(_._4).sum)
    }
    val got = SparkEntry.queries("q200_corpus_capstone")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected)
    // the corpus plants NEAR-dups but no byte-exact dups, so the dedup
    // stage must be a verified pass-through here (q44 proves the
    // non-trivial case on its own fixture); the quality gate must bite
    assert(kept.size == docs.length, "corpus has no byte-exact dups")
    assert(got.values.map(_._1).sum < docs.length.toLong,
      "quality filter must drop rows")
  }
}
