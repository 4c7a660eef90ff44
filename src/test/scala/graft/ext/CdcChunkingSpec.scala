package graft.ext

import graft.{SparkEntry, SparkSpec}

/** Proves q160's load-bearing CDC property (the oracle only proves the
  * chunking is computed as specified): chunk boundaries depend on
  * LOCAL content, so prepending words to a document changes only the
  * chunks up to the first cut point — every later chunk keeps its
  * exact digest, which is what makes chunk-level dedup/transfer
  * incremental. Fixed-size windows (q87) lose every digest under the
  * same edit.
  */
class CdcChunkingSpec extends SparkSpec {

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Mirror of q160's cut rule: md5 bucket (first 15 hex chars) mod 16. */
  private def isCut(w: String): Boolean =
    (java.lang.Long.parseLong(md5hex(w).take(15), 16) % 16) == 0

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc").toString
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("prepending words preserves every chunk after the first cut; q87 loses all") {
    val words = (0 until 400).map(i => s"word$i")
    val (cutWords, plainWords) = words.partition(isCut)
    assert(cutWords.size >= 3 && plainWords.size >= 120, "fixture vocabulary too small")
    // base doc: plain*40, cut, plain*40, cut, plain*30
    val p = plainWords.iterator
    val baseTokens =
      (1 to 40).map(_ => p.next()) ++ Seq(cutWords(0)) ++
        (1 to 40).map(_ => p.next()) ++ Seq(cutWords(1)) ++
        (1 to 30).map(_ => p.next())
    val prefix = (1 to 7).map(_ => p.next()) // all plain: no new cut inside it
    val docA = baseTokens.mkString(" ")
    val docB = (prefix ++ baseTokens).mkString(" ")
    val dir = writeDocs(Seq((0L, docA), (1L, docB)))

    def digests(q: String): Map[Long, Seq[String]] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
          r.getAs[String]("chunk_digest")))
        .groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap

    val cdc = digests("q160_cdc_chunking")
    // both docs cut after the same two interior cut words → 3 chunks
    assert(cdc(0L).size == 3 && cdc(1L).size == 3, s"chunk counts: ${cdc.view.mapValues(_.size).toMap}")
    // chunk 0 absorbs the prepended words and differs; chunks 1,2 are
    // byte-identical — the incremental-dedup property
    assert(cdc(0L).head != cdc(1L).head)
    assert(cdc(0L).drop(1) == cdc(1L).drop(1),
      "tail chunks must survive a front insertion unchanged")

    // fixed-size chunking under the same edit: every window shifts by
    // the prefix length, so no digest survives
    val fixed = digests("q87_doc_chunking")
    assert(fixed(0L).toSet.intersect(fixed(1L).toSet).isEmpty,
      "expected q87 to lose every window digest under a front insertion")
  }
}
