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

  test("q265/q266 index maintenance: merged and folded state equal the scratch build") {
    val scratch = SparkEntry.queries("q108_bm25_retrieval")(spark, sf).collect().toSeq

    // the df-merge path must be genuinely exercised: every query term
    // must appear on BOTH sides of the 90/10 split, so its merged df
    // is a real sum of two nonzero partials
    val sides = Tables.documents(spark, sf)
      .withColumn("is_batch", TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
      .select(col("is_batch"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin("fast", "hash", "join", "dup"))
      .groupBy(col("term")).agg(countDistinct(col("is_batch")).as("sides"))
      .collect()
    assert(sides.length == 4 && sides.forall(_.getLong(1) == 2L),
      s"fixture drift: a query term no longer spans both splits — ${sides.toSeq}")

    assert(SparkEntry.queries("q265_incremental_bm25")(spark, sf).collect().toSeq
      == scratch, "incremental merge != scratch index")
    assert(SparkEntry.queries("q266_stream_bm25_maintenance")(spark, sf).collect().toSeq
      == scratch, "streaming fold != scratch index")
  }

  test("q273 delete maintenance: subtract == rebuild over the survivors") {
    // the delete path must be genuinely exercised: the doomed bucket
    // must be non-empty and must contain at least one query term
    // occurrence, so df/totals subtraction moves real numbers
    val doomed = Tables.documents(spark, sf)
      .filter(TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
    assert(!doomed.isEmpty, "fixture drift: doomed bucket is empty")
    val doomedTerms = doomed
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin("fast", "hash", "join", "dup"))
    assert(!doomedTerms.isEmpty,
      "fixture drift: doomed docs carry no query terms — df subtraction untested")
    // rebuild from scratch over the SURVIVORS only (the in-engine
    // mirror of q273's DuckDB oracle)
    val survivors = Tables.documents(spark, sf)
      .filter(TrainPrep.md5Bucket(col("doc_id"), 100) < 90)
      .select(col("doc_id"), col("text"))
    val rebuilt = TextStats.bm25FromState(TextStats.bm25IndexState(survivors))
      .collect().toSeq
    val maintained = SparkEntry.queries("q273_bm25_delete_maintenance")(spark, sf)
      .collect().toSeq
    assert(maintained == rebuilt, "delete-maintained != rebuilt-from-survivors")
  }

  test("q273 conservation: survivors + deleted == total on df and totals") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
    val doomed = docs.filter(TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
    val full = TextStats.bm25IndexState(docs)
    val del = TextStats.bm25IndexState(doomed)
    val kept = TextStats.subtractBm25(full, del)
    // totals: surviving + deleted must reassemble the full corpus
    val Seq(tk, nk) = kept.totals.collect().head.toSeq.map(_.asInstanceOf[Long])
    val Seq(td, nd) = del.totals.collect().head.toSeq.map(_.asInstanceOf[Long])
    val Seq(tf0, nf) = full.totals.collect().head.toSeq.map(_.asInstanceOf[Long])
    assert(tk + td == tf0 && nk + nd == nf,
      s"totals not conserved: kept=($tk,$nk) del=($td,$nd) full=($tf0,$nf)")
    assert(nd > 0, "fixture drift: nothing deleted")
    // df: per-term surviving + deleted == full, over the whole vocab
    val mismatch = kept.dfS.select(col("term"), col("df").as("df_k"))
      .join(del.dfS.select(col("term"), col("df").as("df_d")), Seq("term"), "full_outer")
      .join(full.dfS.select(col("term"), col("df").as("df_f")), Seq("term"), "full_outer")
      .filter(coalesce(col("df_k"), lit(0L)) + coalesce(col("df_d"), lit(0L))
        =!= coalesce(col("df_f"), lit(0L)))
    assert(mismatch.isEmpty,
      s"df not conserved for terms: ${mismatch.limit(5).collect().mkString(",")}")
  }

  test("q266 batching invariance: 1 file per trigger == all files at once") {
    val stage = java.nio.file.Files.createTempDirectory("graft_bm25spec").toString
    try {
      Tables.documents(spark, sf).repartition(4, col("doc_id"))
        .write.mode("overwrite").parquet(stage)
      val (perFile, n1) = TextStats.streamBm25(spark, stage, filesPerTrigger = 1)
      val (allAtOnce, n2) = TextStats.streamBm25(spark, stage, filesPerTrigger = 4)
      assert(n1 > n2, s"staging must actually split the stream ($n1 vs $n2 batches)")
      assert(perFile.collect().toSeq == allAtOnce.collect().toSeq,
        "fold result depends on batching — the merge is not associative")
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(stage)))
    }
  }
}
