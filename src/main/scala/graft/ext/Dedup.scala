package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for a training-data pipeline, over
  * `documents` (BASELINE.json north star). Four tiers:
  *
  *   - exact (hash-groupBy) — q44
  *   - n-gram Jaccard via an inverted shingle index — q45
  *   - MinHash + LSH banding — q46 (rows-only; no SQL equivalent)
  *   - SimHash — q47 (rows-only)
  *
  * Scale design: everything is formulated as joins/aggregations over
  * exploded shingle/band rows — the inverted-index shape that shuffles
  * by shingle/band key and never materializes the O(n²) pair space.
  * Candidate blocking (same `source`, close `n_chars`) mirrors how a
  * 100 TB crawl dedup blocks by domain/size bucket.
  */
object Dedup {

  /** 3-word shingles of the space-tokenized text, distinct per doc.
    * Guarded for <3-word docs (ANSI mode: no out-of-bounds access).
    */
  private def shingles(text: Column): Column = {
    val ws = split(text, " ")
    array_distinct(
      when(size(ws) >= 3,
        transform(sequence(lit(0), size(ws) - 3), i =>
          concat_ws(" ",
            element_at(ws, i + 1),
            element_at(ws, i + 2),
            element_at(ws, i + 3))))
        .otherwise(array(text)))
  }

  /** q44 — exact dedup: hash-groupBy on the full text (md5 key —
    * shuffles 16-byte keys, not document bodies). `keep_id` = min
    * doc_id per group, the reference-style survivor pick.
    */
  private def q44(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(md5(to_binary(col("text"), lit("utf-8"))).as("text_md5"))
      .agg(
        min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("n_chars")).as("total_chars"))
      .orderBy("keep_id")

  private val q44Sql =
    """SELECT md5(text) AS text_md5, MIN(doc_id) AS keep_id,
      |       COUNT(*) AS n_copies, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin

  /** Document-frequency cap for the inverted index: shingles seen in
    * more than this many docs are dropped from CANDIDATE GENERATION
    * (they carry no discriminative signal and would quadratically
    * blow up the self-join at scale — the standard stop-shingle
    * optimization). Exact Jaccard is then verified on the FULL
    * shingle sets, so pruning affects recall of candidates only, not
    * the reported similarity.
    */
  private val MaxShingleDf = 50

  /** q45 — n-gram (3-shingle) Jaccard near-dup pairs, two phases:
    * (1) candidate pairs from a DF-pruned inverted shingle index
    * (shuffle key = shingle; never materializes O(n²) pairs);
    * (2) exact verify: join each candidate pair back to the two docs'
    * full distinct-shingle arrays, Jaccard = |A∩B| / (|A|+|B|-|A∩B|).
    * Pairs ≥ 0.5 survive. Int/int division → bit-identical doubles.
    */
  private def q45(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
    val sh = d.select(col("doc_id"), explode(col("sh")).as("s"))
    val rare = sh.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxShingleDf)
      .select(col("s"))
    val indexed = sh.join(rare, "s")
    val cand = indexed.select(col("s"), col("doc_id").as("a_id"))
      .join(indexed.select(col("s"), col("doc_id").as("b_id")), "s")
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    val da = d.select(col("doc_id").as("a_id"), col("sh").as("a_sh"))
    val db = d.select(col("doc_id").as("b_id"), col("sh").as("b_sh"))
    cand.join(da, "a_id").join(db, "b_id")
      .select(
        col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).as("inter"),
        size(col("a_sh")).as("na"),
        size(col("b_sh")).as("nb"))
      .withColumn("jaccard", col("inter") / (col("na") + col("nb") - col("inter")))
      .filter(col("jaccard") >= 0.5)
      .orderBy("a_id", "b_id")
  }

  private val q45Sql =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |docsh AS (
       |  SELECT doc_id, list(DISTINCT s) AS sh FROM (
       |    SELECT doc_id,
       |           CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                ELSE array_to_string(ws, ' ') END AS s
       |    FROM (SELECT doc_id, ws,
       |                 unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
       |                             ELSE [1] END) AS i
       |          FROM w))
       |  GROUP BY doc_id),
       |sh AS (SELECT doc_id, unnest(sh) AS s FROM docsh),
       |rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= $MaxShingleDf),
       |indexed AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM indexed a JOIN indexed b ON a.s = b.s AND a.doc_id < b.doc_id),
       |scored AS (
       |  SELECT a_id, b_id,
       |         CAST(len(list_intersect(da.sh, db.sh)) AS INT) AS inter,
       |         CAST(len(da.sh) AS INT) AS na, CAST(len(db.sh) AS INT) AS nb
       |  FROM cand JOIN docsh da ON a_id = da.doc_id JOIN docsh db ON b_id = db.doc_id)
       |SELECT a_id, b_id, inter, na, nb,
       |       inter / (na + nb - inter) AS jaccard
       |FROM scored WHERE inter / (na + nb - inter) >= 0.5
       |ORDER BY a_id, b_id""".stripMargin

  /** Number of MinHash permutations and LSH bands (16 bands × 8 rows:
    * catches Jaccard ≳ 0.55 with high probability).
    */
  private val NumHashes = 128
  private val NumBands  = 16
  private val RowsPerBand = NumHashes / NumBands

  /** MinHash signature: for seed k, `min over shingles of
    * murmur3(shingle, k)` — built entirely from Catalyst built-ins
    * (`transform`/`array_min`/`hash`), no UDF.
    */
  private def minhashSig(sh: Column): Column =
    transform(sequence(lit(0), lit(NumHashes - 1)), k =>
      array_min(transform(sh, s => hash(s, k))))

  /** q46 — MinHash + LSH banding near-dup detection (rows-only: no
    * DuckDB equivalent; correctness covered by MinHashSpec and by
    * agreement with q45 on the planted near-dup pair).
    *
    * Pipeline: signature per doc → explode 16 band keys (hash of the
    * band's 8 signature slots) → self-join on (band, key) → distinct
    * candidate pairs → estimate Jaccard as fraction of agreeing
    * signature slots → keep est ≥ 0.5. The shuffle key is the band
    * hash; the O(n²) pair space is never touched.
    */
  private def q46(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), minhashSig(shingles(col("text"))).as("sig"))
    val banded = d.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(NumBands - 1)), b =>
        struct(b.as("band"),
          hash(slice(col("sig"), b * RowsPerBand + 1, lit(RowsPerBand))).as("bkey"))))
        .as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.bkey"))
    val cand = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        col("x.sig").as("a_sig"), col("y.sig").as("b_sig"))
      .distinct()
    cand
      .withColumn("est_jaccard",
        size(filter(zip_with(col("a_sig"), col("b_sig"), (p, q) => p === q), b => b))
          .cast("double") / NumHashes)
      .filter(col("est_jaccard") >= 0.5)
      .select(col("a_id"), col("b_id"), col("est_jaccard"))
      .orderBy("a_id", "b_id")
  }

  /** q47 — 64-bit SimHash per document (rows-only): per-word xxhash64,
    * one fold builds all 64 bit-counters, majority vote per bit. A
    * single-pass array fold — no shuffle at all until the final sort.
    */
  private def q47(spark: SparkSession, dir: String): DataFrame = {
    val d  = Tables.documents(spark, dir)
    val ws = split(col("text"), " ")
    val hashes = transform(ws, w => xxhash64(w))
    // Per-bit masks as one literal array column (Spark's shiftleft only
    // takes a literal Int, so shifting by a lambda variable is out).
    val masks = typedLit((0 until 64).map(j => 1L << j))
    val counters = aggregate(
      hashes,
      array_repeat(lit(0L), 64),
      (acc, h) =>
        zip_with(acc, masks, (a, m) =>
          a + when(h.bitwiseAND(m) =!= 0, lit(1L)).otherwise(lit(0L))))
    val n = size(ws)
    val simhash = aggregate(
      zip_with(counters, masks, (c, m) =>
        when(c * 2 > n.cast("long"), m).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b))
    d.select(col("doc_id"), simhash.as("simhash"), n.as("n_words"))
      .orderBy("doc_id")
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q44_exact_dedup",    q44, Some(q44Sql), headline = true),
    QuerySpec("q45_ngram_jaccard",  q45, Some(q45Sql), headline = true),
    QuerySpec("q46_minhash_lsh",    q46, None,         headline = true),
    QuerySpec("q47_simhash",        q47, None),
  )
}
