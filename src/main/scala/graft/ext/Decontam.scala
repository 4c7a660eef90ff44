package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the training-data hygiene op: find
  * train-split documents that share any long word n-gram with a
  * held-out (test) document, so evaluation data can be scrubbed from
  * the training corpus. Uses the SAME deterministic md5 split as q58,
  * so "train" and "test" here are the real splits a trainer would
  * consume, and 8-grams (the common published decontamination window)
  * — long enough that chance vocabulary overlap doesn't fire, short
  * enough to catch copied passages.
  *
  * Scale shape: an inverted index on the md5 of each gram — the
  * shuffle key is a fixed 32-hex-char digest, not the gram text, and
  * the join is gram-equi (never doc×doc). The test side of a real
  * decontamination run (benchmark suites) is tiny relative to the
  * corpus, so at 100 TB the gram join broadcasts the test index and
  * the whole op is a map stage over train grams; here both sides come
  * from `documents` and AQE picks the strategy.
  */
object Decontam {

  /** Decontamination n-gram width. */
  private val GramN = 8

  /** q67 — contaminated train docs: for every train-split document
    * sharing ≥1 distinct 8-gram with any test-split document, report
    * how many distinct grams leak and how many test docs are hit.
    */
  private def q67(spark: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(spark, dir)
      .withColumn("bucket", TrainPrep.splitBucket(col("doc_id")))
      .select(col("doc_id"), col("bucket"),
        explode(graft.functions.word_shingles(col("text"), GramN)).as("g"))
      .select(col("doc_id"), col("bucket"),
        md5(to_binary(col("g"), lit("utf-8"))).as("gh"))
    val train = grams.filter(col("bucket") < TrainPrep.TrainPct)
      .select(col("doc_id"), col("gh"))
    val test = grams.filter(col("bucket") >= TrainPrep.TrainPct + TrainPrep.ValPct)
      .select(col("doc_id").as("test_id"), col("gh"))
    train.join(test, "gh")
      .groupBy(col("doc_id"))
      .agg(
        countDistinct(col("gh")).as("n_shared_grams"),
        countDistinct(col("test_id")).as("n_test_docs"))
      .orderBy("doc_id")
  }

  private val q67Sql =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
       |         string_split(text, ' ') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, bucket,
       |         md5(CASE WHEN len(ws) >= $GramN
       |                  THEN array_to_string(ws[i:i+${GramN - 1}], ' ')
       |                  ELSE array_to_string(ws, ' ') END) AS gh
       |  FROM (SELECT doc_id, bucket, ws,
       |               unnest(CASE WHEN len(ws) >= $GramN
       |                           THEN range(1, len(ws) - ${GramN - 2})
       |                           ELSE [1] END) AS i
       |        FROM w)),
       |tr AS (SELECT doc_id, gh FROM g WHERE bucket < ${TrainPrep.TrainPct}),
       |te AS (SELECT doc_id AS test_id, gh FROM g
       |       WHERE bucket >= ${TrainPrep.TrainPct + TrainPrep.ValPct})
       |SELECT tr.doc_id,
       |       COUNT(DISTINCT tr.gh) AS n_shared_grams,
       |       COUNT(DISTINCT te.test_id) AS n_test_docs
       |FROM tr JOIN te ON tr.gh = te.gh
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** Bloom sizing for q73: 4096 bits (64 longs — a 512-byte sketch)
    * × 6 probes. For a blocklist of n keys the false-positive rate is
    * ≈ (1 − e^(−kn/m))^k; production sizes m to the blocklist.
    */
  private val BloomBits = 4096
  private val BloomK    = 6

  /** The two independent 60-bit hashes feeding the Bloom double
    * hashing — the halves of the key's md5 (h2 forced odd so the
    * probe stride never degenerates). Engine-identical by
    * construction; `th` is the md5 hex of the key.
    */
  private[graft] def bloomH1(th: Column): Column =
    conv(substring(th, 1, 15), 16, 10).cast("long")
  private[graft] def bloomH2(th: Column): Column =
    conv(substring(th, 16, 15), 16, 10).cast("long").bitwiseOR(1)

  /** q73 — blocklist filtering via a broadcast Bloom filter: the
    * "drop known-bad documents" pass (opt-outs, eval sets, flagged
    * content) a training pipeline runs map-side. The blocklist (here:
    * every text fingerprint in source src0) aggregates into ONE
    * 512-byte bitmap row ([[graft.functions.BloomAgg]] — bitwise OR
    * is algebraic, so the build is exact partial aggregation);
    * corpus rows then test membership with the codegen'd
    * [[graft.functions.BloomMightContain]] against the 1-row
    * broadcast — at 100 TB the corpus side is a pure map stage and
    * only sketch bytes move, vs an anti-join shuffling every
    * fingerprint. The report compares Bloom hits to exact hits per
    * source, surfacing the (bounded) false-positive rate; a
    * production filter would semi-join only the Bloom survivors for
    * exactness. Oracle-checked bit-for-bit: the md5 double hashing
    * makes the bitmap engine-portable, so DuckDB re-derives every
    * membership answer relationally (distinct set positions vs each
    * key's k probe positions).
    */
  private def q73(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        md5(to_binary(col("text"), lit("utf-8"))).as("th"))
      .withColumn("h1", bloomH1(col("th")))
      .withColumn("h2", bloomH2(col("th")))
    val block = keyed.filter(col("source") === "src0")
    val sketch = block.select(col("h1"), col("h2")).as[(Long, Long)]
      .groupByKey(_ => 0) // one global sketch; partial agg stays map-side
      .agg(graft.functions.BloomAgg(BloomBits, BloomK).toColumn.name("bloom"))
      .toDF("g", "bloom").select(col("bloom"))
    val exact = block.select(col("th")).distinct().withColumn("exact_hit", lit(1L))
    keyed.crossJoin(broadcast(sketch))
      .withColumn("bloom_hit",
        graft.functions.bloom_might_contain(
          col("bloom"), col("h1"), col("h2"), BloomBits, BloomK).cast("long"))
      .join(exact, Seq("th"), "left")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("bloom_hit")).as("n_bloom_hits"),
        sum(coalesce(col("exact_hit"), lit(0L))).as("n_exact_hits"))
      .orderBy("source")
  }

  private val q73Sql =
    s"""WITH k AS (
       |  SELECT doc_id, source, md5(text) AS th,
       |         ('0x' || substr(md5(text), 1, 15))::BIGINT AS h1,
       |         (('0x' || substr(md5(text), 16, 15))::BIGINT) | 1 AS h2
       |  FROM documents),
       |bl AS (SELECT DISTINCT th, h1, h2 FROM k WHERE source = 'src0'),
       |pos AS (SELECT DISTINCT (h1 + i * h2) % $BloomBits AS p
       |        FROM bl, range(0, $BloomK) r(i)),
       |dp AS (SELECT doc_id, (h1 + i * h2) % $BloomBits AS p
       |       FROM k, range(0, $BloomK) r(i)),
       |hit AS (SELECT doc_id FROM dp JOIN pos ON dp.p = pos.p
       |        GROUP BY doc_id HAVING COUNT(*) = $BloomK)
       |SELECT source, COUNT(*) AS n_docs,
       |       CAST(SUM(CASE WHEN hit.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
       |       CAST(SUM(CASE WHEN k.th IN (SELECT th FROM bl) THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hits
       |FROM k LEFT JOIN hit ON k.doc_id = hit.doc_id
       |GROUP BY source ORDER BY source""".stripMargin

  /** Containment threshold for q155: flag a (train, test) pair when
    * the train doc covers ≥ half of the test doc's distinct shingles.
    */
  private val ContainThreshold = 0.5

  /** q155 — ASYMMETRIC containment decontamination: for each
    * (train, test) candidate pair, containment = |train ∩ test| /
    * |test| over distinct 3-word shingles. This is the leakage
    * detector symmetric Jaccard (q45/q116) structurally misses: a
    * 200-word benchmark item pasted into a 20k-word train document has
    * Jaccard ≈ 0.01 but containment ≈ 1.0. q67 catches verbatim
    * 8-gram copies; containment catches PARAPHRASE-ADJACENT leakage
    * where most-but-not-all of the benchmark's vocabulary n-grams
    * survive.
    *
    * Scale shape identical to q67: inverted index keyed by the
    * shingle md5 (digests through the shuffle, never text), test side
    * tiny in production → broadcast; the denominator |test| rides the
    * index rows so the ratio needs no extra join. Int/int division →
    * bit-identical doubles (q45 precedent).
    */
  private def q155(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("bucket", TrainPrep.splitBucket(col("doc_id")))
      .select(col("doc_id"), col("bucket"),
        graft.functions.word_shingles(col("text"), 3).as("sh"))
    val grams = docs.select(col("doc_id"), col("bucket"), size(col("sh")).as("nsh"),
      explode(col("sh")).as("s"))
      .select(col("doc_id"), col("bucket"), col("nsh"),
        md5(to_binary(col("s"), lit("utf-8"))).as("gh"))
    val train = grams.filter(col("bucket") < TrainPrep.TrainPct)
      .select(col("doc_id").as("train_id"), col("gh"))
    val test = grams.filter(col("bucket") >= TrainPrep.TrainPct + TrainPrep.ValPct)
      .select(col("doc_id").as("test_id"), col("nsh").as("n_test_sh"), col("gh"))
    train.join(test, "gh")
      .groupBy(col("train_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"), min(col("n_test_sh")).as("n_test_sh"))
      .withColumn("containment", col("n_shared") / col("n_test_sh"))
      .filter(col("containment") >= ContainThreshold)
      .select(col("train_id"), col("test_id"), col("n_shared").cast("int").as("n_shared"),
        col("n_test_sh"), col("containment"))
      .orderBy("train_id", "test_id")
  }

  private val q155Sql =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
       |         string_split(text, ' ') AS ws
       |  FROM documents),
       |docsh AS (
       |  SELECT doc_id, bucket, list(DISTINCT s) AS sh FROM (
       |    SELECT doc_id, bucket,
       |           CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |                ELSE array_to_string(ws, ' ') END AS s
       |    FROM (SELECT doc_id, bucket, ws,
       |                 unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
       |                             ELSE [1] END) AS i
       |          FROM w))
       |  GROUP BY doc_id, bucket),
       |g AS (SELECT doc_id, bucket, CAST(len(sh) AS INT) AS nsh, md5(unnest(sh)) AS gh
       |      FROM docsh),
       |tr AS (SELECT doc_id AS train_id, gh FROM g WHERE bucket < ${TrainPrep.TrainPct}),
       |te AS (SELECT doc_id AS test_id, nsh AS n_test_sh, gh FROM g
       |       WHERE bucket >= ${TrainPrep.TrainPct + TrainPrep.ValPct})
       |SELECT train_id, test_id,
       |       CAST(COUNT(*) AS INT) AS n_shared,
       |       MIN(n_test_sh) AS n_test_sh,
       |       COUNT(*) / MIN(n_test_sh) AS containment
       |FROM tr JOIN te USING (gh)
       |GROUP BY train_id, test_id
       |HAVING COUNT(*) / MIN(n_test_sh) >= $ContainThreshold
       |ORDER BY train_id, test_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q67_decontaminate", q67, Some(q67Sql), headline = true),
    QuerySpec("q73_bloom_blocklist", q73, Some(q73Sql), headline = true),
    QuerySpec("q155_containment_decontam", q155, Some(q155Sql)),
  )
}
