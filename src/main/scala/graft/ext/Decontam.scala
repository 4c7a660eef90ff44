package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q67_decontaminate", q67, Some(q67Sql), headline = true),
  )
}
