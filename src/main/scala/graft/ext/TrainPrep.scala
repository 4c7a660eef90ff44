package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data preparation operators (BASELINE.json north star):
  * embedding quantization for storage and deterministic dataset
  * splitting. Both are fully relational — no driver collects, no
  * UDFs — and both carry exact DuckDB oracles.
  */
object TrainPrep {

  /** q57 — int8 scalar quantization of the embedding column, the
    * 4× storage/bandwidth op every 100 TB vector corpus applies
    * before indexing. Two phases:
    *   (1) per-dimension min/max ranges — a 64-row aggregate over
    *       posexploded values (map-side partial agg; the only
    *       shuffle is 64 keys);
    *   (2) quantize: broadcast the ranges, map each component to
    *       floor((x−mn)·254/(mx−mn))−127 clamped to [−127,127].
    * Cross-engine exactness: float32→double cast, subtraction,
    * multiply, divide, and floor are all IEEE-identical in Spark and
    * DuckDB, and the OUTPUT is integers (code sum / min / max per
    * vector — order-independent exact aggregates), so the hash
    * compare is stable.
    */
  private def q57(spark: SparkSession, dir: String): DataFrame = {
    val comps = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        posexplode(transform(col("embedding"), x => x.cast("double"))).as(Seq("pos", "x")))
    val ranges = comps.groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    // constant dimension (mn == mx) would divide 0/0 → NaN; map to 0
    val code =
      when(col("mx") === col("mn"), lit(0))
        .otherwise(least(greatest(
          (floor((col("x") - col("mn")) * 254.0 / (col("mx") - col("mn"))) - 127).cast("int"),
          lit(-127)), lit(127)))
    comps.join(broadcast(ranges), "pos")
      .select(col("vec_id"), code.as("c"))
      .groupBy(col("vec_id"))
      .agg(
        sum(col("c")).as("code_sum"),
        min(col("c")).as("code_min"),
        max(col("c")).as("code_max"),
        count(lit(1)).as("n_dims"))
      .orderBy("vec_id")
  }

  private val q57Sql =
    """WITH p AS (
      |  SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
      |         generate_subscripts(embedding, 1) AS pos
      |  FROM embeddings),
      |r AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM p GROUP BY pos),
      |q AS (
      |  SELECT vec_id,
      |         CASE WHEN mx = mn THEN 0
      |              ELSE LEAST(GREATEST(CAST(floor((x - mn) * 254.0 / (mx - mn)) - 127 AS INT), -127), 127)
      |         END AS c
      |  FROM p JOIN r USING (pos))
      |SELECT vec_id,
      |       CAST(SUM(c) AS BIGINT) AS code_sum,
      |       MIN(c) AS code_min,
      |       MAX(c) AS code_max,
      |       COUNT(*) AS n_dims
      |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin

  /** Split fractions (percent) for q58 — train/val/test 80/10/10. */
  private val TrainPct = 80
  private val ValPct   = 10

  /** md5-derived uniform bucket in [0, 100): engine-identical (md5
    * bytes are md5 bytes everywhere), stable under reruns AND under
    * corpus growth — a given doc_id never migrates between splits,
    * which `ORDER BY rand() LIMIT n` splitting cannot promise.
    */
  private def splitBucket(id: Column): Column =
    pmod(conv(substring(md5(to_binary(id.cast("string"), lit("utf-8"))), 1, 15), 16, 10)
      .cast("long"), lit(100))

  /** q58 — deterministic train/val/test split of the document corpus:
    * hash-bucket each doc_id, assign 80/10/10, report per-split
    * per-language counts and char volume (the mixture report a
    * training-data pipeline feeds its sampler). Map-only until the
    * tiny final aggregate — no shuffle of document bodies at any SF.
    */
  private def q58(spark: SparkSession, dir: String): DataFrame = {
    val b = splitBucket(col("doc_id"))
    Tables.documents(spark, dir)
      .withColumn("split",
        when(b < TrainPct, lit("train"))
          .when(b < TrainPct + ValPct, lit("val"))
          .otherwise(lit("test")))
      .groupBy(col("split"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"))
      .orderBy("split", "lang")
  }

  private val q58Sql =
    s"""WITH b AS (
       |  SELECT lang, n_chars,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
       |  FROM documents)
       |SELECT CASE WHEN bucket < $TrainPct THEN 'train'
       |            WHEN bucket < ${TrainPct + ValPct} THEN 'val'
       |            ELSE 'test' END AS split,
       |       lang, COUNT(*) AS n_docs,
       |       CAST(SUM(n_chars) AS BIGINT) AS total_chars
       |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q57_embedding_quantize", q57, Some(q57Sql), headline = true),
    QuerySpec("q58_dataset_split",      q58, Some(q58Sql)),
  )
}
