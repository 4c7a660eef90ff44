package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STREAMING NEAR-DUP CLUSTER MAINTENANCE — the round-9 incremental
  * family (q260 clusters / q261 minhash / q262 IVF) composed into ONE
  * production-shaped Structured Streaming pipeline: documents arrive
  * as micro-batches through a file stream, and every batch updates a
  * maintained dedup state — signature index, LSH band index, and
  * cluster assignment — touching ONLY batch-keyed work. No stage ever
  * recomputes over the already-ingested corpus; the corpus side of
  * every per-batch join is served by the maintained index, exactly
  * the discipline a 100 TB ingest pipeline needs (the arriving batch
  * is GB-scale; the corpus is only ever probed through its index).
  *
  * Correctness bar (the q260 convention): the final maintained
  * assignment must equal the FROM-SCRATCH computation over the whole
  * corpus — which is what the DuckDB oracle replays, so the hash gate
  * proves `fold(batches) == scratch(corpus)` end to end. The identity
  * holds for ANY micro-batch partitioning because every ingredient is
  * order-invariant:
  *   - the per-doc features (distinct 3-shingle set + md5
  *     Kirsch–Mitzenmacher minhash signature, q46b's engine-portable
  *     family) depend only on the doc's own text;
  *   - the candidate rule (sharing ≥1 of 4 two-slot signature bands)
  *     is a symmetric property of the PAIR — every unordered pair is
  *     examined exactly once, in the batch where its later doc
  *     arrives (earlier doc then sits in the band index);
  *   - the accept rule is exact Jaccard ≥ 0.5 on the full distinct
  *     shingle sets (banding bounds candidate generation; it never
  *     decides similarity);
  *   - cluster labels merge through [[DupGraph.incrementalClusters]]'
  *     quotient graph, exact because a label IS its component's min
  *     doc_id (min is associative over any batching).
  * `StreamIngestSpec` additionally pins batching-invariance in-engine
  * (1-file-per-trigger == all-at-once) and forces the cross-batch
  * cluster-MERGE path on a planted corpus.
  */
object StreamIngest {

  /** Signature slots (md5 K–M family, q46b) and band split: 4 bands
    * × 2 slots catches J ≥ 0.5 pairs with P ≈ 1-(1-J²)⁴ (≥ 0.73 at
    * the 0.5 threshold, → 1 fast above it; measured on the driver
    * corpus: 253 of 256 true pairs at sf0.1 for 13.4k candidates —
    * banding is the candidate BOUND, the exact-Jaccard verify is the
    * decision, and the oracle replays both so missed bands can never
    * split engine from oracle).
    */
  private val K = 8
  private val Bands = 4

  /** Per-document features from raw (doc_id, text): the distinct
    * 3-shingle set (exact-verify side) and the K-slot md5 minhash
    * signature (candidate side). Pure map + one per-doc aggregate —
    * at ingest this runs over the BATCH only.
    */
  private[ext] def docFeatures(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"),
      array_distinct(Dedup.shingles(col("text"))).as("shd"))
    val dg = md5(to_binary(col("s"), lit("utf-8")))
    val hh = base.select(col("doc_id"), explode(col("shd")).as("s"))
      .select(col("doc_id"),
        conv(substring(dg, 1, 14), 16, 10).cast("long").as("h1"),
        conv(substring(dg, 15, 14), 16, 10).cast("long").as("h2"))
    val aggs = (0 until K)
      .map(k => min(col("h1") + lit(k.toLong) * col("h2")).as(s"mh$k"))
    base.join(hh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*), "doc_id")
      .withColumn("na", size(col("shd")))
  }

  /** Exploded (doc_id, band, v1, v2) rows — the band index shape; the
    * signature never travels through the candidate shuffle.
    */
  private[ext] def bandRows(feat: DataFrame): DataFrame =
    feat.select(col("doc_id"), explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band"),
          col(s"mh${2 * b}").as("v1"), col(s"mh${2 * b + 1}").as("v2"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.v1").as("v1"), col("bk.v2").as("v2"))

  /** Exact-Jaccard gate over candidate (x_id, y_id) pairs; the
    * shingle arrays are joined in per side and travel only for
    * candidates (banding already bounded that set).
    */
  private def verified(pairs: DataFrame, featX: DataFrame, featY: DataFrame,
      outA: String, outB: String): DataFrame =
    pairs
      .join(featX.select(col("doc_id").as("x_id"), col("shd").as("x_sh"),
        col("na").as("x_na")), "x_id")
      .join(featY.select(col("doc_id").as("y_id"), col("shd").as("y_sh"),
        col("na").as("y_na")), "y_id")
      .withColumn("inter", size(array_intersect(col("x_sh"), col("y_sh"))))
      .filter(col("inter") / (col("x_na") + col("y_na") - col("inter")) >= 0.5)
      .select(col("x_id").as(outA), col("y_id").as(outB))

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** The maintained state, carried across micro-batches: cluster
    * assignment, per-doc features (shingle sets + signatures), and
    * the derived band index. `assign` is localCheckpointed on update
    * (the DupGraph loop rule — the merge rewrites labels corpus-wide);
    * `feats`/`bands` grow as unions of per-batch checkpointed pieces,
    * so batch N+1's plans never re-derive OR re-copy batch ≤N's work.
    */
  private final case class IngestState(
      assign: DataFrame, feats: DataFrame, bands: DataFrame, nBatches: Int)

  /** Run the streaming fold over a staged directory of document
    * parquet files: one foreachBatch call per trigger maintains the
    * state; returns the final (doc_id, comp_id, comp_size) plus the
    * number of non-empty micro-batches processed (spec hook).
    */
  private[ext] def ingestClusters(spark: SparkSession, stagedDir: String,
      filesPerTrigger: Int): (DataFrame, Int) = {
    val ck = java.nio.file.Files.createTempDirectory("graft_q263_ck").toString
    val empty = spark.range(0)
    var st = IngestState(
      assign = empty.select(col("id").as("doc_id"), col("id").as("comp_id")),
      feats = docFeatures(empty.select(col("id").as("doc_id"), lit("x").as("text"))),
      bands = bandRows(docFeatures(empty.select(col("id").as("doc_id"), lit("x").as("text")))),
      nBatches = 0)
    val src = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(stagedDir)
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val bf = docFeatures(batch.select(col("doc_id"), col("text")))
          .localCheckpoint()
        if (!bf.isEmpty) {
          val bb0 = bandRows(bf).localCheckpoint(false)
          // batch-batch candidates: self-join on the band key
          val bb = bb0.as("x").join(bb0.as("y"),
              col("x.band") === col("y.band") && col("x.v1") === col("y.v1") &&
                col("x.v2") === col("y.v2") && col("x.doc_id") < col("y.doc_id"))
            .select(col("x.doc_id").as("x_id"), col("y.doc_id").as("y_id"))
            .distinct()
          // batch-corpus candidates: probe the MAINTAINED band index —
          // the corpus is never rescanned
          val bc = bb0.as("x").join(st.bands.as("y"),
              col("x.band") === col("y.band") && col("x.v1") === col("y.v1") &&
                col("x.v2") === col("y.v2"))
            .select(col("x.doc_id").as("x_id"), col("y.doc_id").as("y_id"))
            .distinct()
          val assign = DupGraph.incrementalClusters(
              st.assign, bf.select(col("doc_id")),
              verified(bb, bf, bf, "a_id", "b_id"),
              verified(bc, bf, st.feats, "batch_id", "corpus_id"))
            .select(col("doc_id"), col("comp_id"))
            .localCheckpoint()
          // Feature and band state are maintained INCREMENTALLY —
          // append the batch's checkpointed rows; never re-derive (or
          // re-copy) the corpus side. Each union arm is already
          // materialized (bf is checkpointed; bandRows of it is
          // map-only), so per-batch state work is batch-sized. A
          // cluster deployment appends to a keyed state store / Delta
          // table instead of growing a union plan; assign IS
          // re-checkpointed because the quotient merge rewrites
          // corpus labels, the one genuinely corpus-wide update.
          st = IngestState(assign, st.feats.unionByName(bf),
            st.bands.unionByName(bandRows(bf)), st.nBatches + 1)
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val sizes = st.assign.groupBy(col("comp_id")).agg(count(lit(1)).as("comp_size"))
    val out = st.assign.join(sizes, "comp_id")
      .select(col("doc_id"), col("comp_id"), col("comp_size"))
      .orderBy(col("doc_id"))
      .localCheckpoint()
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ck)))
    (out, st.nBatches)
  }

  /** q263 — the registered form: stage the documents table as 4
    * parquet files (hash split on doc_id — membership is irrelevant,
    * the fold is batching-invariant), stream them one file per
    * trigger, answer from the final maintained state.
    */
  private def q263(spark: SparkSession, dir: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft_q263_stage").toString
    Tables.documents(spark, dir)
      .repartition(4, col("doc_id"))
      .write.mode("overwrite").parquet(stage)
    val (out, _) = ingestClusters(spark, stage, filesPerTrigger = 1)
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(stage)))
    out
  }

  /** Scratch replay: the same features, candidate rule, exact verify,
    * and min-label closure, computed over the whole corpus at once.
    * Heavy pair CTEs are AS MATERIALIZED (the round-9 lesson: DuckDB
    * re-inlines un-materialized CTEs per reference and re-runs the
    * shingle pipeline).
    */
  private val q263Sql = {
    val mins = (0 until K).map(k => s"MIN(h1 + $k * h2) AS mh$k").mkString(", ")
    val bandSel = (0 until Bands)
      .map(b => s"SELECT doc_id, $b AS band, mh${2 * b} AS v1, mh${2 * b + 1} AS v2 FROM sig")
      .mkString("\n       |  UNION ALL ")
    s"""WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |shl AS (
       |  SELECT doc_id,
       |         CASE WHEN len(ws) >= 3 THEN ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
       |              ELSE array_to_string(ws, ' ') END AS s
       |  FROM (SELECT doc_id, ws,
       |               unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
       |                           ELSE [1] END) AS i
       |        FROM w)),
       |shd AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM shl),
       |hh AS (SELECT doc_id,
       |              ('0x' || substr(md5(s), 1, 14))::BIGINT AS h1,
       |              ('0x' || substr(md5(s), 15, 14))::BIGINT AS h2
       |       FROM shd),
       |sig AS MATERIALIZED (SELECT doc_id, $mins FROM hh GROUP BY doc_id),
       |bnd AS (
       |  $bandSel),
       |cand AS MATERIALIZED (
       |  SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id
       |  FROM bnd x JOIN bnd y
       |    ON x.band = y.band AND x.v1 = y.v1 AND x.v2 = y.v2
       |   AND x.doc_id < y.doc_id),
       |na AS (SELECT doc_id, COUNT(*) AS n FROM shd GROUP BY doc_id),
       |iv AS MATERIALIZED (
       |  SELECT c.a_id, c.b_id, COUNT(*) AS inter
       |  FROM cand c JOIN shd x ON x.doc_id = c.a_id
       |              JOIN shd y ON y.doc_id = c.b_id AND y.s = x.s
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT iv.a_id, iv.b_id
       |  FROM iv JOIN na a ON a.doc_id = iv.a_id JOIN na b ON b.doc_id = iv.b_id
       |  WHERE iv.inter / (a.n + b.n - iv.inter) >= 0.5),
       |sym AS (SELECT a_id AS u, b_id AS v FROM pairs
       |        UNION ALL SELECT b_id, a_id FROM pairs),
       |reach AS (
       |  SELECT u AS id, u AS comp FROM sym
       |  UNION
       |  SELECT s.v AS id, r.comp FROM reach r JOIN sym s ON s.u = r.id),
       |comp AS (SELECT id, MIN(comp) AS comp_id FROM reach GROUP BY id),
       |asg AS (
       |  SELECT d.doc_id, COALESCE(c.comp_id, d.doc_id) AS comp_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
       |SELECT doc_id, comp_id,
       |       CAST(COUNT(*) OVER (PARTITION BY comp_id) AS BIGINT) AS comp_size
       |FROM asg ORDER BY doc_id""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q263_stream_cluster_maintenance", q263, Some(q263Sql)))
}
