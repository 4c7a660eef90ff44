package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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
  private[graft] val TrainPct = 80
  private[graft] val ValPct   = 10

  /** md5-derived uniform bucket in [0, mod): engine-identical (md5
    * bytes are md5 bytes everywhere), stable under reruns AND under
    * corpus growth. `salt` decorrelates independent bucketings of the
    * same key (split vs pack vs sample).
    */
  private[graft] def md5Bucket(id: Column, mod: Int, salt: String = ""): Column =
    pmod(conv(substring(md5(to_binary(concat(id.cast("string"), lit(salt)), lit("utf-8"))), 1, 15), 16, 10)
      .cast("long"), lit(mod))

  /** Split bucket in [0, 100) — a given doc_id never migrates between
    * splits as the corpus grows, which `ORDER BY rand() LIMIT n`
    * splitting cannot promise.
    */
  private[graft] def splitBucket(id: Column): Column = md5Bucket(id, 100)

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

  /** Packing parallelism (number of independent bucket streams) and
    * per-sequence token budget for q70.
    */
  private val PackBuckets = 32
  private[ext] val TokenBudget = 256

  /** q70 — training-sequence packing: next-fit bin packing of
    * documents into fixed token-budget sequences, the step that turns
    * a shuffled corpus into the dense `(seq_id, docs)` batches a
    * trainer actually reads. Packing is inherently sequential, so the
    * corpus is first split into independent md5 buckets (the
    * deterministic order-free parallel unit); within a bucket docs
    * pack in doc_id order via one `mapPartitions` pass — genuine
    * per-partition imperative state, the sanctioned RDD-tier use. At
    * 100 TB you raise PackBuckets so each bucket's sort fits an
    * executor (the shuffle is `repartition(bucket)` + an in-partition
    * sort — no global order, no driver state). A doc longer than the
    * budget occupies a sequence alone; exact next-fit semantics are
    * mirrored by the oracle's recursive CTE.
    */
  private def q70(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        md5Bucket(col("doc_id"), PackBuckets).cast("int").as("bucket"),
        size(split(col("text"), " ")).as("n_tokens"))
      .as[(Long, Int, Int)]
      .repartition(col("bucket"))
      .sortWithinPartitions(col("bucket"), col("doc_id"))
      .mapPartitions(packNextFit(_, TokenBudget))
      .toDF("doc_id", "bucket", "seq_id", "n_tokens")
      .orderBy("doc_id")
  }

  /** The q70 per-partition fold, extracted for direct unit testing
    * (the corpus has no doc above the budget, so the oversized-doc
    * branch is only reachable from a synthetic spec). Input must be
    * sorted by (bucket, doc_id); a hash partition holds several
    * buckets back-to-back, so the state resets at bucket boundaries.
    * A doc with more tokens than the budget occupies its sequence
    * alone (next-fit: it still closes the previous sequence first).
    */
  private[ext] def packNextFit(
      it: Iterator[(Long, Int, Int)], budget: Int): Iterator[(Long, Int, Long, Int)] = {
    var bucket = -1
    var seq = 0L
    var fill = 0L
    it.map { case (id, b, t) =>
      if (b != bucket) { bucket = b; seq = 0L; fill = t.toLong }
      else if (fill + t > budget) { seq += 1; fill = t.toLong }
      else fill += t
      (id, b, seq, t)
    }
  }

  private val q70Sql =
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $PackBuckets AS INT) AS bucket,
       |         CAST(len(string_split(text, ' ')) AS INT) AS n_tokens
       |  FROM documents),
       |o AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn FROM d),
       |packed AS (
       |  SELECT bucket, rn, doc_id, n_tokens, CAST(0 AS BIGINT) AS seq_id, n_tokens AS fill
       |  FROM o WHERE rn = 1
       |  UNION ALL
       |  SELECT o.bucket, o.rn, o.doc_id, o.n_tokens,
       |         CASE WHEN p.fill + o.n_tokens > $TokenBudget THEN p.seq_id + 1 ELSE p.seq_id END,
       |         CASE WHEN p.fill + o.n_tokens > $TokenBudget THEN o.n_tokens ELSE p.fill + o.n_tokens END
       |  FROM packed p JOIN o ON o.bucket = p.bucket AND o.rn = p.rn + 1)
       |SELECT doc_id, bucket, seq_id, n_tokens FROM packed ORDER BY doc_id""".stripMargin

  /** q71 — stratified sampling: per-source sampling rates (the domain
    * mixture weights of a training-data recipe) applied via a salted
    * md5 threshold — deterministic, reproducible, and monotone under
    * corpus growth (a sampled doc stays sampled when new data
    * arrives, unlike `TABLESAMPLE`/`rand()`). Map-only scoring plus
    * one tiny per-source aggregate; the mixture report is what feeds
    * the trainer's sampler. Rates are a deterministic function of the
    * source index here (15% + 4·idx); a production run would join a
    * config dim instead — same plan shape.
    */
  private def q71(spark: SparkSession, dir: String): DataFrame = {
    val pct = lit(15) + substring(col("source"), 4, 10).cast("int") * 4
    val sampled = md5Bucket(col("doc_id"), 100, ":q71") < pct
    Tables.documents(spark, dir)
      .select(col("source"), col("n_chars"), pct.as("target_pct"), sampled.as("s"))
      .groupBy(col("source"))
      .agg(
        min(col("target_pct")).as("target_pct"),
        count(lit(1)).as("n_docs"),
        sum(when(col("s"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("s"), col("n_chars").cast("long")).otherwise(0L)).as("sampled_chars"))
      .orderBy("source")
  }

  private val q71Sql =
    """WITH s AS (
      |  SELECT source, n_chars,
      |         15 + CAST(substr(source, 4) AS INT) * 4 AS pct,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':q71'), 1, 15))::BIGINT % 100 AS bucket
      |  FROM documents)
      |SELECT source, MIN(pct) AS target_pct, COUNT(*) AS n_docs,
      |       CAST(SUM(CASE WHEN bucket < pct THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
      |       CAST(SUM(CASE WHEN bucket < pct THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
      |FROM s GROUP BY source ORDER BY source""".stripMargin

  /** q84 — temperature-scaled source MIXTURE sampling: the dataset
    * mixing step of a multilingual/multi-source training pipeline —
    * resample sources toward `weight ∝ tokens^0.5` (α = 0.5
    * "temperature", the standard upweighting of small sources) under
    * a global token budget of 30% of the corpus, then keep documents
    * deterministically via the salted md5 threshold (q71 machinery at
    * micro-rate granularity, so a doc's keep decision never flips as
    * other sources grow).
    *
    * All rate arithmetic is INTEGER-exact: isq = floor(sqrt(tokens))
    * (sqrt is correctly rounded in every IEEE engine, so the floor
    * agrees), rates in floor-divided micro-units — no double SUM
    * order-dependence anywhere, which is what lets the oracle
    * hash-match. Two shuffles (doc→source agg, source re-join is a
    * 20-row broadcast); the 1-row totals broadcast is the q03/q69
    * allowlisted scalar pattern. Magnitude note: the micro-rate
    * numerator is budget·isq·10^6 — fine through ~10^9-token sources;
    * a 100 TB corpus would drop the scale factor or move this one
    * expression to decimal(38,0).
    */
  private def q84(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("tok"))
    val perSrc = docs.groupBy(col("source"))
      .agg(sum(col("tok")).as("src_tokens"), count(lit(1)).as("n_docs"))
      .withColumn("isq", floor(sqrt(col("src_tokens").cast("double"))).cast("long"))
    val totals = perSrc.agg(
      sum(col("src_tokens")).as("total_tokens"), sum(col("isq")).as("sum_isq"))
    val rated = perSrc.crossJoin(broadcast(totals))
      .withColumn("rate_micro", least(lit(1000000L),
        expr("((3 * total_tokens) DIV 10 * isq * 1000000) DIV (sum_isq * src_tokens)")))
      .select(col("source"), col("src_tokens"), col("n_docs"), col("rate_micro"))
    docs.join(broadcast(rated), "source")
      .withColumn("kept", md5Bucket(col("doc_id"), 1000000, ":q84") < col("rate_micro"))
      .groupBy(col("source"))
      .agg(
        min(col("src_tokens")).as("src_tokens"),
        min(col("n_docs")).as("n_docs"),
        min(col("rate_micro")).as("rate_micro"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("kept"), col("tok")).otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  private val q84Sql =
    """WITH d AS (
      |  SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok
      |  FROM documents),
      |ps AS (SELECT source, SUM(tok) AS src_tokens, COUNT(*) AS n_docs,
      |              CAST(FLOOR(SQRT(CAST(SUM(tok) AS DOUBLE))) AS BIGINT) AS isq
      |       FROM d GROUP BY source),
      |tot AS (SELECT SUM(src_tokens) AS total_tokens, SUM(isq) AS sum_isq FROM ps),
      |r AS (SELECT source, src_tokens, n_docs,
      |             CAST(LEAST(1000000,
      |                  ((3 * total_tokens) // 10 * isq * 1000000) // (sum_isq * src_tokens))
      |               AS BIGINT) AS rate_micro
      |      FROM ps, tot),
      |k AS (SELECT d.source, d.tok, r.src_tokens, r.n_docs, r.rate_micro,
      |             ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':q84'), 1, 15))::BIGINT
      |               % 1000000 < r.rate_micro AS kept
      |      FROM d JOIN r ON d.source = r.source)
      |SELECT source,
      |       CAST(MIN(src_tokens) AS BIGINT) AS src_tokens,
      |       CAST(MIN(n_docs) AS BIGINT) AS n_docs,
      |       MIN(rate_micro) AS rate_micro,
      |       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |       CAST(SUM(CASE WHEN kept THEN tok ELSE 0 END) AS BIGINT) AS kept_tokens
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** q88 shard capacity (documents per training shard). */
  private val ShardSize = 64

  /** q88 — deterministic GLOBAL SHUFFLE + fixed-size shard manifest:
    * the "write the training shards" step — order the corpus by a
    * salted md5 of the id (a reproducible pseudorandom permutation),
    * then cut the sequence into fixed-size shards and report each
    * shard's manifest (doc count, token volume, key range). A trainer
    * streaming shards 0..N sees documents in a deterministic,
    * source-decorrelated order.
    *
    * Scale shape: `orderBy(key)` is Spark's range-partitioned total
    * sort (sampled range boundaries, each partition sorts locally —
    * no single-reducer stage), and the global positions come from
    * `RDD.zipWithIndex`, which runs one lightweight count job over
    * the sorted partitions and then indexes each partition at offset
    * Σ earlier counts — the sanctioned per-partition imperative tier
    * (q70 precedent), never a driver collect of data rows. Documents
    * themselves never travel: the sort carries (doc_id, n_tokens,
    * 16-byte key) triples only.
    */
  private def q88(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).as("n_tokens"),
        md5(to_binary(concat(col("doc_id").cast("string"), lit(":q88")), lit("utf-8"))).as("k"))
      .as[(Long, Int, String)]
      .orderBy("k", "doc_id")
    keyed.rdd.zipWithIndex()
      .map { case ((id, tok, k), pos) => (id, tok, k, pos) }
      .toDF("doc_id", "n_tokens", "k", "pos")
      .groupBy((col("pos") / ShardSize).cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("shard_tokens"),
        min(col("k")).as("first_key"),
        max(col("k")).as("last_key"))
      .orderBy("shard")
  }

  private val q88Sql =
    s"""WITH k AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         md5(CAST(doc_id AS VARCHAR) || ':q88') AS k
       |  FROM documents),
       |p AS (SELECT *, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS pos FROM k)
       |SELECT pos // $ShardSize AS shard, COUNT(*) AS n_docs,
       |       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       |       MIN(k) AS first_key, MAX(k) AS last_key
       |FROM p GROUP BY 1 ORDER BY shard""".stripMargin

  /** q95 eval-set size (documents per source). */
  private val EvalPerSource = 8

  /** q95 — deterministic K-PER-SOURCE eval sample, executed by the
    * custom [[graft.plans.TopKPerKey]] whole-operator plan: order each
    * source's docs by a salted md5 of the id (a reproducible uniform
    * draw, monotone under corpus growth for the ids it has seen) and
    * keep the first K. The custom operator makes this the cheap shape
    * at scale: map-side partial top-K means the exchange carries at
    * most K·sources rows per input partition — the window/row_number
    * form would shuffle and sort the entire corpus to discard all but
    * 8·sources rows.
    */
  private def q95(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopK.topKPerKey(
        Tables.documents(spark, dir)
          .select(col("doc_id"), col("source"),
            md5(to_binary(concat(col("doc_id").cast("string"), lit(":q95")), lit("utf-8")))
              .as("sample_key")),
        keyCols = Seq(col("source")),
        orders = Seq(col("sample_key").asc, col("doc_id").asc),
        k = EvalPerSource)
      .orderBy("source", "sample_key", "doc_id")

  private val q95Sql =
    s"""SELECT doc_id, source, sample_key FROM (
       |  SELECT doc_id, source,
       |         md5(CAST(doc_id AS VARCHAR) || ':q95') AS sample_key,
       |         ROW_NUMBER() OVER (PARTITION BY source
       |             ORDER BY md5(CAST(doc_id AS VARCHAR) || ':q95'), doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= $EvalPerSource
       |ORDER BY source, sample_key, doc_id""".stripMargin

  /** q96 — QUALITY-THRESHOLD data selection under a token budget: keep
    * the highest-quality documents whose tokens fit 30% of the corpus
    * — the "train on the best X%" curation step. Greedy by quality
    * level with a deterministic md5-order tie-break inside the
    * boundary level, in three exact integer stages:
    *   (1) per-doc quality in micro-units (the q41 double arithmetic,
    *       IEEE-identical per row, floored once to an integer);
    *   (2) per-level token totals + running totals over levels sorted
    *       best-first — the level table is bounded by the micro
    *       resolution (≤ 10^6 rows at ANY corpus size), so its
    *       single-partition window is scale-safe by construction;
    *   (3) a per-level running sum over (md5 key, doc_id) inside each
    *       level; a doc is kept iff tokens-above-its-level plus its
    *       own running sum fit the budget — one formula that keeps
    *       full levels whole, drops below-cutoff levels (every token
    *       count is ≥ 1), and cuts the boundary level mid-sequence
    *       deterministically.
    * The 1-row total/budget broadcast is the q03/q69 scalar pattern.
    */
  private def q96(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words  = split(col("text"), " ")
    val nWords = size(words)
    val nUniq  = size(array_distinct(words))
    val stops  = size(filter(words, w => w.isin(TextStats.Stopwords: _*)))
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val quality = (nUniq.cast("long") / nWords) * 0.5 +
      (nAlpha.cast("long") / col("n_chars")) * 0.3 +
      (stops.cast("long") / nWords) * 0.2
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        nWords.cast("long").as("tok"),
        floor(quality * 1000000).cast("long").as("qm"),
        md5(to_binary(concat(col("doc_id").cast("string"), lit(":q96")), lit("utf-8"))).as("k"))
    val budget = docs.agg(expr("(3 * SUM(tok)) DIV 10").as("budget"))
    val levels = docs.groupBy(col("qm")).agg(sum(col("tok")).as("lvl_tokens"))
      .withColumn("cum_incl", sum(col("lvl_tokens")).over(Window.orderBy(col("qm").desc)))
      .withColumn("cum_excl", col("cum_incl") - col("lvl_tokens"))
      .select(col("qm"), col("cum_excl"))
    docs.join(broadcast(levels), "qm")
      .crossJoin(broadcast(budget))
      .withColumn("run",
        sum(col("tok")).over(Window.partitionBy(col("qm")).orderBy(col("k"), col("doc_id"))))
      .select(col("doc_id"), col("qm").as("quality_micro"), col("tok").as("n_tokens"),
        (col("cum_excl") + col("run") <= col("budget")).as("kept"))
      .orderBy("doc_id")
  }

  private val q96Sql =
    """WITH d AS (
      |  SELECT doc_id,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS tok,
      |         CAST(FLOOR((
      |           (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
      |              / len(string_split(text, ' '))) * 0.5
      |           + (CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT)
      |              / n_chars) * 0.3
      |           + (CAST(len(list_filter(string_split(text, ' '),
      |                x -> x IN ('the', 'a', 'and', 'of', 'to', 'in', 'is', 'on'))) AS BIGINT)
      |              / len(string_split(text, ' '))) * 0.2
      |         ) * 1000000) AS BIGINT) AS qm,
      |         md5(CAST(doc_id AS VARCHAR) || ':q96') AS k
      |  FROM documents),
      |b AS (SELECT CAST((3 * SUM(tok)) // 10 AS BIGINT) AS budget FROM d),
      |lv AS (
      |  SELECT qm, SUM(tok) AS lvl_tokens FROM d GROUP BY qm),
      |cum AS (
      |  SELECT qm,
      |         CAST(SUM(lvl_tokens) OVER (ORDER BY qm DESC)
      |              - lvl_tokens AS BIGINT) AS cum_excl
      |  FROM lv),
      |r AS (
      |  SELECT d.doc_id, d.qm, d.tok, cum.cum_excl,
      |         CAST(SUM(d.tok) OVER (PARTITION BY d.qm ORDER BY d.k, d.doc_id) AS BIGINT) AS run
      |  FROM d JOIN cum ON d.qm = cum.qm)
      |SELECT doc_id, qm AS quality_micro, tok AS n_tokens,
      |       (cum_excl + run <= budget) AS kept
      |FROM r, b ORDER BY doc_id""".stripMargin

  /** q97 — corpus VERSION fingerprint: one deterministic id per
    * source plus a grand-total row (ROLLUP) that changes iff the
    * underlying document set changes — the dataset-versioning
    * primitive a reproducible training pipeline records next to every
    * run. The combine is BIT_XOR over 60-bit md5 halves of the text:
    * associative, commutative, overflow-free — an exact partial
    * aggregate at any parallelism and any corpus size (no modular-sum
    * gymnastics), and engine-portable because the hashed bits are md5,
    * not engine-internal. XOR caveat documented: a pair of IDENTICAL
    * texts cancels out, so the exact-dup count (n_docs vs distinct
    * digests, q74's column) belongs next to it in any real manifest.
    */
  private def q97(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        conv(substring(md5(to_binary(col("text"), lit("utf-8"))), 1, 15), 16, 10)
          .cast("long").as("h"),
        col("n_chars"))
      .rollup(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        expr("bit_xor(h)").as("version_xor"))
      .orderBy(col("source").asc_nulls_first)

  private val q97Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       BIT_XOR(('0x' || substr(md5(text), 1, 15))::BIGINT) AS version_xor
      |FROM documents GROUP BY ROLLUP (source)
      |ORDER BY source ASC NULLS FIRST""".stripMargin

  /** q74 — per-source corpus data card: the health report a data
    * curator reads before mixing sources — volume (docs/chars/
    * tokens), language spread, and exact-duplicate rate (distinct
    * text fingerprints vs rows). One shuffle on `source` with all
    * aggregates partial-agg'd map-side; COUNT(DISTINCT md5) shuffles
    * 16-byte digests, not documents.
    */
  private def q74(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars").cast("long")).as("total_chars"),
        sum(size(split(col("text"), " ")).cast("long")).as("total_tokens"),
        countDistinct(md5(to_binary(col("text"), lit("utf-8")))).as("n_unique_texts"))
      .orderBy("source")

  private val q74Sql =
    """SELECT source, COUNT(*) AS n_docs,
      |       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
      |       CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** q109 — exact distribution moments per source: count, min/max,
    * mean and population variance of per-document token counts, in
    * integer micro-units — the normalization statistics a feature
    * pipeline computes before standardizing, and the drift numbers a
    * data card tracks release over release. Exactness: the aggregate
    * state is (n, Σx, Σx²) — all BIGINT, all algebraic, so the
    * partial aggregation is exact at ANY parallelism (a float Welford
    * pass is order-dependent and would break the cross-engine hash);
    * mean = Σx·1e6 div n and var = (n·Σx² − (Σx)²)·1e6 div n² are
    * single floor divisions at the end. Headroom: x ≲ 10³ tokens,
    * so n·Σx² ≲ 10¹⁶ at a billion docs per source — BIGINT-safe
    * right up to corpus scale.
    *
    * Scale shape: one shuffle on `source` moving three longs per
    * partition per source — the textbook mergeable-statistics plan.
    */
  private def q109(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("x"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n"),
        min(col("x")).as("min_tokens"),
        max(col("x")).as("max_tokens"),
        sum(col("x")).as("sum_x"),
        sum(col("x") * col("x")).as("sum_x2"))
      .select(
        col("source"), col("n"), col("min_tokens"), col("max_tokens"),
        expr("sum_x * CAST(1000000 AS BIGINT) div n").as("mean_micro"),
        expr("(n * sum_x2 - sum_x * sum_x) * CAST(1000000 AS BIGINT) div (n * n)")
          .as("var_micro"))
      .orderBy("source")

  private val q109Sql =
    """WITH x AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS x
      |  FROM documents),
      |m AS (
      |  SELECT source, COUNT(*) AS n,
      |         MIN(x) AS min_tokens, MAX(x) AS max_tokens,
      |         CAST(SUM(x) AS BIGINT) AS sum_x,
      |         CAST(SUM(x * x) AS BIGINT) AS sum_x2
      |  FROM x GROUP BY source)
      |SELECT source, n, min_tokens, max_tokens,
      |       sum_x * 1000000 // n AS mean_micro,
      |       (n * sum_x2 - sum_x * sum_x) * 1000000 // (n * n) AS var_micro
      |FROM m ORDER BY source""".stripMargin

  /** q112 target domain: docs from this source play the "high-quality
    * target corpus" role (the Wikipedia/books slot in DSIR).
    */
  private val DsirTarget = "src0"

  /** q112 — DSIR-style IMPORTANCE WEIGHTING (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every raw-corpus document by how target-like its token
    * distribution is, using two hashed-unigram language models — the
    * selection signal for domain-targeted pretraining data.
    *
    * Published DSIR sums per-token LOG likelihood ratios; natural logs
    * differ in the last ulp across libm implementations and would
    * break the driver's hash gate (the q69 idf lesson), so the score
    * here is the ADDITIVE RATIO surrogate: per token, the
    * Laplace-smoothed ratio
    *   lr_micro = ⌊1e6 · (cnt_t+1)(N_r+V) / ((cnt_r+1)(N_t+V))⌋
    * (exact BIGINT arithmetic), summed over the document's token
    * occurrences. Monotone in the same per-token evidence, integer-
    * exact in both engines; `selected` marks docs whose mean token
    * ratio clears 1.0 (score ≥ n_tokens·1e6) — a scale-free,
    * data-independent threshold that needs no global sort.
    *
    * Scale shape: token LM build = one token-keyed partial agg; the
    * 1-row totals ride the q03/q89 scalar-broadcast pattern
    * (PlanGuard-allowlisted); scoring = equi-join of raw-doc token
    * occurrences to the 31-row (V-row) weight table — broadcast, so
    * inference is a map stage + per-doc partial agg, text never
    * shuffles. The lr numerator runs in DECIMAL(38,0) (Spark) /
    * HUGEINT (DuckDB): the triple product crosses BIGINT once
    * raw-token occurrences reach ~1e6× the hot-token count, so the
    * 38-digit form is the 100 TB-safe arithmetic from the start.
    */
  private def q112(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("token"))
    val c = occ.groupBy(col("token")).agg(
      sum(when(col("source") === DsirTarget, 1L).otherwise(0L)).as("cnt_t"),
      sum(when(col("source") =!= DsirTarget, 1L).otherwise(0L)).as("cnt_r"))
    val totals = c.agg(
      sum(col("cnt_t")).as("nt"), sum(col("cnt_r")).as("nr"),
      count(lit(1)).as("v"))
    // DECIMAL(38,0) numerator (the scaladoc's 100 TB plan, applied
    // now): the BIGINT triple product (cnt_t+1)(nr+v)·1e6 crosses
    // 9.2e18 once raw-token occurrences reach ~1e6× the hot-token
    // count, and ANSI mode raises rather than wraps. All quantities
    // are positive, so decimal DIV (truncating) still equals floor
    // and matches DuckDB's HUGEINT `//` exactly.
    val w = c.crossJoin(broadcast(totals))
      .select(col("token"),
        expr("""CAST((CAST(cnt_t + 1 AS DECIMAL(38,0)) * (nr + v) * 1000000)
               | DIV (CAST(cnt_r + 1 AS DECIMAL(38,0)) * (nt + v)) AS BIGINT)""".stripMargin
          .replace("\n", " ")).as("lr"))
    occ.filter(col("source") =!= DsirTarget)
      .join(broadcast(w), "token")
      .groupBy(col("doc_id"), col("source"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr")).as("score"))
      .withColumn("lr_micro_per_token", expr("score DIV n_tokens"))
      .withColumn("selected", (col("score") >= col("n_tokens") * 1000000L).cast("int"))
      .orderBy("doc_id")
  }

  private val q112Sql =
    s"""WITH occ AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents),
       |c AS (
       |  SELECT token,
       |         CAST(SUM(CASE WHEN source = '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t,
       |         CAST(SUM(CASE WHEN source <> '$DsirTarget' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_r
       |  FROM occ GROUP BY token),
       |t AS (
       |  SELECT CAST(SUM(cnt_t) AS BIGINT) AS nt, CAST(SUM(cnt_r) AS BIGINT) AS nr,
       |         CAST(COUNT(*) AS BIGINT) AS v
       |  FROM c),
       |w AS (
       |  SELECT token,
       |         CAST((CAST(cnt_t + 1 AS HUGEINT) * (nr + v) * 1000000)
       |              // (CAST(cnt_r + 1 AS HUGEINT) * (nt + v)) AS BIGINT) AS lr
       |  FROM c, t)
       |SELECT occ.doc_id, occ.source, COUNT(*) AS n_tokens,
       |       CAST(SUM(lr) AS BIGINT) AS score,
       |       CAST(SUM(lr) // COUNT(*) AS BIGINT) AS lr_micro_per_token,
       |       CAST(CASE WHEN SUM(lr) >= COUNT(*) * 1000000 THEN 1 ELSE 0 END AS INT) AS selected
       |FROM occ JOIN w USING (token)
       |WHERE occ.source <> '$DsirTarget'
       |GROUP BY occ.doc_id, occ.source ORDER BY occ.doc_id""".stripMargin

  /** q131 — METADATA association audit (the corpus-bias check a data
    * card should carry): observed (lang, source) cell counts against
    * the independence expectation n_lang·n_source/N, reported as
    * exact integer micros — `ratio_micro` far from 1e6 means language
    * is entangled with provenance (a sampler stratifying on source
    * silently skews languages). Both derived quantities keep POSITIVE
    * integer arithmetic (obs·N·1e6 and n_l·n_s·1e6 numerators), so
    * truncating vs flooring division can never disagree across
    * engines on sign. Plan: one (lang, source) aggregate, two
    * marginal aggregates broadcast back, a 1-row N (allowlisted).
    */
  private def q131(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val cells = d.groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n_obs"))
    val byLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val bySrc = d.groupBy(col("source")).agg(count(lit(1)).as("n_source"))
    val total = d.agg(count(lit(1)).as("n_total"))
    cells
      .join(broadcast(byLang), "lang")
      .join(broadcast(bySrc), "source")
      .crossJoin(broadcast(total))
      .select(col("lang"), col("source"), col("n_obs"),
        expr("(n_lang * n_source * 1000000) DIV (n_total * n_total)").as("expected_share_micro"),
        expr("(n_obs * 1000000) DIV n_total").as("observed_share_micro"),
        expr("(n_obs * n_total * 1000000) DIV (n_lang * n_source)").as("ratio_micro"))
      .orderBy("lang", "source")
  }

  private val q131Sql =
    """WITH c AS (SELECT lang, source, COUNT(*) AS n_obs FROM documents GROUP BY 1, 2),
      |l AS (SELECT lang, COUNT(*) AS n_lang FROM documents GROUP BY 1),
      |s AS (SELECT source, COUNT(*) AS n_source FROM documents GROUP BY 1),
      |t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents)
      |SELECT c.lang, c.source, c.n_obs,
      |       CAST((n_lang * n_source * 1000000) // (n_total * n_total) AS BIGINT)
      |         AS expected_share_micro,
      |       CAST((n_obs * 1000000) // n_total AS BIGINT) AS observed_share_micro,
      |       CAST((n_obs * n_total * 1000000) // (n_lang * n_source) AS BIGINT) AS ratio_micro
      |FROM c JOIN l USING (lang) JOIN s USING (source), t
      |ORDER BY lang, source""".stripMargin

  /** q191 sample size per source. */
  private val PriorityK = 10

  /** q191 — WEIGHT-PROPORTIONAL SAMPLING via PRIORITY SAMPLING
    * (Duffield–Lund–Thorup; equivalently Ohlsson's sequential
    * Poisson): per item, priority qᵢ = wᵢ/uᵢ with uᵢ uniform(0,1];
    * the k highest-priority items per source form a without-
    * replacement πps sample, and the (k+1)-th priority τ yields the
    * unbiased weight estimator ŵᵢ = max(wᵢ, τ) — the method of
    * record for weighted subsampling of massive corpora (vs q71's
    * uniform strata and q84's budgeted mixtures). Deterministic and
    * ORACLE-EXACT despite the float priority: uᵢ derives from a
    * 48-bit md5 slice (exact integer in both engines), and the
    * priority is one correctly-rounded IEEE multiply + divide on
    * exactly-representable inputs — bit-identical across engines by
    * the same argument as the sequential-fold dot product. Weights
    * are document lengths, so the sample tilts toward long docs with
    * exactly known inclusion odds. Plan: map-side priorities, one
    * per-source window for rank and the τ lookahead — partitioned
    * sort, no global stage, no scalar broadcast.
    */
  private def q191(spark: SparkSession, dir: String): DataFrame = {
    val u48 = conv(substring(md5(concat(col("doc_id").cast("string"), lit(":q191"))), 1, 12),
      16, 10).cast("long") + 1 // (0, 2^48] — never zero
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars").as("weight"),
        (col("n_chars").cast("double") * 281474976710656.0 / u48.cast("double"))
          .as("priority"))
      .withColumn("rank", row_number().over(w))
      .withColumn("tau", lead(col("priority"), 1).over(w))
      .filter(col("rank") <= PriorityK)
      // ŵ = max(w, τ of the (k+1)-th) — τ is constant across the kept
      // rows only at rank k, so propagate the rank-k lookahead
      .withColumn("tau_k", last(when(col("rank") === PriorityK, col("tau")), ignoreNulls = true)
        .over(Window.partitionBy(col("source")).orderBy(col("rank"))
          .rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("doc_id"), col("source"), col("weight"), col("rank"),
        greatest(col("weight").cast("double"), col("tau_k")).as("est_weight"))
      .orderBy("source", "rank")
  }

  private val q191Sql =
    s"""WITH p AS (
       |  SELECT doc_id, source, n_chars AS weight,
       |         CAST(n_chars AS DOUBLE) * 281474976710656
       |           / CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':q191'), 1, 12))::BIGINT + 1
       |                  AS DOUBLE) AS priority
       |  FROM documents),
       |r AS (
       |  SELECT *, ROW_NUMBER() OVER w AS rank, LEAD(priority, 1) OVER w AS tau
       |  FROM p WINDOW w AS (PARTITION BY source ORDER BY priority DESC, doc_id)),
       |k AS (
       |  SELECT *, last_value(CASE WHEN rank = $PriorityK THEN tau END IGNORE NULLS)
       |              OVER (PARTITION BY source ORDER BY rank
       |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tau_k
       |  FROM r WHERE rank <= $PriorityK)
       |SELECT doc_id, source, weight, CAST(rank AS INT) AS rank,
       |       greatest(CAST(weight AS DOUBLE), tau_k) AS est_weight
       |FROM k ORDER BY source, rank""".stripMargin

  /** q200 — the CAPSTONE pipeline: clean → exact-dedup → quality
    * filter → deterministic split → per-split datacard, composed as
    * ONE Catalyst DAG and verified by ONE oracle — the point of a
    * declarative engine is that the stages q44/q41/q58/q74 prove
    * individually FUSE without materialization barriers: the dedup
    * keep-min and the quality predicate both ride the same shuffle
    * stage group, Catalyst prunes every column the final rollup
    * doesn't need, and nothing but (split, lang) aggregates cross
    * the last exchange. Stage rules (deliberately the simple forms —
    * each has a richer registered sibling): dedup keeps min doc_id
    * per exact text digest; quality demands ≥ 5 tokens and ≥ 30%
    * distinct tokens (integer cross-multiply, no ratio floats);
    * split is the never-migrates md5 bucket (80/10/10). The output
    * is the per-(split, lang) datacard: surviving docs, token mass,
    * and chars — the summary a training run reads before it starts.
    */
  private def q200(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    // every text-derived stat computes MAP-SIDE so the dedup shuffle
    // carries digests and small ints, never the body (the
    // ShuffleSchemaGuardSpec contract — it caught the text column
    // riding the window exchange in the first cut of this query)
    val enriched = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(to_binary(col("text"), lit("utf-8"))).as("dig"),
        size(words).cast("long").as("n_words"),
        size(array_distinct(words)).cast("long").as("n_uniq"))
    enriched
      .withColumn("keep", row_number().over(
        Window.partitionBy(col("dig")).orderBy(col("doc_id"))))
      .filter(col("keep") === 1)
      .filter(col("n_words") >= 5 && col("n_uniq") * 10 >= col("n_words") * 3)
      .withColumn("split",
        when(splitBucket(col("doc_id")) < 80, "train")
          .when(splitBucket(col("doc_id")) < 90, "val").otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_tokens"),
        sum(col("n_chars")).as("n_chars"))
      .orderBy("split", "lang")
  }

  private val q200Sql =
    """WITH dedup AS (
      |  SELECT doc_id, lang, text, n_chars,
      |         ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS keep
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, lang, n_chars,
      |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_uniq
      |  FROM dedup WHERE keep = 1),
      |f AS (
      |  SELECT *,
      |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS b
      |  FROM q WHERE n_words >= 5 AND n_uniq * 10 >= n_words * 3)
      |SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
      |       lang, COUNT(*) AS n_docs,
      |       CAST(SUM(n_words) AS BIGINT) AS n_tokens,
      |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
      |FROM f GROUP BY 1, 2 ORDER BY split, lang""".stripMargin

  /** q208 — replicate count and the truncated-Poisson(1) cumulative
    * thresholds in ppb (e⁻¹·Σ 1/k!, floored; k ≥ 5 collapses into
    * weight 5 — ~0.37% of draws, identical in both engines: the
    * scheme only needs to be a fixed, deterministic resampling
    * distribution, not an untruncated Poisson).
    */
  private val BootReps = 64
  private val PoissonCumPpb = Seq(367879441L, 735758882L, 919698602L, 981011843L, 996340153L)

  /** q208 — POISSON BOOTSTRAP confidence intervals (the
    * distributed-bootstrap construction from Chamandy et al. /
    * Kleiner's scalable-bootstrap line): classic bootstrap resampling
    * shuffles the corpus B times, which is a non-starter at 100 TB;
    * the Poisson bootstrap instead gives every (row, replicate) an
    * independent Poisson(1) weight against fixed cumulative ppb
    * thresholds — so all B=64 replicates materialize MAP-SIDE as a
    * ×64 fan-out followed by one (segment, replicate) aggregate. No
    * resampling shuffle exists; the plan is one explode + one groupBy
    * at any scale. The replicate uniforms cost ONE md5 PER ROW, not
    * per (row, replicate): Kirsch–Mitzenmacher double hashing (the
    * q46b MinHash precedent — "Less Hashing, Same Performance",
    * ESA'06) splits the digest into two 60-bit halves reduced mod 1e9
    * and derives replicate b's uniform as (h1 + b·h2) mod 1e9 —
    * b·h2 ≤ 63·1e9 stays far inside BIGINT, and DuckDB replays the
    * identical split/fold bit-for-bit. (The degenerate h2 = 0 row —
    * probability 1e-9 — correlates that row's replicates; harmless
    * and deterministic.) Replicate means use exact integer cents
    * division; the
    * 90% CI picks the 4th/61st order statistics of the 64 replicate
    * means (picked-element semantics, tie-broken by replicate id) —
    * everything engine-exact, so the driver hash-verifies a
    * BOOTSTRAP, which float resampling could never do.
    */
  private def q208(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir).select(
      col("o_orderpriority").as("segment"),
      col("o_orderkey").as("id"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("x_c"))
    val wExpr = PoissonCumPpb.zipWithIndex
      .foldRight(lit(PoissonCumPpb.length.toLong)) { case ((cum, k), els) =>
        when(col("u") < cum, lit(k.toLong)).otherwise(els)
      }
    val means = base
      // one digest per row; CollapseProject keeps the non-cheap md5
      // out of the double-referencing projection, so it is computed
      // once and the two halves are substring views of it
      .withColumn("hx",
        md5(to_binary(concat(col("id").cast("string"), lit(":q208")), lit("utf-8"))))
      .withColumn("h1", pmod(conv(substring(col("hx"), 1, 15), 16, 10).cast("long"),
        lit(1000000000L)))
      .withColumn("h2", pmod(conv(substring(col("hx"), 16, 15), 16, 10).cast("long"),
        lit(1000000000L)))
      .drop("hx")
      .withColumn("b", explode(lit((0 until BootReps).toArray)))
      .withColumn("u", pmod(col("h1") + col("b") * col("h2"), lit(1000000000L)))
      .withColumn("w", wExpr)
      .groupBy(col("segment"), col("b"))
      .agg(sum(col("w") * col("x_c")).as("s1"), sum(col("w")).as("s0"))
      .filter(col("s0") > 0)
      .select(col("segment"), col("b"), expr("s1 DIV s0").as("mean_b"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("segment")).orderBy(col("mean_b"), col("b"))))
    val ci = means.groupBy(col("segment")).agg(
      min(when(col("rn") === 4, col("mean_b"))).as("ci_lo_c"),
      min(when(col("rn") === 61, col("mean_b"))).as("ci_hi_c"))
    base.groupBy(col("segment"))
      .agg(count(lit(1)).as("n_orders"), expr("SUM(x_c) DIV COUNT(*)").as("mean_c"))
      .join(ci, Seq("segment"))
      .orderBy("segment")
  }

  private val q208Sql = {
    val cases = PoissonCumPpb.zipWithIndex
      .map { case (cum, k) => s"WHEN u < $cum THEN $k" }
      .mkString(" ")
    s"""WITH base AS (
       |  SELECT o_orderpriority AS segment, o_orderkey AS id,
       |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x_c
       |  FROM orders),
       |hashed AS (
       |  SELECT segment, x_c,
       |         ('0x' || substr(md5(CAST(id AS VARCHAR) || ':q208'), 1, 15))::BIGINT
       |           % 1000000000 AS h1,
       |         ('0x' || substr(md5(CAST(id AS VARCHAR) || ':q208'), 16, 15))::BIGINT
       |           % 1000000000 AS h2
       |  FROM base),
       |reps AS (
       |  SELECT segment, x_c, b, (h1 + b * h2) % 1000000000 AS u
       |  FROM hashed CROSS JOIN (SELECT unnest(range($BootReps)) AS b)),
       |agg AS (
       |  SELECT segment, b,
       |         CAST(SUM((CASE $cases ELSE ${PoissonCumPpb.length} END) * x_c) AS BIGINT) AS s1,
       |         CAST(SUM(CASE $cases ELSE ${PoissonCumPpb.length} END) AS BIGINT) AS s0
       |  FROM reps GROUP BY 1, 2),
       |means AS (
       |  SELECT segment, b, s1 // s0 AS mean_b,
       |         ROW_NUMBER() OVER (PARTITION BY segment ORDER BY s1 // s0, b) AS rn
       |  FROM agg WHERE s0 > 0),
       |ci AS (
       |  SELECT segment,
       |         MIN(CASE WHEN rn = 4 THEN mean_b END) AS ci_lo_c,
       |         MIN(CASE WHEN rn = 61 THEN mean_b END) AS ci_hi_c
       |  FROM means GROUP BY 1),
       |pt AS (
       |  SELECT segment, COUNT(*) AS n_orders,
       |         CAST(CAST(SUM(x_c) AS HUGEINT) // COUNT(*) AS BIGINT) AS mean_c
       |  FROM base GROUP BY 1)
       |SELECT pt.segment, pt.n_orders, pt.mean_c, ci.ci_lo_c, ci.ci_hi_c
       |FROM pt JOIN ci ON pt.segment = ci.segment
       |ORDER BY pt.segment""".stripMargin
  }

  /** q218 — GINI-IMPURITY SPLIT FINDING (the CART split criterion,
    * Breiman et al. 1984): the decision-stump learner that underlies
    * model-based data selection — "which single threshold on this
    * feature best separates the labels" is the per-node inner loop of
    * every tree ensemble, and at 100 TB it must run as ONE aggregate
    * pass, not one pass per candidate. Feature: l_quantity; label:
    * returned (l_returnflag = 'R'). The trick that makes it one
    * pass: aggregate to per-VALUE (cnt, pos) first, then cumulative
    * windows over the ≤50-value domain give every threshold's left/
    * right class counts simultaneously. Exactness: minimizing
    * weighted Gini ⟺ maximizing Σ_side (pos² + neg²)/n_side; each
    * side's ratio is scored in truncated micro-units (DECIMAL(38,0)
    * products — BIGINT would overflow at sf1's n² ≈ 3.6e13·10^6) and
    * the argmax-by-truncated-score with threshold-ascending tie-break
    * is the documented deterministic contract both engines share.
    * Output: top-5 thresholds with their class splits and scores —
    * rank 1 IS the learned stump.
    *
    * Scale shape: one groupBy(value) aggregate off the scan (map-side
    * partial on ≤50 keys), then windows/ranks on the bounded value
    * domain. Nothing after the first aggregate scales with rows.
    */
  private def q218(spark: SparkSession, dir: String): DataFrame = {
    val byV = Tables.lineitem(spark, dir)
      .select(col("l_quantity").cast("long").as("threshold"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      .groupBy(col("threshold"))
      .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
    val wCum = Window.orderBy(col("threshold")).rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val scored = byV
      .withColumn("n_l", sum(col("cnt")).over(wCum))
      .withColumn("pos_l", sum(col("pos")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("p", sum(col("pos")).over(wAll))
      .filter(col("n_l") < col("n")) // the top value splits nothing off
      .select(col("threshold"), col("n_l"), col("pos_l"),
        (col("n") - col("n_l")).as("n_r"), (col("p") - col("pos_l")).as("pos_r"))
      .withColumn("score_micro",
        expr("""CAST((CAST(pos_l AS DECIMAL(38,0)) * pos_l + CAST(n_l - pos_l AS DECIMAL(38,0)) * (n_l - pos_l)) * 1000000 DIV n_l AS BIGINT)
               | + CAST((CAST(pos_r AS DECIMAL(38,0)) * pos_r + CAST(n_r - pos_r AS DECIMAL(38,0)) * (n_r - pos_r)) * 1000000 DIV n_r AS BIGINT)""".stripMargin
          .replace("\n", " ")))
    scored
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score_micro").desc, col("threshold"))))
      .filter(col("rank") <= 5)
      .select(col("rank"), col("threshold"), col("n_l"), col("pos_l"),
        col("n_r"), col("pos_r"), col("score_micro"))
      .orderBy(col("rank"))
  }

  private val q218Sql =
    """WITH by_v AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS threshold,
      |         CAST(COUNT(*) AS BIGINT) AS cnt,
      |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS pos
      |  FROM lineitem GROUP BY 1),
      |cum AS (
      |  SELECT threshold,
      |         CAST(SUM(cnt) OVER (ORDER BY threshold
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_l,
      |         CAST(SUM(pos) OVER (ORDER BY threshold
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS pos_l,
      |         CAST(SUM(cnt) OVER () AS BIGINT) AS n,
      |         CAST(SUM(pos) OVER () AS BIGINT) AS p
      |  FROM by_v),
      |scored AS (
      |  SELECT threshold, n_l, pos_l, n - n_l AS n_r, p - pos_l AS pos_r,
      |         CAST((CAST(pos_l AS HUGEINT) * pos_l + CAST(n_l - pos_l AS HUGEINT) * (n_l - pos_l)) * 1000000 // n_l AS BIGINT)
      |         + CAST((CAST(p - pos_l AS HUGEINT) * (p - pos_l) + CAST((n - n_l) - (p - pos_l) AS HUGEINT) * ((n - n_l) - (p - pos_l))) * 1000000 // (n - n_l) AS BIGINT)
      |           AS score_micro
      |  FROM cum WHERE n_l < n),
      |ranked AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY score_micro DESC, threshold) AS rank, *
      |  FROM scored)
      |SELECT rank, threshold, n_l, pos_l, n_r, pos_r, score_micro
      |FROM ranked WHERE rank <= 5 ORDER BY rank""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q218_gini_split", q218, Some(q218Sql)),
    QuerySpec("q208_poisson_bootstrap", q208, Some(q208Sql)),
    QuerySpec("q200_corpus_capstone",  q200, Some(q200Sql), headline = true),
    QuerySpec("q191_priority_sample",  q191, Some(q191Sql)),
    QuerySpec("q57_embedding_quantize", q57, Some(q57Sql), headline = true),
    QuerySpec("q58_dataset_split",      q58, Some(q58Sql)),
    QuerySpec("q70_sequence_packing",   q70, Some(q70Sql), headline = true),
    QuerySpec("q71_stratified_sample",  q71, Some(q71Sql)),
    QuerySpec("q74_source_datacard",    q74, Some(q74Sql)),
    QuerySpec("q84_mixture_sample",     q84, Some(q84Sql)),
    QuerySpec("q88_shard_manifest",     q88, Some(q88Sql), headline = true),
    QuerySpec("q95_eval_sample",        q95, Some(q95Sql)),
    QuerySpec("q96_quality_budget",     q96, Some(q96Sql), headline = true),
    QuerySpec("q97_corpus_version",     q97, Some(q97Sql)),
    QuerySpec("q109_feature_moments",   q109, Some(q109Sql)),
    QuerySpec("q112_dsir_importance",   q112, Some(q112Sql)),
    QuerySpec("q131_metadata_association", q131, Some(q131Sql)),
  )
}
