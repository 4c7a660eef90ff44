package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline
  * (BASELINE.json north star): token counting, quality scoring,
  * language ID, and document fingerprinting over the `documents`
  * table. Everything is built-in column expressions — per-row,
  * shuffle-free, codegen-friendly, so the same plan is a pure map
  * stage at 100 TB.
  */
object TextStats {

  /** q40 — token counting: whitespace tokens + a BPE-ish alnum-run
    * tokenizer via `regexp_extract_all` (identical RE2/Java semantics
    * for this class-only pattern).
    */
  private def q40(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), "\\s+")).as("n_tokens_ws"),
        size(regexp_extract_all(col("text"), lit("[A-Za-z0-9]+"), lit(0))).as("n_tokens_alnum"),
        col("n_chars"))
      .orderBy("doc_id")

  private val q40Sql =
    """SELECT doc_id,
      |       CAST(len(string_split_regex(text, '\s+')) AS INT) AS n_tokens_ws,
      |       CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_tokens_alnum,
      |       n_chars
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stopword list shared between the Spark expression and the oracle
    * SQL (single source of truth → byte-identical semantics).
    */
  private[ext] val Stopwords = Seq("the", "a", "and", "of", "to", "in", "is", "on")

  /** q41 — quality scoring: length/repetition/stopword signals
    * combined into a [0,1]-ish score. All ratios are int/int double
    * divisions — bit-identical across engines.
    */
  private def q41(spark: SparkSession, dir: String): DataFrame = {
    val d       = Tables.documents(spark, dir)
    val words   = split(col("text"), " ")
    val nWords  = size(words)
    val nUniq   = size(array_distinct(words))
    val stops   = size(filter(words, w => w.isin(Stopwords: _*)))
    val nAlpha  = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    d.select(
        col("doc_id"),
        nWords.as("n_words"),
        nUniq.as("n_uniq"),
        stops.as("n_stop"),
        (nUniq.cast("long") / nWords).as("uniq_ratio"),
        (stops.cast("long") / nWords).as("stop_ratio"),
        (nAlpha.cast("long") / col("n_chars")).as("alpha_ratio"))
      .withColumn("quality",
        col("uniq_ratio") * 0.5 + col("alpha_ratio") * 0.3 + col("stop_ratio") * 0.2)
      .orderBy("doc_id")
  }

  private val q41Sql = {
    val stops = Stopwords.map(s => s"'$s'").mkString(", ")
    s"""WITH m AS (
       |  SELECT doc_id,
       |         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS INT) AS n_stop,
       |         CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         n_chars
       |  FROM documents)
       |SELECT doc_id, n_words, n_uniq, n_stop,
       |       CAST(n_uniq AS BIGINT) / n_words AS uniq_ratio,
       |       CAST(n_stop AS BIGINT) / n_words AS stop_ratio,
       |       n_alpha / n_chars AS alpha_ratio,
       |       (CAST(n_uniq AS BIGINT) / n_words) * 0.5
       |         + (n_alpha / n_chars) * 0.3
       |         + (CAST(n_stop AS BIGINT) / n_words) * 0.2 AS quality
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** Per-language marker words for the n-gram-free language-ID
    * heuristic. Single source of truth for Spark + SQL.
    */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "und", "nicht", "das"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "los", "que", "y", "las"),
    "zh" -> Seq("的", "了", "是", "我", "不"),
  )

  /** q42 — language ID: count marker-word occurrences per language,
    * argmax with a fixed priority order for ties (the CASE chain is
    * identical in both engines, so tie-breaking is deterministic).
    */
  private def q42(spark: SparkSession, dir: String): DataFrame = {
    val d     = Tables.documents(spark, dir)
    val words = split(col("text"), " ")
    def score(markers: Seq[String]): Column =
      size(filter(words, w => w.isin(markers: _*)))
    val scored = d.select(
      (Seq(col("doc_id"), col("lang").as("labeled_lang")) ++
        LangMarkers.map { case (l, ms) => score(ms).as(s"s_$l") }): _*)
    val langs = LangMarkers.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val geAll = langs.filter(_ != l)
        .map(o => col(s"s_$l") >= col(s"s_$o"))
        .reduce(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    scored.withColumn("pred_lang", pred).orderBy("doc_id")
  }

  private val q42Sql = {
    def scoreSql(ms: Seq[String]) =
      s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS INT)"
    val scoreCols = LangMarkers
      .map { case (l, ms) => s"${scoreSql(ms)} AS s_$l" }
      .mkString(",\n       ")
    val langs = LangMarkers.map(_._1)
    val cases = langs.init.map { l =>
      val cond = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n       ")
    s"""WITH m AS (
       |  SELECT doc_id, lang AS labeled_lang,
       |       $scoreCols
       |  FROM documents)
       |SELECT doc_id, labeled_lang, s_en, s_de, s_fr, s_es, s_zh,
       |       CASE $cases
       |       ELSE '${langs.last}' END AS pred_lang
       |FROM m ORDER BY doc_id""".stripMargin
  }

  /** q43 — document fingerprinting: md5 of the case/punct-normalized
    * text (the exact-dedup key at scale; the rolling-hash 64-bit
    * variant is the custom-Expression query q43b, rows-only).
    */
  private def q43(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        md5(to_binary(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), lit("utf-8")))
          .as("fingerprint"),
        length(col("text")).as("text_len"))
      .orderBy("doc_id")

  private val q43Sql =
    """SELECT doc_id,
      |       md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')) AS fingerprint,
      |       CAST(len(text) AS INT) AS text_len
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q43b — 64-bit rolling polynomial fingerprint via the custom
    * codegen Catalyst expression [[graft.functions.RollingHash64]].
    * Not SQL-expressible in DuckDB (BIGINT multiply overflow is an
    * error there, wrapping here) → rows-only check + ScalaTest.
    */
  private def q43b(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.rolling_hash64(regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
          .as("fingerprint64"))
      .orderBy("doc_id")

  /** q43c — rolling fingerprint, ORACLE-CHECKED (the q46→q46b move
    * applied to q43b): [[graft.functions.RollingHashMod]]'s two
    * mod-prime Horner folds stay inside BIGINT at every step, so the
    * DuckDB oracle re-derives the exact fingerprint — Horner's rule
    * rewritten as a power-weighted character sum joined to a
    * recursively built `B^e mod p` table (exact same values, no
    * sequential fold needed on the oracle side). Same shuffle-free
    * map-only shape as q43b, which stays the production-width
    * (64-bit) form.
    */
  private def q43c(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        graft.functions.rolling_hash_mod(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""))
          .as("fingerprint_mod"))
      .orderBy("doc_id")

  private val q43cSql =
    """WITH RECURSIVE norm AS (
      |  SELECT doc_id, regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g') AS t FROM documents),
      |mx AS (SELECT CAST(MAX(len(t)) AS INT) AS m FROM norm),
      |pw AS (
      |  SELECT 0 AS e, 1::BIGINT AS v31, 1::BIGINT AS v37
      |  UNION ALL
      |  SELECT e + 1, (v31 * 31) % 1000003, (v37 * 37) % 1000003 FROM pw, mx WHERE e < mx.m - 1),
      |cs AS (SELECT doc_id, len(t) AS L,
      |              unnest(string_split(t, '')) AS c,
      |              unnest(range(1, len(t) + 1)) AS i
      |       FROM norm WHERE len(t) > 0),
      |hs AS (SELECT doc_id,
      |              SUM(ord(c) * pw.v31) % 1000003 AS h31,
      |              SUM(ord(c) * pw.v37) % 1000003 AS h37
      |       FROM cs JOIN pw ON pw.e = cs.L - cs.i
      |       GROUP BY doc_id)
      |SELECT n.doc_id, CAST(COALESCE(h31 * 1000003 + h37, 0) AS BIGINT) AS fingerprint_mod
      |FROM norm n LEFT JOIN hs ON n.doc_id = hs.doc_id
      |ORDER BY n.doc_id""".stripMargin

  /** q54 — JSON column processing: extract typed fields from the
    * `events.props` JSON payload and aggregate — the semi-structured
    * ingestion path every telemetry pipeline needs.
    */
  private def q54(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
      .orderBy("event_type")

  private val q54Sql =
    """SELECT event_type, COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
      |       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS k_min,
      |       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS k_max
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  /** q55 — regex group extraction: structured ids out of
    * semi-structured name strings, validated against the real key.
    */
  private def q55(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.customer(spark, dir)
      .select(
        col("c_custkey"),
        col("c_name"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("id_str"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).cast("long").as("id_num"))
      .withColumn("matches_key", col("id_num") === col("c_custkey"))
      .orderBy("c_custkey")

  private val q55Sql =
    """SELECT c_custkey, c_name,
      |       regexp_extract(c_name, '([0-9]+)', 1) AS id_str,
      |       CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS id_num,
      |       (CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) = c_custkey) AS matches_key
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q56 — fuzzy matching via edit distance: supplier-name pairs
    * within levenshtein ≤ 2 (integer algorithm — identical across
    * engines; the fuzzy tier of entity dedup).
    *
    * Length-bucket blocking (the q35 neighborhood trick applied to
    * string length): lev ≤ 2 requires |len(a)−len(b)| ≤ 2, and with
    * bucket width 3 > 2 any qualifying pair lands in identical or
    * adjacent len/3 buckets. One side explodes into {b−1, b, b+1} and
    * the join is an EQUI-join on the bucket — a hash/sort-merge
    * shuffle on the bucket key, not a BroadcastNestedLoopJoin over
    * the O(n²) pair space. Exactness is preserved (the blocking is a
    * superset of the length prefilter, which still runs below).
    */
  private def q56(spark: SparkSession, dir: String): DataFrame = {
    val BucketW = 3 // must exceed the max length gap (2) for exactness
    val s = graft.Tables.supplier(spark, dir)
    val a = s.select(col("s_suppkey").as("a_id"), col("s_name").as("a_name"),
        length(col("s_name")).as("a_len"))
      .withColumn("bucket", explode(array(
        floor(col("a_len") / BucketW).cast("long") - 1,
        floor(col("a_len") / BucketW).cast("long"),
        floor(col("a_len") / BucketW).cast("long") + 1)))
    val b = s.select(col("s_suppkey").as("b_id"), col("s_name").as("b_name"),
      length(col("s_name")).as("b_len"),
      floor(length(col("s_name")) / BucketW).cast("long").as("bucket"))
    // b carries ONE bucket, a carries the 3-neighborhood, so each pair
    // meets exactly once — no distinct needed. The repartition keeps
    // probe-side parallelism when the small side broadcasts (uniform
    // name lengths — as in this testdata — collapse to one bucket, and
    // without it the whole levenshtein loop runs on the scan's 1-2
    // input partitions); under a shuffled join at scale AQE's
    // skew-split handles the hot bucket instead
    a.repartition(32)
      .join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id") && abs(col("a_len") - col("b_len")) <= 2)
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= 2)
      .select(col("a_id"), col("b_id"), col("dist"))
      .orderBy("a_id", "b_id")
  }

  private val q56Sql =
    """SELECT a.s_suppkey AS a_id, b.s_suppkey AS b_id,
      |       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
      |FROM supplier a JOIN supplier b
      |  ON a.s_suppkey < b.s_suppkey AND abs(len(a.s_name) - len(b.s_name)) <= 2
      |WHERE levenshtein(a.s_name, b.s_name) <= 2
      |ORDER BY a_id, b_id""".stripMargin

  /** q180 — exact Levenshtein ≤ 1 similarity self-join via FastSS
    * DELETION NEIGHBORHOODS, the scale path of the edit-distance
    * family: q56's length blocking only bounds |len(a)−len(b)| — at
    * uniform lengths (exactly this testdata: every c_name is 18
    * chars) its buckets degrade to all-pairs — while deletion
    * blocking pins the edit POSITION. For any single edit
    * (insert / delete / substitute), deleting the edited position
    * from both strings yields an identical variant, so joining the
    * (len+1) single-character-deletion variants of every name (the
    * identity variant included, catching insertions) is a provably
    * LOSSLESS candidate generator for distance ≤ 1 (Bocek et al.'s
    * FastSS; distance ≤ k generalizes to ≤k-deletion subsets).
    *
    * The join key is `xxhash64(variant)` — a fixed 8-byte shuffle
    * key regardless of string length; a hash collision can only
    * admit a FALSE candidate, which the exact `levenshtein` verify
    * removes, so the result is exact while the candidate shuffle
    * never carries variant text (the "digests through the shuffle"
    * house rule). Candidates dedup to bare (n1, n2) before the
    * verify. At 100 TB: (len+1)·n variant rows of 8-byte keys
    * through one equi-join — no O(n²) stage anywhere. The oracle is
    * the BRUTE-FORCE all-pairs levenshtein (an independent method,
    * so the hash compare proves the neighborhood construction
    * lossless on the full input); EditDistanceJoinSpec re-proves it
    * in-engine at sf0.001 and covers the insert/delete shapes the
    * uniform-length testdata can't produce.
    */
  private def q180(spark: SparkSession, dir: String): DataFrame = {
    val names = graft.Tables.customer(spark, dir)
      .select(col("c_name").as("n")).distinct()
    val vars = names
      .withColumn("i", explode(sequence(lit(0), length(col("n")))))
      .select(col("n"),
        xxhash64(expr("concat(substring(n, 1, i), substring(n, i + 2))")).as("vh"))
      // explicit co-partitioning on the join key: the variant table is
      // only ~11 MB at sf0.1, so AQE would coalesce the join to 1-2
      // partitions and serialize the candidate build; the explicit
      // hash repartition pins probe-side parallelism (and at real
      // scale is exactly the partitioning the join needs anyway)
      .repartition(32, col("vh"))
    vars.as("a").join(vars.as("b"),
        col("a.vh") === col("b.vh") && col("a.n") < col("b.n"))
      .select(col("a.n").as("n1"), col("b.n").as("n2"))
      .distinct()
      // AQE coalesces the ~1M-row dedup shuffle to one partition,
      // which would run the O(len²) levenshtein verify single-threaded
      // — and the global ORDER BY executes the child twice (range
      // sampling + shuffle), doubling it. Re-spread first (the q56
      // rule): 24s → ~4s at sf0.1.
      .repartition(32)
      .withColumn("dist", levenshtein(col("n1"), col("n2")))
      .filter(col("dist") <= 1)
      .orderBy("n1", "n2")
  }

  private val q180Sql =
    """WITH names AS (SELECT DISTINCT c_name AS n FROM customer)
      |SELECT a.n AS n1, b.n AS n2, CAST(levenshtein(a.n, b.n) AS INT) AS dist
      |FROM names a JOIN names b ON a.n < b.n
      |WHERE levenshtein(a.n, b.n) <= 1
      |ORDER BY n1, n2""".stripMargin

  /** PII patterns shared (as literal text) between the Spark plan and
    * the oracle SQL. Class-and-quantifier-only regexes — no
    * lookaround, no backrefs — so Java (Spark) and RE2 (DuckDB)
    * semantics are identical.
    */
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PhoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  /** q68 — PII redaction: scrub emails and phone numbers from a
    * free-text contact field, reporting per-row redaction counts —
    * the privacy pass a training corpus runs before anything else.
    * Pure per-row regex work: map-only at any scale, no shuffle
    * until the final contract ORDER BY.
    *
    * The synthetic testdata carries no organic PII (grep-verified:
    * every string column is enum-like or `Customer#N`), so the query
    * first materializes a deterministic contact blob from the
    * customer key — `name <user{k}@example.com> tel {k-derived
    * phone}` — then redacts it. The materialization is part of the
    * oracle-checked contract, so the redaction is verified against
    * nonzero, row-varying PII rather than a vacuous no-op.
    */
  private def q68(spark: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val blob = concat(
      col("c_name"), lit(" <user"), k.cast("string"), lit("@example.com> tel "),
      format_string("%02d-%03d-%03d-%04d",
        pmod(k, lit(89)) + 10, pmod(k * 7, lit(900)) + 100,
        pmod(k * 13, lit(900)) + 100, pmod(k * 31, lit(9000)) + 1000))
    graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), blob.as("contact"))
      .select(
        col("c_custkey"),
        regexp_replace(regexp_replace(col("contact"), EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]").as("redacted"),
        size(regexp_extract_all(col("contact"), lit(EmailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("contact"), lit(PhoneRe), lit(0))).as("n_phones"))
      .orderBy("c_custkey")
  }

  private val q68Sql =
    s"""WITH c AS (
       |  SELECT c_custkey,
       |         c_name || ' <user' || CAST(c_custkey AS VARCHAR) || '@example.com> tel ' ||
       |         printf('%02d-%03d-%03d-%04d',
       |                c_custkey % 89 + 10, (c_custkey * 7) % 900 + 100,
       |                (c_custkey * 13) % 900 + 100, (c_custkey * 31) % 9000 + 1000)
       |           AS contact
       |  FROM customer)
       |SELECT c_custkey,
       |       regexp_replace(regexp_replace(contact, '$EmailRe', '[EMAIL]', 'g'),
       |                      '$PhoneRe', '[PHONE]', 'g') AS redacted,
       |       CAST(len(regexp_extract_all(contact, '$EmailRe')) AS INT) AS n_emails,
       |       CAST(len(regexp_extract_all(contact, '$PhoneRe')) AS INT) AS n_phones
       |FROM c ORDER BY c_custkey""".stripMargin

  /** Number of top terms reported per document by q69. */
  private val TfIdfTopK = 3

  /** q69 — TF-IDF top terms per document. Classic inverted-statistics
    * shape: one shuffle keyed by term for document frequency, one by
    * (doc, term) for term frequency, a 1-row broadcast of the corpus
    * size (the q03 min/max pattern — a scalar cross join is a map
    * stage, not a pair explosion), and a per-doc window for the
    * top-k. Scoring uses linear idf — score = tf·N/df scaled to
    * integer micro-units via floor (exact in IEEE double up to 2^53,
    * so the value AND the ranking are engine-exact; ln-based idf
    * differs in final-ulp between libm implementations and would
    * break the hash compare). Ties broken by term for a total order.
    */
  private def q69(spark: SparkSession, dir: String): DataFrame = {
    val tokens = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
    val tf = tokens.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term").crossJoin(broadcast(n))
      .withColumn("score_micro",
        floor(col("tf") * lit(1000000.0) * col("n_docs") / col("df")).cast("long"))
    scored
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
          .orderBy(col("score_micro").desc, col("term"))))
      .filter(col("rank") <= TfIdfTopK)
      .select(col("doc_id"), col("rank"), col("term"), col("tf"), col("df"), col("score_micro"))
      .orderBy("doc_id", "rank")
  }

  private val q69Sql =
    s"""WITH tok AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
       |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT COUNT(*) AS n_docs FROM documents),
       |scored AS (
       |  SELECT doc_id, term, tf, df,
       |         CAST(floor(tf * 1000000.0 * n_docs / df) AS BIGINT) AS score_micro
       |  FROM tf JOIN df USING (term) CROSS JOIN n),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (
       |           PARTITION BY doc_id ORDER BY score_micro DESC, term) AS rank
       |  FROM scored)
       |SELECT doc_id, CAST(rank AS INT) AS rank, term, tf, df, score_micro
       |FROM ranked WHERE rank <= $TfIdfTopK ORDER BY doc_id, rank""".stripMargin

  /** q72 — intra-document repetition removal: collapse runs of
    * consecutive repeated tokens (the degenerate "batch batch batch"
    * pattern the corpus really contains) — the within-document tier
    * of repetition cleaning, below q44/q45's cross-document dedup.
    * A single native expression per row
    * ([[graft.functions.CollapseRuns]], one codegen'd O(len) pass) —
    * completely shuffle-free, so at 100 TB this is a map stage, where
    * the window-function formulation (posexplode + lag +
    * re-aggregate) would shuffle every token twice. The equivalent
    * built-in `filter((w, i) -> i == 0 OR w != ws[i-1])` higher-order
    * form evaluates interpreted and measured 2.4s/5k docs at sf0.1 —
    * the native expression removes that hot-path cost.
    */
  private def q72(spark: SparkSession, dir: String): DataFrame = {
    val compressed = graft.functions.collapse_runs(col("text"))
    Tables.documents(spark, dir)
      .select(
        col("doc_id"),
        size(split(col("text"), " ")).as("n_before"),
        size(split(compressed, " ")).as("n_after"),
        compressed.as("compressed"))
      .orderBy("doc_id")
  }

  private val q72Sql =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |t AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w),
      |k AS (SELECT doc_id, ws[i] AS w, i, CAST(len(ws) AS INT) AS n_before
      |      FROM t WHERE i = 1 OR ws[i] != ws[i-1])
      |SELECT doc_id, MIN(n_before) AS n_before, CAST(COUNT(*) AS INT) AS n_after,
      |       string_agg(w, ' ' ORDER BY i) AS compressed
      |FROM k GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q86 curation gates (shared between Spark and the SQL mirror via
    * this single source of truth).
    */
  private val MinWords   = 15
  private val MaxWords   = 5000
  private val MinQuality = 0.45

  /** q86 — the CURATED CORPUS pipeline: the C4-style composition every
    * training-data run executes as ONE pass — length gates, language
    * gate (n-gram-marker prediction vs the labeled language), quality
    * gate (the q41 score), then exact-dup survivor election among the
    * docs that passed everything else (min doc_id per text digest) —
    * with a per-document VERDICT so the drop accounting is auditable
    * (first-failed-gate-wins precedence). Map-only until the digest
    * window (one shuffle of 16-byte digests); the quality/lang
    * expressions are the exact per-row double arithmetic q41/q42
    * already prove engine-identical, so the whole pipeline is
    * hash-checked end-to-end.
    */
  private def q86(spark: SparkSession, dir: String): DataFrame = {
    val words  = split(col("text"), " ")
    val nWords = size(words)
    val nUniq  = size(array_distinct(words))
    val stops  = size(filter(words, w => w.isin(Stopwords: _*)))
    val nAlpha = length(regexp_replace(col("text"), "[^A-Za-z]", ""))
    val quality = (nUniq.cast("long") / nWords) * 0.5 +
      (nAlpha.cast("long") / col("n_chars")) * 0.3 +
      (stops.cast("long") / nWords) * 0.2
    val scores = LangMarkers.map { case (l, ms) =>
      l -> size(filter(words, w => w.isin(ms: _*)))
    }.toMap
    val langs = LangMarkers.map(_._1)
    val pred = langs.init.foldRight(lit(langs.last)) { (l, rest) =>
      val geAll = langs.filter(_ != l).map(o => scores(l) >= scores(o)).reduce(_ && _)
      when(geAll, lit(l)).otherwise(rest)
    }
    val pre = Tables.documents(spark, dir)
      .select(col("doc_id"), nWords.as("n_words"), pred.as("pred_lang"),
        md5(to_binary(col("text"), lit("utf-8"))).as("th"),
        when(nWords < MinWords, "too_short")
          .when(nWords > MaxWords, "too_long")
          .when(pred =!= col("lang"), "lang_mismatch")
          .when(quality < MinQuality, "low_quality").as("pre_reason"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("th"))
    pre
      .withColumn("min_kept",
        min(when(col("pre_reason").isNull, col("doc_id"))).over(w))
      .withColumn("verdict", coalesce(col("pre_reason"),
        when(col("doc_id") =!= col("min_kept"), "duplicate").otherwise("kept")))
      .select(col("doc_id"), col("n_words"), col("pred_lang"), col("verdict"))
      .orderBy("doc_id")
  }

  private val q86Sql = {
    val stops = Stopwords.map(s => s"'$s'").mkString(", ")
    def scoreSql(ms: Seq[String]) =
      s"CAST(len(list_filter(string_split(text, ' '), x -> x IN (${ms.map(m => s"'$m'").mkString(", ")}))) AS INT)"
    val scoreCols = LangMarkers
      .map { case (l, ms) => s"${scoreSql(ms)} AS s_$l" }
      .mkString(",\n       |         ")
    val langs = LangMarkers.map(_._1)
    val cases = langs.init.map { l =>
      val cond = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
      s"WHEN $cond THEN '$l'"
    }.mkString("\n       |              ")
    s"""WITH m AS (
       |  SELECT doc_id, lang, n_chars, text,
       |         CAST(len(string_split(text, ' ')) AS INT) AS n_words,
       |         CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_uniq,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x IN ($stops))) AS INT) AS n_stop,
       |         CAST(len(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
       |         $scoreCols
       |  FROM documents),
       |q AS (
       |  SELECT *,
       |         (CAST(n_uniq AS BIGINT) / n_words) * 0.5
       |           + (n_alpha / n_chars) * 0.3
       |           + (CAST(n_stop AS BIGINT) / n_words) * 0.2 AS quality,
       |         CASE $cases
       |              ELSE '${langs.last}' END AS pred_lang
       |  FROM m),
       |pre AS (
       |  SELECT doc_id, n_words, pred_lang, md5(text) AS th,
       |         CASE WHEN n_words < $MinWords THEN 'too_short'
       |              WHEN n_words > $MaxWords THEN 'too_long'
       |              WHEN pred_lang <> lang THEN 'lang_mismatch'
       |              WHEN quality < $MinQuality THEN 'low_quality' END AS pre_reason
       |  FROM q),
       |d AS (
       |  SELECT *, MIN(CASE WHEN pre_reason IS NULL THEN doc_id END)
       |              OVER (PARTITION BY th) AS min_kept
       |  FROM pre)
       |SELECT doc_id, n_words, pred_lang,
       |       COALESCE(pre_reason,
       |                CASE WHEN doc_id <> min_kept THEN 'duplicate' ELSE 'kept' END) AS verdict
       |FROM d ORDER BY doc_id""".stripMargin
  }

  /** q87 chunk geometry (tokens). Stride < size ⇒ adjacent chunks
    * overlap by ChunkSize − ChunkStride tokens (the context-carryover
    * every RAG/embedding pipeline wants).
    */
  private val ChunkSize   = 64
  private val ChunkStride = 48

  /** q87 — sliding-window document CHUNKING: split each document into
    * overlapping token windows (64 tokens, stride 48) — the step that
    * turns raw documents into embedding/RAG-sized passages. Start
    * offsets stop at the last stride position whose window reaches the
    * end of the doc (no redundant suffix-only windows); a doc shorter
    * than one window yields exactly one chunk. Pure map stage — the
    * generate/explode/slice pipeline never shuffles, so at 100 TB this
    * is embarrassingly parallel scan work; chunk text leaves the scan
    * only as a 16-byte digest.
    */
  private def q87(spark: SparkSession, dir: String): DataFrame = {
    val n = size(col("ws"))
    // last window start: 0 for short docs, else stride·ceil((n−size)/stride)
    val lastStart =
      when(n <= ChunkSize, lit(0))
        .otherwise((((n - ChunkSize + ChunkStride - 1) / ChunkStride)
          .cast("int")) * ChunkStride)
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        posexplode(sequence(lit(0), lastStart, lit(ChunkStride))).as(Seq("chunk_idx", "start")))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("ws"), col("start") + 1, lit(ChunkSize)).as("chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("chunk")).as("chunk_tokens"),
        md5(to_binary(array_join(col("chunk"), " "), lit("utf-8"))).as("chunk_digest"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val q87Sql =
    s"""WITH w AS (
       |  SELECT doc_id, string_split(text, ' ') AS ws,
       |         CAST(len(string_split(text, ' ')) AS INT) AS n
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, ws,
       |         unnest(range(0, CASE WHEN n <= $ChunkSize THEN 1
       |                              ELSE ((n - $ChunkSize + $ChunkStride - 1) // $ChunkStride) * $ChunkStride + 1
       |                         END, $ChunkStride)) AS start
       |  FROM w),
       |c AS (
       |  SELECT doc_id, CAST(start // $ChunkStride AS INT) AS chunk_idx,
       |         list_slice(ws, start + 1, start + $ChunkSize) AS chunk
       |  FROM g)
       |SELECT doc_id, chunk_idx,
       |       CAST(len(chunk) AS INT) AS chunk_tokens,
       |       md5(array_to_string(chunk, ' ')) AS chunk_digest
       |FROM c ORDER BY doc_id, chunk_idx""".stripMargin

  /** q89 vocabulary size (top-K tokens kept). */
  private val VocabK = 32

  /** q89 — VOCABULARY build: global token frequencies, keep the top-K
    * (count desc, token asc), report each token's corpus coverage in
    * exact micro-units. The BPE-precursor / tokenizer-audit op. Plan
    * shape for scale: explode → map-side partial count → one shuffle
    * keyed by token, then the top-K is `orderBy(...).limit(K)` which
    * Spark plans as TakeOrderedAndProject — per-partition heaps merged
    * once, never a single-partition global sort of the whole
    * vocabulary. The 1-row total-tokens aggregate rides the q03/q69
    * scalar-broadcast pattern; rank assignment is a window over the K
    * surviving rows only.
    */
  private def q89(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total_tokens"))
    val topK = counts.orderBy(col("cnt").desc, col("token")).limit(VocabK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token"))
    topK.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("token"), col("cnt"),
        expr("(cnt * 1000000) DIV total_tokens").as("coverage_micro"))
      .orderBy("rank")
  }

  private val q89Sql =
    s"""WITH c AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |f AS (SELECT token, COUNT(*) AS cnt FROM c GROUP BY token),
       |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total_tokens FROM f),
       |k AS (SELECT token, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS rank
       |      FROM f ORDER BY cnt DESC, token LIMIT $VocabK)
       |SELECT CAST(rank AS INT) AS rank, token, cnt,
       |       CAST((cnt * 1000000) // total_tokens AS BIGINT) AS coverage_micro
       |FROM k, t ORDER BY rank""".stripMargin

  /** q90 rarity thresholds: hapax = corpus frequency 1, rare ≤ 3. */
  private val RareMax = 3

  /** q90 — per-document RARITY audit, the OOV-rate proxy a tokenizer/
    * quality pipeline tracks: join every token occurrence to the
    * global frequency table and report how much of each document is
    * hapax (corpus frequency 1) or rare (≤ 3). High hapax ratios flag
    * boilerplate-free but noisy docs (typos, serial numbers); near-zero
    * flags templated text. Plan: explode → token-count aggregate (one
    * shuffle of tokens with map-side partial agg) → equi-join the
    * occurrences back on token → per-doc aggregate. The token join key
    * is zipfian-skewed by nature ("the" dominates); the frequency side
    * is one row per key, so AQE's skew-join split handles the fat
    * partitions — same posture as the q30 salted-agg demo. Ratios are
    * integer micro-units — exact across engines.
    */
  private def q90(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
    val freq = occ.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
    occ.join(freq, "token")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("cnt") <= RareMax, 1L).otherwise(0L)).as("n_rare"))
      .withColumn("hapax_micro", expr("(n_hapax * 1000000) DIV n_tokens"))
      .select(col("doc_id"), col("n_tokens"), col("n_hapax"), col("n_rare"), col("hapax_micro"))
      .orderBy("doc_id")
  }

  private val q90Sql =
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |f AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM occ GROUP BY token)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
       |       CAST(SUM(CASE WHEN cnt <= $RareMax THEN 1 ELSE 0 END) AS BIGINT) AS n_rare,
       |       CAST((SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT) AS hapax_micro
       |FROM occ JOIN f USING (token)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q92 — intra-document REPEATED n-gram ratio (the Gopher/MassiveText
    * duplicate-3-gram quality signal): what fraction of a doc's 3-gram
    * OCCURRENCES are repeats of an earlier 3-gram in the same doc.
    * Complements q72 (consecutive-run collapse) — this catches
    * non-adjacent boilerplate loops. Pure per-row array math (the
    * sliding 3-grams are built by indexing the words array, O(1) per
    * element — NOT positional substr, see CharsAt scaladoc), so the
    * plan is a shuffle-free map stage; the ratio is integer
    * micro-units. Docs under 3 words have no 3-grams → 0/0 guarded to
    * zero.
    */
  private def q92(spark: SparkSession, dir: String): DataFrame = {
    val n = size(col("ws"))
    // explicit empty branch: sequence(1, 0) without a step would count
    // DOWN ([1, 0]), not produce an empty range
    val grams = when(n < 3, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), n - 2),
        i => concat_ws(" ", get(col("ws"), i - 1), get(col("ws"), i), get(col("ws"), i + 1))))
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), grams.as("g"))
      .select(col("doc_id"),
        size(col("g")).as("n_grams"),
        size(array_distinct(col("g"))).as("n_distinct"))
      .withColumn("dup_micro",
        when(col("n_grams") === 0, 0L)
          .otherwise(expr("((n_grams - n_distinct) * 1000000) DIV n_grams")))
      .orderBy("doc_id")
  }

  private val q92Sql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws,
      |         CAST(len(string_split(text, ' ')) AS INT) AS n
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS gram
      |  FROM (SELECT doc_id, ws,
      |               unnest(range(1, GREATEST(n - 2, 0) + 1)) AS i
      |        FROM w)),
      |agg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_grams,
      |         CAST(COUNT(DISTINCT gram) AS INT) AS n_distinct
      |  FROM g GROUP BY doc_id)
      |SELECT w.doc_id,
      |       COALESCE(a.n_grams, 0) AS n_grams,
      |       COALESCE(a.n_distinct, 0) AS n_distinct,
      |       CASE WHEN COALESCE(a.n_grams, 0) = 0 THEN 0
      |            ELSE CAST(((a.n_grams - a.n_distinct) * 1000000) // a.n_grams AS BIGINT)
      |       END AS dup_micro
      |FROM w LEFT JOIN agg a USING (doc_id) ORDER BY w.doc_id""".stripMargin

  /** Count-min sketch shape for q99: 3 rows × 64 counters (a 1.5 KB
    * sketch). Width is deliberately small relative to the corpus
    * vocabulary so hash collisions actually occur and the report's
    * `overcount` column shows the sketch's one-sided error; a
    * production sketch sizes width ≈ e/ε for error ε·Σcounts.
    */
  private val CmsDepth  = 3
  private val CmsWidth  = 64
  private val CmsTopK   = 20

  /** q99 — heavy hitters via a count-min sketch: estimate the
    * frequency of the corpus' top tokens from ONE mergeable 1.5 KB
    * counter matrix ([[graft.functions.CountMinAgg]] — counter
    * addition is algebraic, so the build is exact partial aggregation
    * and, at 100 TB, a pure map stage where the exact count pays a
    * full token-key shuffle). The report joins the sketch estimate
    * against the exact count for the top-20 tokens, surfacing the
    * sketch's one-sided `overcount` (CMS never underestimates — a
    * property the spec asserts corpus-wide). Probing is built-in
    * element_at/least arithmetic over the broadcast 1-row sketch —
    * no UDF, stays codegen. Oracle-checked cell-for-cell: the
    * md5-halves hash family (the q73 Bloom convention) makes the
    * matrix engine-portable, so DuckDB re-derives every estimate
    * relationally (per-cell SUMs, then MIN across rows).
    */
  private def q99(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("token"))
      .withColumn("th", md5(to_binary(col("token"), lit("utf-8"))))
      .withColumn("h1", conv(substring(col("th"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("th"), 16, 15), 16, 10).cast("long")
        .bitwiseOR(1))
    val sketch = keyed.select(col("h1"), col("h2")).as[(Long, Long)]
      .groupByKey(_ => 0) // one global sketch; partial agg stays map-side
      .agg(graft.functions.CountMinAgg(CmsDepth, CmsWidth).toColumn.name("cms"))
      .toDF("g", "cms").select(col("cms"))
    val top = keyed.groupBy(col("token"), col("h1"), col("h2"))
      .agg(count(lit(1)).as("true_cnt"))
      .orderBy(col("true_cnt").desc, col("token"))
      .limit(CmsTopK)
    // row r's counters live at offset r·width in the flattened matrix
    val est = least((0 until CmsDepth).map { r =>
      element_at(col("cms"),
        ((col("h1") + lit(r.toLong) * col("h2")) % CmsWidth).cast("int")
          + (r * CmsWidth + 1))
    }: _*)
    top.crossJoin(broadcast(sketch))
      .select(col("token"), col("true_cnt"), est.as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("true_cnt"))
      .orderBy(col("true_cnt").desc, col("token"))
  }

  private val q99Sql =
    s"""WITH tok AS (
       |  SELECT unnest(string_split(text, ' ')) AS token FROM documents),
       |k AS (
       |  SELECT token, CAST(COUNT(*) AS BIGINT) AS true_cnt,
       |         ('0x' || substr(md5(token), 1, 15))::BIGINT AS h1,
       |         (('0x' || substr(md5(token), 16, 15))::BIGINT) | 1 AS h2
       |  FROM tok GROUP BY token),
       |cells AS (
       |  SELECT r, (h1 + r * h2) % $CmsWidth AS pos,
       |         CAST(SUM(true_cnt) AS BIGINT) AS cnt
       |  FROM k CROSS JOIN range(0, $CmsDepth) t(r)
       |  GROUP BY 1, 2),
       |probe AS (SELECT * FROM k ORDER BY true_cnt DESC, token LIMIT $CmsTopK),
       |est AS (
       |  SELECT p.token, p.true_cnt, MIN(c.cnt) AS est_cnt
       |  FROM probe p
       |  CROSS JOIN range(0, $CmsDepth) t(r)
       |  JOIN cells c ON c.r = t.r AND c.pos = (p.h1 + t.r * p.h2) % $CmsWidth
       |  GROUP BY 1, 2)
       |SELECT token, true_cnt, est_cnt,
       |       CAST(est_cnt - true_cnt AS BIGINT) AS overcount
       |FROM est ORDER BY true_cnt DESC, token""".stripMargin

  /** Merge candidates reported by q101. */
  private val BpeTopK = 20

  /** q101 — BPE merge-candidate statistics: corpus-wide adjacent
    * token-pair frequencies, ranked — the inner loop of
    * byte-pair-encoding tokenizer training (Sennrich et al. 2016):
    * each BPE round merges the most frequent adjacent pair, and this
    * query is that round's counting step, the part that must be
    * distributed (the merge-table update is driver-side metadata).
    * Pair construction is a per-row map over the token array (no
    * window/lag formulation, which would shuffle every token to find
    * its neighbor — adjacency is already local to the row); the only
    * shuffle is the pair-key count, partial-aggregated map-side, and
    * the top-K selection is a TakeOrdered over the aggregated pair
    * table. Occurrence counts (not document counts): BPE weights
    * merges by total frequency. Single-token documents contribute no
    * pairs (explicit n >= 2 branch — two-arg sequence() counts DOWN
    * on an empty range, it does not return empty).
    */
  /** Ranked adjacent-pair frequency relation shared by q101 (the
    * top-K report) and q103 (which applies the rank-1 merge).
    */
  private def rankedPairs(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(spark, dir)
      .select(split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .select(explode(when(col("n") >= 2,
        transform(sequence(lit(0), col("n") - 2),
          i => struct(
            element_at(col("ws"), i + 1).as("left_tok"),
            element_at(col("ws"), i + 2).as("right_tok"))))
        .otherwise(array().cast("array<struct<left_tok:string,right_tok:string>>")))
        .as("pr"))
    pairs.select(col("pr.left_tok"), col("pr.right_tok"))
      .groupBy(col("left_tok"), col("right_tok"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("left_tok"), col("right_tok"))
  }

  private def q101(spark: SparkSession, dir: String): DataFrame =
    rankedPairs(spark, dir).limit(BpeTopK)

  /** The q101 pair-count CTEs, shared verbatim by q101Sql and the
    * q103 oracle (which appends the greedy-walk recursion on top).
    */
  private val bpePairCte =
    """pw AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |pc AS (
      |  SELECT ws[i] AS left_tok, ws[i + 1] AS right_tok, COUNT(*) AS cnt
      |  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM pw)
      |  GROUP BY 1, 2)""".stripMargin

  private val q101Sql =
    s"""WITH $bpePairCte
       |SELECT left_tok, right_tok, CAST(cnt AS BIGINT) AS cnt
       |FROM pc ORDER BY cnt DESC, left_tok, right_tok LIMIT $BpeTopK""".stripMargin

  /** q103 — BPE merge APPLICATION: rewrite every document with the
    * corpus' rank-1 adjacent pair (from q101's counts) merged into a
    * single token, greedy left-to-right — the other half of a BPE
    * training round (count → select merge → apply), after which the
    * next round would re-count. The merge itself is the native
    * codegen expression [[graft.functions.MergeAdjacent]]: one O(len)
    * pass per row, shuffle-free — windows/lag cannot express the
    * overlap rule ("x x x" merges only the first two) because each
    * merge consumes the next position, and a per-row sequential scan
    * is the sanctioned tier for that (the q70/CollapseRuns
    * precedent). The selected pair arrives as a 1-row broadcast (the
    * q03/q73 scalar pattern), so at 100 TB the rewrite is a pure map
    * stage; output carries digests, not rewritten text. Oracle: the
    * same greedy walk replayed as a per-document recursive CTE (the
    * q50b/q43c sequential-fold pattern).
    */
  private def q103(spark: SparkSession, dir: String): DataFrame = {
    val top1 = rankedPairs(spark, dir).limit(1)
    Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .crossJoin(broadcast(top1.select(col("left_tok"), col("right_tok"))))
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens_before"),
        graft.functions.merge_adjacent(
          col("ws"), col("left_tok"), col("right_tok")).as("merged"))
      .select(col("doc_id"), col("n_tokens_before"),
        (col("n_tokens_before") - size(col("merged"))).cast("long").as("n_merges"),
        md5(to_binary(array_join(col("merged"), " "), lit("utf-8"))).as("merged_md5"))
      .orderBy("doc_id")
  }

  private val q103Sql =
    s"""WITH RECURSIVE $bpePairCte,
       |top1 AS (SELECT left_tok AS a, right_tok AS b FROM pc
       |         ORDER BY cnt DESC, left_tok, right_tok LIMIT 1),
       |d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |walk AS (
       |  SELECT doc_id, 1 AS i, CAST('' AS VARCHAR) AS acc, 0 AS m FROM d
       |  UNION ALL
       |  SELECT d.doc_id,
       |         CASE WHEN w.i < len(d.ws) AND d.ws[w.i] = t.a AND d.ws[w.i + 1] = t.b
       |              THEN w.i + 2 ELSE w.i + 1 END AS i,
       |         w.acc || CASE WHEN w.i = 1 THEN '' ELSE ' ' END ||
       |           CASE WHEN w.i < len(d.ws) AND d.ws[w.i] = t.a AND d.ws[w.i + 1] = t.b
       |                THEN t.a || '_' || t.b ELSE d.ws[w.i] END AS acc,
       |         w.m + CASE WHEN w.i < len(d.ws) AND d.ws[w.i] = t.a AND d.ws[w.i + 1] = t.b
       |                    THEN 1 ELSE 0 END AS m
       |  FROM walk w JOIN d ON d.doc_id = w.doc_id CROSS JOIN top1 t
       |  WHERE w.i <= len(d.ws))
       |SELECT w.doc_id, CAST(len(d.ws) AS BIGINT) AS n_tokens_before,
       |       CAST(w.m AS BIGINT) AS n_merges, md5(w.acc) AS merged_md5
       |FROM walk w JOIN d ON d.doc_id = w.doc_id
       |WHERE w.i = len(d.ws) + 1
       |ORDER BY w.doc_id""".stripMargin

  /** Fixed retrieval query for q108 — four corpus terms spanning the
    * document-frequency spectrum (three common, one rare) so both the
    * high-idf and the saturation paths are exercised.
    */
  private val Bm25Query = Seq("fast", "hash", "join", "dup")

  /** Number of retrieved documents reported by q108. */
  private val Bm25TopK = 20

  /** q108 — BM25 ranked retrieval: score every document against a
    * fixed term query with Okapi BM25 (k1 = 1.2, b = 0.75) and return
    * the top 20 — the lexical-retrieval half of a RAG / hard-negative
    * mining pipeline, next to q48/q49's embedding half.
    *
    * Scoring is EXACT integer arithmetic end to end, which takes two
    * deviations from the textbook float form (both value-preserving
    * for ranking):
    *   - idf is the linear odds ratio (N − df + ½)/(df + ½) scaled to
    *     micro-units by floor division, not its logarithm — same
    *     monotonicity, no libm ulp drift between engines (the q69
    *     precedent);
    *   - the tf-saturation factor tf·(k1+1)/(tf + k1(1−b+b·dl/avgdl))
    *     is cleared of fractions: with k1 = 6/5, b = 3/4 and
    *     avgdl = T/N it equals 44·tf·T / (20·tf·T + 6·T + 18·dl·N),
    *     floored at micro resolution. Every intermediate fits BIGINT
    *     at these SFs (headroom notes inline); at petabyte T the
    *     micro factor drops a digit.
    *
    * Scale shape: the token scan filters to the query's terms BEFORE
    * the (doc, term) aggregation, so the tf shuffle carries only
    * matching tokens; df is a per-term count over that tf relation
    * (4 rows, broadcast back); corpus totals are a 1-row broadcast
    * (q03/q69 scalar pattern); the final top-k is
    * TakeOrderedAndProject — per-partition heaps, no global sort.
    */
  /** The BM25 readout shared by q108 (scratch) and q265/q266 (index
    * maintenance): exact integer scoring from (doc, term, tf) +
    * per-term df + per-doc dl + 1-row corpus totals, top-k via
    * TakeOrdered, rank over the bounded top-k rows only.
    */
  private def bm25Readout(tf: DataFrame, df: DataFrame,
      dl: DataFrame, totals: DataFrame, k: Int = Bm25TopK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = tf.join(broadcast(df), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(totals))
      // idf_micro ≤ (2N+1)·1e6/3 (~3.3e9 at sf0.1) — BIGINT-safe
      .withColumn("idf_micro",
        expr("(2 * (n_docs - df) + 1) * CAST(1000000 AS BIGINT) div (2 * df + 1)"))
      // 44·tf·T·1e6 ≤ ~2e15 at sf0.1 (tf ≲ 50, T ≲ 1e6) — BIGINT-safe
      .withColumn("tfsat_micro",
        expr("44 * tf * t_tokens * CAST(1000000 AS BIGINT) div " +
          "(20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)"))
      .withColumn("term_score_micro",
        expr("idf_micro * tfsat_micro div CAST(1000000 AS BIGINT)"))
    val top = scored.groupBy(col("doc_id"))
      .agg(sum(col("term_score_micro")).as("score_micro"),
        count(lit(1)).as("n_terms_matched"))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(k)
    // rank over the already-reduced top-k rows (bounded input, not a
    // global single-partition window)
    top.withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col("doc_id"))))
      .select(col("rank"), col("doc_id"), col("score_micro"), col("n_terms_matched"))
      .orderBy("rank")
  }

  /** One-shot BM25 scoring over the whole table at top-`k` — q108's
    * body, shared with q268's recall stage.
    */
  private def bm25Scratch(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val totals = dl.agg(sum(col("dl")).as("t_tokens"), count(lit(1)).as("n_docs"))
    val tf = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term").isin(Bm25Query: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    bm25Readout(tf, df, dl, totals, k)
  }

  private def q108(spark: SparkSession, dir: String): DataFrame =
    bm25Scratch(spark, dir, Bm25TopK)

  /** q108's from-scratch BM25 SQL parameterized by the corpus
    * relation, so maintenance oracles (q282) can replay a DML batch
    * relationally and score the FINAL corpus with the identical
    * pipeline.
    */
  private[ext] def bm25ScratchSql(corpusSql: String): String = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH corpus AS ($corpusSql),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM corpus),
       |totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens, COUNT(*) AS n_docs FROM dl),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM corpus)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |         ((2 * (n_docs - df) + 1) * 1000000 // (2 * df + 1)) AS idf_micro,
       |         (44 * tf * t_tokens * 1000000 //
       |          (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)) AS tfsat_micro
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN totals),
       |agg AS (
       |  SELECT doc_id,
       |         CAST(SUM(idf_micro * tfsat_micro // 1000000) AS BIGINT) AS score_micro,
       |         COUNT(*) AS n_terms_matched
       |  FROM scored GROUP BY doc_id)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       |       doc_id, score_micro, n_terms_matched
       |FROM agg ORDER BY score_micro DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  private val q108Sql = bm25ScratchSql("SELECT doc_id, text FROM documents")

  // ------------------------------------------------------------------
  // q265/q266 — INCREMENTAL INVERTED-INDEX (BM25) MAINTENANCE: the
  // retrieval member of the round-9 incremental family (q260 clusters,
  // q261 minhash, q262 IVF). A search index does not re-tokenize its
  // corpus when documents arrive: postings are append-only (new docs
  // are new postings rows), document frequencies and corpus totals
  // are ADDITIVE sketches, and scoring probes the merged state.
  // ------------------------------------------------------------------

  /** Per-split inverted-index state: full postings (term, doc_id,
    * tf) — the index proper — plus the per-term df table, per-doc
    * lengths, and the 1-row corpus totals.
    */
  private[ext] final case class Bm25State(
      postings: DataFrame, dfS: DataFrame, dlS: DataFrame, totals: DataFrame)

  /** Build index state from a split's documents only — the tokenize
    * pass a batch pays on arrival.
    */
  private[ext] def bm25IndexState(docs: DataFrame): Bm25State = {
    val dl = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("dl"))
    val postings = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dfS = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val totals = dl.agg(
      coalesce(sum(col("dl")), lit(0L)).as("t_tokens"),
      count(lit(1)).as("n_docs"))
    Bm25State(postings, dfS, dl, totals)
  }

  /** Merge a batch delta into maintained state: postings/dl APPEND
    * (batch docs are disjoint new doc_ids), df merges by ADDITION
    * (full-outer on term — the batch may introduce new terms or grow
    * existing ones), totals add. No operation here rescans the
    * corpus side: at 100 TB yesterday's index contributes its
    * aggregated tables, not a tokenize pass.
    */
  private[ext] def mergeBm25(a: Bm25State, b: Bm25State): Bm25State = Bm25State(
    a.postings.unionByName(b.postings),
    a.dfS.select(col("term"), col("df").as("da"))
      .join(b.dfS.select(col("term"), col("df").as("db")), Seq("term"), "full_outer")
      .select(col("term"),
        (coalesce(col("da"), lit(0L)) + coalesce(col("db"), lit(0L))).as("df")),
    a.dlS.unionByName(b.dlS),
    a.totals.select(col("t_tokens").as("ta"), col("n_docs").as("na"))
      .crossJoin(b.totals)
      .select((col("ta") + col("t_tokens")).as("t_tokens"),
        (col("na") + col("n_docs")).as("n_docs")))

  /** Score the fixed query against maintained state: the postings
    * probe fetches only the query terms' lists (the index lookup),
    * df comes from the maintained per-term table, and the math is
    * [[bm25Readout]] verbatim.
    */
  private[ext] def bm25FromState(st: Bm25State): DataFrame =
    bm25Readout(
      st.postings.filter(col("term").isin(Bm25Query: _*))
        .select(col("doc_id"), col("term"), col("tf")),
      st.dfS.filter(col("term").isin(Bm25Query: _*)),
      st.dlS, st.totals)

  /** Subtract a delete batch's contribution from maintained index
    * state — the OTHER write path of the inverted index (q271's IVF
    * delete discipline applied to retrieval). The index summaries
    * form an abelian group, so deletion = state minus the doomed
    * docs' contribution, computed by tokenizing the DELETE BATCH
    * alone: df subtracts per term (a term whose df reaches 0 leaves
    * the table), totals subtract as a 1-row scalar pair, and the
    * per-doc relations (postings, dl) apply the batch-sized doomed-id
    * set as a TOMBSTONE anti-join — Catalyst pushes the query-term
    * fetch below the tombstone filter at probe time, so serving stays
    * fetch-then-filter (the Lucene delete-bitset shape); a real
    * deployment folds tombstones into its next segment compaction.
    * No corpus rescan anywhere: one batch-sized tokenize pass plus
    * vocabulary-bounded / 1-row algebraic updates.
    */
  private[ext] def subtractBm25(a: Bm25State, del: Bm25State): Bm25State = {
    val doomed = del.dlS.select(col("doc_id"))
    Bm25State(
      a.postings.join(doomed, Seq("doc_id"), "left_anti"),
      a.dfS.join(del.dfS.select(col("term"), col("df").as("df_del")), Seq("term"), "left")
        .select(col("term"), (col("df") - coalesce(col("df_del"), lit(0L))).as("df"))
        .filter(col("df") > 0),
      a.dlS.join(doomed, Seq("doc_id"), "left_anti"),
      a.totals.crossJoin(del.totals
          .select(col("t_tokens").as("tt_del"), col("n_docs").as("nd_del")))
        .select((col("t_tokens") - col("tt_del")).as("t_tokens"),
          (col("n_docs") - col("nd_del")).as("n_docs")))
  }

  /** q265 — INCREMENTAL BM25 INDEX MAINTENANCE (oracle-gated): 90/10
    * md5 split of the documents table into corpus (the materialized
    * index) and batch (the append); the batch pays one tokenize pass
    * over ITSELF only, every merge is append/addition, and the fixed
    * query scores against the merged state.
    *
    * THE ORACLE IS q108's FROM-SCRATCH SQL VERBATIM: corpus ∪ batch
    * is the whole table, so maintained-index scoring must equal the
    * one-shot index build — merge ≡ scratch holds because postings
    * rows are per-doc independent and df/dl/totals are algebraic
    * (additive) summaries. A double-counted df, a dropped posting,
    * or a stale total shifts a score and hash-mismatches.
    *
    * Scale shape: batch-sized tokenize + (term,doc) partial aggs;
    * the df merge is vocabulary-bounded; totals are 1 row; the
    * scoring probe filters postings to the query's terms BEFORE any
    * join (the postings-fetch of a real index serving path).
    */
  private def q265(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("is_batch", TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
    val corpus = docs.filter(!col("is_batch")).select(col("doc_id"), col("text"))
    val batch = docs.filter(col("is_batch")).select(col("doc_id"), col("text"))
    bm25FromState(mergeBm25(bm25IndexState(corpus), bm25IndexState(batch)))
  }

  /** Run q266's streaming fold over a staged directory of document
    * parquet files: each foreachBatch tokenizes the batch only and
    * merges its delta into the maintained index state — postings and
    * dl APPEND per-batch checkpointed pieces (batch N+1 never
    * re-derives or re-copies batch ≤N's rows), df and totals
    * re-checkpoint at vocabulary-bounded / 1-row cost. Returns the
    * readout plus the number of non-empty micro-batches (spec hook).
    */
  private[ext] def streamBm25(spark: SparkSession, stagedDir: String,
      filesPerTrigger: Int): (DataFrame, Int) = {
    import org.apache.spark.sql.types._
    val docSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val ck = java.nio.file.Files.createTempDirectory("graft_q266_ck").toString
    val empty = spark.range(0)
      .select(col("id").as("doc_id"), lit("x").as("text"))
    var st = bm25IndexState(empty)
    var nBatches = 0
    val q = spark.readStream.schema(docSchema)
      .option("maxFilesPerTrigger", filesPerTrigger)
      .parquet(stagedDir)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = bm25IndexState(batch.select(col("doc_id"), col("text")))
        val deltaCk = Bm25State(
          delta.postings.localCheckpoint(), delta.dfS,
          delta.dlS.localCheckpoint(), delta.totals)
        if (!deltaCk.dlS.isEmpty) {
          val m = mergeBm25(st, deltaCk)
          // append arms stay as unions of already-checkpointed
          // pieces; only the BOUNDED tables re-checkpoint per trigger
          st = Bm25State(m.postings, m.dfS.localCheckpoint(),
            m.dlS, m.totals.localCheckpoint())
          nBatches += 1
        }
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val out = bm25FromState(st).localCheckpoint()
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ck)))
    (out, nBatches)
  }

  /** q266 — STREAMING BM25 INDEX MAINTENANCE: q265's append
    * discipline as a Structured Streaming fold — the documents table
    * staged as 4 parquet files arrives one file per trigger, each
    * foreachBatch merges a batch-only delta, and the final maintained
    * state answers the fixed query. ORACLE = q108's from-scratch SQL
    * verbatim: fold(triggers) ≡ one-shot merge ≡ scratch, by
    * associativity of the additive df/dl/totals merges and per-doc
    * independence of postings rows. Bm25Spec additionally pins the
    * in-engine q266 == q108 equality and batching invariance.
    */
  private def q266(spark: SparkSession, dir: String): DataFrame = {
    val stage = java.nio.file.Files.createTempDirectory("graft_q266_stage").toString
    Tables.documents(spark, dir)
      .repartition(4, col("doc_id"))
      .write.mode("overwrite").parquet(stage)
    val (out, _) = streamBm25(spark, stage, filesPerTrigger = 1)
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(stage)))
    out
  }

  /** q273 — BM25 DELETE MAINTENANCE (oracle-gated): the maintained
    * index (built over the whole documents table — standing in for
    * the pre-existing materialized index, q265's convention) takes a
    * DELETE of the md5 bucket ≥ 90 docs; the update is
    * [[subtractBm25]], so the delete pays one tokenize pass over the
    * doomed batch alone plus algebraic subtraction — never a corpus
    * re-tokenize or rebuild. THE ORACLE IS q108's FROM-SCRATCH SQL
    * OVER THE SURVIVING CORPUS, so the hash gate proves
    * delete-maintained ≡ rebuilt-from-survivors tri-SF (subtract ==
    * rebuild, the q271/q133 incremental-maintenance bar). Bm25Spec
    * additionally pins the in-engine equality against a driver-side
    * survivor reference and survivors + deleted == total conservation
    * on df and totals.
    */
  private def q273(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .withColumn("doomed", TrainPrep.md5Bucket(col("doc_id"), 100) >= 90)
    val full = bm25IndexState(docs.select(col("doc_id"), col("text")))
    val del = bm25IndexState(
      docs.filter(col("doomed")).select(col("doc_id"), col("text")))
    bm25FromState(subtractBm25(full, del))
  }

  private val q273Sql = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH s_docs AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 < 90),
       |dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM s_docs),
       |totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens, COUNT(*) AS n_docs FROM dl),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM s_docs)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |         ((2 * (n_docs - df) + 1) * 1000000 // (2 * df + 1)) AS idf_micro,
       |         (44 * tf * t_tokens * 1000000 //
       |          (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)) AS tfsat_micro
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN totals),
       |agg AS (
       |  SELECT doc_id,
       |         CAST(SUM(idf_micro * tfsat_micro // 1000000) AS BIGINT) AS score_micro,
       |         COUNT(*) AS n_terms_matched
       |  FROM scored GROUP BY doc_id)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS rank,
       |       doc_id, score_micro, n_terms_matched
       |FROM agg ORDER BY score_micro DESC, doc_id LIMIT $Bm25TopK""".stripMargin
  }

  /** q282 — MIXED UPSERT BATCH against the maintained BM25 index
    * (oracle-gated): the missing composition between pure append
    * (q265) and pure delete (q273) — one batch carrying all three
    * event classes, the upsert shape q267 applies to the STORE, here
    * applied to the derived INDEX:
    *
    *   - DELETES: the md5-bucket ≥ 90 docs (q273's doomed set);
    *   - UPDATES: every surviving doc_id % 17 = 0 doc's text is
    *     REPLACED by doc (doc_id+1) % n's text — applied as
    *     preimage-subtract + postimage-add, the delete+insert
    *     composition;
    *   - INSERTS: every doc_id % 29 = 0 doc re-keys to doc_id + 10⁶
    *     as a new copy.
    *
    * The whole batch costs two batch-sized tokenize passes (the
    * outgoing rows and the incoming rows) plus vocabulary-bounded /
    * 1-row algebraic updates — never a corpus re-tokenize. THE ORACLE
    * REPLAYS THE BATCH RELATIONALLY and runs q108's from-scratch
    * scoring over the FINAL corpus, so the hash gate proves
    * subtract-then-add ≡ rebuild: a df under- or over-count from the
    * update composition, a surviving posting of a deleted doc, or a
    * stale total all shift a score.
    */
  private def q282(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .localCheckpoint(false)
    val n = docs.count()
    require(n < 1000000L, s"insert re-key offset collides with doc_ids (n=$n)")
    val doomedP = TrainPrep.md5Bucket(col("doc_id"), 100) >= 90
    val full = bm25IndexState(docs)
    val donor = docs.select(col("doc_id").as("d_id"), col("text").as("d_text"))
    val updPre = docs.filter(!doomedP && col("doc_id") % 17 === 0)
    val updPost = updPre.select(col("doc_id"))
      .join(donor, (col("doc_id") + 1) % n === col("d_id"))
      .select(col("doc_id"), col("d_text").as("text"))
    val outgoing = docs.filter(doomedP).unionByName(updPre)
    val incoming = updPost.unionByName(docs.filter(col("doc_id") % 29 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    bm25FromState(mergeBm25(
      subtractBm25(full, bm25IndexState(outgoing)),
      bm25IndexState(incoming)))
  }

  private val q282Sql = bm25ScratchSql(
    """WITH base AS (SELECT doc_id, text FROM documents),
      |  cnt AS (SELECT COUNT(*) AS n FROM base),
      |  doomed AS (
      |    SELECT doc_id FROM base
      |    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 >= 90),
      |  upd AS (
      |    SELECT b.doc_id, d.text FROM base b, cnt, base d
      |    WHERE b.doc_id % 17 = 0
      |      AND b.doc_id NOT IN (SELECT doc_id FROM doomed)
      |      AND d.doc_id = (b.doc_id + 1) % cnt.n),
      |  kept AS (
      |    SELECT b.doc_id, COALESCE(u.text, b.text) AS text
      |    FROM base b LEFT JOIN upd u ON u.doc_id = b.doc_id
      |    WHERE b.doc_id NOT IN (SELECT doc_id FROM doomed))
      |  SELECT doc_id, text FROM kept
      |  UNION ALL
      |  SELECT doc_id + 1000000, text FROM base WHERE doc_id % 29 = 0""".stripMargin)

  /** Recall-stage width for q268's cascade. */
  private val RecallK = 100

  /** q268 — TWO-STAGE RETRIEVAL (retrieve-then-rerank, the RAG
    * serving cascade, complementing q115's rank FUSION): stage 1 is
    * the cheap lexical recall pass — BM25 over the fixed term query,
    * top [[RecallK]] — and stage 2 re-ranks ONLY that recall set by
    * exact dense cosine against a fixed query embedding (vec_id 0;
    * documents and embeddings align on id), returning the top
    * [[Bm25TopK]] with both stage ranks and the cosine. The cascade's
    * economics are the point: the expensive dense scoring touches
    * RecallK rows, never the corpus — the 100-row recall set
    * broadcasts into an id-equi-join against the embeddings table (at
    * 100 TB that's an id-keyed point fetch against the vector store,
    * the q257 bloom-lookup shape, not a scan).
    *
    * Exactness: cosine in doubles via the native sequential-fold
    * dot_product (bit-identical to DuckDB's list_dot_product — the
    * q48 discipline), ties broken by doc_id, so the raw double column
    * hash-matches.
    */
  private def q268(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val recall = bm25Scratch(spark, dir, RecallK)
      .select(col("rank").as("bm25_rank"), col("doc_id"))
    val asDouble = (c: Column) => transform(c, x => x.cast("double"))
    val qe = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qe"))
    val scored = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), asDouble(col("embedding")).as("ce"))
      .join(broadcast(recall), "doc_id")
      .crossJoin(broadcast(qe))
      .withColumn("cos",
        graft.functions.dot_product(col("qe"), col("ce")) /
          (sqrt(graft.functions.dot_product(col("qe"), col("qe"))) *
            sqrt(graft.functions.dot_product(col("ce"), col("ce")))))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(Bm25TopK)
    // rank over the already-reduced top-k rows (bounded input)
    scored.withColumn("rerank",
        row_number().over(Window.orderBy(col("cos").desc, col("doc_id"))))
      .select(col("rerank"), col("doc_id"), col("bm25_rank"), col("cos"))
      .orderBy("rerank")
  }

  private val q268Sql = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens, COUNT(*) AS n_docs FROM dl),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |         ((2 * (n_docs - df) + 1) * 1000000 // (2 * df + 1)) AS idf_micro,
       |         (44 * tf * t_tokens * 1000000 //
       |          (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)) AS tfsat_micro
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN totals),
       |agg AS (
       |  SELECT doc_id,
       |         CAST(SUM(idf_micro * tfsat_micro // 1000000) AS BIGINT) AS score_micro
       |  FROM scored GROUP BY doc_id),
       |recall AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id) AS INT) AS bm25_rank,
       |         doc_id
       |  FROM agg ORDER BY score_micro DESC, doc_id LIMIT $RecallK),
       |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
       |s AS (
       |  SELECT r.bm25_rank, r.doc_id,
       |         list_dot_product(qe, ce) /
       |           (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
       |  FROM recall r
       |  JOIN (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings) e
       |    ON e.vec_id = r.doc_id
       |  CROSS JOIN q),
       |top AS (SELECT * FROM s ORDER BY cos DESC, doc_id LIMIT $Bm25TopK)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS INT) AS rerank,
       |       doc_id, bm25_rank, cos
       |FROM top ORDER BY rerank""".stripMargin
  }

  /** q272 — CASCADE RECALL, measured: how much dense quality does
    * q268's two-stage cascade give up by only re-ranking the BM25
    * recall set? The exact answer — the top-[[Bm25TopK]] docs by
    * dense cosine over the WHOLE corpus — is compared with the
    * cascade's top-k, and the overlap is reported as an
    * oracle-checked fact (the q138/q259 discipline: the quality
    * trade-off of an approximation is a measured, hash-gated number,
    * not a claim). At 100 TB the exact list is unaffordable — that's
    * why the cascade exists — but at bench scale it is the ground
    * truth the recall metric needs.
    *
    * What the measurement shows on THIS corpus: recall@20 falls
    * 30% → 20% → 0% across sf0.001/0.01/0.1. Two real effects, both
    * worth having as hash-gated facts: the fixed [[RecallK]]-doc
    * recall set covers a shrinking fraction of a growing corpus
    * (100/N), and this testdata's embeddings are synthetic noise
    * statistically independent of the text (TESTDATA: no
    * high-cosine pairs), so the lexical stage carries no signal
    * about the dense ordering — the worst case for a cascade. On a
    * real corpus the two stages correlate and the same metric is
    * the knob that sizes RecallK.
    */
  private def q272(spark: SparkSession, dir: String): DataFrame = {
    val asDouble = (c: Column) => transform(c, x => x.cast("double"))
    val qe = Tables.embeddings(spark, dir).filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qe"))
    val exact = Tables.embeddings(spark, dir)
      .select(col("vec_id").as("doc_id"), asDouble(col("embedding")).as("ce"))
      .crossJoin(broadcast(qe))
      .withColumn("cos",
        graft.functions.dot_product(col("qe"), col("ce")) /
          (sqrt(graft.functions.dot_product(col("qe"), col("qe"))) *
            sqrt(graft.functions.dot_product(col("ce"), col("ce")))))
      .orderBy(col("cos").desc, col("doc_id"))
      .limit(Bm25TopK)
      .select(col("doc_id"))
    val cascade = q268(spark, dir).select(col("doc_id"))
    val tagged = exact.withColumn("src", lit(1))
      .unionByName(cascade.withColumn("src", lit(2)))
    tagged.groupBy(col("doc_id"))
      .agg(countDistinct(col("src")).as("k"))
      .agg(
        sum(when(col("k") >= 1, 1L).otherwise(0L)).as("n_union"),
        sum(when(col("k") === 2, 1L).otherwise(0L)).as("n_overlap"))
      .select(lit(Bm25TopK).as("k_exact"), lit(Bm25TopK).as("k_cascade"),
        col("n_union"), col("n_overlap"),
        expr(s"n_overlap * 1000000 DIV $Bm25TopK").as("recall_micro"))
  }

  private val q272Sql = {
    val terms = Bm25Query.map(t => s"'$t'").mkString(", ")
    s"""WITH dl AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |totals AS (
       |  SELECT CAST(SUM(dl) AS BIGINT) AS t_tokens, COUNT(*) AS n_docs FROM dl),
       |tf AS (
       |  SELECT doc_id, term, COUNT(*) AS tf FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents)
       |  WHERE term IN ($terms) GROUP BY 1, 2),
       |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT doc_id,
       |         ((2 * (n_docs - df) + 1) * 1000000 // (2 * df + 1)) AS idf_micro,
       |         (44 * tf * t_tokens * 1000000 //
       |          (20 * tf * t_tokens + 6 * t_tokens + 18 * dl * n_docs)) AS tfsat_micro
       |  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN totals),
       |agg AS (
       |  SELECT doc_id,
       |         CAST(SUM(idf_micro * tfsat_micro // 1000000) AS BIGINT) AS score_micro
       |  FROM scored GROUP BY doc_id),
       |recall AS (
       |  SELECT doc_id FROM agg ORDER BY score_micro DESC, doc_id LIMIT $RecallK),
       |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
       |emb AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
       |cos AS (
       |  SELECT doc_id,
       |         list_dot_product(qe, ce) /
       |           (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(ce, ce))) AS cos
       |  FROM emb CROSS JOIN qv),
       |exact AS (SELECT doc_id FROM cos ORDER BY cos DESC, doc_id LIMIT $Bm25TopK),
       |cascade AS (
       |  SELECT c.doc_id FROM cos c JOIN recall USING (doc_id)
       |  ORDER BY c.cos DESC, c.doc_id LIMIT $Bm25TopK),
       |tagged AS (
       |  SELECT doc_id, 1 AS src FROM exact
       |  UNION ALL SELECT doc_id, 2 FROM cascade),
       |per AS (SELECT doc_id, COUNT(DISTINCT src) AS k FROM tagged GROUP BY doc_id)
       |SELECT CAST($Bm25TopK AS INT) AS k_exact, CAST($Bm25TopK AS INT) AS k_cascade,
       |       CAST(SUM(CASE WHEN k >= 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_union,
       |       CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
       |       CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) * 1000000 // $Bm25TopK AS BIGINT)
       |         AS recall_micro
       |FROM per""".stripMargin
  }

  /** q111 classifier vocabulary width — 16 of the corpus's 31 distinct
    * tokens, so the hashed OOV fallback path really executes.
    */
  private val ClfVocab = 16

  /** md5-derived signed integer weight in [-(mod-1)/2, (mod-1)/2]:
    * 24 bits of the digest of `value+salt`, reduced mod `mod` (odd),
    * recentered. Positive dividend in both engines ⇒ `%` agrees.
    */
  private def md5Weight(value: Column, salt: String, mod: Int): Column =
    conv(substring(md5(to_binary(concat(value, lit(salt)), lit("utf-8"))), 1, 6), 16, 10)
      .cast("long") % mod - (mod - 1) / 2

  /** q111 — LINEAR QUALITY CLASSIFIER inference (the fastText-style
    * model-based filter tier of a curation pipeline, after the
    * heuristic gates of q41/q86): per-document score = Σ weight(token)
    * over token OCCURRENCES, in-vocabulary weights from a broadcast
    * weight table (top-[[ClfVocab]] corpus tokens), out-of-vocabulary
    * tokens through a feature-HASHED fallback weight, keep = score ≥ 0.
    *
    * The WEIGHTS are a deterministic md5 stub standing in for trained
    * parameters (the container has no model artifacts — same policy as
    * the multimodal decode stubs, documented, engine-portable). The
    * PLUMBING is the real production shape and is what this query
    * certifies: inference = one broadcast hash join (weight table) +
    * map-side partial agg per doc — a pure map stage over the corpus
    * at 100 TB, no shuffle of text, the score threshold applied where
    * the data lives. A trained model would swap the weight column, not
    * the plan.
    */
  /** The q111 scoring pipeline (doc_id, source, n_tokens, n_oov,
    * score) — shared with the q123 calibration.
    */
  private def clfScores(spark: SparkSession, dir: String): DataFrame = {
    val occ = Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("token"))
    val vocab = occ.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(ClfVocab)
      .select(col("token"), md5Weight(col("token"), ":q111w", 2001).as("w"))
    occ.join(broadcast(vocab), Seq("token"), "left")
      .withColumn("tw",
        coalesce(col("w"), md5Weight(col("token"), ":q111h", 201)))
      .groupBy(col("doc_id"), col("source"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("w").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("tw")).as("score"))
  }

  private def q111(spark: SparkSession, dir: String): DataFrame =
    clfScores(spark, dir)
      .withColumn("keep", (col("score") >= 0).cast("int"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"), col("score"), col("keep"))
      .orderBy("doc_id")

  private val q111Sql =
    s"""WITH occ AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
       |f AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token),
       |v AS (SELECT token,
       |             ('0x' || substr(md5(token || ':q111w'), 1, 6))::BIGINT % 2001 - 1000 AS w
       |      FROM f ORDER BY cnt DESC, token LIMIT $ClfVocab),
       |s AS (
       |  SELECT occ.doc_id, v.w,
       |         COALESCE(v.w,
       |           ('0x' || substr(md5(occ.token || ':q111h'), 1, 6))::BIGINT % 201 - 100) AS tw
       |  FROM occ LEFT JOIN v USING (token))
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(CASE WHEN w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |       CAST(SUM(tw) AS BIGINT) AS score,
       |       CAST(CASE WHEN SUM(tw) >= 0 THEN 1 ELSE 0 END AS INT) AS keep
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q114 — BIGRAM LM fluency scoring (the CCNet/KenLM perplexity
    * filter tier): train a corpus bigram language model, score every
    * document by its mean conditional token probability — low scores
    * flag token-salad documents a perplexity filter would drop, high
    * scores flag boilerplate. Published filters use log-perplexity;
    * logs differ in the last ulp across libm builds (the q69/q112
    * lesson), so the score is the mean Laplace-smoothed probability in
    * exact integer micros:
    *   p_micro(a→b) = ⌊1e6·(cnt(a,b)+1)/(cnt(a,·)+V)⌋,
    * averaged over the document's bigram occurrences — rank-equivalent
    * for the filter's purpose and bit-identical in both engines.
    *
    * Scale shape: LM build = one bigram-keyed partial agg (the q101
    * shuffle); the model table (≤V² rows, bounded by vocabulary, not
    * corpus) broadcasts; scoring = map-side equi-join + per-doc
    * partial agg — text never shuffles. The 1-row vocab-size aggregate
    * rides the q03 scalar-broadcast pattern (PlanGuard-allowlisted).
    */
  private def q114(spark: SparkSession, dir: String): DataFrame = {
    val bi = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      .select(col("doc_id"), explode(when(col("n") >= 2,
        transform(sequence(lit(0), col("n") - 2),
          i => struct(
            element_at(col("ws"), i + 1).as("a"),
            element_at(col("ws"), i + 2).as("b"))))
        .otherwise(array().cast("array<struct<a:string,b:string>>"))).as("pr"))
      .select(col("doc_id"), col("pr.a").as("a"), col("pr.b").as("b"))
    val cnt2 = bi.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c2"))
    val cnt1 = cnt2.groupBy(col("a")).agg(sum(col("c2")).as("c1"))
    val v = Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("t"))
      .agg(countDistinct(col("t")).as("v"))
    val lm = cnt2.join(cnt1, "a").crossJoin(broadcast(v))
      .select(col("a"), col("b"), expr("((c2 + 1) * 1000000) DIV (c1 + v)").as("p_micro"))
    bi.join(broadcast(lm), Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("p_micro")).as("sum_p_micro"))
      .withColumn("mean_p_micro", expr("sum_p_micro DIV n_bigrams"))
      .orderBy("doc_id")
  }

  private val q114Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |bi AS (
      |  SELECT doc_id, ws[i] AS a, ws[i + 1] AS b
      |  FROM (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM d)),
      |c2 AS (SELECT a, b, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
      |c1 AS (SELECT a, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY a),
      |v AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS v
      |      FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)),
      |lm AS (SELECT a, b, ((c2 + 1) * 1000000) // (c1 + v) AS p_micro
      |       FROM c2 JOIN c1 USING (a), v)
      |SELECT bi.doc_id, COUNT(*) AS n_bigrams,
      |       CAST(SUM(p_micro) AS BIGINT) AS sum_p_micro,
      |       CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS mean_p_micro
      |FROM bi JOIN lm USING (a, b)
      |GROUP BY bi.doc_id ORDER BY bi.doc_id""".stripMargin

  /** q119 n-gram width and per-source report depth. */
  private val SrcGramN = 3
  private val SrcGramK = 5

  /** q119 — per-source TOP-K n-gram report (the boilerplate/template
    * detector a corpus audit runs per provider: a source whose top
    * trigrams dominate is template-heavy). `cnt` is DOCUMENT frequency
    * — [[graft.functions.WordShingles]] emits each doc's distinct
    * shingles, which is the right unit for boilerplate (one doc
    * repeating a gram 100× is repetition, q92's signal; many docs
    * sharing it is boilerplate). Counts are one
    * (source, gram)-keyed partial agg; the per-source top-K then runs
    * through the custom [[graft.plans.TopKPerKey]] whole-operator plan
    * — map-side partial heaps, so the exchange after the count
    * carries at most K rows per source per partition instead of every
    * distinct gram (the window form would shuffle the full gram
    * table). Second consumer of the custom plan after q95, proving
    * the operator generalizes beyond its first query.
    */
  private def q119(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.documents(spark, dir)
      .select(col("source"), // shingles are distinct-per-doc ⇒ cnt = doc frequency
        explode(graft.functions.word_shingles(col("text"), SrcGramN)).as("gram"))
      .groupBy(col("source"), col("gram")).agg(count(lit(1)).as("cnt"))
    graft.plans.TopK.topKPerKey(counts,
        keyCols = Seq(col("source")),
        orders = Seq(col("cnt").desc, col("gram").asc),
        k = SrcGramK)
      .orderBy(col("source"), col("cnt").desc, col("gram"))
  }

  private val q119Sql =
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |g AS (
       |  SELECT DISTINCT doc_id, source,
       |         CASE WHEN len(ws) >= $SrcGramN
       |              THEN array_to_string(ws[i:i+${SrcGramN - 1}], ' ')
       |              ELSE array_to_string(ws, ' ') END AS gram
       |  FROM (SELECT doc_id, source, ws,
       |               unnest(CASE WHEN len(ws) >= $SrcGramN
       |                           THEN range(1, len(ws) - ${SrcGramN - 2})
       |                           ELSE [1] END) AS i
       |        FROM w)),
       |c AS (SELECT source, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
       |r AS (SELECT source, gram, cnt, ROW_NUMBER() OVER (
       |          PARTITION BY source ORDER BY cnt DESC, gram) AS rn
       |      FROM c)
       |SELECT source, gram, cnt FROM r WHERE rn <= $SrcGramK
       |ORDER BY source, cnt DESC, gram""".stripMargin

  /** q123 — PER-SOURCE score CALIBRATION: the q111 classifier scores
    * are not comparable across sources (different base rates — a
    * mediocre doc in a strong source outscores a good doc in a weak
    * one), so mixing pipelines calibrate per source before applying a
    * global threshold. Calibration = within-source quantile transform:
    * rank by (score, doc_id) inside each source, emit
    * ⌊(rank−1)·1e6/(n−1)⌋ — integer-exact, and the row_number tie
    * break makes it deterministic where raw percent_rank ties would
    * not be. Plan: the scoring map stage (q111), then ONE window
    * partitioned by source — the standard partition-parallel shape;
    * source cardinality bounds the skew, and a 100 TB run salts any
    * single source too big for one task the q30 way.
    */
  private def q123(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("score").asc, col("doc_id"))
    clfScores(spark, dir)
      .withColumn("rank", row_number().over(w))
      .withColumn("n_src", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("source"))))
      .withColumn("calib_micro",
        expr("CASE WHEN n_src > 1 THEN ((rank - 1) * 1000000) DIV (n_src - 1) ELSE 500000 END"))
      .select(col("doc_id"), col("source"), col("score"),
        col("rank").cast("int").as("rank"), col("calib_micro"))
      .orderBy("doc_id")
  }

  private val q123Sql =
    s"""WITH occ AS (
       |  SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents),
       |f AS (SELECT token, COUNT(*) AS cnt FROM occ GROUP BY token),
       |v AS (SELECT token,
       |             ('0x' || substr(md5(token || ':q111w'), 1, 6))::BIGINT % 2001 - 1000 AS w
       |      FROM f ORDER BY cnt DESC, token LIMIT $ClfVocab),
       |s AS (
       |  SELECT occ.doc_id, occ.source,
       |         CAST(SUM(COALESCE(v.w,
       |           ('0x' || substr(md5(occ.token || ':q111h'), 1, 6))::BIGINT % 201 - 100)) AS BIGINT)
       |           AS score
       |  FROM occ LEFT JOIN v USING (token)
       |  GROUP BY 1, 2),
       |r AS (
       |  SELECT doc_id, source, score,
       |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY score, doc_id) AS rank,
       |         COUNT(*) OVER (PARTITION BY source) AS n_src
       |  FROM s)
       |SELECT doc_id, source, score, CAST(rank AS INT) AS rank,
       |       CAST(CASE WHEN n_src > 1 THEN ((rank - 1) * 1000000) // (n_src - 1)
       |                 ELSE 500000 END AS BIGINT) AS calib_micro
       |FROM r ORDER BY doc_id""".stripMargin

  /** q126 — PHRASE search over a POSITIONAL inverted index: exact
    * consecutive-token phrase matching (the retrieval op BM25's
    * bag-of-words scoring cannot express — "new york" ≠ "york new").
    * The demo phrase is the corpus's top trigram by document
    * frequency (deterministic, 1-row broadcast); the SEARCH path is
    * the real Lucene shape: the positional index pt(doc, pos, token)
    * is filtered to the phrase's terms by an equi-join against the
    * 3-row term list (posting-list retrieval — the index is touched
    * only at the phrase's tokens, never scanned whole), then the
    * three posting streams intersect on (doc, pos+k) equality —
    * hash-joinable keys, no inequality scan. Per matching doc:
    * occurrence count and first position.
    */
  private def q126(spark: SparkSession, dir: String): DataFrame = {
    val pt = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    val top = Tables.documents(spark, dir)
      .select(col("doc_id"),
        explode(graft.functions.word_shingles(col("text"), 3)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("gram")).limit(1)
    val terms = top.select(posexplode(split(col("gram"), " ")).as(Seq("k", "w")))
    val posting = pt.join(broadcast(terms), col("tok") === col("w"))
      .select(col("doc_id"), col("pos"), col("k"))
    val m = posting.filter(col("k") === 0).select(col("doc_id"), col("pos"))
      .join(posting.filter(col("k") === 1).select(col("doc_id"), (col("pos") - 1).as("pos")),
        Seq("doc_id", "pos"))
      .join(posting.filter(col("k") === 2).select(col("doc_id"), (col("pos") - 2).as("pos")),
        Seq("doc_id", "pos"))
    m.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_occurrences"), min(col("pos")).as("first_pos"))
      .crossJoin(broadcast(top.select(col("gram").as("phrase"))))
      .select(col("doc_id"), col("phrase"), col("n_occurrences"), col("first_pos"))
      .orderBy("doc_id")
  }

  private val q126Sql =
    """WITH d AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |pt AS (
      |  SELECT doc_id, CAST(generate_subscripts(ws, 1) - 1 AS INT) AS pos,
      |         unnest(ws) AS tok
      |  FROM d),
      |g AS (
      |  SELECT DISTINCT doc_id,
      |         CASE WHEN len(ws) >= 3 THEN array_to_string(ws[i:i+2], ' ')
      |              ELSE array_to_string(ws, ' ') END AS gram
      |  FROM (SELECT doc_id, ws,
      |               unnest(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1)
      |                           ELSE [1] END) AS i
      |        FROM d)),
      |top1 AS (SELECT gram FROM g GROUP BY gram
      |         ORDER BY COUNT(*) DESC, gram LIMIT 1),
      |tm AS (SELECT CAST(generate_subscripts(tw, 1) - 1 AS INT) AS k, unnest(tw) AS w
      |       FROM (SELECT string_split(gram, ' ') AS tw FROM top1)),
      |po AS (SELECT pt.doc_id, pt.pos, tm.k FROM pt JOIN tm ON pt.tok = tm.w),
      |m AS (
      |  SELECT a.doc_id, a.pos
      |  FROM (SELECT doc_id, pos FROM po WHERE k = 0) a
      |  JOIN (SELECT doc_id, pos - 1 AS pos FROM po WHERE k = 1) b
      |    ON a.doc_id = b.doc_id AND a.pos = b.pos
      |  JOIN (SELECT doc_id, pos - 2 AS pos FROM po WHERE k = 2) c
      |    ON a.doc_id = c.doc_id AND a.pos = c.pos)
      |SELECT m.doc_id, top1.gram AS phrase, COUNT(*) AS n_occurrences,
      |       CAST(MIN(m.pos) AS INT) AS first_pos
      |FROM m, top1
      |GROUP BY 1, 2 ORDER BY doc_id""".stripMargin

  /** Expected chunk length for q160: a word is a cut point when its
    * md5 bucket mod CdcDivisor is 0 → chunks average ~CdcDivisor
    * tokens.
    */
  private val CdcDivisor = 16

  /** q160 — CONTENT-DEFINED chunking (token-level CDC): a chunk
    * boundary falls AFTER every word whose md5 bucket mod 16 is 0,
    * so boundaries depend only on LOCAL content — never on offsets.
    * That is the property fixed-size chunking (q87) lacks and dedup
    * storage/transfer systems (rsync, LBFS, backup dedupe) rely on:
    * insert a sentence at the top of a document and every q87 window
    * shifts (all digests change), while every CDC chunk after the
    * next cut point keeps its exact digest — so chunk-level dedup
    * still matches the unchanged tail. CdcChunkingSpec pins exactly
    * that resilience contrast.
    *
    * Scale shape: pure map stage like q87 — cut detection, boundary
    * assembly, and slicing all happen inside per-row array
    * expressions (no explode-regroup, so no shuffle carries words;
    * chunk text leaves the row only as a 16-byte digest). The
    * higher-order lambdas here evaluate interpreted, which is
    * acceptable off the hot path at ~n_words evals/doc; the hot-loop
    * alternative is a native expression (the WordShingles precedent)
    * if profiling ever demands it.
    */
  private def q160(spark: SparkSession, dir: String): DataFrame = {
    def bucket(w: Column): Column =
      pmod(conv(substring(md5(to_binary(w, lit("utf-8"))), 1, 15), 16, 10).cast("long"),
        lit(CdcDivisor))
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .withColumn("n", size(col("ws")))
      // cut after word i (1-based) for interior i with bucket 0; the
      // final word never cuts (a cut there would make an empty chunk)
      .withColumn("starts",
        concat(array(lit(0)),
          when(col("n") > 1,
            filter(sequence(lit(1), col("n") - 1),
              i => bucket(get(col("ws"), i - 1)) === 0))
            .otherwise(array().cast("array<int>"))))
      .withColumn("ends",
        concat(slice(col("starts"), lit(2), greatest(size(col("starts")) - 1, lit(0))),
          array(col("n"))))
    d.select(col("doc_id"), col("ws"),
        posexplode(zip_with(col("starts"), col("ends"),
          (s, e) => struct(s.as("start"), (e - s).as("len")))).as(Seq("chunk_idx", "se")))
      .select(col("doc_id"), col("chunk_idx"),
        col("se.start").as("start_tok"),
        col("se.len").as("n_tokens"),
        md5(to_binary(
          array_join(slice(col("ws"), col("se.start") + 1, col("se.len")), " "),
          lit("utf-8"))).as("chunk_digest"))
      .orderBy("doc_id", "chunk_idx")
  }

  private val q160Sql =
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       |tok AS (SELECT doc_id, ws[i] AS wd, i, len(ws) AS n
       |        FROM (SELECT doc_id, ws, unnest(range(1, len(ws) + 1)) AS i FROM w)),
       |cuts AS (SELECT doc_id, i FROM tok
       |         WHERE i < n AND ('0x' || substr(md5(wd), 1, 15))::BIGINT % $CdcDivisor = 0),
       |starts AS (SELECT doc_id, 0 AS s FROM w
       |           UNION ALL SELECT doc_id, i FROM cuts),
       |ord AS (SELECT doc_id, s,
       |               CAST(ROW_NUMBER() OVER pw - 1 AS INT) AS chunk_idx,
       |               LEAD(s) OVER pw AS nxt
       |        FROM starts WINDOW pw AS (PARTITION BY doc_id ORDER BY s)),
       |ch AS (SELECT o.doc_id, o.chunk_idx,
       |              CAST(o.s AS INT) AS start_tok,
       |              CAST(COALESCE(o.nxt, len(w.ws)) - o.s AS INT) AS n_tokens,
       |              md5(array_to_string(w.ws[o.s + 1:COALESCE(o.nxt, len(w.ws))], ' '))
       |                AS chunk_digest
       |       FROM ord o JOIN w ON o.doc_id = w.doc_id)
       |SELECT doc_id, chunk_idx, start_tok, n_tokens, chunk_digest
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin

  /** q169 support floor: pairs must co-occur in at least this many
    * docs to be reported (kills the long random-pair tail).
    */
  private val CoocMinSupport = 5

  /** q169 — TOKEN CO-OCCURRENCE lift (market-basket over documents):
    * which token pairs appear together far more often than
    * independence predicts — the association audit that surfaces
    * template/boilerplate phrases and topic clusters in a corpus.
    * lift·10⁶ = n_both·n_docs·10⁶ / (n_a·n_b), exact integers end to
    * end (one `div` per pair, identical in both engines). The pair
    * generator is a SELF-EQUI-JOIN on doc_id over per-doc DISTINCT
    * tokens with `ta < tb` — per-doc fan-out is (tokens/doc choose
    * 2), independent of corpus size, so the shuffle grows linearly
    * with docs; the support floor bounds the output. At a real vocab
    * (this corpus has 31 tokens; a web corpus has millions) the
    * standard extra bound is a doc-frequency ceiling on the exploded
    * tokens (drop df > 50% stopword-ish terms) BEFORE the self-join —
    * noted, not needed at this vocab. Top-50 by lift with a full
    * (ta, tb) tie-break so the LIMIT is deterministic.
    */
  private def q169(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("t"))
    val dfA = tok.groupBy(col("t")).agg(count(lit(1)).as("na"))
      .withColumnRenamed("t", "ta")
    val dfB = dfA.toDF("tb", "nb")
    val nDocs = Tables.documents(spark, dir)
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    tok.as("a")
      .join(tok.as("b"),
        col("a.doc_id") === col("b.doc_id") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= CoocMinSupport)
      .join(dfA, "ta")
      .join(dfB, "tb")
      .crossJoin(broadcast(nDocs))
      .select(col("ta"), col("tb"), col("n_both"),
        expr("CAST(n_both * n_docs * 1000000 DIV (na * nb) AS BIGINT)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("ta"), col("tb"))
      .limit(50)
  }

  private val q169Sql =
    s"""WITH tok AS (
       |  SELECT DISTINCT doc_id, t FROM (
       |    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
       |df AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY 1),
       |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
       |p AS (
       |  SELECT a.t AS ta, b.t AS tb, COUNT(*) AS n_both
       |  FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND a.t < b.t
       |  GROUP BY 1, 2 HAVING COUNT(*) >= $CoocMinSupport)
       |SELECT ta, tb, n_both,
       |       CAST(n_both * n.n_docs * 1000000 // (da.n * db.n) AS BIGINT) AS lift_ppm
       |FROM p
       |JOIN df da ON da.t = p.ta
       |JOIN df db ON db.t = p.tb
       |CROSS JOIN n
       |ORDER BY lift_ppm DESC, ta, tb LIMIT 50""".stripMargin

  /** q170 vocab size — deliberately SMALLER than this corpus's
    * 31-token vocabulary so the OOV path is exercised for real.
    */
  private val EncodeVocabN = 24

  /** q170 — CORPUS ENCODING to vocabulary ids: the step that turns
    * cleaned text into model-ready integer sequences. The vocab is
    * the top-[[EncodeVocabN]] tokens by corpus frequency (ties broken
    * by token, ids dense from 1; 0 is reserved for OOV), assigned by
    * a row_number over the VOCAB-sized aggregate — a single-partition
    * window over ≤|vocab| rows, the one place a global window is
    * right (a real 100k-token vocab is still a single executor's
    * work, and the result broadcasts to the encode join). Encoding is
    * a broadcast left join on the exploded (doc, pos, token) rows,
    * re-assembled in position order via array_sort over
    * (pos, id) structs; the id sequence ships as a canonical CSV
    * string (arrays hash differently across engines' parquet
    * writers; strings compare bit-exact). Per-doc OOV counts fall out
    * of the same pass — the coverage metric that decides whether the
    * vocab is big enough.
    */
  private def q170(spark: SparkSession, dir: String): DataFrame = {
    val tok = Tables.documents(spark, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "t")))
    val vocab = tok.groupBy(col("t")).agg(count(lit(1)).as("n"))
      .withColumn("id", row_number().over(Window.orderBy(col("n").desc, col("t"))))
      .filter(col("id") <= EncodeVocabN)
      .select(col("t"), col("id"))
    tok.join(broadcast(vocab), Seq("t"), "left")
      .withColumn("tid", coalesce(col("id"), lit(0)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("id").isNull, 1L).otherwise(0L)).as("n_oov"),
        concat_ws(",",
          transform(array_sort(collect_list(struct(col("pos"), col("tid")))),
            x => x.getField("tid").cast("string"))).as("ids_csv"))
      .orderBy("doc_id")
  }

  private val q170Sql =
    s"""WITH parts AS (
       |  SELECT doc_id, string_split(text, ' ') AS p FROM documents),
       |tok AS (
       |  SELECT doc_id, g AS pos, p[g] AS t
       |  FROM parts, unnest(generate_series(1, len(p))) AS u(g)),
       |freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY 1),
       |vocab AS (
       |  SELECT t, id FROM (
       |    SELECT t, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS id FROM freq)
       |  WHERE id <= $EncodeVocabN),
       |enc AS (
       |  SELECT tok.doc_id, tok.pos,
       |         COALESCE(vocab.id, 0) AS tid,
       |         CASE WHEN vocab.id IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM tok LEFT JOIN vocab ON vocab.t = tok.t)
       |SELECT doc_id, COUNT(*) AS n_tokens,
       |       CAST(SUM(oov) AS BIGINT) AS n_oov,
       |       string_agg(CAST(tid AS VARCHAR), ',' ORDER BY pos) AS ids_csv
       |FROM enc GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q169_cooccurrence_lift", q169, Some(q169Sql)),
    QuerySpec("q170_corpus_encode", q170, Some(q170Sql)),
    QuerySpec("q40_token_stats",   q40, Some(q40Sql)),
    QuerySpec("q41_quality_score", q41, Some(q41Sql), headline = true),
    QuerySpec("q42_lang_id",       q42, Some(q42Sql), headline = true),
    QuerySpec("q43_fingerprint",   q43, Some(q43Sql)),
    QuerySpec("q43b_rolling_hash", q43b, None),
    QuerySpec("q43c_rolling_hash_sql", q43c, Some(q43cSql)),
    QuerySpec("q54_json_extract",  q54, Some(q54Sql)),
    QuerySpec("q55_regex_extract", q55, Some(q55Sql)),
    QuerySpec("q56_fuzzy_match",   q56, Some(q56Sql)),
    QuerySpec("q180_edit_distance_join", q180, Some(q180Sql), headline = true),
    QuerySpec("q68_pii_redaction", q68, Some(q68Sql)),
    QuerySpec("q69_tfidf_topterms", q69, Some(q69Sql), headline = true),
    QuerySpec("q72_repetition_removal", q72, Some(q72Sql)),
    QuerySpec("q86_curated_corpus", q86, Some(q86Sql), headline = true),
    QuerySpec("q87_doc_chunking",   q87, Some(q87Sql), headline = true),
    QuerySpec("q89_vocab_build",    q89, Some(q89Sql)),
    QuerySpec("q90_rarity_audit",   q90, Some(q90Sql)),
    QuerySpec("q92_gopher_repetition", q92, Some(q92Sql)),
    QuerySpec("q99_heavy_hitters",  q99, Some(q99Sql), headline = true),
    QuerySpec("q101_bpe_pair_stats", q101, Some(q101Sql)),
    QuerySpec("q103_bpe_merge_apply", q103, Some(q103Sql)),
    QuerySpec("q108_bm25_retrieval", q108, Some(q108Sql), headline = true),
    QuerySpec("q265_incremental_bm25", q265, Some(q108Sql)),
    QuerySpec("q266_stream_bm25_maintenance", q266, Some(q108Sql)),
    QuerySpec("q273_bm25_delete_maintenance", q273, Some(q273Sql)),
    QuerySpec("q282_bm25_mixed_batch", q282, Some(q282Sql)),
    QuerySpec("q268_two_stage_retrieval", q268, Some(q268Sql)),
    QuerySpec("q272_cascade_recall", q272, Some(q272Sql)),
    QuerySpec("q111_quality_classifier", q111, Some(q111Sql)),
    QuerySpec("q114_bigram_lm_score", q114, Some(q114Sql)),
    QuerySpec("q119_source_ngrams", q119, Some(q119Sql)),
    QuerySpec("q123_score_calibration", q123, Some(q123Sql)),
    QuerySpec("q126_phrase_search", q126, Some(q126Sql)),
    QuerySpec("q160_cdc_chunking", q160, Some(q160Sql)),
  )
}
