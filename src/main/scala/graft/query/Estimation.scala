package graft.query

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cardinality-estimation operators: hash-exact KMV / theta sketches
  * (the mergeable distinct-count machinery a 100 TB catalog runs on)
  * and CBO-style join-size estimation audited against the true join.
  *
  * Everything here is DETERMINISTIC — sketches are pure functions of
  * md5, estimators are integer arithmetic (DECIMAL(38,0) / HUGEINT
  * products, truncating DIV / `//`) — so unlike q27b/q33b/q134b these
  * sketch queries are oracle-HASH-checked, not just spec-bounded.
  * Reference scope: the reference (pandas ETL, server.py) has no
  * sketching; this family is part of the large-scale extension
  * surface alongside q27b (HLL), q73 (Bloom), q99 (count-min).
  */
object Estimation {

  /** KMV sketch size. 64 gives ~1/sqrt(62) ≈ 12.7% relative standard
    * error — demo-sized on purpose so sf0.001's per-type user counts
    * (hundreds) sit in the estimating regime rather than the
    * exact-small regime; production uses k=1024+.
    */
  private val KmvK = 64

  /** Hash-space size: md5-derived 60-bit keys (15 hex chars), the
    * repo-wide idiom (`TrainPrep.md5Bucket`, q46b, q209).
    */
  private val HashSpace = 1152921504606846976L // 2^60

  /** 60-bit md5 key of a BIGINT id under a salt — engine-identical on
    * both sides (Spark md5-over-utf8 binary ≡ DuckDB md5-over-varchar;
    * established parity, see q209/q58).
    */
  private def h60(id: Column, salt: String): Column =
    conv(substring(md5(to_binary(concat(id.cast("string"), lit(salt)), lit("utf-8"))), 1, 15), 16, 10)
      .cast("long")

  private def h60Sql(idExpr: String, salt: String): String =
    s"('0x' || substr(md5(CAST($idExpr AS VARCHAR) || '$salt'), 1, 15))::BIGINT"

  /** q216 — KMV (K-MINIMUM-VALUES) DISTINCT-COUNT SKETCH of the part
    * keys touched per return status, hash-exact: keep the k smallest
    * 60-bit key hashes; the k-th smallest h_(k) estimates the
    * distinct count as (k−1)·2^60 / h_(k) (Bar-Yossef et al. 2002).
    * The estimator is a pure function of md5, so the DuckDB oracle
    * reproduces the ESTIMATE bit-for-bit — the sketch itself is under
    * the hash gate. Groups with fewer than k distinct keys report
    * exactly (the sketch IS the set below k). Output: exact count,
    * the k-th hash, the estimate, and the realized error in ppm.
    * (Part keys, not user ids, so every SF sits in the estimating
    * regime — sf0.001 has only 15 users.)
    *
    * Scale shape: the only shuffle is the distinct on (flag, part) —
    * which the exact-count audit column needs anyway; a
    * production-only sketch drops that column and keeps per-partition
    * bottom-k merges (algebraic, like q66's TopKPerKey in ascending
    * order), shuffling k rows per group instead of the id set. The
    * window after the distinct runs on ndv-sized data, grouped by a
    * 3-value key.
    */
  private def q216(spark: SparkSession, dir: String): DataFrame = {
    val du = Tables.lineitem(spark, dir)
      .select(col("l_returnflag").as("grp"), col("l_partkey")).distinct()
      .withColumn("h", h60(col("l_partkey"), ":kmv"))
    val ranked = du.withColumn(
      "rk", row_number().over(Window.partitionBy(col("grp")).orderBy(col("h"))))
    val kth = ranked.filter(col("rk") === KmvK)
      .select(col("grp"), col("h").as("kth_hash"))
    du.groupBy(col("grp")).agg(count(lit(1)).as("n_exact"))
      .join(kth, Seq("grp"), "left")
      .withColumn("est_distinct",
        expr(s"""CASE WHEN kth_hash IS NULL THEN n_exact
                 ELSE CAST(CAST(${KmvK - 1} AS DECIMAL(38,0)) * $HashSpace DIV kth_hash AS BIGINT) END"""))
      .withColumn("err_ppm",
        expr("CAST(abs(est_distinct - n_exact) * 1000000 DIV n_exact AS BIGINT)"))
      .orderBy(col("grp"))
  }

  private val q216Sql =
    s"""WITH du AS (SELECT DISTINCT l_returnflag AS grp, l_partkey FROM lineitem),
       |h AS (SELECT grp, ${h60Sql("l_partkey", ":kmv")} AS h FROM du),
       |ranked AS (
       |  SELECT grp, h,
       |         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rk
       |  FROM h),
       |kth AS (SELECT grp, h AS kth_hash FROM ranked WHERE rk = $KmvK),
       |n AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_exact FROM h GROUP BY 1),
       |est AS (
       |  SELECT n.grp, n.n_exact, kth.kth_hash,
       |         CASE WHEN kth.kth_hash IS NULL THEN n.n_exact
       |              ELSE CAST(CAST(${KmvK - 1} AS HUGEINT) * $HashSpace // kth.kth_hash AS BIGINT)
       |         END AS est_distinct
       |  FROM n LEFT JOIN kth ON n.grp = kth.grp)
       |SELECT grp, n_exact, kth_hash, est_distinct,
       |       CAST(abs(est_distinct - n_exact) * 1000000 // n_exact AS BIGINT) AS err_ppm
       |FROM est ORDER BY grp""".stripMargin

  /** q217 — THETA-SKETCH SET OPERATIONS: estimate |A∪B|, |A∩B| and
    * the Jaccard of two ORDER-KEY sets — orders containing a returned
    * line vs orders containing a near-full-quantity line (two
    * overlapping-but-distinct populations: J ≈ 0.23 on this data) —
    * from ONE merged KMV sketch: the mergeable-sketch algebra that
    * lets a catalog answer overlap questions across 100 TB partitions
    * without re-scanning either side (Dasgupta et al.,
    * "Theta sketch framework", 2016). θ = k-th smallest hash of the
    * UNION stream; every estimate is survivors/θ: est = |{h<θ}| ·
    * 2^60/θ restricted to the predicate (in A, in B, in both). Exact
    * counts ride along as the audit columns, and the whole readout is
    * md5-deterministic → oracle-hash-checked like q216.
    *
    * Scale shape: per-side distincts (the exact audit needs them;
    * production merges per-partition bottom-k), one sort-free
    * aggregate over the ≤2·ndv hash rows, survivors counted with
    * conditional sums — no joins beyond the tiny side-tag union.
    */
  private def q217(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    def side(pred: Column, tag: String) = li.filter(pred)
      .select(col("l_orderkey")).distinct()
      .select(h60(col("l_orderkey"), ":kmv").as("h"), lit(tag).as("side"))
    val tagged = side(col("l_returnflag") === "R", "a")
      .unionAll(side(col("l_quantity") >= 48, "b"))
      .groupBy(col("h"))
      .agg(max(when(col("side") === "a", 1).otherwise(0)).as("in_a"),
        max(when(col("side") === "b", 1).otherwise(0)).as("in_b"))
    // θ and the survivor counts fall out of ONE rank pass: with hashes
    // distinct, h < h_(k) ⟺ rank < k — and when the union is smaller
    // than k, θ = 2^60 and every row survives, which `rank < k` also
    // yields. No scalar crossJoin needed (keeps PlanGuard's allowlist
    // tight). The rank is the two-pass DISTRIBUTED form over the
    // uniform 60-bit hash domain (fixed-width range buckets — no
    // percentile pass), not a single-partition window: the hash table
    // is fact-scale, and one task sorting every distinct orderkey
    // hash was the engine's worst 100×-scale hazard.
    val agg = graft.scale.DistributedRank
      .withRank(tagged, "rk", col("h"), Seq.empty,
        bounds = Some(graft.scale.DistributedRank.uniformBounds(HashSpace, 64)))
      .agg(
        coalesce(max(when(col("rk") === KmvK, col("h"))), lit(HashSpace)).as("theta"),
        count(lit(1)).as("n_union_exact"),
        sum(col("in_a").cast("long")).as("n_a_exact"),
        sum(col("in_b").cast("long")).as("n_b_exact"),
        sum((col("in_a") * col("in_b")).cast("long")).as("n_inter_exact"),
        sum(when(col("rk") < KmvK, 1L).otherwise(0L)).as("surv_union"),
        sum(when(col("rk") < KmvK && col("in_a") === 1 && col("in_b") === 1, 1L)
          .otherwise(0L)).as("surv_inter"))
    agg.select(
        col("theta"), col("n_a_exact"), col("n_b_exact"),
        col("n_union_exact"), col("n_inter_exact"),
        expr(s"CAST(CAST(surv_union AS DECIMAL(38,0)) * $HashSpace DIV theta AS BIGINT)")
          .as("est_union"),
        expr(s"CAST(CAST(surv_inter AS DECIMAL(38,0)) * $HashSpace DIV theta AS BIGINT)")
          .as("est_inter"))
      .withColumn("est_jaccard_ppm",
        expr("CASE WHEN est_union > 0 THEN est_inter * 1000000 DIV est_union ELSE 0 END"))
      .withColumn("exact_jaccard_ppm",
        expr("n_inter_exact * 1000000 DIV n_union_exact"))
  }

  private val q217Sql =
    s"""WITH a AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
       |b AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_quantity >= 48),
       |tagged AS (
       |  SELECT h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
       |    SELECT ${h60Sql("l_orderkey", ":kmv")} AS h, 1 AS in_a, 0 AS in_b FROM a
       |    UNION ALL
       |    SELECT ${h60Sql("l_orderkey", ":kmv")} AS h, 0 AS in_a, 1 AS in_b FROM b)
       |  GROUP BY h),
       |ranked AS (
       |  SELECT h, in_a, in_b, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM tagged),
       |agg AS (
       |  SELECT COALESCE(MAX(CASE WHEN rk = $KmvK THEN h END), $HashSpace) AS theta,
       |         CAST(COUNT(*) AS BIGINT) AS n_union_exact,
       |         CAST(SUM(in_a) AS BIGINT) AS n_a_exact,
       |         CAST(SUM(in_b) AS BIGINT) AS n_b_exact,
       |         CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter_exact,
       |         CAST(SUM(CASE WHEN rk < $KmvK THEN 1 ELSE 0 END) AS BIGINT) AS surv_union,
       |         CAST(SUM(CASE WHEN rk < $KmvK AND in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS surv_inter
       |  FROM ranked)
       |SELECT theta, n_a_exact, n_b_exact, n_union_exact, n_inter_exact,
       |       CAST(CAST(surv_union AS HUGEINT) * $HashSpace // theta AS BIGINT) AS est_union,
       |       CAST(CAST(surv_inter AS HUGEINT) * $HashSpace // theta AS BIGINT) AS est_inter,
       |       CASE WHEN CAST(CAST(surv_union AS HUGEINT) * $HashSpace // theta AS BIGINT) > 0
       |            THEN CAST(CAST(surv_inter AS HUGEINT) * $HashSpace // theta AS BIGINT) * 1000000
       |                 // CAST(CAST(surv_union AS HUGEINT) * $HashSpace // theta AS BIGINT)
       |            ELSE 0 END AS est_jaccard_ppm,
       |       n_inter_exact * 1000000 // n_union_exact AS exact_jaccard_ppm
       |FROM agg""".stripMargin

  /** q223 — histogram buckets for the CBO estimate: enough resolution
    * that per-bucket uniformity is plausible, few enough that the
    * statistics table stays negligible.
    */
  private val CboBuckets = 256

  /** q223 — CBO JOIN-CARDINALITY ESTIMATION, audited: estimate
    * |A ⋈ B| from per-bucket (count, ndv) statistics — the textbook
    * estimator Σ_b cntA_b·cntB_b / max(ndvA_b, ndvB_b) (per-bucket
    * containment + uniformity, the System-R assumption every
    * cost-based optimizer runs on) — then JOIN FOR REAL and report
    * the realized error. This is the self-audit loop a 100 TB
    * warehouse uses to decide whether its stats are stale: estimates
    * drifting from actuals on the FK spine (orders→lineitem,
    * customer→orders) trigger re-ANALYZE. Buckets come from the
    * repo's md5 idiom so both engines bucket identically; estimator
    * arithmetic is integral (truncating DIV per bucket).
    *
    * Scale shape: each side aggregates to ≤256 stat rows before any
    * join (map-side partial, then a 256-row exchange); the stats join
    * is broadcast-sized by construction. The audit actuals are plain
    * key equi-joins — count-only, no payload columns through the
    * shuffle.
    */
  private def q223(spark: SparkSession, dir: String): DataFrame = {
    def stats(df: DataFrame, key: String) = df
      .select(graft.ext.TrainPrep.md5Bucket(col(key), CboBuckets, ":cbo").as("b"),
        col(key).as("k"))
      .groupBy(col("b"))
      .agg(count(lit(1)).as("cnt"), countDistinct(col("k")).as("ndv"))
    def estimate(a: DataFrame, ak: String, b: DataFrame, bk: String) =
      stats(a, ak).alias("sa")
        .join(stats(b, bk).alias("sb"), col("sa.b") === col("sb.b"))
        .agg(sum(expr("sa.cnt * sb.cnt DIV greatest(sa.ndv, sb.ndv)")).as("est_rows"))
    def actual(a: DataFrame, ak: String, b: DataFrame, bk: String) =
      a.select(col(ak).as("k")).join(b.select(col(bk).as("k")), Seq("k"))
        .agg(count(lit(1)).as("actual_rows"))
    val ord = Tables.orders(spark, dir); val li = Tables.lineitem(spark, dir)
    val cust = Tables.customer(spark, dir)
    // 1-row estimate × 1-row actual: the q03/q69 scalar-broadcast
    // assembly (Catalyst folds any constant-key equi-join back into a
    // nested loop anyway; PlanGuard-allowlisted)
    def pair(name: String, a: DataFrame, ak: String, b: DataFrame, bk: String) =
      estimate(a, ak, b, bk).crossJoin(actual(a, ak, b, bk))
        .select(lit(name).as("join_pair"), col("est_rows"), col("actual_rows"),
          expr("CAST(abs(est_rows - actual_rows) * 1000000 DIV actual_rows AS BIGINT)")
            .as("err_ppm"))
    pair("customer_orders", cust, "c_custkey", ord, "o_custkey")
      .unionAll(pair("orders_lineitem", ord, "o_orderkey", li, "l_orderkey"))
      .orderBy(col("join_pair"))
  }

  private val q223Sql = {
    def one(name: String, ta: String, ka: String, tb: String, kb: String) =
      s"""SELECT '$name' AS join_pair,
         |  (SELECT CAST(SUM(sa.cnt * sb.cnt // greatest(sa.ndv, sb.ndv)) AS BIGINT)
         |   FROM (SELECT ${h60Sql(ka, ":cbo")} % $CboBuckets AS b,
         |                CAST(COUNT(*) AS BIGINT) AS cnt,
         |                CAST(COUNT(DISTINCT $ka) AS BIGINT) AS ndv
         |         FROM $ta GROUP BY 1) sa
         |   JOIN (SELECT ${h60Sql(kb, ":cbo")} % $CboBuckets AS b,
         |                CAST(COUNT(*) AS BIGINT) AS cnt,
         |                CAST(COUNT(DISTINCT $kb) AS BIGINT) AS ndv
         |         FROM $tb GROUP BY 1) sb ON sa.b = sb.b) AS est_rows,
         |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $ta a JOIN $tb b ON a.$ka = b.$kb) AS actual_rows""".stripMargin
    s"""WITH pairs AS (
       |${one("customer_orders", "customer", "c_custkey", "orders", "o_custkey")}
       |UNION ALL
       |${one("orders_lineitem", "orders", "o_orderkey", "lineitem", "l_orderkey")})
       |SELECT join_pair, est_rows, actual_rows,
       |       CAST(abs(est_rows - actual_rows) * 1000000 // actual_rows AS BIGINT) AS err_ppm
       |FROM pairs ORDER BY join_pair""".stripMargin
  }

  /** q221 — fixed power-iteration budget, identical in both engines:
    * the result is DEFINED as the round-[[MarkovRounds]] iterate (the
    * q209/q213 truncation contract); MarkovSpec proves convergence at
    * the OUTPUT resolution (one more round moves no ppm readout — the
    * raw 10^12-scale iterate jitters by O(m) units forever because
    * every truncating round drops sub-unit mass).
    */
  private val MarkovRounds = 16

  /** q221 — MARKOV-CHAIN STATIONARY DISTRIBUTION of the user
    * event-type process: build the transition matrix from consecutive
    * event pairs per user (q151 reports the matrix; this closes the
    * loop and solves π = πP by power iteration), in EXACT integer
    * arithmetic: probabilities are never materialized — each round
    * computes v'(j) = Σ_i v(i)·cnt(i,j) DIV rowtot(i) with the
    * product in DECIMAL(38,0)/HUGEINT (v carries 10^12 scale), so
    * both engines walk bit-identical iterates and the oracle
    * hash-checks the SOLVER, not a float approximation. The readout
    * compares π against the empirical visit share — the "is the
    * process already mixed?" diagnostic a session-model owner wants.
    *
    * Scale shape: ONE shuffle that scales with data (the per-user
    * LEAD + pair count); everything after runs on the ≤|types|²
    * matrix — iteration cost is independent of row volume (the
    * bounded-domain argument of q212/q201). Rounds localCheckpoint
    * so the 16-round lineage never compounds (q209 rule).
    */
  private def q221(spark: SparkSession, dir: String): DataFrame = {
    val seq = Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .filter(col("nxt").isNotNull)
    val trans = seq.groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("cnt"))
    val tr = trans
      .withColumn("rowtot", sum(col("cnt")).over(Window.partitionBy(col("src"))))
      .localCheckpoint()
    var v = tr.select(col("src").as("state")).distinct()
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .select(col("state"), expr("1000000000000 DIV m").as("p"))
      .localCheckpoint()
    for (_ <- 1 to MarkovRounds) {
      v = v.join(tr, v("state") === tr("src"))
        .groupBy(col("dst"))
        .agg(expr("CAST(SUM(CAST(p AS DECIMAL(38,0)) * cnt DIV rowtot) AS BIGINT)").as("p"))
        .select(col("dst").as("state"), col("p"))
        .localCheckpoint()
    }
    val empirical = Tables.events(spark, dir)
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .withColumn("total", sum(col("n_events")).over(Window.partitionBy()))
      .select(col("event_type"), col("n_events"),
        expr("n_events * 1000000 DIV total").as("empirical_ppm"))
    v.select(col("state").as("event_type"), expr("p DIV 1000000").as("stationary_ppm"))
      .join(empirical, Seq("event_type"))
      .withColumn("gap_ppm", abs(col("stationary_ppm") - col("empirical_ppm")))
      .orderBy(col("event_type"))
  }

  private val q221Sql = {
    val rounds = (1 to MarkovRounds).map { k =>
      s"""v$k AS MATERIALIZED (
         |  SELECT t.dst AS state,
         |         CAST(SUM(CAST(v.p AS HUGEINT) * t.cnt // t.rowtot) AS BIGINT) AS p
         |  FROM v${k - 1} v JOIN tr t ON v.state = t.src GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH seq AS (
       |  SELECT event_type,
       |         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
       |  FROM events),
       |trans AS (
       |  SELECT event_type AS src, nxt AS dst, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM seq WHERE nxt IS NOT NULL GROUP BY 1, 2),
       |tr AS MATERIALIZED (
       |  SELECT src, dst, cnt,
       |         CAST(SUM(cnt) OVER (PARTITION BY src) AS BIGINT) AS rowtot
       |  FROM trans),
       |v0 AS MATERIALIZED (
       |  SELECT src AS state,
       |         1000000000000 // (SELECT CAST(COUNT(DISTINCT src) AS BIGINT) FROM tr) AS p
       |  FROM tr GROUP BY src),
       |$rounds,
       |empirical AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       |         CAST(COUNT(*) AS BIGINT) * 1000000
       |           // (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS empirical_ppm
       |  FROM events GROUP BY 1)
       |SELECT v.state AS event_type, v.p // 1000000 AS stationary_ppm,
       |       e.n_events, e.empirical_ppm,
       |       abs(v.p // 1000000 - e.empirical_ppm) AS gap_ppm
       |FROM v$MarkovRounds v JOIN empirical e ON v.state = e.event_type
       |ORDER BY event_type""".stripMargin
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q216_kmv_distinct", q216, Some(q216Sql)),
    QuerySpec("q217_theta_set_ops", q217, Some(q217Sql)),
    QuerySpec("q221_markov_stationary", q221, Some(q221Sql)),
    QuerySpec("q223_join_cardinality", q223, Some(q223Sql)),
  )
}
