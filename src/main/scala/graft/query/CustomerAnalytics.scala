package graft.query

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Customer/behavioral analytics tier: RFM value segmentation (q224),
  * exponential smoothing with a one-step forecast audit (q225), and
  * HITS hub/authority ranking over the bipartite purchase graph
  * (q226). Reference scope: the reference (a pandas ETL over a transit
  * survey, server.py) has none of this; the family extends the
  * warehouse surface the way q124/q125 (cohorts/funnel) and q142
  * (PageRank) do, under the repo's exactness rules — money in cents
  * BIGINT, scores in exact integer ppm, fixed iteration budgets with
  * DECIMAL(38,0)/HUGEINT intermediate products.
  */
object CustomerAnalytics {

  private def cents(c: org.apache.spark.sql.Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  private def centsSql(x: String) = s"CAST(CAST($x AS DECIMAL(18,2)) * 100 AS BIGINT)"

  /** q224 — RFM SEGMENTATION: quintile-score every customer on
    * Recency (last order date), Frequency (order count) and Monetary
    * (lifetime cents), then roll up the 5×5×5 segment grid with a
    * marketing label for the classic corners — the customer-value
    * report every retail warehouse ships. Scores are NTILE(5) over a
    * TOTAL order (metric, then custkey) so the quintile assignment is
    * deterministic in both engines; money stays exact cents BIGINT
    * (the q20 house rule). Customers with no orders have no RFM row
    * (document the base population).
    *
    * Scale shape: one shuffle to the per-customer rollup (map-side
    * partial counts/sums), then three NTILE scores over the CUSTOMER
    * aggregate via the two-pass [[graft.scale.DistributedRank]]
    * (range-bucket → bounded offsets broadcast → local rank + closed
    * NTILE formula — the approx_percentile-boundary shape the old
    * scaladoc only promised, now the actual plan; no task ever sorts
    * the whole customer rollup). The rollup is localCheckpointed once
    * so the three scores' bounded bucket-count passes re-read it
    * instead of re-aggregating orders. Output is bounded: ≤125
    * segment rows.
    */
  private def q224(spark: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("monetary_cents"))
      .localCheckpoint()
    // unix_micros is monotone-bijective on timestamps, so ordering by
    // it equals ordering by last_order (the rank key must be numeric);
    // the three scores share ONE percentile action and ONE joint
    // 16³-cell count action (withNtiles), not two actions per score
    val scored = graft.scale.DistributedRank.withNtiles(perCust,
      Seq(("r_score", 5, expr("unix_micros(CAST(last_order AS TIMESTAMP))")),
        ("f_score", 5, col("n_orders")),
        ("m_score", 5, col("monetary_cents"))),
      Seq(col("o_custkey")), buckets = 16)
    scored
      .groupBy(col("r_score"), col("f_score"), col("m_score"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("monetary_cents")).as("segment_cents"))
      .withColumn("label",
        expr("""CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
                     WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
                     WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
                     WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2 THEN 'hibernating'
                     ELSE 'core' END"""))
      .orderBy("r_score", "f_score", "m_score")
  }

  private val q224Sql =
    s"""WITH per_cust AS (
       |  SELECT o_custkey, MAX(o_orderdate) AS last_order,
       |         CAST(COUNT(*) AS BIGINT) AS n_orders,
       |         CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS monetary_cents
       |  FROM orders GROUP BY 1),
       |scored AS (
       |  SELECT *,
       |         CAST(NTILE(5) OVER (ORDER BY last_order, o_custkey) AS INT) AS r_score,
       |         CAST(NTILE(5) OVER (ORDER BY n_orders, o_custkey) AS INT) AS f_score,
       |         CAST(NTILE(5) OVER (ORDER BY monetary_cents, o_custkey) AS INT) AS m_score
       |  FROM per_cust)
       |SELECT r_score, f_score, m_score,
       |       CAST(COUNT(*) AS BIGINT) AS n_customers,
       |       CAST(SUM(monetary_cents) AS BIGINT) AS segment_cents,
       |       CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
       |            WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
       |            WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
       |            WHEN r_score <= 2 AND f_score <= 2 AND m_score <= 2 THEN 'hibernating'
       |            ELSE 'core' END AS label
       |FROM scored GROUP BY 1, 2, 3
       |ORDER BY r_score, f_score, m_score""".stripMargin

  /** q225 EWMA window: α = 1/2 truncated at 8 terms — weights
    * 2^(7-i), the power-of-two family that keeps the smoother in
    * exact BIGINT arithmetic (a float α-recursion is
    * accumulation-order-dependent and unhashable).
    */
  private val EwmaTerms = 8

  /** q225 — EXPONENTIAL SMOOTHING (EWMA) of the daily event volume
    * per type, plus the one-step forecast error — the capacity/
    * anomaly baseline (alert when today deviates from yesterday's
    * smoothed level) a monitoring pipeline keeps per series. The
    * α=1/2 smoother is expressed as its closed 8-term form: ewma_t =
    * Σ_{i<8} x_{t-i}·2^(7-i) DIV Σ available 2^(7-i) — truncation
    * renormalizes over the observed lags, so series heads are
    * well-defined and every value is a pure integer function of the
    * series (both engines bit-identical; contrast q118's 2σ band,
    * which this complements with a LEVEL baseline). Smoothing runs
    * over observed days; densification to calendar days is q136's
    * job and composes upstream.
    *
    * Scale shape: one shuffle to (type, day) counts, then per-type
    * windows over the BOUNDED daily aggregate (|types|×|days| rows —
    * the q201/q212 bounded-domain argument). The 8 LAG terms share
    * one window frame; no self-joins.
    */
  private def q225(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lags = (0 until EwmaTerms).map(i => lag(col("n"), i).over(w).as(s"x$i"))
    val withLags = daily.select(col("event_type") +: col("day") +: col("n") +: lags: _*)
    val num = (0 until EwmaTerms)
      .map(i => coalesce(col(s"x$i"), lit(0L)) * lit(1L << (EwmaTerms - 1 - i)))
      .reduce(_ + _)
    val den = (0 until EwmaTerms)
      .map(i => when(col(s"x$i").isNotNull, lit(1L << (EwmaTerms - 1 - i))).otherwise(lit(0L)))
      .reduce(_ + _)
    withLags
      .withColumn("ewma", (num / den).cast("long"))
      .select(col("event_type"), col("day"), col("n"), col("ewma"))
      .withColumn("forecast_abs_err",
        abs(col("n") - lag(col("ewma"), 1).over(w)))
      .orderBy("event_type", "day")
  }

  private val q225Sql = {
    val lagDefs = (0 until EwmaTerms)
      .map(i => s"LAG(n, $i) OVER (PARTITION BY event_type ORDER BY day) AS x$i")
      .mkString(",\n       |         ")
    val num = (0 until EwmaTerms)
      .map(i => s"COALESCE(x$i, 0) * ${1L << (EwmaTerms - 1 - i)}").mkString(" + ")
    val den = (0 until EwmaTerms)
      .map(i => s"CASE WHEN x$i IS NOT NULL THEN ${1L << (EwmaTerms - 1 - i)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, day, n,
       |         $lagDefs
       |  FROM daily),
       |smoothed AS (
       |  SELECT event_type, day, n, ($num) // ($den) AS ewma FROM lagged)
       |SELECT event_type, day, n, ewma,
       |       abs(n - LAG(ewma, 1) OVER (PARTITION BY event_type ORDER BY day))
       |         AS forecast_abs_err
       |FROM smoothed ORDER BY event_type, day""".stripMargin
  }

  /** q226 — fixed HITS iteration budget (the q221/q209 truncation
    * contract: the result is DEFINED as the round-4 iterate; the spec
    * proves round-5 moves no readout).
    */
  private val HitsRounds = 4

  /** q226 scale: scores live at 10^12 total mass per side; products
    * against 10^12-scale partners stay inside DECIMAL(38,0)/HUGEINT.
    */
  private val HitsScale = 1000000000000L

  /** q226 — HITS HUBS & AUTHORITIES over the bipartite
    * customer→part purchase graph (Kleinberg 1999): authority(p) =
    * Σ hub(c) over buyers, hub(c) = Σ authority(p) over their
    * basket, each half-round L1-renormalized to 10^12 total mass in
    * EXACT integer arithmetic (DECIMAL(38,0) products, truncating
    * DIV) — so both engines walk bit-identical iterates and the
    * oracle hash-checks the SOLVER (the q221 power-iteration
    * discipline applied to the mutual-recursion fixpoint PageRank
    * q142 doesn't exercise). Readout: the top-10 of each side with
    * scores in ppm of their side's mass — "which parts anchor the
    * catalog, which customers anchor demand".
    *
    * Scale shape: ONE data-sized shuffle builds the distinct edge
    * list; every round after is edge ⋈ score (equi-join on the
    * round's side key, score side is |customers| or |parts| rows —
    * broadcast-sized relative to edges) + a groupBy on the other
    * key. Rounds localCheckpoint so the 8-join lineage never
    * compounds (q209 rule). Normalization totals ride a
    * Window.partitionBy() over the SCORE table (bounded by the
    * entity count, not the edge count).
    */
  private def q226(spark: SparkSession, dir: String): DataFrame = {
    val edges = Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, dir).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
      .localCheckpoint()

    // the normalizing total is ONE bounded driver scalar per
    // half-round (the DistributedRank offsets class) — the previous
    // Window.partitionBy() form moved every node's score into a
    // single task, 2×rounds times (the q217-family hazard, hidden
    // behind an empty partitionBy instead of a bare orderBy)
    def renorm(df: DataFrame, key: String): DataFrame = {
      // sum() is NULL on an empty (or all-null) frame — read it as an
      // Option and short-circuit: a degenerate round renormalizes to
      // the frame itself (empty in, empty out) instead of an NPE, and
      // tot == 0 would otherwise divide by zero
      val row = df.agg(sum(col("s"))).head()
      val tot = if (row.isNullAt(0)) 0L else row.getLong(0)
      if (tot == 0L) df.select(col(key), col("s"))
      else df.select(col(key),
        expr(s"CAST(CAST(s AS DECIMAL(38,0)) * $HitsScale DIV ${tot}L AS BIGINT)").as("s"))
    }

    var hub = edges.select(col("c")).distinct().withColumn("s", lit(1000000L))
    var auth: DataFrame = null
    // Checkpoint each HALF-round. Measured: checkpointing hub only
    // (auth staying lineage) reads as "one join less per round" but
    // benches 17s vs 4.9s at sf0.1 — the stats-less window in auth's
    // lineage demotes the next round's broadcast decision, so both
    // halves checkpoint (the q209 fixpoint rule, plus fresh stats for
    // the join planner each half-round).
    for (_ <- 1 to HitsRounds) {
      // checkpoint BEFORE renorm so its scalar-total action reads the
      // pinned aggregate instead of re-running the round's join
      auth = renorm(
        edges.join(hub, "c").groupBy(col("p")).agg(sum(col("s")).as("s"))
          .localCheckpoint(), "p")
      hub = renorm(
        edges.join(auth, "p").groupBy(col("c")).agg(sum(col("s")).as("s"))
          .localCheckpoint(), "c")
    }
    // top-10 via distributed TakeOrdered (orderBy+limit), THEN the
    // rank window over the ≤10 surviving rows — the former global
    // row_number sorted every node in one task
    val topAuth = auth.orderBy(col("s").desc, col("p")).limit(10)
      .withColumn("rk", row_number().over(Window.orderBy(col("s").desc, col("p"))))
      .select(lit("authority").as("side"), col("rk"), col("p").as("key"),
        expr("s DIV 1000000").as("score_ppm"))
    val topHub = hub.orderBy(col("s").desc, col("c")).limit(10)
      .withColumn("rk", row_number().over(Window.orderBy(col("s").desc, col("c"))))
      .select(lit("hub").as("side"), col("rk"), col("c").as("key"),
        expr("s DIV 1000000").as("score_ppm"))
    topAuth.unionAll(topHub).orderBy("side", "rk")
  }

  private val q226Sql = {
    val rounds = (1 to HitsRounds).map { k =>
      val prevHub = if (k == 1) "h0" else s"h${k - 1}"
      s"""a${k}_raw AS MATERIALIZED (
         |  SELECT e.p, CAST(SUM(h.s) AS BIGINT) AS s
         |  FROM edges e JOIN $prevHub h ON e.c = h.c GROUP BY 1),
         |a$k AS MATERIALIZED (
         |  SELECT p, CAST(CAST(s AS HUGEINT) * $HitsScale
         |         // (SELECT SUM(s) FROM a${k}_raw) AS BIGINT) AS s
         |  FROM a${k}_raw),
         |h${k}_raw AS MATERIALIZED (
         |  SELECT e.c, CAST(SUM(a.s) AS BIGINT) AS s
         |  FROM edges e JOIN a$k a ON e.p = a.p GROUP BY 1),
         |h$k AS MATERIALIZED (
         |  SELECT c, CAST(CAST(s AS HUGEINT) * $HitsScale
         |         // (SELECT SUM(s) FROM h${k}_raw) AS BIGINT) AS s
         |  FROM h${k}_raw)""".stripMargin
    }.mkString(",\n")
    s"""WITH edges AS MATERIALIZED (
       |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
       |  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
       |h0 AS (SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS s FROM edges),
       |$rounds,
       |top_a AS (
       |  SELECT 'authority' AS side,
       |         CAST(ROW_NUMBER() OVER (ORDER BY s DESC, p) AS INT) AS rk,
       |         p AS key, s // 1000000 AS score_ppm
       |  FROM a$HitsRounds),
       |top_h AS (
       |  SELECT 'hub' AS side,
       |         CAST(ROW_NUMBER() OVER (ORDER BY s DESC, c) AS INT) AS rk,
       |         c AS key, s // 1000000 AS score_ppm
       |  FROM h$HitsRounds)
       |SELECT * FROM (
       |  SELECT * FROM top_a WHERE rk <= 10
       |  UNION ALL
       |  SELECT * FROM top_h WHERE rk <= 10)
       |ORDER BY side, rk""".stripMargin
  }

  /** q230 — CUPED variance-reduced experiment readout (Deng et al.,
    * WSDM'13 — "Improving the Sensitivity of Online Controlled
    * Experiments by Utilizing Pre-Experiment Data"): the A/B readout
    * (q137's sibling) with each user's experiment-period metric
    * adjusted by their PRE-period covariate,
    *
    *   ŷᵢ = yᵢ − θ·(xᵢ − x̄),  θ = cov(x, y) / var(x)
    *
    * which preserves the arm-difference expectation (θ is pooled
    * across arms) while removing the covariate-explained variance.
    * Here x = the user's event count in the pre-period (before
    * 2024-01-16), y = purchase count after; arms are the salted-md5
    * never-migrates split (q58/q137 house rule). Everything is exact:
    * θ's numerator/denominator stay integer (n·Sxy − Sx·Sy over
    * n·Sxx − Sx²), and each arm's adjusted mean clears every
    * denominator by cross multiplication —
    *
    *   adj_a = (Sy_a·var·n − cov·(Sx_a·n − Sx·n_a)) · 10⁶
    *           ──────────────────────────────────────────
    *                       n_a · var · n
    *
    * — with the triple products in DECIMAL(38,0)/HUGEINT (the q112
    * overflow rule; counts² × counts³ crosses BIGINT at large SFs).
    * Output: one row per arm with raw and adjusted means, plus the
    * shared θ and the variance-reduction ratio ρ² = cov²/(var_x·var_y)
    * in ppm — the "how much narrower did the CI get" headline
    * (1 − ρ² is the residual variance fraction).
    *
    * Scale shape: ONE groupBy(user) over events with conditional
    * sums (map-side partials), then 1-row/2-row aggregates joined by
    * broadcast (the q03/q69 scalar pattern, PlanGuard-allowlisted).
    * Nothing user-level ever reshuffles after the first aggregate.
    */
  private def q230(spark: SparkSession, dir: String): DataFrame = {
    val Boundary = "2024-01-16"
    val perUser = graft.Tables.events(spark, dir)
      .select(col("user_id"),
        (col("ts") < lit(Boundary).cast("timestamp")).as("pre"),
        col("event_type"))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("pre"), 1L).otherwise(0L)).as("x"),
        sum(when(!col("pre") && col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .withColumn("arm", graft.ext.TrainPrep.md5Bucket(col("user_id"), 2, ":q230"))
    val glob = perUser.agg(
      count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val arms = perUser.groupBy(col("arm")).agg(
      count(lit(1)).as("n_arm"), sum(col("x")).as("sx_arm"), sum(col("y")).as("sy_arm"))
    arms.crossJoin(broadcast(glob))
      .select(col("arm"), col("n_arm"),
        expr("(sx_arm * 1000000) DIV n_arm").as("mean_x_micro"),
        expr("(sy_arm * 1000000) DIV n_arm").as("mean_y_micro"),
        expr("""CAST((CAST(sy_arm AS DECIMAL(38,0)) * (n*sxx - sx*sx) * n
               |      - CAST(n*sxy - sx*sy AS DECIMAL(38,0)) * (sx_arm*n - sx*n_arm))
               |     * 1000000
               |     DIV (CAST(n_arm AS DECIMAL(38,0)) * (n*sxx - sx*sx) * n)
               |     AS BIGINT)""".stripMargin).as("adj_mean_y_micro"),
        expr("((n*sxy - sx*sy) * 1000000) DIV (n*sxx - sx*sx)").as("theta_micro"),
        expr("""CAST(CAST(n*sxy - sx*sy AS DECIMAL(38,0)) * (n*sxy - sx*sy) * 1000000
               |     DIV (CAST(n*sxx - sx*sx AS DECIMAL(38,0)) * (n*syy - sy*sy))
               |     AS BIGINT)""".stripMargin).as("var_reduction_ppm"))
      .orderBy(col("arm"))
  }

  private val q230Sql =
    """WITH per_user AS (
      |  SELECT user_id,
      |         CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS x,
      |         CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
      |                        AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':q230'), 1, 15))::BIGINT % 2 AS arm
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy,
      |         CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM per_user),
      |arms AS (
      |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_arm,
      |         CAST(SUM(x) AS BIGINT) AS sx_arm, CAST(SUM(y) AS BIGINT) AS sy_arm
      |  FROM per_user GROUP BY arm)
      |SELECT arm, n_arm,
      |       CAST((sx_arm * 1000000) // n_arm AS BIGINT) AS mean_x_micro,
      |       CAST((sy_arm * 1000000) // n_arm AS BIGINT) AS mean_y_micro,
      |       CAST((CAST(sy_arm AS HUGEINT) * (n*sxx - sx*sx) * n
      |             - CAST(n*sxy - sx*sy AS HUGEINT) * (sx_arm*n - sx*n_arm))
      |            * 1000000
      |            // (CAST(n_arm AS HUGEINT) * (n*sxx - sx*sx) * n)
      |            AS BIGINT) AS adj_mean_y_micro,
      |       CAST(((n*sxy - sx*sy) * 1000000) // (n*sxx - sx*sx) AS BIGINT) AS theta_micro,
      |       CAST(CAST(n*sxy - sx*sy AS HUGEINT) * (n*sxy - sx*sy) * 1000000
      |            // (CAST(n*sxx - sx*sx AS HUGEINT) * (n*syy - sy*sy))
      |            AS BIGINT) AS var_reduction_ppm
      |FROM arms CROSS JOIN g
      |ORDER BY arm""".stripMargin

  /** q232 — THEIL–SEN ROBUST TREND per nation: the median of all
    * pairwise slopes of the nation's monthly order-count series —
    * the standard robust alternative to OLS trend (q167's groupwise
    * regression): a 29% contamination of the series moves the
    * estimate boundedly, where one bad month drags OLS arbitrarily.
    * Slopes are floor-micros by exact cross-multiplied integer
    * division ((y_j−y_i)·10⁶ DIV (m_j−m_i) — both engines truncate
    * toward zero, the q183-verified rule), and the even-count median
    * is pinned engine-exactly as the two middle ORDER STATISTICS
    * under a TOTAL order (slope, i, j), averaged with one more
    * truncating DIV. The intercept is the median residual
    * y_i·10⁶ − slope·m_i under the chosen slope (Conover's variant).
    *
    * Scale shape: the series is a (nation, month) AGGREGATE — its
    * length is bounded by the calendar, not the data, so the O(L²)
    * pair stage is scale-INVARIANT (84 months → ≤3.5k pairs per
    * nation forever); everything upstream is one shuffled rollup of
    * orders⋈customer. The per-nation windows partition by nation —
    * no single-partition global sort anywhere.
    */
  private def q232(spark: SparkSession, dir: String): DataFrame = {
    val series = graft.Tables.orders(spark, dir)
      .join(graft.Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nk"),
        ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1).as("m"))
      .groupBy(col("nk"), col("m")).agg(count(lit(1)).as("y"))
    val a = series.select(col("nk"), col("m").as("mi"), col("y").as("yi"))
    val b = series.select(col("nk"), col("m").as("mj"), col("y").as("yj"))
    val slopes = a.join(b, Seq("nk")).filter(col("mi") < col("mj"))
      .select(col("nk"), col("mi"), col("mj"),
        expr("((yj - yi) * 1000000) DIV (mj - mi)").as("s"))
    val w = Window.partitionBy(col("nk")).orderBy(col("s"), col("mi"), col("mj"))
    val med = slopes
      .withColumn("rn", row_number().over(w))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("nk"))))
      .filter(expr("rn = (cnt + 1) DIV 2 OR rn = cnt DIV 2 + 1"))
      .groupBy(col("nk"))
      .agg(max(col("cnt")).as("n_pairs"),
        expr("CAST(SUM(s) DIV COUNT(*) AS BIGINT)").as("slope_micro"))
    val resid = series.join(med, Seq("nk"))
      .select(col("nk"), col("m"),
        (col("y") * 1000000L - col("slope_micro") * col("m")).as("r"))
    val wr = Window.partitionBy(col("nk")).orderBy(col("r"), col("m"))
    val intercept = resid
      .withColumn("rn", row_number().over(wr))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy(col("nk"))))
      .filter(expr("rn = (cnt + 1) DIV 2 OR rn = cnt DIV 2 + 1"))
      .groupBy(col("nk"))
      .agg(max(col("cnt")).as("n_months"),
        expr("CAST(SUM(r) DIV COUNT(*) AS BIGINT)").as("intercept_micro"))
    med.join(intercept, Seq("nk"))
      .select(col("nk").as("nationkey").cast("int"), col("n_months").cast("long"),
        col("n_pairs").cast("long"), col("slope_micro"), col("intercept_micro"))
      .orderBy(col("nationkey"))
  }

  private val q232Sql =
    """WITH series AS (
      |  SELECT c_nationkey AS nk,
      |         (CAST(year(o_orderdate) AS BIGINT) - 1995) * 12
      |           + month(o_orderdate) - 1 AS m,
      |         CAST(COUNT(*) AS BIGINT) AS y
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |slopes AS (
      |  SELECT a.nk, a.m AS mi, b.m AS mj,
      |         ((b.y - a.y) * 1000000) // (b.m - a.m) AS s
      |  FROM series a JOIN series b ON a.nk = b.nk AND a.m < b.m),
      |ranked AS (
      |  SELECT nk, s,
      |         ROW_NUMBER() OVER (PARTITION BY nk ORDER BY s, mi, mj) AS rn,
      |         COUNT(*) OVER (PARTITION BY nk) AS cnt
      |  FROM slopes),
      |med AS (
      |  SELECT nk, CAST(MAX(cnt) AS BIGINT) AS n_pairs,
      |         CAST(SUM(s) // COUNT(*) AS BIGINT) AS slope_micro
      |  FROM ranked
      |  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
      |  GROUP BY nk),
      |resid AS (
      |  SELECT series.nk, m, y * 1000000 - slope_micro * m AS r
      |  FROM series JOIN med ON series.nk = med.nk),
      |rranked AS (
      |  SELECT nk, r,
      |         ROW_NUMBER() OVER (PARTITION BY nk ORDER BY r, m) AS rn,
      |         COUNT(*) OVER (PARTITION BY nk) AS cnt
      |  FROM resid),
      |icept AS (
      |  SELECT nk, CAST(MAX(cnt) AS BIGINT) AS n_months,
      |         CAST(SUM(r) // COUNT(*) AS BIGINT) AS intercept_micro
      |  FROM rranked
      |  WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1
      |  GROUP BY nk)
      |SELECT CAST(med.nk AS INT) AS nationkey, n_months, n_pairs,
      |       slope_micro, intercept_micro
      |FROM med JOIN icept ON med.nk = icept.nk
      |ORDER BY nationkey""".stripMargin

  /** q233 hub guard: parts touched by more distinct customers than
    * this contribute deg² candidate pairs and ~0 signal (1/deg → 0);
    * production caps them out of the pair generator entirely. A no-op
    * on the synthetic graph (max degree ≈ 40) — the knob documents
    * the 100 TB hazard, q129's skew report is how you'd size it.
    */
  private val RaDegCap = 1000L

  /** q233 — LINK PREDICTION on the co-purchase graph via the
    * RESOURCE-ALLOCATION index (Zhou–Lü–Zhang 2009): for customers
    * u, v the predicted-affinity score is Σ_{p ∈ Γ(u)∩Γ(v)} 1/deg(p)
    * over shared parts — common-neighbors where rare shared items
    * count more. RA is chosen over Adamic–Adar deliberately: 1/deg
    * is EXACT in integer pico-units (10¹² DIV deg), where AA's
    * 1/log(deg) would drag libm into the hash gate. Top-50 pairs by
    * (score, common count, pair id) under a total order.
    *
    * Scale shape: candidate pairs come from the edge self-join on
    * partkey — fan-out Σ deg(p)², bounded by the RaDegCap hub guard;
    * scores aggregate id pairs only (never names/payloads), and the
    * top-50 runs as TakeOrderedAndProject (per-partition heaps, no
    * global sort — the q89 plan shape).
    */
  private def q233(spark: SparkSession, dir: String): DataFrame = {
    val edges = graft.Tables.orders(spark, dir)
      .join(graft.Tables.lineitem(spark, dir), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct()
    val deg = edges.groupBy(col("p")).agg(count(lit(1)).as("d"))
      .filter(col("d") <= RaDegCap)
    val scored = edges.join(deg, Seq("p"))
    val a = scored.select(col("p"), col("c").as("ca"), col("d"))
    val b = scored.select(col("p"), col("c").as("cb"))
    a.join(b, Seq("p")).filter(col("ca") < col("cb"))
      .groupBy(col("ca"), col("cb"))
      .agg(count(lit(1)).as("common_parts"),
        sum(expr("1000000000000 DIV d")).as("ra_pico"))
      .orderBy(col("ra_pico").desc, col("common_parts").desc, col("ca"), col("cb"))
      .limit(50)
  }

  private val q233Sql =
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS c, l_partkey AS p
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |deg AS (
       |  SELECT p, CAST(COUNT(*) AS BIGINT) AS d FROM edges GROUP BY p
       |  HAVING COUNT(*) <= $RaDegCap)
       |SELECT a.c AS ca, b.c AS cb,
       |       CAST(COUNT(*) AS BIGINT) AS common_parts,
       |       CAST(SUM(1000000000000 // d) AS BIGINT) AS ra_pico
       |FROM edges a JOIN deg USING (p) JOIN edges b USING (p)
       |WHERE a.c < b.c
       |GROUP BY 1, 2
       |ORDER BY ra_pico DESC, common_parts DESC, ca, cb
       |LIMIT 50""".stripMargin

  /** q248 — ROLLING-ORIGIN FORECAST BACKTEST of the q225 EWMA
    * forecaster against the naive (yesterday-equals-today) baseline —
    * the q211 eval-harness pattern applied to time series: every day
    * with a full history window is a forecast origin, the model
    * forecasts one step ahead, and the readout is per-type MAE (both
    * models, exact floor-micros) plus the fraction of origins the
    * EWMA strictly beats naive (ppm). A forecaster that can't beat
    * naive on its own training signal shouldn't ship — this query is
    * the gate that says so, and it's oracle-exact because both error
    * series are integers.
    *
    * Scale shape: rides the q225 per-type windows (partition =
    * event_type — no global window), then one ≤|types|-row rollup.
    */
  private def q248(spark: SparkSession, dir: String): DataFrame = {
    val daily = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val lags = (0 until EwmaTerms).map(i => lag(col("n"), i).over(w).as(s"x$i"))
    val withLags = daily.select(col("event_type") +: col("day") +: col("n") +: lags: _*)
    val num = (0 until EwmaTerms)
      .map(i => coalesce(col(s"x$i"), lit(0L)) * lit(1L << (EwmaTerms - 1 - i)))
      .reduce(_ + _)
    val den = (0 until EwmaTerms)
      .map(i => when(col(s"x$i").isNotNull, lit(1L << (EwmaTerms - 1 - i))).otherwise(lit(0L)))
      .reduce(_ + _)
    withLags
      .withColumn("ewma", (num / den).cast("long"))
      .withColumn("e_model", abs(col("n") - lag(col("ewma"), 1).over(w)))
      .withColumn("e_naive", abs(col("n") - lag(col("n"), 1).over(w)))
      // origins: the FORECASTING row (t-1) must have had the full
      // window — gate on x7 of the previous row, not the current one
      .withColumn("prev_full", lag(col(s"x${EwmaTerms - 1}"), 1).over(w))
      .filter(col("prev_full").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_origins"),
        expr("(SUM(e_model) * 1000000) DIV COUNT(*)").as("mae_model_micro"),
        expr("(SUM(e_naive) * 1000000) DIV COUNT(*)").as("mae_naive_micro"),
        expr("(SUM(CASE WHEN e_model < e_naive THEN 1 ELSE 0 END) * 1000000) DIV COUNT(*)")
          .as("wins_ppm"),
        expr("(SUM(CASE WHEN e_model = e_naive THEN 1 ELSE 0 END) * 1000000) DIV COUNT(*)")
          .as("ties_ppm"))
      .orderBy(col("event_type"))
  }

  private val q248Sql = {
    val lagDefs = (0 until EwmaTerms)
      .map(i => s"LAG(n, $i) OVER w AS x$i")
      .mkString(",\n       |         ")
    val num = (0 until EwmaTerms)
      .map(i => s"COALESCE(x$i, 0) * ${1L << (EwmaTerms - 1 - i)}").mkString(" + ")
    val den = (0 until EwmaTerms)
      .map(i => s"CASE WHEN x$i IS NOT NULL THEN ${1L << (EwmaTerms - 1 - i)} ELSE 0 END")
      .mkString(" + ")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         CAST(COUNT(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |lagged AS (
       |  SELECT event_type, day, n,
       |         $lagDefs
       |  FROM daily
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
       |smoothed AS (
       |  SELECT event_type, day, n, x${EwmaTerms - 1}, ($num) // ($den) AS ewma FROM lagged),
       |scored AS (
       |  SELECT event_type,
       |         LAG(x${EwmaTerms - 1}, 1) OVER w AS prev_full,
       |         abs(n - LAG(ewma, 1) OVER w) AS e_model,
       |         abs(n - LAG(n, 1) OVER w) AS e_naive
       |  FROM smoothed
       |  WINDOW w AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_origins,
       |       CAST((SUM(e_model) * 1000000) // COUNT(*) AS BIGINT) AS mae_model_micro,
       |       CAST((SUM(e_naive) * 1000000) // COUNT(*) AS BIGINT) AS mae_naive_micro,
       |       CAST((SUM(CASE WHEN e_model < e_naive THEN 1 ELSE 0 END) * 1000000)
       |            // COUNT(*) AS BIGINT) AS wins_ppm,
       |       CAST((SUM(CASE WHEN e_model = e_naive THEN 1 ELSE 0 END) * 1000000)
       |            // COUNT(*) AS BIGINT) AS ties_ppm
       |FROM scored
       |WHERE prev_full IS NOT NULL
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** q252 — KAPLAN–MEIER SURVIVAL (churn) curves per market segment:
    * each customer's "lifetime" is the span from first to last order;
    * a lifetime ending well before the observation horizon is an
    * observed CHURN event, one ending near it is CENSORED (the
    * customer may still be active — the half survival analysis
    * exists to handle). The KM estimator at each event time t is the
    * running product Π(1 − dᵢ/nᵢ) over at-risk counts; the product
    * is evaluated as an EXACT integer fold in micro units —
    * S ← (S·(nᵢ−dᵢ)) DIV nᵢ over event times ascending — a
    * deterministic sequential contract both engines replay bit-for-
    * bit (Spark: a bounded per-segment `aggregate` lambda over the
    * collected risk table; DuckDB: a recursive CTE stepping rn→rn+1
    * — the q199/q43c non-window-expressible-fold pattern). Output:
    * (segment, t, at-risk, events, S_micro) for every event time.
    *
    * Scale shape: the risk table is (segment × distinct lifetime
    * days) — calendar-bounded like q232, so the collected arrays and
    * the fold are O(days) regardless of customer count; everything
    * upstream is two keyed aggregates.
    */
  private def q252(spark: SparkSession, dir: String): DataFrame = {
    val Censor = "2001-02-01"
    val subj = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("fo"), max(col("o_orderdate")).as("lo"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        datediff(col("lo"), col("fo")).cast("long").as("dur"),
        (col("lo") < lit(Censor).cast("timestamp")).cast("long").as("event"))
    val byDur = subj.groupBy(col("segment"), col("dur"))
      .agg(count(lit(1)).as("m"), sum(col("event")).as("d"))
    val w = Window.partitionBy(col("segment")).orderBy(col("dur"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("segment"))
    val risk = byDur
      .withColumn("n", sum(col("m")).over(wAll) - sum(col("m")).over(w) + col("m"))
      .filter(col("d") >= 1)
      .select(col("segment"), col("dur").as("t"), col("n"), col("d"))
    val arr = risk.groupBy(col("segment"))
      .agg(sort_array(collect_list(struct(col("t"), col("n"), col("d")))).as("a"))
    arr.select(col("segment"), explode(expr(
      """aggregate(a,
        |  named_struct('s', 1000000L,
        |               'out', CAST(array() AS ARRAY<STRUCT<t: BIGINT, n: BIGINT, d: BIGINT, s: BIGINT>>)),
        |  (acc, x) -> named_struct(
        |    's', (acc.s * (x.n - x.d)) DIV x.n,
        |    'out', concat(acc.out, array(named_struct(
        |      't', x.t, 'n', x.n, 'd', x.d,
        |      's', (acc.s * (x.n - x.d)) DIV x.n)))),
        |  acc -> acc.out)""".stripMargin)).as("r"))
      .select(col("segment"), col("r.t"), col("r.n").as("n_at_risk"),
        col("r.d").as("n_events"), col("r.s").as("s_micro"))
      .orderBy(col("segment"), col("t"))
  }

  private val q252Sql =
    """WITH RECURSIVE subj AS (
      |  SELECT c_mktsegment AS segment,
      |         CAST(datediff('day', fo, lo) AS BIGINT) AS dur,
      |         CASE WHEN lo < TIMESTAMP '2001-02-01' THEN 1 ELSE 0 END AS event
      |  FROM (SELECT o_custkey, MIN(o_orderdate) AS fo, MAX(o_orderdate) AS lo
      |        FROM orders GROUP BY 1)
      |  JOIN customer ON o_custkey = c_custkey),
      |by_dur AS (
      |  SELECT segment, dur, CAST(COUNT(*) AS BIGINT) AS m, CAST(SUM(event) AS BIGINT) AS d
      |  FROM subj GROUP BY 1, 2),
      |risk AS (
      |  SELECT segment, dur AS t, d,
      |         CAST(SUM(m) OVER (PARTITION BY segment) -
      |              SUM(m) OVER (PARTITION BY segment ORDER BY dur
      |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |              + m AS BIGINT) AS n,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY dur) AS BIGINT) AS rn0
      |  FROM by_dur),
      |r AS (
      |  SELECT segment, t, n, d,
      |         CAST(ROW_NUMBER() OVER (PARTITION BY segment ORDER BY t) AS BIGINT) AS rn
      |  FROM risk WHERE d >= 1),
      |km AS (
      |  SELECT segment, rn, t, n, d, (1000000 * (n - d)) // n AS s
      |  FROM r WHERE rn = 1
      |  UNION ALL
      |  SELECT r.segment, r.rn, r.t, r.n, r.d, (km.s * (r.n - r.d)) // r.n
      |  FROM km JOIN r ON r.segment = km.segment AND r.rn = km.rn + 1)
      |SELECT segment, t, n AS n_at_risk, d AS n_events, CAST(s AS BIGINT) AS s_micro
      |FROM km
      |ORDER BY segment, t""".stripMargin

  /** q253 — HETEROGENEOUS TREATMENT EFFECT (uplift) BY SEGMENT: the
    * q137 A/B readout cut by customer market segment — the subgroup
    * table every experiment review asks for next ("who did the
    * treatment actually move?"). Unit of analysis stays the USER
    * (q137's collapse), arms stay the salted-md5 never-migrates
    * split, and the per-segment uplift is the signed rate difference
    * in exact micros by cross multiplication:
    * (conv_b·n_a − conv_a·n_b)·10⁶ DIV (n_a·n_b) — truncation toward
    * zero on either sign, the q183-verified rule. (Significance per
    * cell is the same four counts; multiple-comparison discipline is
    * the reader's job — the table deliberately reports every cell.)
    *
    * Scale shape: the q137 funnel stages plus one broadcast
    * dimension hop (user → segment) and a ≤|segments|-row rollup.
    */
  private def q253(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ts"),
        date_trunc("day", col("ts")).as("day"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("v_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(v, Seq("user_id", "day"))
      .filter(col("ts") >= col("v_ts"))
      .groupBy(col("user_id"), col("day")).agg(min(col("ts")).as("p_ts"))
    val users = v.join(p, Seq("user_id", "day"), "left")
      .groupBy(col("user_id"))
      .agg(max(col("p_ts").isNotNull.cast("long")).as("converted"))
      .withColumn("arm", graft.ext.TrainPrep.md5Bucket(col("user_id"), 2, ":q253"))
      .join(broadcast(Tables.customer(spark, dir)
        .select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"))
    users.groupBy(col("c_mktsegment"))
      .agg(
        sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 0, col("converted")).otherwise(0L)).as("conv_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 1, col("converted")).otherwise(0L)).as("conv_b"))
      .filter(col("n_a") > 0 && col("n_b") > 0)
      .select(col("c_mktsegment"), col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
        expr("((conv_b * n_a - conv_a * n_b) * 1000000) DIV (n_a * n_b)")
          .as("uplift_micro"))
      .orderBy(col("c_mktsegment"))
  }

  private val q253Sql =
    """WITH ev AS (
      |  SELECT user_id, event_type, ts, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      |  FROM events),
      |v AS (SELECT user_id, day, MIN(ts) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY 1, 2),
      |p AS (SELECT ev.user_id, ev.day, MIN(ev.ts) AS p_ts
      |      FROM ev JOIN v ON ev.user_id = v.user_id AND ev.day = v.day
      |      WHERE ev.event_type = 'purchase' AND ev.ts >= v.v_ts GROUP BY 1, 2),
      |u AS (
      |  SELECT v.user_id,
      |         MAX(CASE WHEN p.p_ts IS NOT NULL THEN 1 ELSE 0 END) AS converted,
      |         ('0x' || substr(md5(CAST(v.user_id AS VARCHAR) || ':q253'), 1, 15))::BIGINT % 2
      |           AS arm
      |  FROM v LEFT JOIN p ON v.user_id = p.user_id AND v.day = p.day
      |  GROUP BY v.user_id),
      |cells AS (
      |  SELECT c_mktsegment,
      |         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |         CAST(SUM(CASE WHEN arm = 0 THEN converted ELSE 0 END) AS BIGINT) AS conv_a,
      |         CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |         CAST(SUM(CASE WHEN arm = 1 THEN converted ELSE 0 END) AS BIGINT) AS conv_b
      |  FROM u JOIN customer ON user_id = c_custkey
      |  GROUP BY 1)
      |SELECT c_mktsegment, n_a, conv_a, n_b, conv_b,
      |       CAST(((conv_b * n_a - conv_a * n_b) * 1000000) // (n_a * n_b) AS BIGINT)
      |         AS uplift_micro
      |FROM cells
      |WHERE n_a > 0 AND n_b > 0
      |ORDER BY c_mktsegment""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q224_rfm_segments", q224, Some(q224Sql)),
    QuerySpec("q225_ewma_smoothing", q225, Some(q225Sql)),
    QuerySpec("q226_hits_ranking", q226, Some(q226Sql)),
    QuerySpec("q230_cuped_readout", q230, Some(q230Sql)),
    QuerySpec("q232_theil_sen", q232, Some(q232Sql)),
    QuerySpec("q233_link_prediction", q233, Some(q233Sql)),
    QuerySpec("q248_forecast_backtest", q248, Some(q248Sql)),
    QuerySpec("q252_kaplan_meier", q252, Some(q252Sql)),
    QuerySpec("q253_uplift_segments", q253, Some(q253Sql)),
  )
}
