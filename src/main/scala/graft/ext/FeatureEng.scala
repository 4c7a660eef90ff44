package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised feature engineering for model-training pipelines:
  * leakage-safe categorical target encoding (q227) and monotone
  * probability calibration via isotonic regression (q228). Reference
  * scope: the reference (a pandas transit-survey ETL, server.py) has
  * no model-prep tier; this module extends the training-data surface
  * the way q111 (classifier scoring), q123 (score calibration by
  * quantile transform) and q112 (DSIR weighting) do, under the repo
  * exactness rules — every encoded value is integer micros produced
  * by truncating division over BIGINT-safe products, so the DuckDB
  * oracle hash-matches bit for bit.
  */
object FeatureEng {

  private def cents(c: Column) =
    (c.cast(DecimalType(18, 2)) * 100).cast("long")

  /** q227 — LEAVE-ONE-OUT TARGET ENCODING of the customer market
    * segment against an order-count target: the standard
    * leakage-safe way to feed a high-cardinality categorical to a
    * model. For customer u in segment s with target t_u (order
    * count, 0 for never-ordered customers — LEFT join keeps them):
    *
    *   loo(u)    = (T_s − t_u) / (n_s − 1)            [NULL if n_s = 1]
    *   smooth(u) = (T_s − t_u + m·ĝ) / (n_s − 1 + m)  [m = 10, ĝ = G/N]
    *
    * both emitted as floor-micros via exact integer cross
    * multiplication (smooth() clears the global-mean denominator:
    * ((T_s−t_u)·N + m·G)·10⁶ DIV ((n_s−1+m)·N)), so the encoding is
    * engine-exact. Excluding the row's own target is what makes the
    * feature leakage-safe under row-wise train evaluation; the
    * m-smoothed variant shrinks rare segments toward the global mean
    * (the Micci-Barreca encoder every tabular-ML library ships).
    *
    * Scale shape: target = one groupBy(custkey) on orders (map-side
    * partial counts); segment stats = a ≤|segments|-row aggregate
    * BROADCAST back; global stats = a 1-row broadcast (q69 pattern,
    * PlanGuard-allowlisted). The encode itself is a map stage — no
    * per-row window, no shuffle of the encoded table beyond the
    * target join, so the shape survives a 100 TB fact side.
    */
  private def q227(spark: SparkSession, dir: String): DataFrame = {
    val M = 10L
    val target = Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("t"))
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
      .join(target, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("t"), lit(0L)).as("t"))
    val segStats = cust.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_seg"), sum(col("t")).as("t_seg"))
    val globalStats = cust.agg(
      count(lit(1)).as("n_all"), sum(col("t")).as("t_all"))
    cust
      .join(broadcast(segStats), Seq("c_mktsegment"))
      .crossJoin(broadcast(globalStats))
      .select(
        col("c_custkey"), col("c_mktsegment"), col("t"),
        expr("CASE WHEN n_seg > 1 THEN ((t_seg - t) * 1000000) DIV (n_seg - 1) END")
          .as("loo_micro"),
        expr(s"(((t_seg - t) * n_all + $M * t_all) * 1000000) DIV ((n_seg - 1 + $M) * n_all)")
          .as("smooth_micro"))
      .orderBy(col("c_custkey"))
  }

  private val q227Sql =
    """WITH target AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS t FROM orders GROUP BY 1),
      |cust AS (
      |  SELECT c_custkey, c_mktsegment, COALESCE(t, 0) AS t
      |  FROM customer LEFT JOIN target ON c_custkey = o_custkey),
      |seg AS (
      |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_seg,
      |         CAST(SUM(t) AS BIGINT) AS t_seg
      |  FROM cust GROUP BY 1),
      |gstats AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_all, CAST(SUM(t) AS BIGINT) AS t_all
      |  FROM cust)
      |SELECT c_custkey, cust.c_mktsegment, t,
      |       CAST(CASE WHEN n_seg > 1
      |                 THEN ((t_seg - t) * 1000000) // (n_seg - 1) END AS BIGINT)
      |         AS loo_micro,
      |       CAST((((t_seg - t) * n_all + 10 * t_all) * 1000000)
      |            // ((n_seg - 1 + 10) * n_all) AS BIGINT) AS smooth_micro
      |FROM cust
      |JOIN seg ON cust.c_mktsegment = seg.c_mktsegment
      |CROSS JOIN gstats
      |ORDER BY c_custkey""".stripMargin

  /** Bin count for the q228 calibration curve. Bounded and small on
    * purpose: the isotonic fit runs on the BIN aggregate (≤ B rows),
    * so every pooling step is driver-free relational algebra over a
    * broadcastable frame regardless of the customer count.
    */
  private val IsoBins = 16

  /** q228 — ISOTONIC CALIBRATION (PAVA) of order-conversion rate on
    * account-balance bins: fit the best monotone non-decreasing
    * step function to P(converted | balance bin) — the calibration
    * pass every scored ranking/classification pipeline runs before
    * thresholding. Customers are binned by NTILE(16) over
    * (balance cents, custkey) (deterministic total order, the q224
    * quintile idiom); y = 1 iff the customer ever placed an URGENT
    * order — a target with genuine noise across balance bins (every
    * synthetic customer has ≥ 1 order, so plain conversion is
    * degenerately 100%).
    *
    * The fit uses the MINIMAX identity for weighted isotonic
    * regression (Robertson–Wright–Dykstra, "Order Restricted
    * Statistical Inference", ch. 1):
    *
    *   fit(k) = max_{i ≤ k} min_{j ≥ k} pooledAvg(i..j)
    *
    * which turns the sequential pool-adjacent-violators loop into
    * three relational stages over prefix sums: pair averages (i ≤ j)
    * from cumulative (conv, n), an (i, k)-grouped MIN over j ≥ k,
    * and a k-grouped MAX over i ≤ k — O(B³) rows with B = 16, all on
    * the bin aggregate. Averages are emitted as floor-micros FIRST;
    * because floor is monotone non-decreasing, it commutes with both
    * MIN and MAX over finite sets, so the integer minimax equals
    * floor(10⁶ · exact rational PAVA fit) — the engine result is the
    * exact fit in floor-micros, not an approximation (FeatureEngSpec
    * proves equality against a driver-side rational-arithmetic PAVA
    * replay). Output per bin: size, conversions, raw rate, fitted
    * rate; the fitted column is monotone by construction.
    *
    * Scale shape: one groupBy(custkey) on orders + one two-pass
    * [[graft.scale.DistributedRank]] NTILE over the customer
    * aggregate (range-bucket → bounded offsets broadcast → local
    * rank — no single-partition window); everything after the
    * ≤16-row bin aggregate is bounded work.
    */
  private def q228(spark: SparkSession, dir: String): DataFrame = {
    val target = Tables.orders(spark, dir)
      .groupBy(col("o_custkey"))
      .agg(max((col("o_orderpriority") === "1-URGENT").cast("long")).as("urgent"))
    // two-pass NTILE (DistributedRank): the q224 note's
    // approx_percentile-boundary shape as the actual plan — no
    // single-partition window over the customer join; checkpointed so
    // the bounded bucket-count pass re-reads rather than re-joins
    val binned = graft.scale.DistributedRank.withNtile(
      Tables.customer(spark, dir)
        .select(col("c_custkey"), cents(col("c_acctbal")).as("bal_cents"))
        .join(target, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("bal_cents"),
          coalesce(col("urgent"), lit(0L)).as("converted"))
        .localCheckpoint(),
      "bin", IsoBins, col("bal_cents"), Seq(col("c_custkey")))
    val bins = binned.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val cum = bins.select(col("bin"), col("n"), col("conv"),
      sum(col("n")).over(Window.orderBy(col("bin"))).as("cn"),
      sum(col("conv")).over(Window.orderBy(col("bin"))).as("cc"))
    // pair (i, j), i <= j: pooled floor-micro average over bins i..j
    val lo = cum.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cn_lo"), (col("cc") - col("conv")).as("cc_lo"))
    val hi = cum.select(col("bin").as("j"), col("cn").as("cn_hi"), col("cc").as("cc_hi"))
    val pairs = lo.join(hi, col("i") <= col("j"))
      .select(col("i"), col("j"),
        expr("((cc_hi - cc_lo) * 1000000) DIV (cn_hi - cn_lo)").as("avg_micro"))
    val grid = bins.select(col("bin").as("k"))
    val inner = grid.join(pairs, col("i") <= col("k") && col("j") >= col("k"))
      .groupBy(col("k"), col("i")).agg(min(col("avg_micro")).as("m"))
    val fit = inner.groupBy(col("k")).agg(max(col("m")).as("fit_micro"))
    bins.join(fit, col("bin") === col("k"))
      .select(col("bin"), col("n"), col("conv"),
        expr("(conv * 1000000) DIV n").as("raw_micro"), col("fit_micro"))
      .orderBy(col("bin"))
  }

  private val q228Sql =
    s"""WITH target AS (
       |  SELECT o_custkey,
       |         MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS urgent
       |  FROM orders GROUP BY 1),
       |binned AS (
       |  SELECT c_custkey,
       |         COALESCE(urgent, 0) AS converted,
       |         NTILE($IsoBins) OVER (
       |           ORDER BY CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT),
       |                    c_custkey) AS bin
       |  FROM customer LEFT JOIN target ON c_custkey = o_custkey),
       |bins AS (
       |  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(SUM(converted) AS BIGINT) AS conv
       |  FROM binned GROUP BY 1),
       |cum AS (
       |  SELECT bin, n, conv,
       |         CAST(SUM(n) OVER (ORDER BY bin) AS BIGINT) AS cn,
       |         CAST(SUM(conv) OVER (ORDER BY bin) AS BIGINT) AS cc
       |  FROM bins),
       |pairs AS (
       |  SELECT lo.bin AS i, hi.bin AS j,
       |         ((hi.cc - (lo.cc - lo.conv)) * 1000000)
       |           // (hi.cn - (lo.cn - lo.n)) AS avg_micro
       |  FROM cum lo JOIN cum hi ON lo.bin <= hi.bin),
       |inner_min AS (
       |  SELECT k.bin AS k, p.i, MIN(p.avg_micro) AS m
       |  FROM bins k JOIN pairs p ON p.i <= k.bin AND p.j >= k.bin
       |  GROUP BY 1, 2),
       |fit AS (
       |  SELECT k, CAST(MAX(m) AS BIGINT) AS fit_micro FROM inner_min GROUP BY 1)
       |SELECT bin, n, conv,
       |       CAST((conv * 1000000) // n AS BIGINT) AS raw_micro, fit_micro
       |FROM bins JOIN fit ON bin = k
       |ORDER BY bin""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q227_target_encoding", q227, Some(q227Sql)),
    QuerySpec("q228_isotonic_calibration", q228, Some(q228Sql)),
  )
}
