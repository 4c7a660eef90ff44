package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TWO-PASS DISTRIBUTED RANK / NTILE — the shared primitive that
  * replaces data-proportional `Window.orderBy(...)` (no partition →
  * one task sorts everything) with a plan that scales: range-bucket
  * the rows, count per bucket, broadcast the cumulative offsets back,
  * and rank LOCALLY inside each bucket. Exactness does not depend on
  * where the bucket boundaries fall — any boundary set yields the
  * same global rank, because bucket assignment is monotone in the key
  * (equal keys always share a bucket) and the per-bucket offset is an
  * exact count — so the result is bit-identical to
  * `row_number().over(Window.orderBy(key, tiebreaks…))` while the
  * largest sort is one bucket, not the whole table.
  *
  * The two driver-side actions are BOUNDED, independent of row count:
  * one approx-percentile row (≤ `buckets` boundary values — only the
  * BUCKETING uses the approximation, never the rank) and one
  * ≤ `buckets`-row count table (the "cumulative offsets broadcast" of
  * the classic two-pass parallel ranking scheme) — the same class as
  * the manifest/HtmlSink bounded collects. At 100 TB you raise
  * `buckets` so a bucket fits an executor; the plan shape is
  * unchanged.
  *
  * Ordering contract: ascending on (key, tiebreaks…), which must be a
  * TOTAL order for the rank to be engine-deterministic (the q224
  * house rule); `key` must be numeric (callers map dates through
  * `unix_date` — monotone, so the order is unchanged).
  */
object DistributedRank {

  /** Boundary cut points for a key uniform on [0, space) — e.g. the
    * 60-bit md5 hash domain — skipping the percentile pass entirely.
    */
  def uniformBounds(space: Long, buckets: Int): Seq[Long] =
    (1 until buckets).map(i => (space / buckets) * i)

  /** `df` + `out` = exact global 1-based rank (LongType) of each row
    * under ascending (key, tiebreaks…). `bounds` skips the percentile
    * pass when the caller knows the key distribution (uniformBounds).
    */
  def withRank(
      df: DataFrame,
      out: String,
      key: Column,
      tiebreaks: Seq[Column],
      buckets: Int = 64,
      bounds: Option[Seq[Long]] = None): DataFrame =
    ranked(df, out, key, tiebreaks, buckets, bounds)._1

  /** `df` + `out` = NTILE(tiles) (IntegerType) under ascending
    * (key, tiebreaks…) — ANSI semantics (first n % tiles tiles take
    * the extra row), bit-identical to `ntile(tiles).over(Window
    * .orderBy(…))` in both engines, computed from the distributed
    * rank by the closed formula instead of a global window.
    */
  def withNtile(
      df: DataFrame,
      out: String,
      tiles: Int,
      key: Column,
      tiebreaks: Seq[Column],
      buckets: Int = 64,
      bounds: Option[Seq[Long]] = None): DataFrame = {
    val (r, n) = ranked(df, "_drk_r", key, tiebreaks, buckets, bounds)
    r.withColumn(out, ntileFromRank("_drk_r", n, tiles)).drop("_drk_r")
  }

  /** SEVERAL independent NTILE columns over the same frame in TWO
    * bounded passes total: one combined percentile action and one
    * JOINT bucket-count action (cell count ≤ buckets^keys — callers
    * size `buckets` so the cell table stays driver-bounded; the
    * marginal offsets per key fall out of the joint cells for free).
    * Sequential [[withNtile]] calls would pay two actions per key,
    * each re-evaluating every previous key's rank window inside its
    * own lineage (measured on q242: 1.7s → 7s before this variant).
    */
  def withNtiles(
      df: DataFrame,
      ntiles: Seq[(String, Int, Column)],
      tiebreaks: Seq[Column],
      buckets: Int = 16): DataFrame = {
    val m = ntiles.size
    require(m >= 1 && math.pow(buckets.toDouble, m.toDouble) <= 1e6,
      s"joint cell table buckets^keys = $buckets^$m must stay driver-bounded")
    val keyed = ntiles.zipWithIndex.foldLeft(df) { case (d, ((_, _, key), i)) =>
      d.withColumn(s"_drk_k$i", key.cast("long"))
    }
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val pctRow = keyed.agg(
      percentile_approx(col("_drk_k0"), array(probs.map(lit): _*), lit(10000)).as("b0"),
      (1 until m).map(i =>
        percentile_approx(col(s"_drk_k$i"), array(probs.map(lit): _*), lit(10000))
          .as(s"b$i")): _*)
      .head()
    val bucketed = (0 until m).foldLeft(keyed) { (d, i) =>
      val cuts =
        if (pctRow.isNullAt(i)) Nil
        else pctRow.getSeq[Long](i).distinct.sorted
      d.withColumn(s"_drk_b$i", bucketCol(s"_drk_k$i", cuts))
    }
    val cells = bucketed
      .groupBy((0 until m).map(i => col(s"_drk_b$i")): _*)
      .agg(count(lit(1)).as("_drk_c"))
      .collect()
    val n = cells.map(_.getLong(m)).sum
    val tiled = (0 until m).foldLeft(bucketed) { (d, i) =>
      val counts = cells.groupBy(_.getInt(i)).view
        .mapValues(_.map(_.getLong(m)).sum).toSeq.sortBy(_._1)
      val offsets: Map[Int, Long] = counts
        .scanLeft((0, 0L, 0L)) { case ((_, cum, c0), (b, c)) => (b, cum + c0, c) }
        .drop(1)
        .map { case (b, off, _) => b -> off }
        .toMap
      val w = Window.partitionBy(col(s"_drk_b$i"))
        .orderBy(col(s"_drk_k$i") +: tiebreaks: _*)
      val (out, tiles, _) = ntiles(i)
      d.withColumn(s"_drk_r$i",
          row_number().over(w).cast("long") +
            coalesce(element_at(typedlit(offsets), col(s"_drk_b$i")), lit(0L)))
        .withColumn(out, ntileFromRank(s"_drk_r$i", n, tiles))
    }
    (0 until m).foldLeft(tiled) { (d, i) =>
      d.drop(s"_drk_k$i", s"_drk_b$i", s"_drk_r$i")
    }
  }

  /** Exact EXCLUSIVE prefix sum of `value` under ascending (key,
    * tiebreaks…) — Σ value over STRICTLY preceding rows, 0 for the
    * first — by the same two-pass shape as [[withRank]]: per-bucket
    * partial sums (≤ `buckets` rows, one bounded action) broadcast as
    * offsets, running sum local to each bucket. Replaces the
    * data-proportional `sum().over(Window.orderBy(key))` cumulative
    * windows on frames that grow with the data (e.g. q184's
    * distinct-price spine).
    */
  def withPrefixSum(
      df: DataFrame,
      out: String,
      value: Column,
      key: Column,
      tiebreaks: Seq[Column],
      buckets: Int = 64,
      bounds: Option[Seq[Long]] = None): DataFrame = {
    val keyed = df
      .withColumn("_drk_k", key.cast("long"))
      .withColumn("_drk_v", value.cast("long"))
    val cuts = bounds.getOrElse(percentileBounds(keyed, buckets)).distinct.sorted
    val bucketed = keyed.withColumn("_drk_b", bucketCol("_drk_k", cuts))
    val sums = bucketed.groupBy(col("_drk_b"))
      .agg(sum(col("_drk_v")).as("_drk_s"))
      .collect()
      .map(r => r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1)))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = sums
      .scanLeft((0, 0L, 0L)) { case ((_, cum, c0), (b, c)) => (b, cum + c0, c) }
      .drop(1)
      .map { case (b, off, _) => b -> off }
      .toMap
    val w = Window.partitionBy(col("_drk_b"))
      .orderBy(col("_drk_k") +: tiebreaks: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn(out,
        coalesce(sum(col("_drk_v")).over(w), lit(0L)) +
          coalesce(element_at(typedlit(offsets), col("_drk_b")), lit(0L)))
      .drop("_drk_b", "_drk_k", "_drk_v")
  }

  private def bucketCol(keyName: String, cuts: Seq[Long]): Column =
    if (cuts.isEmpty) lit(0)
    else graft.functions.search_sorted(col(keyName), cuts)

  private def ntileFromRank(rankCol: String, n: Long, tiles: Int): Column = {
    val q = n / tiles
    val rem = n % tiles
    if (q == 0L) expr(s"CAST($rankCol AS INT)")
    else expr(
      s"""CAST(CASE WHEN $rem > 0 AND $rankCol <= ${(q + 1) * rem}
         |          THEN ($rankCol + $q) DIV ${q + 1}
         |          ELSE $rem + ($rankCol - ${(q + 1) * rem} + ${q - 1}) DIV $q
         |     END AS INT)""".stripMargin.replace("\n", " "))
  }

  private def ranked(
      df: DataFrame,
      out: String,
      key: Column,
      tiebreaks: Seq[Column],
      buckets: Int,
      bounds: Option[Seq[Long]]): (DataFrame, Long) = {
    val keyed = df.withColumn("_drk_k", key.cast("long"))
    val cuts = bounds.getOrElse(percentileBounds(keyed, buckets)).distinct.sorted
    // monotone bucket assignment: equal keys always share a bucket,
    // so (bucket, key, tiebreaks) ordering == (key, tiebreaks).
    // bucket = #{cut < key}+adjust via the native binary-search
    // expression — a chained WHEN fold is linear in cuts and
    // deoptimizes codegen past ~16 cuts (see SearchSortedLong)
    val bucketed = keyed.withColumn("_drk_b", bucketCol("_drk_k", cuts))
    val counts = bucketed.groupBy(col("_drk_b"))
      .agg(count(lit(1)).as("_drk_c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = counts
      .scanLeft((0, 0L, 0L)) { case ((_, cum, c0), (b, c)) => (b, cum + c0, c) }
      .drop(1)
      .map { case (b, off, _) => b -> off }
      .toMap
    val n = counts.map(_._2).sum
    val w = Window.partitionBy(col("_drk_b"))
      .orderBy(col("_drk_k") +: tiebreaks: _*)
    val r = bucketed
      .withColumn(out,
        row_number().over(w).cast("long") +
          coalesce(element_at(typedlit(offsets), col("_drk_b")), lit(0L)))
      .drop("_drk_b", "_drk_k")
    (r, n)
  }

  private def percentileBounds(keyed: DataFrame, buckets: Int): Seq[Long] = {
    if (buckets <= 1) return Nil
    val probs = (1 until buckets).map(_.toDouble / buckets)
    val row = keyed
      .agg(percentile_approx(col("_drk_k"),
        array(probs.map(lit): _*), lit(10000)).as("b"))
      .head()
    if (row.isNullAt(0)) Nil else row.getSeq[Long](0)
  }
}
