package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}

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
    * GROUPING-SETS bucket-count action that computes every key's
    * MARGINAL bucket counts in a single scan (≤ keys × buckets rows
    * driver-side — NOT the joint buckets^keys cell table an earlier
    * version collected, which capped 3-key use at ~100 buckets; the
    * marginals are all the offsets need, so 1000+-bucket multi-key
    * ranks are in range). Sequential [[withNtile]] calls would pay
    * two actions per key, each re-evaluating every previous key's
    * rank window inside its own lineage (measured on q242:
    * 1.7s → 7s before this variant).
    */
  def withNtiles(
      df: DataFrame,
      ntiles: Seq[(String, Int, Column)],
      tiebreaks: Seq[Column],
      buckets: Int = 16): DataFrame = {
    val m = ntiles.size
    require(m >= 1 && buckets.toLong * m <= 1000000L,
      s"marginal count table keys × buckets = $m × $buckets must stay driver-bounded")
    requireNoTempCols(df)
    ntiles.foreach { case (_, _, key) => requireIntegral(df, key, "ntile key") }
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
    // one scan, one shuffle: GROUPING SETS {b0}, {b1}, … {b_{m-1}}
    // yields each key's marginal bucket counts; grouping_id() tells
    // the sets apart (bit i set = column i aggregated away)
    val marginals = bucketed
      .groupingSets((0 until m).map(i => Seq(col(s"_drk_b$i"))),
        (0 until m).map(i => col(s"_drk_b$i")): _*)
      .agg(count(lit(1)).as("_drk_c"), grouping_id().as("_drk_g"))
      .collect()
    val full = (1L << m) - 1L
    def setOf(i: Int): Long = full & ~(1L << (m - 1 - i))
    val byKey = (0 until m).map { i =>
      val rows = marginals.filter(_.getLong(m + 1) == setOf(i))
      rows.foreach(r => require(!r.isNullAt(i),
        s"DistributedRank: null ntile key for '${ntiles(i)._1}' — ranks over null keys " +
          "diverge from Window.orderBy; filter or coalesce nulls first"))
      rows.map(r => r.getInt(i) -> r.getLong(m)).sortBy(_._1)
    }
    val n = byKey.head.map(_._2).sum
    val tiled = (0 until m).foldLeft(bucketed) { (d, i) =>
      val offsets: Map[Int, Long] = byKey(i)
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
    requireNoTempCols(df)
    requireIntegral(df, key, "prefix-sum key")
    requireIntegral(df, value, "prefix-sum value")
    val keyed = df
      .withColumn("_drk_k", key.cast("long"))
      .withColumn("_drk_v", value.cast("long"))
    val cuts = bounds.getOrElse(percentileBounds(keyed, buckets)).distinct.sorted
    val bucketed = keyed.withColumn("_drk_b", bucketCol("_drk_k", cuts))
    val sums = bucketed.groupBy(col("_drk_b"))
      .agg(sum(col("_drk_v")).as("_drk_s"))
      .collect()
      .map { r =>
        require(!r.isNullAt(0),
          "DistributedRank: null prefix-sum key — filter or coalesce nulls first")
        r.getInt(0) -> (if (r.isNullAt(1)) 0L else r.getLong(1))
      }
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

  /** Null keys map to a NULL bucket in every branch (search_sorted is
    * null-propagating; the no-cuts branch guards explicitly) so they
    * surface in the bounded count action as a clear error instead of
    * an NPE — ranks over null keys have no Window.orderBy-equivalent
    * contract here.
    */
  private def bucketCol(keyName: String, cuts: Seq[Long]): Column =
    if (cuts.isEmpty) when(col(keyName).isNotNull, lit(0))
    else graft.functions.search_sorted(col(keyName), cuts)

  /** The caller's frame must not use the reserved `_drk_` staging
    * prefix — withColumn would silently replace (then drop) the
    * caller's column.
    */
  private def requireNoTempCols(df: DataFrame): Unit = {
    val clash = df.columns.filter(_.startsWith("_drk_"))
    require(clash.isEmpty,
      s"DistributedRank: input columns ${clash.mkString(", ")} use the reserved _drk_ prefix")
  }

  /** The long cast on the key (and prefix-sum value) is only exact
    * for integral inputs — a fractional double/decimal would be
    * silently truncated and the rank would diverge from
    * `Window.orderBy(key)`. Fail at entry with the contract spelled
    * out instead (dates go through unix_date/unix_micros, which are
    * monotone).
    */
  private def requireIntegral(df: DataFrame, c: Column, what: String): Unit = {
    val dt = df.select(c).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"DistributedRank: $what must be integral (Byte/Short/Int/Long), got $dt — " +
        "fractional keys would be truncated by the long cast and diverge from " +
        "Window.orderBy(key); map dates through unix_date/unix_micros first")
  }

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
    requireNoTempCols(df)
    requireIntegral(df, key, "rank key")
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
      .map { r =>
        require(!r.isNullAt(0),
          "DistributedRank: null rank key — ranks over null keys diverge from " +
            "Window.orderBy; filter or coalesce nulls first")
        r.getInt(0) -> r.getLong(1)
      }
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
