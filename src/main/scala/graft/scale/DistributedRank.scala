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
    val q = n / tiles
    val rem = n % tiles
    val tile =
      if (q == 0L) expr("CAST(_drk_r AS INT)")
      else expr(
        s"""CAST(CASE WHEN $rem > 0 AND _drk_r <= ${(q + 1) * rem}
           |          THEN (_drk_r + $q) DIV ${q + 1}
           |          ELSE $rem + (_drk_r - ${(q + 1) * rem} + ${q - 1}) DIV $q
           |     END AS INT)""".stripMargin.replace("\n", " "))
    r.withColumn(out, tile).drop("_drk_r")
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
    // so (bucket, key, tiebreaks) ordering == (key, tiebreaks)
    val bucketCol = cuts.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("_drk_k") > lit(b), 1).otherwise(0)
    }
    val bucketed = keyed.withColumn("_drk_b", bucketCol)
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
