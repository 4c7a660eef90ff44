package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for 100 TB-scale aggregation and joins.
  *
  * AQE's skew-join splitting covers sort-merge joins automatically
  * (enabled in Bench/Verify sessions); these helpers cover the cases
  * AQE does not: hot-key GROUP BY (a single reducer drowning in one
  * key) and broadcast-averse skewed joins.
  */
object Skew {

  /** Two-phase salted aggregation: spray each input row across
    * `buckets` sub-keys, partially aggregate on (key, salt), then
    * aggregate the partials on key alone. The first shuffle spreads a
    * hot key over `buckets` reducers; the second shuffle moves only
    * `buckets` rows per key.
    *
    * Usable for any algebraic aggregate expressed as
    * (partial, merge) column pairs: pass the partial aggregates and
    * the matching merge aggregates over the partial columns.
    *
    * The salt is `pmod(hash of a per-row uniform column)` — here
    * `monotonically_increasing_id` hashed, which is deterministic for
    * a deterministic input layout (no RNG, replayable).
    */
  def saltedAgg(
      df: DataFrame,
      keys: Seq[Column],
      buckets: Int)(
      partials: Seq[Column],
      merges: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(monotonically_increasing_id()), lit(buckets)))
    val partial = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partials.head, partials.tail: _*)
    val keyNames = partial.columns.dropRight(partials.length + 1) // keys only
    partial
      .groupBy(keyNames.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Salted fact⋈dim equi-join for HOT fact keys: rows carrying a hot
    * key are sprayed across `buckets` sub-keys (salt derived from
    * `saltSrc`, a per-row deterministic column — no RNG, replayable),
    * and the dim side replicates its hot rows once per bucket so
    * every (key, salt) cell still finds its match. Non-hot keys keep
    * salt 0 on both sides — dim inflation is `buckets × |hot dim
    * rows|`, not `buckets × |dim|`. Same join result as the unsalted
    * join (inner, on `keyCols`), but no reducer receives a hot key's
    * full row set: the worst partition shrinks by ~`buckets`×.
    *
    * This is the manual fallback for the skew AQE can't fix:
    * AQE skew-join splits oversized SMJ partitions of the FACT side
    * but still routes every match of a hot key through the join; when
    * the hot key's row set alone exceeds an executor (the 100 TB bot
    * user, the null-key convention), pre-spreading the key is the
    * standard remedy.
    *
    * `hot` must be a predicate over the join key columns (present on
    * both sides by name).
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      hot: Column,
      buckets: Int,
      saltSrc: Column): DataFrame = {
    val (f, d) = saltedSides(fact, dim, hot, buckets, saltSrc)
    f.join(d, keyCols :+ "__salt").drop("__salt")
  }

  /** The two salted inputs of [[saltedJoin]] with their `__salt`
    * column still visible — exposed so SaltedJoinSpec can assert the
    * spread and replication properties on the REAL implementation
    * rather than a re-derivation.
    */
  private[scale] def saltedSides(
      fact: DataFrame,
      dim: DataFrame,
      hot: Column,
      buckets: Int,
      saltSrc: Column): (DataFrame, DataFrame) = {
    val f = fact.withColumn("__salt",
      when(hot, pmod(hash(saltSrc), lit(buckets))).otherwise(lit(0)))
    val d = dim.withColumn("__salt",
      explode(when(hot, sequence(lit(0), lit(buckets - 1))).otherwise(array(lit(0)))))
    (f, d)
  }
}
