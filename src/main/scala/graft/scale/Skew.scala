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
}
