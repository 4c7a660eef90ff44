package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (where
  * SQL-expressible) the equivalent DuckDB oracle SQL the driver
  * hash-compares against. `headline = true` marks the flagship
  * queries (Bench times all queries; headline flags the
  * representative set for reporting).
  *
  * Every query obeys two cross-engine determinism rules so the hash
  * compare is stable:
  *   1. aggregates over doubles go through exact decimal/integer
  *      arithmetic (see [[graft.etl.CleanExprs.moneySum]]) — raw
  *      double SUMs are accumulation-order-dependent;
  *   2. the result carries a deterministic total ORDER BY in both
  *      engines.
  */
final case class QuerySpec(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false,
)
