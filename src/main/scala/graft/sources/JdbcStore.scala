package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The S2 JDBC scan/sink paths (reference `server.py:53-56` reads the
  * fact over SQLite, `server.py:115-130` writes table families back
  * with `to_sql`). The engine-side contract is plain Spark JDBC:
  *
  *   - READ: a PARTITIONED `spark.read.jdbc` — `numPartitions`
  *     concurrent connections each pull one `partitionColumn` range
  *     slice, so a 100 TB-adjacent OLTP extract parallelizes across
  *     executors instead of draining through one connection (the
  *     single-connection form is the JDBC equivalent of a
  *     driver-side collect).
  *   - WRITE: `df.write.jdbc`, one batch insert per partition.
  *
  * The testdata ships parquet extracts (no SQLite driver offline), so
  * `Tables` reads those; JdbcSourceSpec exercises THIS code path
  * end-to-end against embedded Derby (the JDBC engine on Spark's own
  * classpath) — same API, same dialect machinery as any
  * cluster-side RDBMS.
  */
object JdbcStore {

  /** Range-partitioned parallel JDBC read. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Single-connection read — only for small dimension tables. */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** Batch JDBC write (the `to_sql` replacement). */
  def write(df: DataFrame, url: String, table: String): Unit =
    df.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", table)
      .option("truncate", "false")
      .save()
}
