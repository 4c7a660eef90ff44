package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** S2 exercised for real: the raw fact fixture round-trips through an
  * embedded Derby database (the JDBC engine already on Spark's
  * classpath) — `df.write.jdbc` out, range-partitioned
  * `spark.read.jdbc` back — and survives `cleanFact` downstream.
  * This is the same Spark JDBC API + dialect machinery a cluster
  * deployment points at SQLite/Postgres; only the URL differs.
  */
class JdbcSourceSpec extends SparkSpec {

  private def res(name: String): String =
    getClass.getResource(s"/reference/$name").toString

  private lazy val url = {
    val dir = java.nio.file.Files.createTempDirectory("graft_derby").toString
    s"jdbc:derby:$dir/factdb;create=true"
  }

  private lazy val raw = spark.read.parquet(res("raw_fact.parquet"))

  test("fact table round-trips through JDBC write + partitioned read") {
    JdbcStore.write(raw, url, "fact_transaction")
    // Derby has no BIGINT-typed id here (raw is stringly); partition
    // on a derived int column the way a production extract would use
    // the PK: push the cast into the dbtable subquery
    val roundTripped = JdbcStore.readPartitioned(
      spark, url,
      // identifiers quoted: Spark's JDBC writer creates case-exact
      // (lowercase) column names, which unquoted Derby SQL would fold
      // to uppercase
      // (Spark maps StringType to Derby CLOB, which only casts
      // numeric via an intermediate VARCHAR)
      table = """(SELECT f.*, CAST(CAST(CAST(f."id" AS VARCHAR(32)) AS DECIMAL(18,1)) AS BIGINT) AS "part_key" FROM fact_transaction f) t""",
      partitionColumn = "part_key",
      lowerBound = 1L, upperBound = 2000L, numPartitions = 4)
    assert(roundTripped.rdd.getNumPartitions == 4,
      "partitioned JDBC read must open N range slices, not one connection")
    val got = roundTripped.drop("part_key")
    assert(got.columns.toSeq.map(_.toLowerCase) == raw.columns.toSeq.map(_.toLowerCase))
    val g = got.toDF(raw.columns: _*)
    assert(g.count() == raw.count())
    assert(raw.exceptAll(g).count() == 0 && g.exceptAll(raw).count() == 0,
      "JDBC round trip must be lossless")
  }

  test("all-VARCHAR fact (the sqlite TEXT-affinity shape) repairs identically") {
    // server.py:53-56 reads the fact over sqlite, where TEXT affinity
    // hands EVERY column back as text regardless of content. The
    // sqlite jar is unavailable offline (documented S2 gap), so this
    // closes the SEMANTIC half jar-free: the same fact forced into
    // explicit VARCHAR columns on Derby (not Spark's default CLOB
    // mapping), pulled back through JDBC, must repair via cleanFact
    // into exactly the rows the parquet-sourced path produces —
    // proving the typed-cast/try_cast repair layer is agnostic to a
    // TEXT-affinity source.
    val varcharTypes = raw.columns.map(c => s"$c VARCHAR(256)").mkString(", ")
    raw.write.mode("overwrite").format("jdbc")
      .option("url", url).option("dbtable", "fact_text_affinity")
      .option("createTableColumnTypes", varcharTypes)
      .save()
    val viaText = JdbcStore.read(spark, url, "fact_text_affinity")
    assert(viaText.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType),
      "TEXT-affinity fixture must arrive all-string")
    val cleaned = graft.etl.ReferencePipeline.cleanFact(viaText.toDF(raw.columns: _*))
    val fromParquet = graft.etl.ReferencePipeline.cleanFact(raw)
    assert(cleaned.count() == fromParquet.count())
    assert(fromParquet.exceptAll(cleaned).count() == 0 &&
      cleaned.exceptAll(fromParquet).count() == 0,
      "TEXT-affinity source must clean to the identical typed rows")
  }

  test("cleanFact runs unchanged on the JDBC-sourced fact") {
    val viaJdbc = JdbcStore.read(spark, url, "fact_transaction")
      .toDF(raw.columns: _*)
    val cleaned = graft.etl.ReferencePipeline.cleanFact(viaJdbc)
    val fromParquet = graft.etl.ReferencePipeline.cleanFact(raw)
    assert(cleaned.count() == fromParquet.count())
    // spot-check a derived column end-to-end (quarter key F11)
    val a = cleaned.groupBy(col("quarter")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = fromParquet.groupBy(col("quarter")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b, "quarter histogram must match the parquet-sourced clean")
  }
}
