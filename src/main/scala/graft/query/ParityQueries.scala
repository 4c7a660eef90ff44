package graft.query

import graft.{QuerySpec, Tables}
import graft.etl.CleanExprs._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own query surface (SURVEY.md §2) re-expressed over
  * the driver testdata, per the role mapping in FIXTURES.md §B:
  * quarter key → `quarter(o_orderdate)`, mode → `o_orderpriority`,
  * amount → `o_totalprice`, hour → `events.ts`. The dirty-data
  * cleaning expressions (F1-F8) are exercised as round-trips: corrupt
  * strings are CONSTRUCTED from integer key columns with pure string
  * ops (identical in Spark and DuckDB), then repaired — so the oracle
  * can check the repair logic itself on real testdata, not just on
  * fixture literals.
  */
object ParityQueries {

  private val quarterSql =
    "(CAST(year(o_orderdate) AS VARCHAR) || 'Q' || CAST(quarter(o_orderdate) AS VARCHAR))"

  /** A1 + F11 — partition-by-quarter row counts (reference
    * `server.py:101-105`: `groupby(date_start.dt.to_period('Q'))`).
    */
  private def q01(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(quarterKey(col("o_orderdate")).as("quarter"))
      .agg(count(lit(1)).as("n"))
      .orderBy("quarter")

  private val q01Sql =
    s"""SELECT $quarterSql AS quarter, COUNT(*) AS n
       |FROM orders GROUP BY 1 ORDER BY quarter""".stripMargin

  /** A2 categorical — mode frequency histogram (reference
    * `server.py:167`: the "Amount Per Mode" chart).
    */
  private def q02(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("mode"))
      .agg(count(lit(1)).as("n"))
      .orderBy("mode")

  private val q02Sql =
    """SELECT o_orderpriority AS mode, COUNT(*) AS n
      |FROM orders GROUP BY 1 ORDER BY mode""".stripMargin

  /** A2 + A3 numeric — matplotlib-parity 10-bin equal-width histogram
    * (reference `server.py:158`: `plt.hist(amount_delivery)`): bin
    * edges are linspace(min, max, 11); the last bin is right-closed
    * (x == max lands in bin 9). Two-pass: a 1-row min/max aggregate is
    * (broadcast-)cross-joined back — no driver collect, so the same
    * plan works at any scale.
    */
  private def q03(spark: SparkSession, dir: String): DataFrame =
    graft.etl.ReferencePipeline.numericHistogram(
      Tables.orders(spark, dir), col("o_totalprice"))

  private val q03Sql =
    """WITH mm AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
      |SELECT CAST(CASE WHEN mx = mn THEN 0
      |            ELSE LEAST(FLOOR((o_totalprice - mn) * 10 / (mx - mn)), 9) END AS INT) AS bin,
      |       COUNT(*) AS n
      |FROM orders, mm GROUP BY 1 ORDER BY bin""".stripMargin

  /** A4 — distinct partition keys for navigation (reference
    * `server.py:139,216-218`: `simplify.keys()`).
    */
  private def q04(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(quarterKey(col("o_orderdate")).as("quarter"))
      .distinct()
      .orderBy("quarter")

  private val q04Sql =
    s"""SELECT DISTINCT $quarterSql AS quarter FROM orders ORDER BY quarter""".stripMargin

  /** F12 + A2 — hour-of-day histogram (reference `server.py:253,261`:
    * start/end-hour charts).
    */
  private def q05(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(hourOf(col("ts")).as("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy("h")

  private val q05Sql =
    """SELECT CAST(hour(ts) AS INT) AS h, COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY h""".stripMargin

  /** F7/F8 round-trip — lat/lng repair on constructed dirty strings
    * (reference `transformer.py:33-54`). Three row shapes, keyed off
    * `c_custkey % 10`: tab-polluted (the 10 dirty rows of
    * `server.py:93-94`), missing-comma (the `transformer.py:39-40`
    * fallback), and clean. All string material derives from integer
    * columns, so both engines build byte-identical inputs.
    */
  private def q06(spark: SparkSession, dir: String): DataFrame = {
    val c      = Tables.customer(spark, dir)
    val latS   = concat(lit("-0."), ((col("c_custkey") * 37) % 1000000).cast("string"))
    val lngS   = concat(lit("109."), ((col("c_custkey") * 91) % 1000000).cast("string"))
    val tabs   = expr("repeat('\t', 31)")
    val raw    = when(col("c_custkey") % 10 === 0,
                   concat(latS, lit(","), lngS, lit(" "), tabs, latS))
                 .when(col("c_custkey") % 10 === 1, concat(latS, lit("-"), lngS))
                 .otherwise(concat(latS, lit(","), lngS))
    c.select(
        col("c_custkey"),
        raw.as("raw"),
        latOf(raw).as("lat"),
        lngOf(raw).as("lng"))
      .orderBy("c_custkey")
  }

  private val q06Sql =
    """WITH src AS (
      |  SELECT c_custkey,
      |         '-0.' || CAST((c_custkey * 37) % 1000000 AS VARCHAR) AS lat_s,
      |         '109.' || CAST((c_custkey * 91) % 1000000 AS VARCHAR) AS lng_s
      |  FROM customer),
      |raws AS (
      |  SELECT c_custkey,
      |         CASE WHEN c_custkey % 10 = 0 THEN lat_s || ',' || lng_s || ' ' || repeat(chr(9), 31) || lat_s
      |              WHEN c_custkey % 10 = 1 THEN lat_s || '-' || lng_s
      |              ELSE lat_s || ',' || lng_s END AS raw
      |  FROM src),
      |cleaned AS (
      |  SELECT c_custkey, raw, regexp_replace(raw, '[\t ]', '', 'g') AS cl FROM raws)
      |SELECT c_custkey, raw,
      |       CAST(CASE WHEN len(string_split(cl, ',')) = 2 THEN string_split(cl, ',')[1]
      |                 WHEN strpos(substr(cl, 2), '-') > 0 THEN substr(cl, 1, strpos(substr(cl, 2), '-'))
      |                 ELSE cl END AS DOUBLE) AS lat,
      |       CAST(string_split(string_split(string_split_regex(raw, '\t{31}')[1], ' ')[1], ',')[2] AS DOUBLE) AS lng
      |FROM cleaned ORDER BY c_custkey""".stripMargin

  /** F1 round-trip — scientific-notation id repair (reference
    * `transformer.py:2-6`): build `"6.171031002E9"`-style strings from
    * 10-digit ids, repair them back to longs.
    */
  private def q07(spark: SparkSession, dir: String): DataFrame = {
    val c   = Tables.customer(spark, dir)
    val id0 = (col("c_custkey") + 6171000000L).cast("string")
    val sci = concat(substring(id0, 1, 1), lit("."), substring(id0, 2, 16), lit("E9"))
    c.select(
        col("c_custkey"),
        sci.as("sci"),
        sciNotationIdToLong(sci).as("repaired"))
      .orderBy("c_custkey")
  }

  private val q07Sql =
    """WITH src AS (SELECT c_custkey, CAST(c_custkey + 6171000000 AS VARCHAR) AS id0 FROM customer),
      |sci AS (SELECT c_custkey, substr(id0, 1, 1) || '.' || substr(id0, 2, 16) || 'E9' AS sci FROM src)
      |SELECT c_custkey, sci,
      |       CAST(regexp_replace(replace(sci, '.', ''), 'E9$', '') AS BIGINT) AS repaired
      |FROM sci ORDER BY c_custkey""".stripMargin

  /** F2 round-trip — trailing `".0"` removal (reference
    * `transformer.py:9-11`).
    */
  private def q08(spark: SparkSession, dir: String): DataFrame = {
    val c  = Tables.customer(spark, dir)
    val s  = concat(col("c_custkey").cast("string"), lit(".0"))
    c.select(
        col("c_custkey"),
        s.as("raw"),
        removeAfterDot(s).as("fixed"),
        removeAfterDot(s).cast("long").as("fixed_id"))
      .orderBy("c_custkey")
  }

  private val q08Sql =
    """SELECT c_custkey,
      |       CAST(c_custkey AS VARCHAR) || '.0' AS raw,
      |       split_part(CAST(c_custkey AS VARCHAR) || '.0', '.', 1) AS fixed,
      |       CAST(split_part(CAST(c_custkey AS VARCHAR) || '.0', '.', 1) AS BIGINT) AS fixed_id
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F4/F5/F9/F10 round-trip — `"start s/d end"` split + duration
    * derivation (reference `transformer.py:16-30`, `server.py:59-64,
    * 88-90`) over `events.ts` (formatted to whole seconds so both
    * engines parse identical strings).
    */
  private def q09(spark: SparkSession, dir: String): DataFrame = {
    val e     = Tables.events(spark, dir)
    val start = date_format(col("ts"), "yyyy-MM-dd HH:mm:ss")
    val end   = date_format(
      timestamp_add("MINUTE", (col("event_id") % 180).cast("int"), col("ts")),
      "yyyy-MM-dd HH:mm:ss")
    val dp    = concat(start, lit(" s/d "), end)
    e.select(
        col("event_id"),
        dp.as("date_process"),
        dateProcessStart(dp).as("date_start"),
        dateProcessEnd(dp).as("date_end"),
        durationMinutes(dateProcessStart(dp), dateProcessEnd(dp)).as("duration"))
      .orderBy("event_id")
  }

  private val q09Sql =
    """WITH src AS (
      |  SELECT event_id,
      |         strftime(ts, '%Y-%m-%d %H:%M:%S') || ' s/d ' ||
      |         strftime(ts + to_minutes(event_id % 180), '%Y-%m-%d %H:%M:%S') AS date_process
      |  FROM events),
      |parsed AS (
      |  SELECT event_id, date_process,
      |         strptime(string_split(date_process, ' s/d ')[1], '%Y-%m-%d %H:%M:%S') AS date_start,
      |         strptime(string_split(date_process, ' s/d ')[2], '%Y-%m-%d %H:%M:%S') AS date_end
      |  FROM src)
      |SELECT event_id, date_process, date_start, date_end,
      |       CAST(TRUNC(date_diff('second', date_start, date_end) / 60.0) AS INT) AS duration
      |FROM parsed ORDER BY event_id""".stripMargin

  /** F13 — bool encodings (reference `server.py:28,33,49`). */
  private def q10(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    c.select(
        col("c_custkey"),
        isMale(col("c_mktsegment").substr(1, 1)).as("flag_first_char"),
        (col("c_mktsegment") === "BUILDING").as("is_building"),
        boolFromInt(col("c_nationkey") % 2).as("odd_nation"))
      .orderBy("c_custkey")
  }

  private val q10Sql =
    """SELECT c_custkey,
      |       (substr(c_mktsegment, 1, 1) = 'L') AS flag_first_char,
      |       (c_mktsegment = 'BUILDING') AS is_building,
      |       (c_nationkey % 2 = 1) AS odd_nation
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** F6 — truncation-toward-zero semantics (reference
    * `transformer.py:22-24`: `int(float(s))`, NOT rounding). The
    * oracle uses `TRUNC` explicitly because DuckDB's bare double→int
    * CAST rounds while Spark's truncates.
    */
  private def q11(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val d = col("l_quantity") * (lit(1) - col("l_discount")) * 3
    l.select(
        col("l_orderkey"),
        col("l_linenumber"),
        d.as("dist"),
        roundedDist(d).as("dist_rounded"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q11Sql =
    """SELECT l_orderkey, l_linenumber,
      |       l_quantity * (1 - l_discount) * 3 AS dist,
      |       CAST(TRUNC(l_quantity * (1 - l_discount) * 3) AS INT) AS dist_rounded
      |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** §2.8 — geo projection (reference `server.py:189-210`): the
    * 3-column `select(lat, lng, label)` feeding the scatter plot.
    */
  private def q12(spark: SparkSession, dir: String): DataFrame = {
    val s = Tables.supplier(spark, dir)
    s.select(
        col("s_suppkey"),
        (col("s_acctbal") / 100.0).as("lat"),
        (col("s_acctbal") / 50.0 + 100.0).as("lng"),
        col("s_name").as("label"))
      .orderBy("s_suppkey")
  }

  private val q12Sql =
    """SELECT s_suppkey, s_acctbal / 100.0 AS lat, s_acctbal / 50.0 + 100.0 AS lng, s_name AS label
      |FROM supplier ORDER BY s_suppkey""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q01_quarter_counts",   q01, Some(q01Sql), headline = true),
    QuerySpec("q02_mode_histogram",   q02, Some(q02Sql), headline = true),
    QuerySpec("q03_price_histogram",  q03, Some(q03Sql), headline = true),
    QuerySpec("q04_distinct_quarters", q04, Some(q04Sql)),
    QuerySpec("q05_hour_histogram",   q05, Some(q05Sql), headline = true),
    QuerySpec("q06_latlng_repair",    q06, Some(q06Sql), headline = true),
    QuerySpec("q07_scinot_repair",    q07, Some(q07Sql)),
    QuerySpec("q08_trailing_dot",     q08, Some(q08Sql)),
    QuerySpec("q09_date_split_duration", q09, Some(q09Sql), headline = true),
    QuerySpec("q10_bool_encoding",    q10, Some(q10Sql)),
    QuerySpec("q11_trunc_distance",   q11, Some(q11Sql)),
    QuerySpec("q12_geo_projection",   q12, Some(q12Sql)),
  )
}
