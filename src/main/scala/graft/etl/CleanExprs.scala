package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's eight cleaning/derivation UDFs (reference
  * `transformer.py:2-54`) plus the inline derivations of
  * `server.py:59-105`, re-expressed as pure Catalyst column
  * combinators — zero Scala UDFs, so every one stays inside
  * whole-stage codegen and is usable at any scale.
  *
  * Numbering (F1..F13) follows SURVEY.md §2.6.
  */
object CleanExprs {

  /** F1 — `scientific_notation_9_kelurahan_id_to_int`
    * (reference `transformer.py:2-6`, applied `server.py:67-70`).
    * String surgery, NOT a float parse: `"6.171031002E9"` → drop the
    * `"."`, drop the trailing `"E9"`, parse the remaining digits as a
    * long. Preserves every digit (a double round-trip could not be
    * trusted to).
    */
  def sciNotationIdToLong(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\.", ""), "E9$", "").cast("long")

  /** F2 — `remove_after_dot` (reference `transformer.py:9-11`, applied
    * `server.py:43-44`): `"6171030001.0"` → `"6171030001"` — keep the
    * prefix before the first dot, as a string (the reference keeps the
    * merchant FK stringly-typed).
    */
  def removeAfterDot(c: Column): Column = substring_index(c, ".", 1)

  /** F3 — `second_to_minute` (reference `transformer.py:13-14`). */
  def secondToMinute(c: Column): Column = c / 60

  private val DateFmt = "yyyy-MM-dd HH:mm:ss"

  /** F4 — `split_date_process_start` + F10 datetime parse (reference
    * `transformer.py:16-20`, `server.py:59-61`): left side of
    * `"start s/d end"` (`s/d` = Indonesian "until"), parsed as a
    * timestamp.
    */
  def dateProcessStart(c: Column): Column =
    to_timestamp(split(c, " s/d ").getItem(0), DateFmt)

  /** F5 — `split_date_process_end` (reference `transformer.py:26-30`,
    * `server.py:62-64`): right side of the same split.
    */
  def dateProcessEnd(c: Column): Column =
    to_timestamp(split(c, " s/d ").getItem(1), DateFmt)

  /** F6 — `get_rounded_dist` (reference `transformer.py:22-24`, applied
    * `server.py:85`): `int(float(s))` — truncation toward zero, not
    * rounding (the reference's name lies). Spark's double→int cast also
    * truncates, giving exact parity.
    */
  def roundedDist(c: Column): Column = c.cast("double").cast("int")

  /** Shared by F7: strip tabs and spaces (reference `transformer.py:34-36`). */
  private def cleanLatLng(c: Column): Column =
    regexp_replace(c, "[\\t ]", "")

  /** F7 — `get_lat` (reference `transformer.py:33-42`, applied
    * `server.py:75,79`): strip tabs+spaces, split on `","`; two parts →
    * part 0 as double; one part (missing comma) → the prefix up to the
    * second `'-'` (the corrupted rows glue lat and lng with the lng's
    * sign).
    */
  def latOf(c: Column): Column = {
    val clean  = cleanLatLng(c)
    val parts  = split(clean, ",")
    // position of a '-' at or after char 2 ⇒ the second '-' when the
    // value itself is negative, the first when positive — exactly the
    // reference's "prefix up to second '-'" fallback.
    val sep    = locate("-", clean, 2)
    val fallback = when(sep > 0, substring(clean, lit(1), sep - 1)).otherwise(clean)
    when(size(parts) === 2, parts.getItem(0))
      .otherwise(fallback)
      .try_cast("double") // total on garbage: null, not an ANSI cast error
  }

  /** F8 — `get_lng` (reference `transformer.py:45-54`, applied
    * `server.py:77,81`): the reference's `replace(r"\t", …)` matches a
    * literal backslash-t and is a no-op; the real cleaning is splitting
    * the raw cell on the 31-tab run, then taking the FIRST
    * space-delimited token and its post-comma part. That quirk (lng
    * comes from the first space token of the segment before the tab
    * run) is replicated, not fixed.
    */
  def lngOf(c: Column): Column =
    get(split(split(split(c, "\\t{31}").getItem(0), " ").getItem(0), ","), lit(1))
      .try_cast("double")

  /** F9 — duration in whole minutes (reference `server.py:88-90`):
    * `(end - start).total_seconds() / 60`, truncated to int.
    */
  def durationMinutes(start: Column, end: Column): Column =
    ((unix_timestamp(end) - unix_timestamp(start)) / 60).cast("int")

  /** F10 — datetime parse (reference `server.py:61,64`). */
  def parseTs(c: Column): Column = to_timestamp(c, DateFmt)

  /** F11 — quarter key, stringified like pandas `Period('Q')`
    * (reference `server.py:101-105`): `"2018Q3"`.
    */
  def quarterKey(c: Column): Column =
    concat(year(c).cast("string"), lit("Q"), quarter(c).cast("string"))

  /** F12 — hour extraction (reference `server.py:253,261`). */
  def hourOf(c: Column): Column = hour(c)

  /** F13 — bool encodings (reference `server.py:28,33,49`):
    * `category_is_food = (x == 1)`, `is_male = (gender == 'L')`.
    */
  def boolFromInt(c: Column): Column = c === 1
  def isMale(c: Column): Column      = c === "L"

  // --------------------------------------------------------------------
  // Cross-engine-exact numeric helpers (not in the reference; used by
  // every aggregate query so the DuckDB-oracle hash compare is
  // bit-stable). Summing raw doubles is order-dependent; summing after
  // a decimal(18,2) cast is exact and associative, and the final
  // decimal→double cast rounds identically in Spark and DuckDB.
  // --------------------------------------------------------------------

  /** Exact, order-independent SUM of a money-scale double column.
    * Scale 6, not 2: Spark's double→decimal cast rounds the SHORTEST
    * decimal representation (half-up) while DuckDB rounds the exact
    * binary value — at scale 2 a computed value like `x.xx5` can round
    * differently; at scale 6 the data's intrinsic ≤2-decimal precision
    * is never at a rounding boundary in either engine.
    */
  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Exact AVG: exact decimal sum divided by count, in double. */
  def moneyAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 6))).cast("double") / count(c))

  /** SQL (DuckDB) mirror of [[moneySum]]. */
  def moneySumSql(x: String): String =
    s"CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE)"

  /** SQL (DuckDB) mirror of [[moneyAvg]]. */
  def moneyAvgSql(x: String): String =
    s"(CAST(SUM(CAST($x AS DECIMAL(18,6))) AS DOUBLE) / COUNT($x))"
}
