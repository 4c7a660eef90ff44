package graft.query

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse dimension-maintenance operators — the lifecycle half of a
  * star schema the reference never reaches (its only maintenance story
  * is `if_exists='replace'`, reference `server.py:115-130`): MERGE-
  * style SCD-1 upsert and SCD-2 history construction. Both are pure
  * equi-join/window plans (shuffle key = the dimension key), and both
  * derive their change set deterministically from the testdata so the
  * DuckDB oracle can rebuild the identical delta.
  */
object Maintenance {

  /** q75 — SCD-1 upsert (MERGE INTO semantics): apply a CDC-style
    * delta — updates (key % 7 = 0: segment overwrite + balance
    * adjustment), deletes (key % 97 = 3), inserts (ten new negative
    * keys) — to the customer dimension in one pass: anti-filter the
    * deletes, left-join the updates and coalesce per column, union
    * the inserts. Everything is keyed on c_custkey, so at scale the
    * plan is one shuffle (or zero with a bucketed/partitioned target,
    * where merge-on-read rewrites only the touched partitions). The
    * delta is derived from the base table here purely so the oracle
    * can reconstruct it; production feeds a real changelog through
    * the same plan.
    */
  private def q75(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.customer(spark, dir)
    val upd = base.filter(col("c_custkey") % 7 === 0)
      .select(col("c_custkey"),
        lit("UPDATED").as("new_seg"),
        (col("c_acctbal") + 100).as("new_bal"))
    val inserts = spark.range(1, 11).select(
      (-col("id")).as("c_custkey"),
      concat(lit("new_customer_"), col("id")).as("c_name"),
      col("id").cast("int").as("c_nationkey"),
      (lit(100.25) * col("id")).as("c_acctbal"),
      lit("NEWSEG").as("c_mktsegment"))
    base.filter(col("c_custkey") % 97 =!= 3)
      .join(upd, Seq("c_custkey"), "left")
      .select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        coalesce(col("new_bal"), col("c_acctbal")).as("c_acctbal"),
        coalesce(col("new_seg"), col("c_mktsegment")).as("c_mktsegment"))
      .unionByName(inserts)
      .orderBy("c_custkey")
  }

  private val q75Sql =
    """WITH upd AS (
      |  SELECT c_custkey, 'UPDATED' AS new_seg, c_acctbal + 100 AS new_bal
      |  FROM customer WHERE c_custkey % 7 = 0),
      |kept AS (SELECT * FROM customer WHERE c_custkey % 97 != 3),
      |merged AS (
      |  SELECT k.c_custkey, k.c_name, k.c_nationkey,
      |         COALESCE(u.new_bal, k.c_acctbal) AS c_acctbal,
      |         COALESCE(u.new_seg, k.c_mktsegment) AS c_mktsegment
      |  FROM kept k LEFT JOIN upd u USING (c_custkey)
      |  UNION ALL
      |  SELECT -i, 'new_customer_' || i, CAST(i AS INT), 100.25 * i, 'NEWSEG'
      |  FROM range(1, 11) r(i))
      |SELECT * FROM merged ORDER BY c_custkey""".stripMargin

  /** q76 — SCD-2 history: build the versioned slowly-changing
    * dimension from an event log — each customer's order-priority
    * change opens a new version with `[effective_from, effective_to)`
    * validity and an `is_current` flag on the open version. Two
    * window passes over the same (key, time, tie-break) ordering —
    * change detection via `lag`, validity closure via `lead` — so
    * Catalyst reuses one sort/exchange; the only shuffle key is the
    * dimension key. The (custkey, date) tie is broken by o_orderkey
    * in BOTH engines or change detection itself would be
    * nondeterministic (the testdata contains exactly one such tie).
    */
  private def q76(spark: SparkSession, dir: String): DataFrame =
    scd2History(spark, dir).orderBy("o_custkey", "version")

  /** The versioned SCD-2 dimension (unordered) — shared by q76 (the
    * history report) and q94 (the point-in-time join).
    */
  private def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val changes = Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"), col("o_orderpriority"))
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
    changes
      .withColumn("version", row_number().over(w))
      .withColumn("effective_to", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey"),
        col("version"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("effective_from"),
        col("effective_to"),
        col("effective_to").isNull.as("is_current"))
  }

  private val q76Sql =
    """WITH m AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |         LAG(o_orderpriority) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |c AS (SELECT * FROM m WHERE prev IS NULL OR prev != o_orderpriority),
      |v AS (
      |  SELECT o_custkey,
      |         CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |         o_orderpriority AS priority,
      |         o_orderdate AS effective_from,
      |         LEAD(o_orderdate) OVER w AS effective_to
      |  FROM c
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
      |SELECT *, effective_to IS NULL AS is_current FROM v
      |ORDER BY o_custkey, version""".stripMargin

  /** q78 — latest-wins log compaction: reduce an append-only event
    * log to one current row per key (the CDC compaction every
    * merge-on-read table format runs), deterministically — ordered by
    * event time with the unique event_id as tie-break. One shuffle on
    * the key; Spark's WindowGroupLimit pushes the rank-1 filter below
    * the full sort (rank ≤ k prunes per partition before the window),
    * and the per-user event count rides the same window partition.
    * At extreme key cardinality the same semantics are expressible as
    * `max_by(struct(...), struct(ts, event_id))` — a map-side-partial
    * aggregate with no sort at all; the window form is kept here
    * because it also emits the per-key history size.
    */
  private def q78(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(w))
      .withColumn("n_events", count(lit(1)).over(Window.partitionBy(col("user_id"))))
      .filter(col("rn") === 1)
      .select(
        col("user_id"),
        col("ts").as("last_ts"),
        col("event_type").as("last_event_type"),
        col("value").as("last_value"),
        col("event_id").as("last_event_id"),
        col("n_events"))
      .orderBy("user_id")
  }

  private val q78Sql =
    """WITH r AS (
      |  SELECT user_id, ts, event_type, value, event_id,
      |         ROW_NUMBER() OVER
      |           (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n_events
      |  FROM events)
      |SELECT user_id, ts AS last_ts, event_type AS last_event_type,
      |       value AS last_value, event_id AS last_event_id,
      |       CAST(n_events AS BIGINT) AS n_events
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** q81 — data-quality audit (the deequ/dbt-test tier): run the
    * warehouse's constraint suite and report one row per check with
    * its violation count. Same-table checks fuse into ONE conditional
    * aggregation pass per table (no per-check scans); referential
    * checks are anti-join counts keyed on the FK (shuffle or
    * broadcast by size). All checks return a count — including the
    * passing ones — so the report distinguishes "checked and clean"
    * from "not checked", and a scheduler can alert on any
    * n_violations > 0. At 100 TB each table is still read exactly
    * once for its fused check pass.
    */
  private def q81(spark: SparkSession, dir: String): DataFrame = {
    def cnt(pred: org.apache.spark.sql.Column) =
      sum(when(pred, 1L).otherwise(0L))
    val li = Tables.lineitem(spark, dir)
    val liChecks = li.agg(
      cnt(col("l_quantity") <= 0).as("lineitem_nonpositive_qty"),
      cnt(col("l_extendedprice") < 0).as("lineitem_negative_price"),
      cnt(col("l_discount") < 0 || col("l_discount") > 1).as("lineitem_discount_range"),
      cnt(col("l_orderkey").isNull).as("lineitem_null_orderkey"))
    val ord = Tables.orders(spark, dir)
    val ordChecks = ord.agg(
      cnt(col("o_totalprice") <= 0).as("orders_nonpositive_total"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orders_duplicate_pk"))
    val fkLineOrder = li.join(ord.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("lineitem_orphan_orderkey"))
    val fkOrderCust = ord.join(Tables.customer(spark, dir).select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("orders_orphan_custkey"))
    def unpivot(df: DataFrame): DataFrame = {
      val cols = df.columns
      df.select(explode(array(cols.map(c =>
        struct(lit(c).as("check_name"), col(c).cast("long").as("n_violations"))): _*)).as("kv"))
        .select(col("kv.check_name"), col("kv.n_violations"))
    }
    unpivot(liChecks)
      .unionByName(unpivot(ordChecks))
      .unionByName(unpivot(fkLineOrder))
      .unionByName(unpivot(fkOrderCust))
      .orderBy("check_name")
  }

  private val q81Sql =
    """WITH li AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_nonpositive_qty,
      |    CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_negative_price,
      |    CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_discount_range,
      |    CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lineitem_null_orderkey
      |  FROM lineitem),
      |o AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS orders_nonpositive_total,
      |    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS orders_duplicate_pk
      |  FROM orders),
      |fk1 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS lineitem_orphan_orderkey
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders x WHERE x.o_orderkey = l.l_orderkey)),
      |fk2 AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS orders_orphan_custkey
      |  FROM orders y WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = y.o_custkey))
      |SELECT 'lineitem_nonpositive_qty' AS check_name, lineitem_nonpositive_qty AS n_violations FROM li
      |UNION ALL SELECT 'lineitem_negative_price', lineitem_negative_price FROM li
      |UNION ALL SELECT 'lineitem_discount_range', lineitem_discount_range FROM li
      |UNION ALL SELECT 'lineitem_null_orderkey', lineitem_null_orderkey FROM li
      |UNION ALL SELECT 'orders_nonpositive_total', orders_nonpositive_total FROM o
      |UNION ALL SELECT 'orders_duplicate_pk', orders_duplicate_pk FROM o
      |UNION ALL SELECT 'lineitem_orphan_orderkey', lineitem_orphan_orderkey FROM fk1
      |UNION ALL SELECT 'orders_orphan_custkey', orders_orphan_custkey FROM fk2
      |ORDER BY check_name""".stripMargin

  /** q94 — POINT-IN-TIME join (temporal leakage prevention): enrich
    * each lineitem with the customer's order-priority version that was
    * valid AT ITS SHIP DATE, not the current one — the as-of-history
    * join every training-data snapshot needs so features never peek
    * past the fact's own timestamp. Fact side: lineitem → orders
    * (equi-join on the order key) for the customer key; dimension
    * side: the q76 SCD-2 history. The temporal match is an equi-join
    * on the customer key with the interval predicate
    * `from <= ship < to` as the join filter — a SortMergeJoin keyed on
    * the dimension key (versions per key are few), never a nested
    * loop. Facts that PREDATE the dimension's first version (~9% of
    * this corpus: the synthetic ship dates are not constrained to
    * follow order dates) keep a NULL as-of version — a LEFT join, so
    * no fact is silently dropped and "feature unknown at that time"
    * is visible to the consumer instead of leaking the current value.
    * Row conservation is asserted by the spec and the oracle mirrors
    * the same LEFT semantics.
    */
  private def q94(spark: SparkSession, dir: String): DataFrame = {
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
      .join(Tables.orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    val hist = scd2History(spark, dir).withColumnRenamed("o_custkey", "h_custkey")
    fact.join(hist,
        col("o_custkey") === col("h_custkey") && col("l_shipdate") >= col("effective_from") &&
          (col("effective_to").isNull || col("l_shipdate") < col("effective_to")),
        "left")
      .select(col("l_orderkey"), col("l_linenumber"), col("o_custkey"),
        col("l_shipdate"), col("version"), col("priority").as("priority_asof"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  private val q94Sql =
    """WITH m AS (
      |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
      |         LAG(o_orderpriority) OVER
      |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      |  FROM orders),
      |c AS (SELECT * FROM m WHERE prev IS NULL OR prev != o_orderpriority),
      |v AS (
      |  SELECT o_custkey,
      |         CAST(ROW_NUMBER() OVER w AS INT) AS version,
      |         o_orderpriority AS priority,
      |         o_orderdate AS effective_from,
      |         LEAD(o_orderdate) OVER w AS effective_to
      |  FROM c
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
      |f AS (
      |  SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, l.l_shipdate
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |SELECT f.l_orderkey, f.l_linenumber, f.o_custkey, f.l_shipdate,
      |       v.version, v.priority AS priority_asof
      |FROM f LEFT JOIN v ON f.o_custkey = v.o_custkey
      |  AND f.l_shipdate >= v.effective_from
      |  AND (v.effective_to IS NULL OR f.l_shipdate < v.effective_to)
      |ORDER BY f.l_orderkey, f.l_linenumber""".stripMargin

  /** q105 — corpus snapshot diff: given two corpus versions, report
    * per-source how many documents were added, removed, changed, or
    * unchanged — the audit a training-data release pipeline runs
    * between every crawl refresh (q97 fingerprints ANSWER "did
    * anything change"; this query answers "what changed"). The two
    * snapshots are derived deterministically from the base table so
    * the oracle can rebuild them: v1 lacks the late-arriving docs
    * (id % 11 = 5), v2 lacks the taken-down docs (id % 13 = 2) and
    * carries revised text for id % 7 = 0.
    *
    * Scale shape: each snapshot reduces to (doc_id, source, digest)
    * at the scan — 16-byte md5s travel, never document bodies — and
    * the diff is ONE full-outer equi-join on doc_id followed by a
    * map-side status CASE and a tiny (source × status) aggregation.
    * At 100 TB that is one digest-weight shuffle, the same plan a
    * petabyte snapshot compare wants.
    */
  private def q105(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
    val v1 = base.filter(col("doc_id") % 11 =!= 5)
      .select(col("doc_id"), col("source"), md5(col("text")).as("digest"))
    val v2 = base.filter(col("doc_id") % 13 =!= 2)
      .select(col("doc_id"), col("source"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("digest"))
    v1.select(col("doc_id"), col("source").as("src1"), col("digest").as("d1"))
      .join(v2.select(col("doc_id"), col("source").as("src2"), col("digest").as("d2")),
        Seq("doc_id"), "full_outer")
      .select(
        coalesce(col("src1"), col("src2")).as("source"),
        when(col("d1").isNull, lit("added"))
          .when(col("d2").isNull, lit("removed"))
          .when(col("d1") =!= col("d2"), lit("changed"))
          .otherwise(lit("unchanged")).as("status"))
      .groupBy(col("source"), col("status"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status")
  }

  private val q105Sql =
    """WITH v1 AS (
      |  SELECT doc_id, source, md5(text) AS digest
      |  FROM documents WHERE doc_id % 11 != 5),
      |v2 AS (
      |  SELECT doc_id, source,
      |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS digest
      |  FROM documents WHERE doc_id % 13 != 2),
      |diff AS (
      |  SELECT COALESCE(v1.source, v2.source) AS source,
      |         CASE WHEN v1.digest IS NULL THEN 'added'
      |              WHEN v2.digest IS NULL THEN 'removed'
      |              WHEN v1.digest != v2.digest THEN 'changed'
      |              ELSE 'unchanged' END AS status
      |  FROM v1 FULL OUTER JOIN v2 USING (doc_id))
      |SELECT source, status, COUNT(*) AS n_docs
      |FROM diff GROUP BY source, status ORDER BY source, status""".stripMargin

  /** q106 — right-to-be-forgotten erasure audit: given a forget list
    * of customers (here derived as c_custkey % 53 = 7 so the oracle
    * can rebuild it; production feeds a real deletion queue), cascade
    * the erasure through the schema — customer rows, their orders,
    * the lineitems of those orders, and their event streams — and
    * report per table how many rows the erasure removes. Compliance
    * pipelines run exactly this audit before the destructive rewrite.
    *
    * Scale shape: every leg is an equi-join or a map-side predicate
    * on the table's own key — the forget list is dimension-sized (a
    * broadcast at any realistic scale), and the one fact-fact hop
    * (lineitem → its order's customer) is the orderkey equi-join the
    * tables are already keyed on. Counts are conditional aggregates
    * in the same pass as the scan, so the audit costs one read of
    * each table; the subsequent rewrite touches only partitions that
    * contain flagged rows.
    */
  private def q106(spark: SparkSession, dir: String): DataFrame = {
    val forgotten = col("c_custkey") % 53 === 7
    val audit = (name: String, df: DataFrame, erased: Column) =>
      df.agg(count(lit(1)).as("rows_before"),
          sum(when(erased, 1L).otherwise(0L)).as("rows_erased"))
        .select(lit(name).as("table_name"), col("rows_before"), col("rows_erased"),
          (col("rows_before") - col("rows_erased")).as("rows_after"))
    val cust = audit("customer", Tables.customer(spark, dir), forgotten)
    val ord = audit("orders", Tables.orders(spark, dir),
      col("o_custkey") % 53 === 7)
    val li = audit("lineitem",
      Tables.lineitem(spark, dir).select(col("l_orderkey"))
        .join(Tables.orders(spark, dir)
          .select(col("o_orderkey"), (col("o_custkey") % 53 === 7).as("gone")),
          col("l_orderkey") === col("o_orderkey"), "left"),
      coalesce(col("gone"), lit(false)))
    val ev = audit("events", Tables.events(spark, dir),
      col("user_id") % 53 === 7)
    cust.unionByName(ord).unionByName(li).unionByName(ev)
      .orderBy("table_name")
  }

  private val q106Sql =
    """SELECT 'customer' AS table_name, COUNT(*) AS rows_before,
      |       CAST(SUM(CASE WHEN c_custkey % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS rows_erased,
      |       CAST(COUNT(*) - SUM(CASE WHEN c_custkey % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT) AS rows_after
      |FROM customer
      |UNION ALL
      |SELECT 'orders', COUNT(*),
      |       CAST(SUM(CASE WHEN o_custkey % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(COUNT(*) - SUM(CASE WHEN o_custkey % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'lineitem', COUNT(*),
      |       CAST(SUM(CASE WHEN COALESCE(o.o_custkey % 53 = 7, FALSE) THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(COUNT(*) - SUM(CASE WHEN COALESCE(o.o_custkey % 53 = 7, FALSE) THEN 1 ELSE 0 END) AS BIGINT)
      |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
      |UNION ALL
      |SELECT 'events', COUNT(*),
      |       CAST(SUM(CASE WHEN user_id % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT),
      |       CAST(COUNT(*) - SUM(CASE WHEN user_id % 53 = 7 THEN 1 ELSE 0 END) AS BIGINT)
      |FROM events
      |ORDER BY table_name""".stripMargin

  /** q128 — TABLE PROFILER (the ANALYZE / discovery tier, upstream of
    * q81's rule checks: the profile tells you which constraints are
    * worth asserting): per column of `documents` — row count, null
    * count, exact NDV, min/max rendered to string. Long-form output
    * (one row per column) so new columns never change the schema.
    *
    * Plan shape: one aggregate pass per column, unioned — kept exact
    * because the oracle hash-compares NDV; the single-pass production
    * form at 100 TB swaps `countDistinct` for
    * `approx_count_distinct` (the q27b machinery) and fuses all
    * columns into one scan. Min/max are computed TYPED and rendered
    * afterward, so numeric columns don't sort lexically.
    */
  private def q128(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.documents(spark, dir)
    // The BODY column's profile must not ship documents through the
    // shuffle (ShuffleSchemaGuardSpec bans exactly that), which takes
    // two moves: (1) ndv counts md5 digests, not raw strings —
    // countDistinct's partial-distinct otherwise ships every distinct
    // body; (2) ndv runs in its OWN aggregate — fused with min/max,
    // Spark groups the partials by the distinct expression, making
    // the per-group min/max partials the bodies again. Split, the
    // min/max partial ships one extreme per partition (O(partitions))
    // and the ndv shuffle carries only digests; the two 1-row results
    // reassemble via a broadcast (the q03 scalar pattern,
    // PlanGuard-allowlisted). Digest ndv is the same number in both
    // engines.
    def profile(cname: String, body: Boolean): org.apache.spark.sql.DataFrame = {
      val c = col(cname)
      if (!body)
        d.agg(
            count(lit(1)).as("n_rows"),
            sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
            countDistinct(c).as("ndv"),
            min(c).cast("string").as("min_value"),
            max(c).cast("string").as("max_value"))
          .select(lit(cname).as("column_name"), col("n_rows"), col("n_nulls"),
            col("ndv"), col("min_value"), col("max_value"))
      else {
        val base = d.agg(
          count(lit(1)).as("n_rows"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_nulls"),
          min(c).cast("string").as("min_value"),
          max(c).cast("string").as("max_value"))
        val ndv = d.agg(
          countDistinct(md5(to_binary(c, lit("utf-8")))).as("ndv"))
        base.crossJoin(broadcast(ndv))
          .select(lit(cname).as("column_name"), col("n_rows"), col("n_nulls"),
            col("ndv"), col("min_value"), col("max_value"))
      }
    }
    Seq("doc_id" -> false, "text" -> true, "lang" -> false,
        "source" -> false, "n_chars" -> false)
      .map { case (c, b) => profile(c, b) }.reduce(_.unionAll(_))
      .orderBy("column_name")
  }

  private val q128Sql = {
    def one(c: String, ndvExpr: String) =
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |       CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |       CAST(COUNT(DISTINCT $ndvExpr) AS BIGINT) AS ndv,
         |       CAST(MIN($c) AS VARCHAR) AS min_value,
         |       CAST(MAX($c) AS VARCHAR) AS max_value
         |FROM documents""".stripMargin
    Seq("doc_id" -> "doc_id", "text" -> "md5(text)", "lang" -> "lang",
        "source" -> "source", "n_chars" -> "n_chars")
      .map { case (c, e) => one(c, e) }
      .mkString("", "\nUNION ALL\n", "\nORDER BY column_name")
  }

  /** q132 anonymity threshold (groups smaller than K are risky). */
  private val AnonK = 5

  /** q132 — K-ANONYMITY audit: the re-identification check a privacy
    * review runs before releasing "aggregated" data — any
    * quasi-identifier combination ((event_type, day) here) shared by
    * fewer than K distinct users singles those users out, so the
    * release needs suppression or generalization for exactly these
    * cells. Reports every risky cell with its user count; one grouped
    * aggregate over ids and dates (the q124 shuffle), output bounded
    * by the quasi-identifier domain. Complements q68 (PII scrubbing)
    * and q106 (erasure): scrub, forget, and THEN check that what
    * remains doesn't isolate anyone.
    */
  private def q132(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        // a released report's value band joins the quasi-identifier;
        // floor of an IEEE division is engine-identical
        floor(col("value") / 50).cast("long").as("value_band"),
        col("user_id"))
      .groupBy(col("event_type"), col("day"), col("value_band"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))
      .filter(col("n_users") < AnonK)
      .orderBy("event_type", "day", "value_band")

  private val q132Sql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       CAST(floor(value / 50) AS BIGINT) AS value_band,
       |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |       COUNT(*) AS n_events
       |FROM events
       |GROUP BY 1, 2, 3 HAVING COUNT(DISTINCT user_id) < $AnonK
       |ORDER BY event_type, day, value_band""".stripMargin

  /** q258 noise tables: cumulative ppb thresholds of the TRUNCATED
    * two-sided geometric (support [-6, 6], tail mass collapsed into
    * the extremes) for ε = 1.0 and ε = 0.5 — noise for threshold
    * index i is i − 6; a draw past the last threshold is +6.
    */
  private val DpEps1CumPpb = Seq(
    1147003L, 4264881L, 12740151L, 35778326L, 98402578L, 268632944L,
    731367055L, 901597421L, 964221673L, 987259848L, 995735118L, 998852996L)
  private val DpEpsHalfCumPpb = Seq(
    12670092L, 33559543L, 68000426L, 124783841L, 218403866L, 372757193L,
    627242806L, 781596133L, 875216158L, 931999573L, 966440456L, 987329907L)

  /** q258 — DIFFERENTIAL-PRIVACY COUNT RELEASE with budget
    * accounting: per-language and per-source document counts released
    * through the (truncated) two-sided-geometric mechanism — the
    * discrete-Laplace mechanism of Ghosh–Roughgarden–Sundararajan
    * 2009, the standard integer-valued ε-DP release for
    * sensitivity-1 counts — plus the sequential-composition
    * bookkeeping (Σε over the release set) a DP data platform
    * maintains per dataset. Released values clamp at zero
    * (post-processing, free under DP).
    *
    * HONESTY NOTE (same class as the multimodal decode stub): the
    * noise draw here is md5-SEEDED — deterministic, therefore not
    * actually private — because the driver's hash gate needs both
    * engines to replay the identical mechanism (the q208 seeded-
    * uniform precedent). Everything AROUND the draw is the real
    * operator: sensitivity-1 count aggregation, the exact
    * integer-threshold inverse-CDF mapping (no float noise, no libm
    * divergence), zero-clamping, and the ε ledger; a production
    * release swaps the md5 uniform for a CSPRNG draw and nothing
    * else changes. Truncation at ±6 collapses <0.3% (ε=1) / <2.6%
    * (ε=0.5) of tail mass into the extremes — the bounded-noise
    * variant, stated rather than hidden.
    *
    * Scale shape: two grouped counts over ids (map-side partial),
    * noise is a per-GROUP map expression — rows never carry noise
    * state; output bounded by the released domains.
    */
  private def q258(spark: SparkSession, dir: String): DataFrame = {
    def release(dim: String, key: Column, cumPpb: Seq[Long],
        epsMicro: Long, salt: String) = {
      val noise = cumPpb.zipWithIndex.foldRight(lit(6L)) { case ((cum, i), els) =>
        when(col("u") < cum, lit(i.toLong - 6L)).otherwise(els)
      }
      graft.Tables.documents(spark, dir)
        .groupBy(key.as("key")).agg(count(lit(1)).as("n"))
        .withColumn("u", graft.ext.TrainPrep.md5Bucket(col("key"), 1000000000, salt))
        .select(lit(dim).as("dim"), col("key"),
          greatest(col("n") + noise, lit(0L)).as("released"),
          lit(epsMicro).as("epsilon_micro"))
    }
    release("lang", col("lang"), DpEps1CumPpb, 1000000L, ":dp_lang")
      .unionAll(release("source", col("source"), DpEpsHalfCumPpb, 500000L, ":dp_source"))
      .withColumn("budget_total_micro", lit(1500000L)) // sequential composition
      .orderBy("dim", "key")
  }

  private val q258Sql = {
    def cases(cum: Seq[Long]) = cum.zipWithIndex
      .map { case (c, i) => s"WHEN u < $c THEN ${i - 6}" }.mkString(" ")
    def rel(dim: String, key: String, cum: Seq[Long], eps: Long, salt: String) =
      s"""SELECT '$dim' AS dim, key,
         |       GREATEST(n + CASE ${cases(cum)} ELSE 6 END, 0) AS released,
         |       CAST($eps AS BIGINT) AS epsilon_micro
         |FROM (
         |  SELECT $key AS key, CAST(COUNT(*) AS BIGINT) AS n,
         |         ('0x' || substr(md5($key || '$salt'), 1, 15))::BIGINT % 1000000000 AS u
         |  FROM documents GROUP BY 1)""".stripMargin
    s"""SELECT dim, key, CAST(released AS BIGINT) AS released, epsilon_micro,
       |       CAST(1500000 AS BIGINT) AS budget_total_micro
       |FROM (
       |${rel("lang", "lang", DpEps1CumPpb, 1000000L, ":dp_lang")}
       |UNION ALL
       |${rel("source", "source", DpEpsHalfCumPpb, 500000L, ":dp_source")})
       |ORDER BY dim, key""".stripMargin
  }

  /** q133 cutoff: events at or after this instant arrive "late"; mid-day on purpose, so the cutoff day itself genuinely MERGES base and delta partials. */
  private val IvmCutoff = "2024-01-25 12:00:00"

  /** q133 — INCREMENTAL rollup maintenance (IVM): a materialized
    * daily rollup is maintained under a late-arriving batch by
    * merging per-day partials instead of recomputing history — the
    * pattern that keeps a 100 TB rollup's nightly cost proportional
    * to the DELTA, not the table. The base aggregate (events before
    * the cutoff) and the late batch's partial aggregate outer-merge
    * on the (event_type, day) key; COUNTs and decimal-exact SUMs are
    * algebraic, so merged partials equal a full recompute exactly —
    * and the ORACLE IS THE FULL RECOMPUTE, making the driver's hash
    * gate a proof of the IVM equivalence, not just a replay.
    * `refreshed` marks the days the delta touched (the only
    * partitions a real maintenance job would rewrite).
    */
  private def q133(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        col("ts"), col("value"))
    def rollup(part: org.apache.spark.sql.DataFrame) =
      part.groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6))).as("sv"))
    val base = rollup(ev.filter(col("ts") < lit(IvmCutoff).cast("timestamp")))
      .select(col("event_type"), col("day"), col("n").as("bn"), col("sv").as("bsv"))
    val delta = rollup(ev.filter(col("ts") >= lit(IvmCutoff).cast("timestamp")))
      .select(col("event_type"), col("day"), col("n").as("dn"), col("sv").as("dsv"))
    base.join(delta, Seq("event_type", "day"), "full_outer")
      .select(col("event_type"), col("day"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_events"),
        (coalesce(col("bsv"), lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 6))) +
          coalesce(col("dsv"), lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 6))))
          .cast("double").as("total_value"),
        col("dn").isNotNull.cast("int").as("refreshed"))
      .orderBy("event_type", "day")
  }

  private val q133Sql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       COUNT(*) AS n_events,
       |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       |       CAST(CASE WHEN SUM(CASE WHEN ts >= TIMESTAMP '$IvmCutoff' THEN 1 ELSE 0 END) > 0
       |                 THEN 1 ELSE 0 END AS INT) AS refreshed
       |FROM events
       |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** q145 — OBSERVED data quality: the q81 constraint tier collected
    * by `Dataset.observe` (CollectMetrics) DURING the pipeline's own
    * action instead of by a second scan — at 100 TB the difference
    * between "DQ audit" and "DQ audit that re-reads the lake". The
    * events pipeline runs once to a noop sink with six metrics riding
    * the scan (row count, null-value/negative-value violation counts,
    * purchase/error class counts, exact decimal value total, ts
    * span); the query's output IS the observation row, and the oracle
    * recomputes every metric as an explicit aggregate — so the gate
    * proves CollectMetrics sees exactly what a dedicated pass sees.
    * All metrics are partial-mergeable by construction (counts,
    * conditional counts, decimal sum, min/max) — the CollectMetrics
    * contract.
    */
  private def q145(spark: SparkSession, dir: String): DataFrame = {
    import graft.etl.CleanExprs.moneySum
    val obs = org.apache.spark.sql.Observation()
    Tables.events(spark, dir)
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(col("value").isNull.cast("long")).as("n_null_value"),
        sum((col("value") < 0).cast("long")).as("n_negative_value"),
        sum((col("event_type") === "purchase").cast("long")).as("n_purchases"),
        sum((col("event_type") === "error").cast("long")).as("n_errors"),
        moneySum(col("value")).as("total_value"),
        min(unix_micros(col("ts"))).as("min_ts_us"),
        max(unix_micros(col("ts"))).as("max_ts_us"))
      .write.format("noop").mode("overwrite").save()
    val m = obs.get
    import spark.implicits._
    Seq((
      m("n_rows").asInstanceOf[Long],
      m("n_null_value").asInstanceOf[Long],
      m("n_negative_value").asInstanceOf[Long],
      m("n_purchases").asInstanceOf[Long],
      m("n_errors").asInstanceOf[Long],
      m("total_value").asInstanceOf[Double],
      m("min_ts_us").asInstanceOf[Long],
      m("max_ts_us").asInstanceOf[Long],
    )).toDF("n_rows", "n_null_value", "n_negative_value", "n_purchases",
        "n_errors", "total_value", "min_ts_us", "max_ts_us")
  }

  private val q145Sql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_value,
      |       CAST(SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_negative_value,
      |       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases,
      |       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
      |       CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS min_ts_us,
      |       CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS max_ts_us,
      |       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
      |FROM events""".stripMargin

  /** Bucket count for the q158 digest exchange. */
  private val MerkleBuckets = 64

  /** q158 — MERKLE-style table sync: find where two table versions
    * differ by exchanging per-bucket digests FIRST, then running the
    * row-level diff ONLY inside differing buckets. Phase 1 reduces
    * each version to `MerkleBuckets` rows of (row count, order-
    * independent digest sum) — at 100 TB the cross-site/cross-version
    * comparison ships 64 digest rows, not two tables (the
    * anti-entropy shape DynamoDB/Cassandra replica repair uses).
    * Phase 2 joins row-level digests only for rows whose bucket
    * failed the phase-1 compare — a broadcast semi-join against the
    * (tiny) differing-bucket list prunes both sides before the
    * expensive full-outer row diff (q105 runs that diff globally;
    * this is its incremental form).
    *
    * Determinism: the bucket is the q58 md5 bucket, the row digest a
    * 32-bit md5 chunk of (doc_id, content-digest) — both
    * engine-portable, and SUM over ≤2^32-valued terms is
    * order-independent and overflow-safe in BIGINT. A digest-sum
    * collision masking a real difference would need md5 chunks to
    * cancel exactly — and both engines compute the identical sum
    * either way, so the hash compare stays exact regardless.
    */
  private def q158(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
    val v1 = base.filter(col("doc_id") % 11 =!= 5)
      .select(col("doc_id"), md5(col("text")).as("digest"))
    val v2 = base.filter(col("doc_id") % 13 =!= 2)
      .select(col("doc_id"),
        md5(when(col("doc_id") % 7 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text"))).as("digest"))
    def keyed(v: DataFrame): DataFrame = v
      .withColumn("bucket", graft.ext.TrainPrep.md5Bucket(col("doc_id"), MerkleBuckets))
      .withColumn("rh",
        conv(substring(md5(concat_ws(":", col("doc_id"), col("digest"))), 1, 8), 16, 10)
          .cast("long"))
    val b1 = keyed(v1).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_v1"), sum(col("rh")).as("s1"))
    val b2 = keyed(v2).groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_v2"), sum(col("rh")).as("s2"))
    val differing = b1.join(b2, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_v1"), lit(0L)).as("n_v1"),
        coalesce(col("n_v2"), lit(0L)).as("n_v2"),
        coalesce(col("s1"), lit(0L)).as("s1"),
        coalesce(col("s2"), lit(0L)).as("s2"))
      .filter(col("n_v1") =!= col("n_v2") || col("s1") =!= col("s2"))
    val diffBuckets = broadcast(differing.select(col("bucket")))
    val r1 = keyed(v1).join(diffBuckets, Seq("bucket"), "left_semi")
      .select(col("doc_id"), col("bucket"), col("digest").as("d1"))
    val r2 = keyed(v2).join(diffBuckets, Seq("bucket"), "left_semi")
      .select(col("doc_id"), col("digest").as("d2"))
    // bucket is a pure function of doc_id, so pruning each side to the
    // differing buckets BEFORE the full-outer row join loses nothing
    val rows = r1.join(r2, Seq("doc_id"), "full_outer")
      .withColumn("bucket",
        coalesce(col("bucket"), graft.ext.TrainPrep.md5Bucket(col("doc_id"), MerkleBuckets)))
    rows.groupBy(col("bucket"))
      .agg(
        sum(col("d1").isNull.cast("long")).as("n_added"),
        sum(col("d2").isNull.cast("long")).as("n_removed"),
        sum((col("d1").isNotNull && col("d2").isNotNull && col("d1") =!= col("d2"))
          .cast("long")).as("n_changed"))
      .join(differing.select(col("bucket"), col("n_v1"), col("n_v2")), "bucket")
      .select(col("bucket"), col("n_v1"), col("n_v2"),
        col("n_added"), col("n_removed"), col("n_changed"))
      .orderBy("bucket")
  }

  private val q158Sql =
    s"""WITH v1 AS (
       |  SELECT doc_id, md5(text) AS digest
       |  FROM documents WHERE doc_id % 11 != 5),
       |v2 AS (
       |  SELECT doc_id,
       |         md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS digest
       |  FROM documents WHERE doc_id % 13 != 2),
       |k1 AS (
       |  SELECT doc_id, digest,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $MerkleBuckets AS bucket,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || digest), 1, 8))::BIGINT AS rh
       |  FROM v1),
       |k2 AS (
       |  SELECT doc_id, digest,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % $MerkleBuckets AS bucket,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || digest), 1, 8))::BIGINT AS rh
       |  FROM v2),
       |b1 AS (SELECT bucket, COUNT(*) AS n_v1, CAST(SUM(rh) AS BIGINT) AS s1 FROM k1 GROUP BY bucket),
       |b2 AS (SELECT bucket, COUNT(*) AS n_v2, CAST(SUM(rh) AS BIGINT) AS s2 FROM k2 GROUP BY bucket),
       |differing AS (
       |  SELECT bucket,
       |         COALESCE(n_v1, 0) AS n_v1, COALESCE(n_v2, 0) AS n_v2,
       |         COALESCE(s1, 0) AS s1, COALESCE(s2, 0) AS s2
       |  FROM b1 FULL OUTER JOIN b2 USING (bucket)
       |  WHERE COALESCE(n_v1, 0) != COALESCE(n_v2, 0) OR COALESCE(s1, 0) != COALESCE(s2, 0)),
       |rows_ AS (
       |  SELECT COALESCE(k1.bucket, k2.bucket) AS bucket, k1.digest AS d1, k2.digest AS d2
       |  FROM k1 FULL OUTER JOIN k2 USING (doc_id)
       |  WHERE COALESCE(k1.bucket, k2.bucket) IN (SELECT bucket FROM differing))
       |SELECT differing.bucket, differing.n_v1, differing.n_v2,
       |       CAST(SUM(CASE WHEN d1 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |       CAST(SUM(CASE WHEN d2 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |       CAST(SUM(CASE WHEN d1 IS NOT NULL AND d2 IS NOT NULL AND d1 != d2
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_changed
       |FROM rows_ JOIN differing USING (bucket)
       |GROUP BY differing.bucket, differing.n_v1, differing.n_v2
       |ORDER BY differing.bucket""".stripMargin

  /** q171 diversity floor: a k-anonymous cell whose sensitive
    * attribute takes fewer than this many distinct values is still a
    * disclosure (everyone in the cell shares the secret).
    */
  private val DivL = 2

  /** q171 — L-DIVERSITY audit, the companion check to q132: a cell
    * can pass k-anonymity (≥K distinct users) and still leak — if
    * every member shares the same sensitive value, knowing someone is
    * in the cell reveals their secret. Sensitive attribute here is
    * the props JSON `k` halved into a binary class (the coarsest,
    * hardest-to-diversify case); the audit reports every K-ANONYMOUS
    * cell with its distinct-sensitive count `l_distinct` and flags
    * `at_risk` cells below [[DivL]]. Same single groupBy shuffle as
    * q132 — distinct-count of a bounded attribute adds no extra pass
    * — and the output stays bounded by the quasi-identifier domain at
    * any SF.
    */
  private def q171(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") / 50).cast("long").as("value_band"),
        col("user_id"),
        (get_json_object(col("props"), "$.k").cast("int") >= 50).as("sens"))
      .groupBy(col("event_type"), col("day"), col("value_band"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("sens")).as("l_distinct"))
      .filter(col("n_users") >= AnonK)
      .withColumn("at_risk", col("l_distinct") < DivL)
      .orderBy("event_type", "day", "value_band")

  private val q171Sql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       CAST(floor(value / 50) AS BIGINT) AS value_band,
       |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       |       CAST(COUNT(DISTINCT CAST(json_extract_string(props, '$$.k') AS INT) >= 50) AS BIGINT)
       |         AS l_distinct,
       |       COUNT(DISTINCT CAST(json_extract_string(props, '$$.k') AS INT) >= 50) < $DivL
       |         AS at_risk
       |FROM events
       |GROUP BY 1, 2, 3 HAVING COUNT(DISTINCT user_id) >= $AnonK
       |ORDER BY event_type, day, value_band""".stripMargin

  /** q172 — missing bucket: md5(event_id) % 100 below this is
    * "missing" (a deterministic, engine-identical 10% planting).
    */
  private val ImputeMissPct = 10

  /** q172 — GROUP-MEDIAN imputation with an EXACT integer median:
    * the standard repair for missing numeric features before
    * training. The median is the lower-median BY CONSTRUCTION —
    * row_number over (cents, event_id) picked at position
    * ⌊(n+1)/2⌋ — because interpolated percentiles return
    * accumulation-dependent doubles while a picked element is a
    * cents value both engines agree on bit-for-bit. Missingness is
    * planted via the shared md5 bucket (engine-identical, rerun-
    * stable). Plan shape: one window over the present rows partitioned
    * by type (each partition sorts locally), a 5-row median lookup
    * broadcast back, and one rollup — no collect, no global sort; at
    * 100 TB the per-type sort is the only O(n log n) stage and it
    * partitions across executors by group.
    */
  private def q172(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
      .withColumn("miss",
        graft.ext.TrainPrep.md5Bucket(col("event_id"), 100) < ImputeMissPct)
    val present = ev.filter(!col("miss"))
    val med = present
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col("c"), col("event_id"))))
      .join(present.groupBy(col("event_type")).agg(count(lit(1)).as("n_present")),
        "event_type")
      .filter(col("rn") === expr("(n_present + 1) div 2"))
      .select(col("event_type"), col("c").as("median_cents"), col("n_present"))
    ev.join(broadcast(med), "event_type")
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(col("miss").cast("long")).as("n_missing"),
        min(col("median_cents")).as("median_cents"),
        sum(when(col("miss"), col("median_cents")).otherwise(col("c")))
          .as("sum_cents_imputed"))
      .orderBy("event_type")
  }

  private val q172Sql =
    s"""WITH ev AS (
       |  SELECT event_type, event_id,
       |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
       |         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT % 100
       |           < $ImputeMissPct AS miss
       |  FROM events),
       |present AS (SELECT * FROM ev WHERE NOT miss),
       |ranked AS (
       |  SELECT event_type, c,
       |         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
       |         COUNT(*) OVER (PARTITION BY event_type) AS n_present
       |  FROM present),
       |med AS (
       |  SELECT event_type, c AS median_cents
       |  FROM ranked WHERE rn = (n_present + 1) // 2)
       |SELECT ev.event_type, COUNT(*) AS n_rows,
       |       CAST(SUM(CASE WHEN miss THEN 1 ELSE 0 END) AS BIGINT) AS n_missing,
       |       CAST(MIN(median_cents) AS BIGINT) AS median_cents,
       |       CAST(SUM(CASE WHEN miss THEN median_cents ELSE c END) AS BIGINT)
       |         AS sum_cents_imputed
       |FROM ev JOIN med ON med.event_type = ev.event_type
       |GROUP BY 1 ORDER BY ev.event_type""".stripMargin

  /** q179 — snapshot cut and delta window for the join-IVM demo: the
    * "stored view" covers activity before the cut; the maintenance
    * batch applies one month of arrivals on BOTH sides of the join.
    */
  private val IvmCut = "1999-01-01 00:00:00"
  private val IvmEnd = "1999-02-01 00:00:00"

  /** q179 — INCREMENTAL VIEW MAINTENANCE of a JOIN view (the
    * two-sided companion to q133's rollup IVM): the maintained view is
    * revenue per (o_orderpriority, l_returnflag) over orders ⋈
    * lineitem. When a batch arrives on BOTH base tables, the delta of
    * the join is NOT ΔO ⋈ ΔL — it is the three cross terms
    * ΔO⋈L_old ∪ O_old⋈ΔL ∪ ΔO⋈ΔL, and the engine maintains the view
    * by aggregating only those terms and merging them into the stored
    * aggregate (union → re-group → sum), never re-joining the base.
    * At 100 TB that's the whole point: the base join never re-runs;
    * the three delta joins are month-sized, AQE broadcasts the small
    * delta sides, and the merge shuffles one aggregate grid (~15
    * rows), not the fact tables. The ORACLE is the full recompute
    * over the post-batch window — the driver hash-compare IS the
    * proof of the maintenance identity (the q133 pattern). Revenue
    * merges exactly because partial decimal sums are associative;
    * the double cast happens once, after the merge.
    */
  private def q179(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val l = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"),
        (col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(18, 6)).as("rev"))
    val cut = lit(IvmCut).cast("timestamp")
    val end = lit(IvmEnd).cast("timestamp")
    val oOld = o.filter(col("o_orderdate") < cut)
    val oNew = o.filter(col("o_orderdate") >= cut && col("o_orderdate") < end)
    val lOld = l.filter(col("l_shipdate") < cut)
    val lNew = l.filter(col("l_shipdate") >= cut && col("l_shipdate") < end)
    def viewAgg(oSide: DataFrame, lSide: DataFrame): DataFrame = oSide
      .join(lSide, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev")).as("rev_part"))
    viewAgg(oOld, lOld)                  // the stored view (would be read, not re-joined)
      .unionAll(viewAgg(oNew, lOld))     // Δorders against old lineitems
      .unionAll(viewAgg(oOld, lNew))     // old orders against Δlineitems
      .unionAll(viewAgg(oNew, lNew))     // Δ against Δ
      .groupBy(col("o_orderpriority"), col("l_returnflag"))
      .agg(sum(col("n_items")).as("n_items"),
        sum(col("rev_part")).cast("double").as("revenue"))
      .orderBy("o_orderpriority", "l_returnflag")
  }

  private val q179Sql =
    s"""SELECT o_orderpriority, l_returnflag, COUNT(*) AS n_items,
       |       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
       |            AS DOUBLE) AS revenue
       |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE o_orderdate < TIMESTAMP '$IvmEnd'
       |  AND l_shipdate  < TIMESTAMP '$IvmEnd'
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q185 — the AS-OF instant for the time-travel read: mid-history,
    * so both superseded and not-yet-born versions exist on each side.
    */
  private val AsOfInstant = "1998-06-01 00:00:00"

  /** q185 — TIME-TRAVEL READ over the SCD-2 dimension (the
    * read-side counterpart of q76's history build and q94's
    * point-in-time join): reconstruct the dimension AS OF a past
    * instant T by slicing the validity intervals —
    * effective_from ≤ T < effective_to (open-ended current rows
    * included via the null bound). Zero-width versions (superseded
    * the same day they appeared) are correctly invisible at any T.
    * This is the engine feature table formats market as "time
    * travel"; over an interval-versioned dimension it is a pure
    * partition-prunable filter — no snapshot copies, no log replay.
    * At 100 TB the history table is partitioned by effective_from
    * range, so the scan prunes to segments born before T; the filter
    * is map-only. Exactly one version per customer born before T
    * survives (the intervals tile time) — AsOfTravelSpec asserts
    * both uniqueness and agreement with a latest-row-wins recompute.
    */
  private def q185(spark: SparkSession, dir: String): DataFrame = {
    val t = lit(AsOfInstant).cast("timestamp")
    scd2History(spark, dir)
      .filter(col("effective_from") <= t &&
        (col("effective_to").isNull || col("effective_to") > t))
      .select(col("o_custkey"), col("version"), col("priority"),
        col("effective_from"), col("effective_to"))
      .orderBy("o_custkey")
  }

  private val q185Sql =
    s"""WITH m AS (
       |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
       |         LAG(o_orderpriority) OVER
       |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
       |  FROM orders),
       |c AS (SELECT * FROM m WHERE prev IS NULL OR prev != o_orderpriority),
       |v AS (
       |  SELECT o_custkey,
       |         CAST(ROW_NUMBER() OVER w AS INT) AS version,
       |         o_orderpriority AS priority,
       |         o_orderdate AS effective_from,
       |         LEAD(o_orderdate) OVER w AS effective_to
       |  FROM c
       |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
       |SELECT o_custkey, version, priority, effective_from, effective_to
       |FROM v
       |WHERE effective_from <= TIMESTAMP '$AsOfInstant'
       |  AND (effective_to IS NULL OR effective_to > TIMESTAMP '$AsOfInstant')
       |ORDER BY o_custkey""".stripMargin

  /** q189 — maintenance window and erasure cohort for the
    * retraction-aware IVM: one month of arrivals, plus deletion of
    * every order belonging to an md5-selected ~1/37 of customers
    * (the q106 GDPR-erasure shape arriving as retractions).
    */
  private val RetractCut = "1998-01-01 00:00:00"
  private val RetractEnd = "1998-02-01 00:00:00"

  /** q189 — INCREMENTAL VIEW MAINTENANCE UNDER DELETES: q133/q179
    * maintain on inserts only; real pipelines also retract (GDPR
    * erasure, late-data corrections, CDC deletes). The maintained
    * view is (n_orders, total_cents) per priority; the batch carries
    * BOTH polarities — inserts (one month of arrivals, erasures
    * already honored) and retractions (every stored row of the
    * erased customers) — and the engine merges SIGNED deltas into
    * the stored aggregate: counts and sums are abelian-group
    * aggregates, so a delete is literally a −1 row; a group whose
    * maintained count reaches zero must DROP (the classic retraction
    * subtlety — max/min would need auxiliary structures, which is
    * why retractable IVM restricts to group-homomorphic aggregates).
    * The base join/aggregate never re-runs: the three legs are the
    * stored view (read, not recomputed, in production), the
    * month-sized insert delta, and the erasure-sized delete delta.
    * The ORACLE is the full recompute over (survivors before end) —
    * the driver hash compare IS the maintenance-identity proof, now
    * covering the delete path the q133/q179 oracles cannot.
    */
  private def q189(spark: SparkSession, dir: String): DataFrame = {
    val cut = lit(RetractCut).cast("timestamp")
    val end = lit(RetractEnd).cast("timestamp")
    val erased = (conv(substring(md5(col("o_custkey").cast("string")), 1, 15), 16, 10)
      .cast("long") % 37) === 0
    val o = Tables.orders(spark, dir).select(
      col("o_custkey"), col("o_orderpriority"), col("o_orderdate"),
      expr("CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"),
      erased.as("erased"))
    def signedAgg(df: DataFrame, sign: Int): DataFrame = df
      .groupBy(col("o_orderpriority"))
      .agg(sum(lit(sign.toLong)).as("dn"), sum(col("cents") * sign).as("dc"))
    val stored = signedAgg(o.filter(col("o_orderdate") < cut), 1)
    val inserts = signedAgg(
      o.filter(col("o_orderdate") >= cut && col("o_orderdate") < end && !col("erased")), 1)
    val retractions = signedAgg(
      o.filter(col("o_orderdate") < cut && col("erased")), -1)
    stored.unionAll(inserts).unionAll(retractions)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("dn")).as("n_orders"), sum(col("dc")).as("total_cents"))
      .filter(col("n_orders") > 0) // fully-retracted groups disappear
      .orderBy("o_orderpriority")
  }

  private val q189Sql =
    s"""SELECT o_orderpriority, COUNT(*) AS n_orders,
       |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
       |            AS BIGINT) AS total_cents
       |FROM orders
       |WHERE o_orderdate < TIMESTAMP '$RetractEnd'
       |  AND mod(('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 15))::BIGINT, 37) != 0
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q192 — ROBUST DISPERSION per group: median + MAD (median
    * absolute deviation) + robust-z outlier counts over event values,
    * all in EXACT integers. Mean/stddev outlier screens break on the
    * contamination they're meant to find (one 1e9 row inflates σ
    * until nothing is an outlier); median/MAD have a 50% breakdown
    * point. Both medians are the LOWER median by construction (the
    * q172 picked-element rule — interpolated percentiles return
    * accumulation-dependent doubles, a picked element is a value both
    * engines agree on bit-for-bit), and the robust-z test
    * |c − m| > 3σ̂ = 3·1.4826·MAD runs as the cross-multiplied
    * integer compare 10000·|c−m| > 44478·MAD — no float division
    * anywhere. Plan: two partitioned window sorts (values, then
    * deviations) and two tiny broadcast lookups — per-group sorts
    * distribute across executors; no global stage.
    */
  private def q192(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("c"))
    def lowerMedian(df: DataFrame, valueCol: String, out: String): DataFrame = df
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("event_type")).orderBy(col(valueCol), col("event_id"))))
      .join(df.groupBy(col("event_type")).agg(count(lit(1)).as("n")), "event_type")
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col(valueCol).as(out))
    val med = lowerMedian(ev, "c", "median_cents")
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("d", abs(col("c") - col("median_cents")))
    val mad = lowerMedian(dev.select(col("event_type"), col("event_id"), col("d")),
      "d", "mad_cents")
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        min(col("median_cents")).as("median_cents"),
        min(col("mad_cents")).as("mad_cents"),
        sum((col("d") * 10000 > col("mad_cents") * 44478).cast("long")).as("n_outliers"))
      .orderBy("event_type")
  }

  private val q192Sql =
    """WITH ev AS (
      |  SELECT event_type, event_id,
      |         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      |  FROM events),
      |m AS (
      |  SELECT event_type, c AS median_cents FROM (
      |    SELECT event_type, c,
      |           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, event_id) AS rn,
      |           COUNT(*) OVER (PARTITION BY event_type) AS n
      |    FROM ev)
      |  WHERE rn = (n + 1) // 2),
      |d AS (
      |  SELECT ev.event_type, ev.event_id, ev.c, m.median_cents,
      |         abs(ev.c - m.median_cents) AS dd
      |  FROM ev JOIN m ON m.event_type = ev.event_type),
      |mad AS (
      |  SELECT event_type, dd AS mad_cents FROM (
      |    SELECT event_type, dd,
      |           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY dd, event_id) AS rn,
      |           COUNT(*) OVER (PARTITION BY event_type) AS n
      |    FROM d)
      |  WHERE rn = (n + 1) // 2)
      |SELECT d.event_type, COUNT(*) AS n,
      |       MIN(d.median_cents) AS median_cents,
      |       MIN(mad.mad_cents) AS mad_cents,
      |       CAST(SUM(CASE WHEN d.dd * 10000 > mad.mad_cents * 44478
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN mad ON mad.event_type = d.event_type
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q195 — the two snapshot instants for the CDC extraction. */
  private val SnapT1 = "1997-06-01 00:00:00"
  private val SnapT2 = "1998-06-01 00:00:00"

  /** q195 — SNAPSHOT-DIFF CDC EXTRACTION: the inverse of q188's CDC
    * apply — given two as-of snapshots of the dimension (the q185
    * interval slice at T1 and T2), recover the change stream between
    * them as I/U/D operations via one full-outer join keyed on the
    * business key: key only in the new snapshot → INSERT, only in
    * the old → DELETE, in both with a changed payload → UPDATE;
    * unchanged keys are NOT emitted (a CDC feed carries deltas, not
    * the table). This is how warehouses without change logs bootstrap
    * CDC (snapshot-based extraction — the Kimball "brute force diff").
    * DELETE is structurally impossible HERE — both snapshots derive
    * from one history whose last version is open-ended, so a key
    * born by T1 is alive at T2; the branch exists because real
    * snapshot pairs come from independent extracts where keys do
    * vanish, and SnapshotCdcSpec pins the structural zero plus an
    * I/U recompute. Plan: the shared history build,
    * two map-only interval slices of it, one key-partitioned
    * full-outer join — at 100 TB both snapshot scans prune to
    * segments live at their instant and the join shuffles the
    * (small) dimension, never a fact table.
    */
  private def q195(spark: SparkSession, dir: String): DataFrame = {
    def asOf(t: String): DataFrame = {
      val ts = lit(t).cast("timestamp")
      scd2History(spark, dir)
        .filter(col("effective_from") <= ts &&
          (col("effective_to").isNull || col("effective_to") > ts))
        .select(col("o_custkey"), col("priority"))
    }
    val s1 = asOf(SnapT1).withColumnRenamed("priority", "old_priority")
    val s2 = asOf(SnapT2).withColumnRenamed("priority", "new_priority")
    s1.join(s2, Seq("o_custkey"), "full_outer")
      .withColumn("op",
        when(col("old_priority").isNull, lit("I"))
          .when(col("new_priority").isNull, lit("D"))
          .when(col("old_priority") =!= col("new_priority"), lit("U")))
      .filter(col("op").isNotNull)
      .select(col("op"), col("o_custkey"), col("old_priority"), col("new_priority"))
      .orderBy("op", "o_custkey")
  }

  private val q195Sql =
    s"""WITH m AS (
       |  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
       |         LAG(o_orderpriority) OVER
       |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
       |  FROM orders),
       |c AS (SELECT * FROM m WHERE prev IS NULL OR prev != o_orderpriority),
       |v AS (
       |  SELECT o_custkey, o_orderpriority AS priority,
       |         o_orderdate AS effective_from,
       |         LEAD(o_orderdate) OVER
       |           (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS effective_to
       |  FROM c),
       |s1 AS (SELECT o_custkey, priority AS old_priority FROM v
       |       WHERE effective_from <= TIMESTAMP '$SnapT1'
       |         AND (effective_to IS NULL OR effective_to > TIMESTAMP '$SnapT1')),
       |s2 AS (SELECT o_custkey, priority AS new_priority FROM v
       |       WHERE effective_from <= TIMESTAMP '$SnapT2'
       |         AND (effective_to IS NULL OR effective_to > TIMESTAMP '$SnapT2'))
       |SELECT CASE WHEN s1.o_custkey IS NULL THEN 'I'
       |            WHEN s2.o_custkey IS NULL THEN 'D'
       |            ELSE 'U' END AS op,
       |       COALESCE(s1.o_custkey, s2.o_custkey) AS o_custkey,
       |       s1.old_priority, s2.new_priority
       |FROM s1 FULL OUTER JOIN s2 ON s2.o_custkey = s1.o_custkey
       |WHERE s1.o_custkey IS NULL OR s2.o_custkey IS NULL
       |   OR s1.old_priority != s2.new_priority
       |ORDER BY op, o_custkey""".stripMargin

  /** q206/q207 — the candidate sets drive BOTH engine sides, so the
    * Spark plan and the oracle SQL can never drift apart.
    */
  private val FdCandidates: Seq[(String, String, String)] = Seq(
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("part", "p_brand", "p_type"),
    ("part", "p_name", "p_brand"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("nation", "n_nationkey", "n_regionkey"))

  /** q206 — approximate FUNCTIONAL-DEPENDENCY discovery (the
    * profiling tier above q128's per-column stats): for each declared
    * candidate A→B, the violation mass is Σ_a (cnt(a) − max_b
    * cnt(a,b)) — the minimum number of rows you'd have to delete for
    * the dependency to hold exactly (the g3 error measure from the
    * FD-mining literature, TANE/Metanome). Reported in exact ppm of
    * table rows; holds ⟺ zero violations. Plan shape per candidate:
    * one (A,B) count aggregate, one per-A max/sum re-aggregate —
    * cardinality bounded by ndv(A,B), then ndv(A); the six candidate
    * sub-plans union into one result. Candidates are declared, not
    * enumerated-all-pairs: at 100 TB you run the bounded list the
    * schema owner cares about (all-pairs mining adds a lattice walk
    * on TOP of these same per-pair aggregates).
    */
  private def q206(spark: SparkSession, dir: String): DataFrame = {
    val per = FdCandidates.map { case (t, a, b) =>
      Tables.table(spark, dir, t)
        .groupBy(col(a).as("lhs"), col(b).as("rhs"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("lhs"))
        .agg(sum(col("cnt")).as("tot"), max(col("cnt")).as("keep"))
        .agg(
          count(lit(1)).as("n_lhs"),
          sum(col("tot")).as("n_rows"),
          sum(col("tot") - col("keep")).as("violations"))
        .select(lit(s"$t.$a->$b").as("fd"), col("n_rows"), col("n_lhs"),
          col("violations"),
          expr("(violations * 1000000) DIV n_rows").as("viol_ppm"),
          (col("violations") === 0L).as("holds"))
    }
    per.reduce(_.unionAll(_)).orderBy("fd")
  }

  private val q206Sql = {
    val blocks = FdCandidates.map { case (t, a, b) =>
      s"""SELECT '$t.$a->$b' AS fd,
         |       CAST(SUM(tot) AS BIGINT) AS n_rows,
         |       CAST(COUNT(*) AS BIGINT) AS n_lhs,
         |       CAST(SUM(tot - keep) AS BIGINT) AS violations,
         |       CAST((SUM(tot - keep) * 1000000) // SUM(tot) AS BIGINT) AS viol_ppm,
         |       SUM(tot - keep) = 0 AS holds
         |FROM (SELECT $a AS lhs, CAST(SUM(cnt) AS BIGINT) AS tot,
         |             CAST(MAX(cnt) AS BIGINT) AS keep
         |      FROM (SELECT $a, $b, COUNT(*) AS cnt FROM $t GROUP BY 1, 2)
         |      GROUP BY 1)""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  private val IndCandidates: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
    // the deliberate partial case: most customers never appear in the
    // events stream (15 distinct user_ids vs 150+ customers)
    ("customer", "c_custkey", "events", "user_id"))

  /** q207 — INCLUSION-DEPENDENCY / foreign-key discovery: for each
    * candidate lhs ⊆ rhs, the fraction of DISTINCT lhs values present
    * in rhs (exact ppm); containment = 1e6 certifies a candidate FK.
    * The distinct-value projections shrink both sides to their key
    * domains before the left-anti probe — each check is
    * ndv-vs-ndv, never row-vs-row, and the anti join is the
    * shuffle-pruned shape (only misses survive the probe). The
    * reversed customer⊆orders candidate documents the partial case
    * (customers with no orders yet) — discovery must REPORT
    * containment < 1, not assume FK-ness.
    */
  private def q207(spark: SparkSession, dir: String): DataFrame = {
    val per = IndCandidates.map { case (lt, lc, rt, rc) =>
      val lhs = Tables.table(spark, dir, lt).select(col(lc).as("v")).distinct()
      val rhs = Tables.table(spark, dir, rt).select(col(rc).as("v")).distinct()
      lhs.join(rhs.withColumn("hit", lit(1)), Seq("v"), "left")
        .agg(count(lit(1)).as("n_lhs"), count(col("hit")).as("n_contained"))
        .select(lit(s"$lt.$lc<=$rt.$rc").as("ind"), col("n_lhs"), col("n_contained"),
          expr("(n_contained * 1000000) DIV n_lhs").as("containment_ppm"),
          (col("n_contained") === col("n_lhs")).as("is_fk_candidate"))
    }
    per.reduce(_.unionAll(_)).orderBy("ind")
  }

  private val q207Sql = {
    val blocks = IndCandidates.map { case (lt, lc, rt, rc) =>
      s"""SELECT '$lt.$lc<=$rt.$rc' AS ind,
         |       CAST(COUNT(*) AS BIGINT) AS n_lhs,
         |       CAST(COUNT(r.v) AS BIGINT) AS n_contained,
         |       CAST((COUNT(r.v) * 1000000) // COUNT(*) AS BIGINT) AS containment_ppm,
         |       COUNT(r.v) = COUNT(*) AS is_fk_candidate
         |FROM (SELECT DISTINCT $lc AS v FROM $lt) l
         |LEFT JOIN (SELECT DISTINCT $rc AS v FROM $rt) r ON l.v = r.v""".stripMargin
    }
    blocks.mkString("", "\nUNION ALL\n", "\nORDER BY ind")
  }

  /** q214 feature log-odds in micro units — a-priori Fellegi–Sunter
    * agreement/disagreement weights (log₂(m/u) for plausible m/u,
    * fixed constants so both engines share them exactly; production
    * systems estimate m/u by EM, which is a fitting step upstream of
    * this scoring query).
    */
  private val WNameAgree = 4000000L
  private val WNameDis = -1000000L
  private val WBalAgree = 3000000L
  private val WBalDis = -2000000L
  private val WNation = 1000000L
  private val MatchThresh = 6000000L

  /** q214 — FELLEGI–SUNTER record-linkage scoring: the probabilistic
    * matching tier between blocking (q56/q180) and survivorship
    * (q194). A synthetic CRM extract derives from customer with
    * md5-determined corruption classes (70% clean, 20% name typo,
    * 10% wrong nation — plus a ≤3-cent balance drift on every row);
    * candidate pairs come from MULTI-KEY BLOCKING — equality on
    * (nation, $1000-balance-window) with the crm side exploded to
    * ±1 windows (the q56/q181 neighbor-probe rule: the ≤3-cent drift
    * can cross a window boundary, and a one-sided block would lose
    * exactly those pairs). Each pair scores name-exact /
    * balance-within-5¢ / nation-equal with the fixed log-odds
    * weights; decisions at the match/possible thresholds. Because
    * ground truth is known by construction, the OUTPUT is the
    * honest evaluation: a per-decision confusion row (true vs false
    * pairs) plus a `missed_by_blocking` audit row counting true
    * links no block recovered (the wrong-nation class — exactly the
    * recall price the blocking-key choice pays, stated rather than
    * hidden). Scale shape: block cells are bounded (nation ×
    * window), so the pair join is cell-local — never customers²;
    * scoring is map-side arithmetic on the pair stream.
    */
  private def q214(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.TrainPrep.md5Bucket
    val cust = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_name").as("name"),
      col("c_nationkey").as("nation"),
      expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)").as("bal_c"))
    val crm = cust
      .withColumn("cls", md5Bucket(col("id"), 10, ":q214"))
      .withColumn("drift", md5Bucket(col("id"), 7, ":q214bal") - 3L)
      .select(
        col("id").as("src_id"),
        when(col("cls").isin(7, 8),
          concat(substring(col("name"), 1, 1), expr("substring(name, 3)")))
          .otherwise(col("name")).as("name2"),
        when(col("cls") === 9, (col("nation") + 1) % 25)
          .otherwise(col("nation")).as("nation2"),
        (col("bal_c") + col("drift")).as("bal2_c"))
    val custKeyed = cust.withColumn("wb", expr("bal_c DIV 100000"))
    val crmKeyed = crm
      .withColumn("wb0", expr("bal2_c DIV 100000"))
      .withColumn("wb", explode(array(col("wb0") - 1, col("wb0"), col("wb0") + 1)))
    val scored = custKeyed
      .join(crmKeyed, Seq("wb"))
      .filter(col("nation") === col("nation2"))
      .withColumn("score",
        when(col("name") === col("name2"), lit(WNameAgree)).otherwise(lit(WNameDis)) +
          when(abs(col("bal_c") - col("bal2_c")) <= 5, lit(WBalAgree))
            .otherwise(lit(WBalDis)) +
          lit(WNation))
      .withColumn("decision",
        when(col("score") >= MatchThresh, lit("match"))
          .when(col("score") >= 0, lit("possible"))
          .otherwise(lit("non_match")))
      .withColumn("is_true", (col("id") === col("src_id")).cast("long"))
    val confusion = scored.groupBy(col("decision")).agg(
      count(lit(1)).as("n_pairs"),
      sum(col("is_true")).as("n_true"),
      (count(lit(1)) - sum(col("is_true"))).as("n_false"))
    val missed = crm.join(
        scored.filter(col("is_true") === 1).select(col("src_id")).distinct(),
        Seq("src_id"), "left_anti")
      .agg(count(lit(1)).as("n_pairs"))
      .select(lit("missed_by_blocking").as("decision"), col("n_pairs"),
        col("n_pairs").as("n_true"), lit(0L).as("n_false"))
    confusion.unionAll(missed).orderBy("decision")
  }

  private val q214Sql =
    s"""WITH cust AS (
       |  SELECT c_custkey AS id, c_name AS name, c_nationkey AS nation,
       |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal_c
       |  FROM customer),
       |crm AS (
       |  SELECT id AS src_id,
       |         CASE WHEN ('0x' || substr(md5(CAST(id AS VARCHAR) || ':q214'), 1, 15))::BIGINT % 10 IN (7, 8)
       |              THEN substr(name, 1, 1) || substr(name, 3)
       |              ELSE name END AS name2,
       |         CASE WHEN ('0x' || substr(md5(CAST(id AS VARCHAR) || ':q214'), 1, 15))::BIGINT % 10 = 9
       |              THEN (nation + 1) % 25 ELSE nation END AS nation2,
       |         bal_c + (('0x' || substr(md5(CAST(id AS VARCHAR) || ':q214bal'), 1, 15))::BIGINT % 7) - 3 AS bal2_c
       |  FROM cust),
       |ck AS (SELECT *, bal_c // 100000 AS wb FROM cust),
       |rk AS (
       |  SELECT crm.*, (bal2_c // 100000) + d.o AS wb
       |  FROM crm CROSS JOIN (SELECT unnest([-1, 0, 1]) AS o) d),
       |scored AS (
       |  SELECT ck.id, rk.src_id,
       |         (CASE WHEN ck.name = rk.name2 THEN $WNameAgree ELSE $WNameDis END)
       |         + (CASE WHEN abs(ck.bal_c - rk.bal2_c) <= 5 THEN $WBalAgree ELSE $WBalDis END)
       |         + $WNation AS score
       |  FROM ck JOIN rk ON ck.wb = rk.wb AND ck.nation = rk.nation2),
       |dec AS (
       |  SELECT *,
       |         CASE WHEN score >= $MatchThresh THEN 'match'
       |              WHEN score >= 0 THEN 'possible'
       |              ELSE 'non_match' END AS decision,
       |         CASE WHEN id = src_id THEN 1 ELSE 0 END AS is_true
       |  FROM scored),
       |confusion AS (
       |  SELECT decision, COUNT(*) AS n_pairs,
       |         CAST(SUM(is_true) AS BIGINT) AS n_true,
       |         CAST(COUNT(*) - SUM(is_true) AS BIGINT) AS n_false
       |  FROM dec GROUP BY decision),
       |missed AS (
       |  SELECT 'missed_by_blocking' AS decision, COUNT(*) AS n_pairs,
       |         CAST(COUNT(*) AS BIGINT) AS n_true, CAST(0 AS BIGINT) AS n_false
       |  FROM crm WHERE src_id NOT IN (SELECT src_id FROM dec WHERE is_true = 1))
       |SELECT * FROM confusion UNION ALL SELECT * FROM missed ORDER BY decision""".stripMargin

  /** q219 — the t-closeness threshold (Li, Li & Venkatasubramanian
    * 2007 suggest 0.15–0.2 as a practical release bar), in ppm.
    */
  private val TCloseT = 200000L

  /** q219 — T-CLOSENESS audit, the third rung of the release-privacy
    * ladder (q132 k-anonymity → q171 l-diversity → this): a cell can
    * be k-anonymous AND l-diverse while its sensitive-value
    * DISTRIBUTION still leaks (all its values at the distribution's
    * extreme tail). t-closeness bounds the Earth Mover's Distance
    * between each cell's sensitive distribution and the global one.
    * For an ORDERED attribute with m equally-spaced bands the EMD is
    * (1/(m−1))·Σ_i |P_cum,i − Q_cum,i|; everything stays integral by
    * cross-multiplying the two cumulative fractions:
    * Σ|cumg_i·N − cum_i·n_g| · 10^6 DIV (n_g·N·(m−1)) — products in
    * DECIMAL(38,0)/HUGEINT so the sf1+ magnitudes can't overflow.
    * Output: the 10 worst cells with their EMD in ppm and the
    * violation flag at t = 0.2.
    *
    * Scale shape: one (type, day, band) aggregate off the scan, then
    * every window/join runs on the bounded cell×band spine (the q136
    * derived-domain argument — the spine crossJoin is two
    * POST-AGGREGATION frames, 150 cells × 10 bands, independent of
    * row volume; PlanGuard-allowlisted like q136's calendar).
    */
  private def q219(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
        floor(col("value") / 50).cast("long").as("band"))
    val cellBand = ev.groupBy(col("event_type"), col("day"), col("band"))
      .agg(count(lit(1)).as("cnt"))
    val cells = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n_g"))
    val global = ev.groupBy(col("band")).agg(count(lit(1)).as("cnt_b"))
      .withColumn("cum_b", sum(col("cnt_b")).over(
        Window.orderBy(col("band")).rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("n_total", sum(col("cnt_b")).over(Window.partitionBy()))
      .withColumn("m", count(lit(1)).over(Window.partitionBy()))
      .select(col("band"), col("cum_b"), col("n_total"), col("m"))
    val spine = cells.crossJoin(global)
      .join(cellBand, Seq("event_type", "day", "band"), "left")
      .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
      .withColumn("cumg", sum(col("cnt")).over(
        Window.partitionBy(col("event_type"), col("day")).orderBy(col("band"))
          .rowsBetween(Window.unboundedPreceding, 0)))
    spine.groupBy(col("event_type"), col("day"), col("n_g"), col("n_total"), col("m"))
      .agg(sum(expr("abs(CAST(cumg AS DECIMAL(38,0)) * n_total - CAST(cum_b AS DECIMAL(38,0)) * n_g)"))
        .as("emd_num"))
      .select(col("event_type"), col("day"), col("n_g"),
        expr("CAST(CAST(emd_num AS DECIMAL(38,0)) * 1000000 DIV (CAST(n_g AS DECIMAL(38,0)) * n_total * (m - 1)) AS BIGINT)")
          .as("t_ppm"))
      .withColumn("violates_t", (col("t_ppm") > TCloseT).cast("int"))
      .orderBy(col("t_ppm").desc, col("event_type"), col("day"))
      .limit(10)
  }

  private val q219Sql =
    s"""WITH ev AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         CAST(floor(value / 50) AS BIGINT) AS band
       |  FROM events),
       |cell_band AS (
       |  SELECT event_type, day, band, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM ev GROUP BY 1, 2, 3),
       |cells AS (
       |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS n_g FROM ev GROUP BY 1, 2),
       |global AS (
       |  SELECT band, CAST(SUM(COUNT(*)) OVER (ORDER BY band
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_b,
       |         CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total,
       |         CAST(COUNT(*) OVER () AS BIGINT) AS m
       |  FROM ev GROUP BY band),
       |spine AS (
       |  SELECT c.event_type, c.day, c.n_g, g.band, g.cum_b, g.n_total, g.m,
       |         COALESCE(cb.cnt, 0) AS cnt
       |  FROM cells c CROSS JOIN global g
       |  LEFT JOIN cell_band cb
       |    ON cb.event_type = c.event_type AND cb.day = c.day AND cb.band = g.band),
       |cum AS (
       |  SELECT *, CAST(SUM(cnt) OVER (PARTITION BY event_type, day ORDER BY band
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cumg
       |  FROM spine),
       |emd AS (
       |  SELECT event_type, day, n_g, n_total, m,
       |         SUM(abs(CAST(cumg AS HUGEINT) * n_total - CAST(cum_b AS HUGEINT) * n_g)) AS emd_num
       |  FROM cum GROUP BY 1, 2, 3, 4, 5)
       |SELECT event_type, day, n_g,
       |       CAST(CAST(emd_num AS HUGEINT) * 1000000 // (CAST(n_g AS HUGEINT) * n_total * (m - 1)) AS BIGINT) AS t_ppm,
       |       CAST(CAST(CAST(emd_num AS HUGEINT) * 1000000 // (CAST(n_g AS HUGEINT) * n_total * (m - 1)) AS BIGINT) > $TCloseT AS INT) AS violates_t
       |FROM emd
       |ORDER BY t_ppm DESC, event_type, day LIMIT 10""".stripMargin

  /** q220 — RANDOMIZED RESPONSE (Warner 1965), the local-DP
    * mechanism: each row reports its sensitive bit truthfully only
    * half the time (the other half it reports a fair coin), giving
    * every individual plausible deniability (ε = ln 3 local DP), yet
    * the population rate debiases exactly: E[obs] = π/2 + 1/4, so
    * π̂ = (4·obs − n)/(2n). Both coins come from salted md5 of the
    * event id, so the entire mechanism — noise included — is replayed
    * bit-for-bit by the oracle: the hash gate checks the DEBIASING
    * ALGEBRA, not just a happy path. Output: per-day true rate vs
    * debiased estimate (both ppm, truncating integral division;
    * 4·obs−n may be negative and DIV/`//` both truncate toward zero
    * — the q183 parity fact) and the realized absolute error.
    *
    * Scale shape: pure map stage (two md5s + a CASE) into a per-day
    * count aggregate; nothing but (day, three counts) ever shuffles.
    */
  private def q220(spark: SparkSession, dir: String): DataFrame = {
    val coin1 = graft.ext.TrainPrep.md5Bucket(col("event_id"), 2, ":rr1")
    val coin2 = graft.ext.TrainPrep.md5Bucket(col("event_id"), 2, ":rr2")
    Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("day"),
        (col("event_type") === "error").cast("long").as("s"),
        coin1.as("c1"), coin2.as("c2"))
      .withColumn("reported", when(col("c1") === 0, col("s")).otherwise(col("c2")))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("true_cnt"),
        sum(col("reported")).as("obs_cnt"))
      .select(col("day"), col("n"), col("true_cnt"), col("obs_cnt"),
        expr("true_cnt * 1000000 DIV n").as("true_ppm"),
        expr("(4 * obs_cnt - n) * 1000000 DIV (2 * n)").as("est_ppm"))
      .withColumn("abs_err_ppm", abs(col("est_ppm") - col("true_ppm")))
      .orderBy(col("day"))
  }

  private val q220Sql =
    """WITH rr AS (
      |  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS s,
      |         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':rr1'), 1, 15))::BIGINT % 2 AS c1,
      |         ('0x' || substr(md5(CAST(event_id AS VARCHAR) || ':rr2'), 1, 15))::BIGINT % 2 AS c2
      |  FROM events),
      |agg AS (
      |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
      |         CAST(SUM(s) AS BIGINT) AS true_cnt,
      |         CAST(SUM(CASE WHEN c1 = 0 THEN s ELSE c2 END) AS BIGINT) AS obs_cnt
      |  FROM rr GROUP BY day)
      |SELECT day, n, true_cnt, obs_cnt,
      |       true_cnt * 1000000 // n AS true_ppm,
      |       (4 * obs_cnt - n) * 1000000 // (2 * n) AS est_ppm,
      |       abs((4 * obs_cnt - n) * 1000000 // (2 * n) - true_cnt * 1000000 // n) AS abs_err_ppm
      |FROM agg ORDER BY day""".stripMargin

  /** q235 — BITEMPORAL AS-OF READ (SQL:2011 application-time +
    * system-time, the axis pair q185's time travel only covers half
    * of): every record carries BOTH a valid-time interval (when the
    * fact was true in the world) and a transaction-time interval
    * (when the warehouse believed it), so "what was customer X's
    * balance on date V, as we knew it at time T" is answerable for
    * any (V, T) — the query auditors and model-reproducibility
    * checks actually ask. The bitemporal table is built
    * deterministically from customer ⋈ orders: an initial record
    * valid from epoch; a balance revision valid from the customer's
    * first order date (loaded that day); and for an md5-selected 10%
    * of customers the initial load of that revision was WRONG
    * (+10000 cents) — a correction record arrives 30 days later,
    * closing the erroneous record's transaction interval without
    * touching valid time (the defining bitemporal move: corrections
    * rewrite belief, never history).
    *
    * Readout: balance at valid date V = 2000-01-01 as known at
    * T1 = first_load + 15d (inside the erroneous belief window) and
    * at T2 = first_load + 45d (after the correction): exactly one
    * record matches each (V, T) probe — BitemporalSpec proves that
    * uniqueness over a (V, T) grid — and corrected customers show
    * the 10000-cent retraction iff their revision was valid-selected.
    *
    * Scale shape: records are ≤ 4 per customer derived in one
    * orders-rollup ⋈ customer pass; the as-of probe is a conditional
    * aggregate per custkey — one shuffle end to end, no windows over
    * anything unbounded.
    */
  private def q235(spark: SparkSession, dir: String): DataFrame = {
    def cents(c: Column): Column =
      (c.cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100).cast("long")
    val Inf = "TIMESTAMP '9999-01-01'"
    val wFirst = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val firstOrder = Tables.orders(spark, dir)
      .withColumn("rn", row_number().over(wFirst))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderdate").as("fo_raw"),
        cents(col("o_totalprice")).as("first_cents"))
    val base = Tables.customer(spark, dir)
      .join(firstOrder, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey").as("ck"), cents(col("c_acctbal")).as("bal0"),
        col("fo_raw").as("fo"), coalesce(col("first_cents"), lit(0L)).as("oc"),
        (graft.ext.TrainPrep.md5Bucket(col("c_custkey"), 10, ":q235") === 0).as("corr"))
    // record assembly: valid interval, transaction interval, balance.
    // The initial record ships in TWO transaction-time generations:
    // before the revision loads the warehouse believes it valid
    // forever (g1); the load at fo supersedes it with the closed
    // valid interval (g2) — there is never a (V, T) gap in belief.
    val v1g1 = base.selectExpr("ck", "fo",
      "TIMESTAMP '1995-01-01' AS valid_from",
      s"$Inf AS valid_to",
      "TIMESTAMP '1995-01-01' AS tx_from", s"coalesce(fo, $Inf) AS tx_to",
      "bal0 AS bal")
    val v1g2 = base.filter(col("fo").isNotNull).selectExpr("ck", "fo",
      "TIMESTAMP '1995-01-01' AS valid_from",
      "fo AS valid_to",
      "fo AS tx_from", s"$Inf AS tx_to",
      "bal0 AS bal")
    val v2wrong = base.filter(col("fo").isNotNull && col("corr")).selectExpr("ck", "fo",
      "fo AS valid_from", s"$Inf AS valid_to",
      "fo AS tx_from", "fo + INTERVAL 30 DAY AS tx_to",
      "bal0 + oc + 10000 AS bal")
    val v2right = base.filter(col("fo").isNotNull).selectExpr("ck", "fo",
      "fo AS valid_from", s"$Inf AS valid_to",
      "CASE WHEN corr THEN fo + INTERVAL 30 DAY ELSE fo END AS tx_from",
      s"$Inf AS tx_to",
      "bal0 + oc AS bal")
    val records = v1g1.unionByName(v1g2).unionByName(v2wrong).unionByName(v2right)
    records
      .withColumn("v", expr("TIMESTAMP '2000-01-01'"))
      .withColumn("t1", expr("coalesce(fo, TIMESTAMP '1995-07-01') + INTERVAL 15 DAY"))
      .withColumn("t2", expr("coalesce(fo, TIMESTAMP '1995-07-01') + INTERVAL 45 DAY"))
      .groupBy(col("ck"))
      .agg(
        max(when(expr("valid_from <= v AND v < valid_to AND tx_from <= t1 AND t1 < tx_to"),
          col("bal"))).as("bal_t1_cents"),
        max(when(expr("valid_from <= v AND v < valid_to AND tx_from <= t2 AND t2 < tx_to"),
          col("bal"))).as("bal_t2_cents"),
        count(lit(1)).as("n_records"))
      .withColumn("was_corrected", col("bal_t1_cents") =!= col("bal_t2_cents"))
      .orderBy(col("ck"))
  }

  private val q235Sql =
    """WITH first_order AS (
      |  SELECT o_custkey, o_orderdate AS fo,
      |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS oc
      |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
      |                    ORDER BY o_orderdate, o_orderkey) AS rn
      |        FROM orders)
      |  WHERE rn = 1),
      |base AS (
      |  SELECT c_custkey AS ck,
      |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS bal0,
      |         fo, COALESCE(oc, 0) AS oc,
      |         (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':q235'), 1, 15))::BIGINT
      |            % 10 = 0) AS corr
      |  FROM customer LEFT JOIN first_order ON c_custkey = o_custkey),
      |records AS (
      |  SELECT ck, fo, TIMESTAMP '1995-01-01' AS valid_from,
      |         TIMESTAMP '9999-01-01' AS valid_to,
      |         TIMESTAMP '1995-01-01' AS tx_from,
      |         COALESCE(fo, TIMESTAMP '9999-01-01') AS tx_to,
      |         bal0 AS bal
      |  FROM base
      |  UNION ALL
      |  SELECT ck, fo, TIMESTAMP '1995-01-01', fo,
      |         fo, TIMESTAMP '9999-01-01', bal0
      |  FROM base WHERE fo IS NOT NULL
      |  UNION ALL
      |  SELECT ck, fo, fo, TIMESTAMP '9999-01-01',
      |         fo, fo + INTERVAL 30 DAY, bal0 + oc + 10000
      |  FROM base WHERE fo IS NOT NULL AND corr
      |  UNION ALL
      |  SELECT ck, fo, fo, TIMESTAMP '9999-01-01',
      |         CASE WHEN corr THEN fo + INTERVAL 30 DAY ELSE fo END,
      |         TIMESTAMP '9999-01-01', bal0 + oc
      |  FROM base WHERE fo IS NOT NULL),
      |probed AS (
      |  SELECT *, TIMESTAMP '2000-01-01' AS v,
      |         COALESCE(fo, TIMESTAMP '1995-07-01') + INTERVAL 15 DAY AS t1,
      |         COALESCE(fo, TIMESTAMP '1995-07-01') + INTERVAL 45 DAY AS t2
      |  FROM records)
      |SELECT ck,
      |       MAX(CASE WHEN valid_from <= v AND v < valid_to
      |                 AND tx_from <= t1 AND t1 < tx_to THEN bal END) AS bal_t1_cents,
      |       MAX(CASE WHEN valid_from <= v AND v < valid_to
      |                 AND tx_from <= t2 AND t2 < tx_to THEN bal END) AS bal_t2_cents,
      |       CAST(COUNT(*) AS BIGINT) AS n_records,
      |       (MAX(CASE WHEN valid_from <= v AND v < valid_to
      |                  AND tx_from <= t1 AND t1 < tx_to THEN bal END)
      |        <> MAX(CASE WHEN valid_from <= v AND v < valid_to
      |                     AND tx_from <= t2 AND t2 < tx_to THEN bal END)) AS was_corrected
      |FROM probed
      |GROUP BY ck
      |ORDER BY ck""".stripMargin

  /** q246 — FD-VIOLATION REPAIR: the actionable half of q206's
    * dependency discovery. The order feed inherits each customer's
    * market segment, then an md5-selected 5% of rows arrive CORRUPTED
    * (segment rotated to the next value — deterministic dirt, the
    * q68/q214 convention); the FD o_custkey → segment now has
    * violation mass, and the repair sets every minority value to its
    * group's PLURALITY value (ties broken by segment string, so the
    * vote is total). Output: per final segment, the row count after
    * repair plus the repair telemetry (rows repaired INTO the
    * segment, rows that were corrupted away from it) — and the
    * headline audit: repaired ≡ pre-corruption for every group whose
    * clean majority survived the 5% noise (the spec quantifies the
    * unrecoverable tail: 1-order customers whose only row was
    * corrupted are information-theoretically gone).
    *
    * Scale shape: corruption + vote are one groupBy(custkey, value)
    * + one window over the ≤|values|-per-group vote table; repair is
    * a broadcast-joinable map of violating groups only. No row data
    * beyond (key, value) ever shuffles.
    */
  private def q246(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
    val rotate = segs.indices.map(i => (segs(i), segs((i + 1) % segs.length)))
      .toDF("seg_from", "seg_to")
    val base = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_mktsegment").as("seg_true"))
      .withColumn("corrupt",
        graft.ext.TrainPrep.md5Bucket(col("o_orderkey"), 20, ":q246") === 0)
    val dirty = base.join(broadcast(rotate), col("seg_true") === col("seg_from"))
      .select(col("o_orderkey"), col("o_custkey"), col("seg_true"), col("corrupt"),
        when(col("corrupt"), col("seg_to")).otherwise(col("seg_true")).as("seg_obs"))
    // plurality vote per customer: (count desc, value asc) total order
    val votes = dirty.groupBy(col("o_custkey").as("ck"), col("seg_obs").as("v"))
      .agg(count(lit(1)).as("n"))
    val wv = Window.partitionBy(col("ck")).orderBy(col("n").desc, col("v"))
    val majority = votes.withColumn("rk", row_number().over(wv))
      .filter(col("rk") === 1).select(col("ck"), col("v").as("seg_repaired"))
    dirty.join(broadcast(majority), col("o_custkey") === col("ck"))
      .groupBy(col("seg_repaired"))
      .agg(count(lit(1)).as("n_rows"),
        sum((col("seg_obs") =!= col("seg_repaired")).cast("long")).as("n_repaired_into"),
        sum((col("corrupt") && col("seg_true") === col("seg_repaired")).cast("long"))
          .as("n_was_corrupted"),
        sum((col("seg_repaired") =!= col("seg_true")).cast("long")).as("n_still_wrong"))
      .orderBy(col("seg_repaired"))
  }

  private val q246Sql =
    """WITH segs AS (
      |  SELECT * FROM (VALUES ('AUTOMOBILE','BUILDING'), ('BUILDING','FURNITURE'),
      |    ('FURNITURE','HOUSEHOLD'), ('HOUSEHOLD','MACHINERY'),
      |    ('MACHINERY','AUTOMOBILE')) AS t(seg_from, seg_to)),
      |base AS (
      |  SELECT o_orderkey, o_custkey, c_mktsegment AS seg_true,
      |         (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || ':q246'), 1, 15))::BIGINT
      |            % 20 = 0) AS corrupt
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |dirty AS (
      |  SELECT o_orderkey, o_custkey, seg_true, corrupt,
      |         CASE WHEN corrupt THEN seg_to ELSE seg_true END AS seg_obs
      |  FROM base JOIN segs ON seg_true = seg_from),
      |votes AS (
      |  SELECT o_custkey AS ck, seg_obs AS v, COUNT(*) AS n
      |  FROM dirty GROUP BY 1, 2),
      |majority AS (
      |  SELECT ck, v AS seg_repaired FROM (
      |    SELECT ck, v, ROW_NUMBER() OVER (PARTITION BY ck ORDER BY n DESC, v) AS rk
      |    FROM votes)
      |  WHERE rk = 1)
      |SELECT seg_repaired,
      |       CAST(COUNT(*) AS BIGINT) AS n_rows,
      |       CAST(SUM(CASE WHEN seg_obs <> seg_repaired THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_repaired_into,
      |       CAST(SUM(CASE WHEN corrupt AND seg_true = seg_repaired THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_was_corrupted,
      |       CAST(SUM(CASE WHEN seg_repaired <> seg_true THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_still_wrong
      |FROM dirty JOIN majority ON o_custkey = ck
      |GROUP BY seg_repaired
      |ORDER BY seg_repaired""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q219_t_closeness", q219, Some(q219Sql)),
    QuerySpec("q220_randomized_response", q220, Some(q220Sql)),
    QuerySpec("q214_record_linkage", q214, Some(q214Sql)),
    QuerySpec("q206_fd_discovery", q206, Some(q206Sql)),
    QuerySpec("q207_inclusion_deps", q207, Some(q207Sql)),
    QuerySpec("q195_snapshot_cdc", q195, Some(q195Sql)),
    QuerySpec("q192_robust_mad", q192, Some(q192Sql)),
    QuerySpec("q189_retractable_ivm", q189, Some(q189Sql)),
    QuerySpec("q185_scd2_time_travel", q185, Some(q185Sql)),
    QuerySpec("q179_join_ivm", q179, Some(q179Sql), headline = true),
    QuerySpec("q171_l_diversity", q171, Some(q171Sql)),
    QuerySpec("q172_group_impute", q172, Some(q172Sql)),
    QuerySpec("q75_scd1_upsert",  q75, Some(q75Sql)),
    QuerySpec("q76_scd2_history", q76, Some(q76Sql)),
    QuerySpec("q94_pit_join",     q94, Some(q94Sql), headline = true),
    QuerySpec("q78_log_compaction", q78, Some(q78Sql)),
    QuerySpec("q81_dq_audit",     q81, Some(q81Sql)),
    QuerySpec("q105_corpus_diff", q105, Some(q105Sql)),
    QuerySpec("q106_gdpr_erasure", q106, Some(q106Sql)),
    QuerySpec("q128_table_profile", q128, Some(q128Sql)),
    QuerySpec("q132_k_anonymity", q132, Some(q132Sql)),
    QuerySpec("q258_dp_release", q258, Some(q258Sql)),
    QuerySpec("q133_incremental_rollup", q133, Some(q133Sql)),
    QuerySpec("q145_observed_dq", q145, Some(q145Sql)),
    QuerySpec("q158_merkle_diff", q158, Some(q158Sql)),
    QuerySpec("q235_bitemporal_asof", q235, Some(q235Sql)),
    QuerySpec("q246_fd_repair", q246, Some(q246Sql)),
  )
}
