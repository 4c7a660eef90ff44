package graft.streaming

import graft.QuerySpec
import graft.etl.CleanExprs.{moneySum, moneySumSql}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table (SURVEY.md §2.7 — the
  * reference is batch-only; this is the §7-step-8 extension mapping
  * the quarter/mode dashboards onto event-time windows).
  *
  * The driver contract wants a batch `DataFrame` back, so each query
  * replays the events parquet as a file stream into a memory sink,
  * drains it synchronously (`processAllAvailable`), and returns the
  * sink table — real streaming execution (incremental state store,
  * event-time windows, watermarks), deterministic batch result.
  */
object StreamingQueries {

  /** events.ts has shipped as TIMESTAMP(NANOS) and as µs
    * TIMESTAMP_NTZ across testdata generations (see
    * [[graft.Tables.events]]); readStream needs the schema up front,
    * so probe the footer with a one-off batch read and declare the
    * matching physical type, normalizing to session-TZ TimestampType
    * either way.
    */
  private def rawSchema(tsType: DataType) = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType),
  ))

  private def eventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // memoized resolved relation (round 17): the schema probe used to
    // pay a full ~100 ms DataSource resolution per streaming query
    val tsType = graft.Tables.table(spark, dir, "events").schema("ts").dataType
    // The file-stream source requires a directory path; events.parquet
    // is a single file, so stream the directory with a name filter.
    val raw = spark.readStream
      .schema(rawSchema(if (tsType == LongType) LongType else tsType))
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    if (tsType == LongType) raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw.withColumn("ts", col("ts").cast(TimestampType))
  }

  /** Drain a streaming aggregate into a uniquely-named memory sink and
    * return it as a batch DataFrame.
    *
    * Streaming queries run with a REDUCED shuffle-partition count
    * (pinned at stream start): every stateful operator keeps one state
    * store per shuffle partition, each with per-micro-batch
    * maintenance — at 32 partitions that is 32 stores churning per
    * stateful op for aggregates whose key cardinality is tiny
    * (event types × windows). AQE never coalesces stateful exchanges,
    * so this is the one knob; on a real cluster the operator sizes it
    * to expected state cardinality, not to cores. Results are
    * partitioning-independent (decimal-exact sums), which the oracle
    * gate re-proves every round.
    */
  private var sinkCounter = 0
  private val StreamShufflePartitions = "8"

  /** Every stateful stream here runs under the ROCKSDB state store
    * (VERDICT r6 task 4): the default HDFS-backed provider keeps all
    * state on-heap, which at 100 TB-scale keyspaces (per-user
    * sessions, high-cardinality windows) is an OOM waiting to happen —
    * RocksDB spills state to local disk with an off-heap block cache
    * and is the provider a production deployment pins. Pinned
    * per-query (the conf is read at stream start); the driver's hash
    * gate re-proves all 12 streaming oracles unchanged under it.
    */
  private val StateStoreProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def drain(spark: SparkSession, agg: DataFrame, mode: String): DataFrame = {
    val name = synchronized { sinkCounter += 1; s"graft_sink_$sinkCounter" }
    val key = "spark.sql.shuffle.partitions"
    val storeKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.get(key)
    val prevStore = spark.conf.getOption(storeKey)
    spark.conf.set(key, StreamShufflePartitions)
    spark.conf.set(storeKey, StateStoreProvider)
    // each drain start allocates a temp checkpoint dir; without this
    // flag Spark leaves it behind (best-effort delete on stop) and
    // repeated sweeps/bench reps accumulate state under /tmp
    spark.conf.set("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    try {
      val q = agg.writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
      q.processAllAvailable()
      q.stop()
    } finally {
      spark.conf.set(key, prev)
      prevStore match {
        case Some(v) => spark.conf.set(storeKey, v)
        case None => spark.conf.unset(storeKey)
      }
    }
    spark.table(name)
  }

  /** q60 — tumbling daily windows per event type (complete mode: the
    * whole history replays in one batch, and complete emits every
    * window without waiting on the watermark).
    */
  private def q60(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
    drain(spark, agg, "complete")
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("total_value"))
      .orderBy("day", "event_type")
  }

  private val q60Sql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
       |       COUNT(*) AS n, ${moneySumSql("value")} AS total_value
       |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** q61 — sliding windows (6h slide over 24h width) per event type:
    * each event lands in 4 windows — the streaming-state shape the
    * tumbling case doesn't exercise. Oracle: a generate_series
    * unnest reproduces window assignment relationally.
    */
  private def q61(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day", "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    drain(spark, agg, "complete")
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))
      .orderBy("win_start", "event_type")
  }

  private val q61Sql =
    """WITH wins AS (
      |  SELECT event_type,
      |         CAST(date_trunc('day', ts) AS TIMESTAMP)
      |           + to_hours(6 * CAST(floor(date_diff('hour', CAST(date_trunc('day', ts) AS TIMESTAMP), CAST(ts AS TIMESTAMP)) / 6.0) AS BIGINT))
      |           - to_hours(6 * s.i) AS win_start
      |  FROM events, (SELECT unnest(range(0, 4)) AS i) s),
      |valid AS (SELECT event_type, win_start FROM wins)
      |SELECT win_start, event_type, COUNT(*) AS n
      |FROM valid GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** q62 — streaming stateful dedup: `dropDuplicates` on
    * (user_id, event_type, day) with a watermark bounding the dedup
    * state — the streaming form of exact dedup for an event firehose.
    * Append mode: each key emits exactly once.
    */
  private def q62(spark: SparkSession, dir: String): DataFrame = {
    val deduped = eventStream(spark, dir)
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("day", "1 day")
      .dropDuplicates("user_id", "event_type", "day")
      .select(col("user_id"), col("event_type"), col("day"))
    drain(spark, deduped, "append")
      .orderBy("user_id", "event_type", "day")
  }

  private val q62Sql =
    """SELECT DISTINCT user_id, event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      |FROM events ORDER BY user_id, event_type, day""".stripMargin

  /** q63 — event-time sessionization: `session_window` with a 1-day
    * inactivity gap per user (batch evaluation of the streaming
    * operator; the oracle re-derives sessions relationally via the
    * islands-and-gaps LAG pattern). Boundary semantics: an event
    * exactly `gap` after the previous one starts a NEW session
    * (Spark's window end is exclusive), hence `>=` in the oracle.
    */
  private def q63(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.events(spark, dir)
      .groupBy(col("user_id"), session_window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"), col("n_events"))
      .orderBy("user_id", "session_start")

  private val q63Sql =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |         CASE WHEN LAG(ts) OVER w IS NULL
      |                OR ts - LAG(ts) OVER w >= INTERVAL 1 DAY THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id, ts,
      |         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM marked)
      |SELECT user_id, CAST(MIN(ts) AS TIMESTAMP) AS session_start, COUNT(*) AS n_events
      |FROM sessions GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** Per-user custom state carried by q64: event count and running
    * value sum (cents, exact).
    */
  final case class UserState(n: Long, valueCents: Long)
  final case class SeqEvent(user_id: Long, event_id: Long, seq_no: Int,
      run_value_cents: Long)

  /** q64 — arbitrary stateful processing via
    * `flatMapGroupsWithState`: a hand-rolled per-user state machine
    * (sequence number + exact running value) — the API for state
    * logic that windows/dedup can't express. The whole replay arrives
    * in one micro-batch, so each group's iterator is sorted in the
    * state function (iterator order within a batch is not defined)
    * and the result is deterministic; the oracle is the equivalent
    * window specification.
    */
  private def q64(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

    val events = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("value_cents"),
        // exact micros for ordering (Timestamp.getTime is millis-only)
        unix_micros(col("ts")).as("ts_us"))
      .as[(Long, Long, Long, Long)]

    def stateFn(
        userId: Long,
        rows: Iterator[(Long, Long, Long, Long)],
        state: GroupState[UserState]): Iterator[SeqEvent] = {
      val prior = state.getOption.getOrElse(UserState(0L, 0L))
      // batch iterator order is undefined — impose event-time order
      val sorted = rows.toSeq.sortBy { case (_, eid, _, tsUs) => (tsUs, eid) }
      var n = prior.n
      var run = prior.valueCents
      val out = sorted.map { case (_, eid, cents, _) =>
        n += 1; run += cents
        SeqEvent(userId, eid, n.toInt, run)
      }
      state.update(UserState(n, run))
      out.iterator
    }

    val seqd = events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(stateFn)

    drain(spark, seqd.toDF(), "append")
      .orderBy("user_id", "seq_no")
  }

  private val q64Sql =
    """SELECT user_id, event_id,
      |       CAST(ROW_NUMBER() OVER w AS INT) AS seq_no,
      |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) OVER
      |            (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |         AS run_value_cents
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
      |ORDER BY user_id, seq_no""".stripMargin

  /** q65 — stream-stream interval join: each purchase joined to the
    * same user's views in the preceding 24 hours (the attribution
    * join), BOTH sides streaming. The join state is keyed by user and
    * pruned by watermark + time-bound condition (Spark buffers only
    * events inside the horizon) — the scalable shape for joining two
    * firehoses: state is bounded by the interval, not the stream
    * length. Inner join + full single-batch replay ⇒ deterministic;
    * oracle = the equivalent batch inequality join.
    */
  private def q65(spark: SparkSession, dir: String): DataFrame = {
    val views = eventStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 day")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 day")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 DAY"))
    drain(spark, joined, "append")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"))
      .orderBy("user_id", "purchase_id", "view_id")
  }

  private val q65Sql =
    """SELECT p.user_id, p.event_id AS purchase_id, l.event_id AS view_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'view') l
      |  ON p.user_id = l.user_id
      | AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(l.ts AS TIMESTAMP))
      |     BETWEEN 0 AND 86400000000
      |ORDER BY p.user_id, purchase_id, view_id""".stripMargin

  /** q79 — CHAINED stateful streaming (the multi-stateful-operator
    * support Spark gained in 3.4): one streaming query runs
    * filter → watermarked `dropDuplicates` → tumbling-window count —
    * the full streaming ingestion pipeline (quality gate, dedup,
    * daily rollup) in a single incremental plan with two state
    * stores. Chained stateful operators REQUIRE append mode, and
    * append emits a window only once the watermark passes its end —
    * so the final day(s) of the replay are legitimately withheld.
    * The oracle mirrors that emission rule exactly: it keeps only
    * windows with `end <= max(click ts) − 1h` (the final watermark of
    * this stream), making Spark's append semantics themselves part of
    * the checked contract.
    */
  private def q79(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .filter(col("event_type") === "click")
      .withColumn("day", date_trunc("day", col("ts")))
      .withWatermark("day", "1 hour")
      .dropDuplicates("user_id", "day")
      .groupBy(window(col("day"), "1 day"))
      .agg(count(lit(1)).as("n_unique_users"))
    drain(spark, agg, "append")
      .select(col("window.start").as("day"), col("n_unique_users"))
      .orderBy("day")
  }

  private val q79Sql =
    """WITH clicks AS (
      |  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, ts
      |  FROM events WHERE event_type = 'click'),
      |dedup AS (SELECT DISTINCT user_id, day FROM clicks),
      |wm AS (SELECT CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) - INTERVAL 1 HOUR AS w
      |       FROM clicks)
      |SELECT day, COUNT(*) AS n_unique_users
      |FROM dedup
      |WHERE day + INTERVAL 1 DAY <= (SELECT w FROM wm)
      |GROUP BY day ORDER BY day""".stripMargin

  /** q85 — STREAM-STATIC join: every micro-batch of the event stream
    * is enriched against the batch `customer` dimension (joined fresh
    * per batch — Catalyst broadcasts it under the threshold, and on a
    * cluster the dim may also be re-read per batch, so slowly-changing
    * enrichment picks up updates), then windowed per market segment.
    * The third join family after stream-stream (q65) and the
    * foreachBatch upsert path: NO join state store is needed — only
    * the windowed aggregate keeps state, which is what makes
    * dimension enrichment cheap in a streaming ingest pipeline.
    */
  private def q85(spark: SparkSession, dir: String): DataFrame = {
    val cust = graft.Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .join(cust, col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 day"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), moneySum(col("value")).as("total_value"))
    drain(spark, agg, "complete")
      .select(col("window.start").as("day"), col("c_mktsegment").as("segment"),
        col("n"), col("total_value"))
      .orderBy("day", "segment")
  }

  private val q85Sql =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       c.c_mktsegment AS segment,
       |       COUNT(*) AS n, ${moneySumSql("value")} AS total_value
       |FROM events e JOIN customer c ON e.user_id = c.c_custkey
       |GROUP BY 1, 2 ORDER BY day, segment""".stripMargin

  /** Sketch shape for q102: 3 rows × 8 counters — deliberately
    * narrower than the ~15-key user domain so collisions occur and
    * the one-sided `overcount` is visible (the q99 sizing note).
    */
  private val CmsDepth = 3
  private val CmsWidth = 8

  /** q102 — STREAMING heavy hitters: the q99 count-min sketch
    * maintained incrementally as streaming state (typed
    * [[graft.functions.CountMinAgg]] under a streaming groupByKey —
    * counter addition is algebraic, so each micro-batch folds into
    * the state buffer and the final sketch is bit-identical to a
    * batch build at ANY partitioning/trigger slicing; that
    * merge-invariance is exactly what lets one 192-byte state row
    * track per-user event frequency over an unbounded firehose).
    * After the drain, the snapshot sketch is probed against exact
    * per-user counts from the batch table — so the report both
    * demonstrates the estimate quality AND lets the oracle re-derive
    * every streamed counter relationally in DuckDB (the stream-built
    * matrix must equal the relational one, or est_cnt hashes
    * mismatch).
    */
  private def q102(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def hashed(df: DataFrame): DataFrame = df
      .withColumn("th", md5(to_binary(col("user_id").cast("string"), lit("utf-8"))))
      .withColumn("h1", conv(substring(col("th"), 1, 15), 16, 10).cast("long"))
      .withColumn("h2", conv(substring(col("th"), 16, 15), 16, 10).cast("long")
        .bitwiseOR(1))
    val sketchStream = hashed(eventStream(spark, dir))
      .select(col("h1"), col("h2")).as[(Long, Long)]
      .groupByKey(_ => 0) // one global sketch row; partial agg is per-batch map-side
      .agg(graft.functions.CountMinAgg(CmsDepth, CmsWidth).toColumn.name("cms"))
      .toDF("g", "cms")
    val sketch = drain(spark, sketchStream, "complete").select(col("cms"))
    val exact = hashed(graft.Tables.events(spark, dir))
      .groupBy(col("user_id"), col("h1"), col("h2"))
      .agg(count(lit(1)).as("true_cnt"))
    val est = least((0 until CmsDepth).map { r =>
      element_at(col("cms"),
        ((col("h1") + lit(r.toLong) * col("h2")) % CmsWidth).cast("int")
          + (r * CmsWidth + 1))
    }: _*)
    exact.crossJoin(broadcast(sketch))
      .select(col("user_id"), col("true_cnt"), est.as("est_cnt"))
      .withColumn("overcount", col("est_cnt") - col("true_cnt"))
      .orderBy(col("true_cnt").desc, col("user_id"))
  }

  private val q102Sql =
    s"""WITH k AS (
       |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_cnt,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h1,
       |         (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 16, 15))::BIGINT) | 1 AS h2
       |  FROM events GROUP BY user_id),
       |cells AS (
       |  SELECT r, (h1 + r * h2) % $CmsWidth AS pos,
       |         CAST(SUM(true_cnt) AS BIGINT) AS cnt
       |  FROM k CROSS JOIN range(0, $CmsDepth) t(r)
       |  GROUP BY 1, 2),
       |est AS (
       |  SELECT p.user_id, p.true_cnt, MIN(c.cnt) AS est_cnt
       |  FROM k p
       |  CROSS JOIN range(0, $CmsDepth) t(r)
       |  JOIN cells c ON c.r = t.r AND c.pos = (p.h1 + t.r * p.h2) % $CmsWidth
       |  GROUP BY 1, 2)
       |SELECT user_id, true_cnt, est_cnt,
       |       CAST(est_cnt - true_cnt AS BIGINT) AS overcount
       |FROM est ORDER BY true_cnt DESC, user_id""".stripMargin

  /** q113 decontamination gram width (matches the batch q67). */
  private val DecontamGramN = 8

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
  ))

  /** q113 — STREAMING decontamination: the q67 hygiene gate applied at
    * INGESTION time instead of as a batch sweep. The held-out test
    * split's distinct 8-gram digests form a STATIC index (in
    * production: the benchmark suite, tiny and broadcast); arriving
    * train-split documents stream through, explode into gram digests,
    * and stream-static inner-join the index per micro-batch — the q85
    * join family, so NO join state store exists; the only state is the
    * per-doc running count of contaminated gram occurrences. A doc
    * appearing in the output means "quarantine before it reaches the
    * training corpus" — the answer arrives while the data lands, not
    * after a nightly scan of 100 TB.
    *
    * Shuffle shape matches q67: fixed-width md5 digests key every
    * exchange, never gram text, never doc×doc. Oracle = the exact
    * batch replay (occurrence-granularity: each train gram occurrence
    * matching any distinct test gram counts once).
    */
  private def q113(spark: SparkSession, dir: String): DataFrame = {
    import graft.ext.TrainPrep
    val gh = (g: org.apache.spark.sql.Column) => md5(to_binary(g, lit("utf-8")))
    val testIdx = graft.Tables.documents(spark, dir)
      .withColumn("bucket", TrainPrep.splitBucket(col("doc_id")))
      .filter(col("bucket") >= TrainPrep.TrainPct + TrainPrep.ValPct)
      .select(explode(graft.functions.word_shingles(col("text"), DecontamGramN)).as("g"))
      .select(gh(col("g")).as("gh"))
      .distinct()
    val agg = spark.readStream
      .schema(docSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)
      .withColumn("bucket", TrainPrep.splitBucket(col("doc_id")))
      .filter(col("bucket") < TrainPrep.TrainPct)
      .select(col("doc_id"),
        explode(graft.functions.word_shingles(col("text"), DecontamGramN)).as("g"))
      .select(col("doc_id"), gh(col("g")).as("gh"))
      .join(testIdx, "gh")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_contaminated_occurrences"))
    drain(spark, agg, "complete")
      .orderBy("doc_id")
  }

  private val q113Sql =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket,
       |         string_split(text, ' ') AS ws
       |  FROM documents),
       |g AS (
       |  SELECT doc_id, bucket,
       |         md5(CASE WHEN len(ws) >= $DecontamGramN
       |                  THEN array_to_string(ws[i:i+${DecontamGramN - 1}], ' ')
       |                  ELSE array_to_string(ws, ' ') END) AS gh
       |  FROM (SELECT doc_id, bucket, ws,
       |               unnest(CASE WHEN len(ws) >= $DecontamGramN
       |                           THEN range(1, len(ws) - ${DecontamGramN - 2})
       |                           ELSE [1] END) AS i
       |        FROM w)),
       |te AS (SELECT DISTINCT gh FROM g
       |       WHERE bucket >= ${graft.ext.TrainPrep.TrainPct + graft.ext.TrainPrep.ValPct}),
       |tr AS (SELECT doc_id, gh FROM g WHERE bucket < ${graft.ext.TrainPrep.TrainPct})
       |SELECT tr.doc_id, COUNT(*) AS n_contaminated_occurrences
       |FROM tr JOIN te USING (gh)
       |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin

  /** q118 — STREAMING anomaly detection: per-type daily event counts
    * maintained incrementally (the q60 state), then each day flagged
    * against its type's history with a 2σ deviation test — the
    * volume-drop / traffic-spike alert a production ingest pipeline
    * hangs off its metrics stream. The flagging arithmetic is
    * integer-exact (the q109 moment trick): with D observed days,
    * Σn and Σn², the test |n − μ| > 2σ is equivalently
    *   (n·D − Σn)² > 4·(D·Σn² − (Σn)²)
    * — no division, no sqrt, no floats, so both engines agree
    * bit-for-bit. Deviation and bound are reported so the alert is
    * auditable.
    *
    * The history baseline runs over the DRAINED window table — rows
    * bounded by types × days (a metrics stream, not the event
    * stream), the same post-drain tier every streaming query's final
    * ORDER BY uses; only observed days participate (a production
    * monitor would densify the calendar before flagging volume
    * drops to literal zero).
    */
  private def q118(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    // localCheckpoint: the memory-sink view is not a
    // MultiInstanceRelation, so the days-stats self-join below would
    // fail attribute deduplication against the raw view (and the
    // table is bounded by types × days anyway)
    val days = drain(spark, agg, "complete")
      .select(col("window.start").as("day"), col("event_type"), col("n"))
      .localCheckpoint()
    val stats = days.groupBy(col("event_type"))
      .agg(count(lit(1)).as("d"), sum(col("n")).as("sn"),
        sum(col("n") * col("n")).as("sn2"))
    days.join(stats, "event_type")
      .withColumn("dev2", expr("(n * d - sn) * (n * d - sn)"))
      .withColumn("bound", expr("4 * (d * sn2 - sn * sn)"))
      .withColumn("anomaly", (col("dev2") > col("bound")).cast("int"))
      .select(col("event_type"), col("day"), col("n"),
        col("dev2"), col("bound"), col("anomaly"))
      .orderBy("event_type", "day")
  }

  private val q118Sql =
    """WITH days AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
      |         COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |st AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS d,
      |         CAST(SUM(n) AS BIGINT) AS sn,
      |         CAST(SUM(n * n) AS BIGINT) AS sn2
      |  FROM days GROUP BY event_type)
      |SELECT days.event_type, day, n,
      |       (n * d - sn) * (n * d - sn) AS dev2,
      |       4 * (d * sn2 - sn * sn) AS bound,
      |       CAST(CASE WHEN (n * d - sn) * (n * d - sn) > 4 * (d * sn2 - sn * sn)
      |                 THEN 1 ELSE 0 END AS INT) AS anomaly
      |FROM days JOIN st USING (event_type)
      |ORDER BY event_type, day""".stripMargin

  /** q135 — STREAMING ETL into an exactly-once parquet store, as a
    * registered oracle-checked query (until now the
    * [[ExactlyOnceSink]] contract lived only in StreamingEtlSpec's
    * crash-replay proof): the event stream lands micro-batch by
    * micro-batch through the idempotent batch-id-partitioned writer,
    * then the STORE is read back and aggregated — so the driver's
    * hash gate verifies the actual files the sink produced, closing
    * the loop stream → store → query. Decimal-exact sums make the
    * store aggregation hash-stable regardless of how many batches the
    * replay produced (the batch_id partition column is provenance,
    * not part of the result).
    */
  private def q135(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_q135_store").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_q135_ck").toString
    val src = eventStream(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"), col("value"))
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ExactlyOnceSink.writeBatch(batch, batchId, out)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    // localCheckpoint pins the read-back aggregate so the store and
    // checkpoint temp dirs can be deleted NOW — repeated sweeps/bench
    // reps would otherwise accumulate unbounded parquet under /tmp
    val result = spark.read.parquet(out)
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_events"), moneySum(col("value")).as("total_value"))
      .orderBy("event_type", "day")
      .localCheckpoint()
    Seq(out, ck).foreach { d =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
    result
  }

  /** q188 — STREAMING CDC MERGE into a versioned table: each
    * micro-batch folds into a per-user profile store (event count +
    * latest event) by read-merge-write against the previous snapshot
    * version — the continuous MERGE INTO shape every table format
    * (Delta/Iceberg/Hudi) ships, built from first principles: batch
    * b writes snapshot v_b = merge(v_{b-1}, agg(batch_b)), and the
    * final snapshot answers the query. Correctness does NOT depend
    * on how the stream happens to split into micro-batches, because
    * both merge operations are ASSOCIATIVE: counts add and "latest"
    * is a max over the (ts, event_id, type) struct — so any batch
    * partition folds to the same table (CdcMergeSpec proves a forced
    * multi-batch replay ≡ the one-shot run). At 100 TB the
    * read-merge-write of the FULL store per batch becomes a keyed
    * MERGE pruned to touched partitions (the delta only carries
    * batch keys), and the snapshot chain is exactly a table format's
    * version log — the versioned-dir chain here keeps every
    * intermediate state inspectable and the final read atomic. The
    * oracle is the batch recompute (latest row + count per user)
    * over the same events, proving the incremental chain exact.
    */
  private def q188(spark: SparkSession, dir: String): DataFrame =
    cdcMerge(spark, eventStream(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type")))

  /** The q188 merge loop over any (user_id, ts, event_id, event_type)
    * stream — exposed so CdcMergeSpec can drive it with a forced
    * multi-batch replay.
    */
  private[streaming] def cdcMerge(spark: SparkSession, src: DataFrame): DataFrame = {
    val base = java.nio.file.Files.createTempDirectory("graft_q188_store").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_q188_ck").toString
    var current: Option[String] = None // snapshot pointer, advanced per batch
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = batch
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            max(struct(col("ts"), col("event_id"), col("event_type"))).as("last"))
        val merged = current match {
          case None => delta
          case Some(prev) => spark.read.parquet(prev)
            .unionByName(delta)
            .groupBy(col("user_id"))
            .agg(sum(col("n_events")).as("n_events"), max(col("last")).as("last"))
        }
        val v = s"$base/v$batchId"
        merged.write.mode("overwrite").parquet(v)
        current = Some(v)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val result = spark.read.parquet(current.get)
      .select(col("user_id"), col("n_events"),
        col("last.ts").as("last_ts"), col("last.event_type").as("last_type"))
      .orderBy("user_id")
      .localCheckpoint()
    Seq(base, ck).foreach { d =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
    result
  }

  private val q188Sql =
    """WITH r AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         ROW_NUMBER() OVER (PARTITION BY user_id
      |                            ORDER BY ts DESC, event_id DESC) AS rn,
      |         COUNT(*) OVER (PARTITION BY user_id) AS n
      |  FROM events)
      |SELECT user_id, n AS n_events, CAST(ts AS TIMESTAMP) AS last_ts,
      |       event_type AS last_type
      |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin

  private val q135Sql =
    s"""SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |       COUNT(*) AS n_events,
       |       ${moneySumSql("value")} AS total_value
       |FROM events
       |GROUP BY 1, 2 ORDER BY event_type, day""".stripMargin

  /** q136 — calendar GAP FILLING (the densification q118's scaladoc
    * defers): generate the full day calendar between the observed min
    * and max, cross it with the type dimension, and left-join the
    * observed per-day counts so silent days appear as explicit zero
    * rows — without this, a volume-drop monitor can't distinguish "no
    * row" from "zero events". Both generated sides are 1-row
    * aggregates exploded to bounded domains (days × types), so the
    * cross join is a broadcast of tiny derived tables (allowlisted),
    * and the only data-sized op is the (type, day) count aggregate.
    */
  private def q136(spark: SparkSession, dir: String): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"))
    val calendar = ev.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(expr("sequence(mn, mx, INTERVAL 1 DAY)")).as("day"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n"))
    calendar.crossJoin(types)
      .join(counts, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("n").isNull.cast("int").as("filled"))
      .orderBy("event_type", "day")
  }

  private val q136Sql =
    """WITH ev AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM events),
      |cal AS (
      |  SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
      |  FROM (SELECT MIN(day) AS mn, MAX(day) AS mx FROM ev)),
      |ty AS (SELECT DISTINCT event_type FROM ev),
      |c AS (SELECT event_type, day, COUNT(*) AS n FROM ev GROUP BY 1, 2)
      |SELECT ty.event_type, cal.day,
      |       COALESCE(c.n, 0) AS n_events,
      |       CAST(CASE WHEN c.n IS NULL THEN 1 ELSE 0 END AS INT) AS filled
      |FROM cal CROSS JOIN ty
      |LEFT JOIN c ON c.event_type = ty.event_type AND c.day = cal.day
      |ORDER BY ty.event_type, cal.day""".stripMargin

  /** q139 session gap: 1 day, matching q63's `session_window` so the
    * two sessionizers describe the same sessions.
    */
  private val SessionGapUs = 86400000000L

  /** q139 — CUSTOM PER-KEY STATE MACHINE via `flatMapGroupsWithState`
    * in UPDATE mode with long-lived COMPACT state — the state-API
    * regime q64's append-mode per-event enumerator doesn't cover:
    * q64 emits a row per input event (state is a cursor), while q139
    * maintains a bounded per-user PROFILE that outlives any batch and
    * re-emits current state per touched key — the accumulator shape
    * of fraud scoring, CDC reconciliation, and enrichment caches,
    * where state size (not output size) is the scaling constraint.
    * Each user's profile folds their event sequence: event/purchase
    * counts, 1-day-gap session count (q63's sessions, recomputed by
    * explicit state transitions instead of `session_window`),
    * first/last activity, longest gap.
    *
    * Determinism contract: within each micro-batch the group's
    * events are folded in (ts, event_id) order from the persisted
    * state; the drain harness replays history through the file
    * source, so the fold equals the exact batch recompute and the
    * DuckDB window oracle checks it. (A real deployment fed
    * out-of-order batches would pair this with a watermark + timeout
    * eviction — GroupStateTimeout is part of the exercised API.)
    * Update-mode emissions re-state each touched user per batch;
    * the post-drain dedup keeps each user's final state (n_events is
    * monotone). State lives in the RocksDB store like every stateful
    * query here; keys shuffle once to their state partition.
    */
  /** The q139 state transition applied to a streaming event Dataset —
    * shared with StateMachineSpec, which drives it through a forced
    * MULTI-batch replay (1 file per trigger) to prove the state
    * really persists and composes across micro-batches.
    */
  private[streaming] def userStateMachine(
      ev: org.apache.spark.sql.Dataset[UserEvent]): DataFrame = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserLifetimeState, UserLifetimeRow](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, events: Iterator[UserEvent], state: GroupState[UserLifetimeState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
          var s = state.getOption.getOrElse(UserLifetimeState(0L, 0L, 0L, 0L, 0L, 0L))
          sorted.foreach { e =>
            s =
              if (s.nEvents == 0L)
                UserLifetimeState(1L, 1L, e.is_purchase.toLong, e.ts_us, e.ts_us, 0L)
              else {
                val gap = e.ts_us - s.lastTsUs
                UserLifetimeState(
                  s.nEvents + 1L,
                  s.nSessions + (if (gap > SessionGapUs) 1L else 0L),
                  s.nPurchases + e.is_purchase.toLong,
                  s.firstTsUs,
                  e.ts_us,
                  math.max(s.maxGapUs, gap))
              }
          }
          state.update(s)
          Iterator(UserLifetimeRow(uid, s.nEvents, s.nSessions, s.nPurchases,
            s.firstTsUs, s.lastTsUs, s.maxGapUs))
      }.toDF()
  }

  /** Post-drain dedup: update mode re-states a touched user each
    * batch; n_events is monotone, so the max row is the final state.
    */
  private[streaming] def latestStatePerUser(drained: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n_events").desc)
    drained.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
      .orderBy("user_id")
  }

  private def q139(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventStream(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
        (col("event_type") === "purchase").cast("int").as("is_purchase"))
      .as[UserEvent]
    latestStatePerUser(drain(spark, userStateMachine(ev), "update"))
  }

  private val q139Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       |         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
       |  FROM events),
       |g AS (
       |  SELECT user_id, ts_us, is_purchase,
       |         ts_us - LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS gap
       |  FROM e)
       |SELECT user_id,
       |       CAST(COUNT(*) AS BIGINT) AS n_events,
       |       CAST(1 + SUM(CASE WHEN gap > $SessionGapUs THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
       |       CAST(SUM(is_purchase) AS BIGINT) AS n_purchases,
       |       CAST(MIN(ts_us) AS BIGINT) AS first_ts_us,
       |       CAST(MAX(ts_us) AS BIGINT) AS last_ts_us,
       |       CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us
       |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q140 — SESSION CLOSING via EVENT-TIME TIMEOUT: the state-API
    * surface q64/q139 leave untouched — `withWatermark` +
    * `GroupStateTimeout.EventTimeTimeout` + `setTimeoutTimestamp` +
    * `hasTimedOut` + `state.remove()` — doing the canonical job that
    * needs it: emitting each user session exactly once, as it CLOSES.
    * Sessions whose gap to the next event exceeds [[SessionGapUs]]
    * close inline on data; each user's final session has no next
    * event, so the engine must close it for us — the state carries a
    * timeout at (last event + gap), and when the watermark passes it
    * Spark runs the state function with `hasTimedOut` in a dedicated
    * (possibly data-less) micro-batch, where the session is emitted
    * and its state removed. Append mode: every session appears once,
    * tagged with HOW it closed.
    *
    * Determinism: the watermark after the replay is the corpus max
    * event time (0s delay), so exactly the sessions with
    * `(end + gap) // 1000 < watermark_ms` time out — both the
    * millisecond floor (timeouts and watermarks are ms-granular) and
    * the STRICT compare (`hasTimedOut` fires when the watermark
    * passes beyond the set timestamp) are replicated in the oracle;
    * any session still within gap of the corpus edge remains open and
    * is deliberately ABSENT from the output, exactly as in a live
    * deployment.
    */
  private def q140(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val ev = eventStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessionEvent]
    val closed = ev.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, events: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(uid, s.startUs, s.lastUs, s.n, "timeout"))
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
            val out = scala.collection.mutable.ListBuffer[ClosedSession]()
            var cur = state.getOption
            sorted.foreach { e =>
              cur match {
                case Some(s) if e.ts_us - s.lastUs > SessionGapUs =>
                  out += ClosedSession(uid, s.startUs, s.lastUs, s.n, "data")
                  cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
                case Some(s) =>
                  cur = Some(OpenSession(s.startUs, e.ts_us, s.n + 1L))
                case None =>
                  cur = Some(OpenSession(e.ts_us, e.ts_us, 1L))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp((s.lastUs + SessionGapUs) / 1000L)
            }
            out.iterator
          }
      }
    drain(spark, closed.toDF(), "append")
      .orderBy("user_id", "session_start_us")
  }

  private val q140Sql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
       |  FROM events),
       |g AS (
       |  SELECT user_id, ts_us,
       |         CASE WHEN ts_us - LAG(ts_us) OVER w > $SessionGapUs OR
       |                   LAG(ts_us) OVER w IS NULL
       |              THEN 1 ELSE 0 END AS is_start
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
       |isl AS (
       |  SELECT user_id, ts_us,
       |         SUM(is_start) OVER (PARTITION BY user_id ORDER BY ts_us
       |                             ROWS UNBOUNDED PRECEDING) AS island
       |  FROM g),
       |s AS (
       |  SELECT user_id, island,
       |         CAST(MIN(ts_us) AS BIGINT) AS session_start_us,
       |         CAST(MAX(ts_us) AS BIGINT) AS session_end_us,
       |         CAST(COUNT(*) AS BIGINT) AS n_events,
       |         CAST(MAX(island) OVER (PARTITION BY user_id) AS BIGINT) AS last_island
       |  FROM isl GROUP BY user_id, island),
       |wm AS (SELECT MAX(ts_us) // 1000 AS wm_ms FROM e)
       |SELECT user_id, session_start_us, session_end_us, n_events,
       |       CASE WHEN island = last_island THEN 'timeout' ELSE 'data' END AS closed_by
       |FROM s, wm
       |WHERE island < last_island
       |   OR (session_end_us + $SessionGapUs) // 1000 < wm_ms
       |ORDER BY user_id, session_start_us""".stripMargin

  /** q141 rolling-throttle TTL (2 days in micros). */
  private val ThrottleTtlUs = 2L * 86400L * 1000000L

  /** q141 — TTL-BOUNDED streaming state: per-(user, event_type)
    * notification throttling ("send at most one alert per key per
    * rolling [[ThrottleTtlUs]] window") where EventTimeTimeout evicts
    * idle keys so state size is bounded by the ACTIVE keyspace, not
    * the all-time one. This is the piece q140 doesn't show: there the
    * timeout CHANGES the answer (it closes sessions); here eviction is
    * provably semantics-free — state for a key whose last sent alert
    * is `ttl` behind the watermark can never suppress again (any
    * non-late event has `ts > watermark >= last_sent + ttl`, so the
    * greedy rule re-sends and re-seeds state identically), which is
    * exactly the argument that lets a 100 TB deployment keep
    * O(active keys) state over an unbounded stream. The timeout
    * branch emits NOTHING and just removes state.
    *
    * Semantics (greedy, event-time only, deterministic under any
    * micro-batching of the replay): per key in (ts, event_id) order,
    * an event is `sent` iff `ts >= last_sent + ttl` (or no prior
    * sent), else `suppressed`; `sent` advances `last_sent`. The
    * oracle replays the same recurrence as a DuckDB recursive CTE
    * over per-key row numbers (chain depth = events per key, ≤29 at
    * sf0.1, so the recursion is shallow however large the corpus).
    */
  private def q141(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventStream(spark, dir)
      .withWatermark("ts", "0 seconds")
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[ThrottleEvent]
    drain(spark, throttleDecisions(ev).toDF(), "append")
      .orderBy("user_id", "event_type", "ts_us", "event_id")
  }

  /** q141 core, exposed so TtlThrottleSpec can replay it multi-batch
    * (where the advancing watermark actually EVICTS state between
    * triggers) and assert the output is identical to the one-batch
    * run — the semantics-free-eviction property, executed.
    */
  private[streaming] def throttleDecisions(
      ev: org.apache.spark.sql.Dataset[ThrottleEvent]): org.apache.spark.sql.Dataset[ThrottleRow] = {
    import ev.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    ev.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[ThrottleState, ThrottleRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: (Long, String), events: Iterator[ThrottleEvent],
         state: GroupState[ThrottleState]) =>
          if (state.hasTimedOut) {
            // pure state-size control: evict, emit nothing
            state.remove()
            Iterator.empty
          } else {
            val sorted = events.toSeq.sortBy(e => (e.ts_us, e.event_id))
            var lastSent = state.getOption.map(_.lastSentUs)
            val out = sorted.map { e =>
              val send = lastSent.forall(ls => e.ts_us >= ls + ThrottleTtlUs)
              if (send) lastSent = Some(e.ts_us)
              ThrottleRow(key._1, key._2, e.event_id, e.ts_us,
                if (send) "sent" else "suppressed")
            }
            lastSent.foreach { ls =>
              state.update(ThrottleState(ls))
              // round UP to the next ms: timeouts are ms-granular, and
              // flooring could evict up to 999µs BEFORE last_sent+ttl —
              // exactly the sub-ms window that would break the
              // semantics-free-eviction invariant. Evicting late is
              // always safe (state lingers; decisions stay identical).
              state.setTimeoutTimestamp((ls + ThrottleTtlUs + 999L) / 1000L)
            }
            out.iterator
          }
      }
  }

  private val q141Sql =
    s"""WITH RECURSIVE e AS (
       |  SELECT user_id, event_type, event_id,
       |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
       |         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
       |                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS rn
       |  FROM events),
       |walk AS (
       |  SELECT user_id, event_type, event_id, ts_us, rn,
       |         ts_us AS last_sent, 'sent' AS action
       |  FROM e WHERE rn = 1
       |  UNION ALL
       |  SELECT e.user_id, e.event_type, e.event_id, e.ts_us, e.rn,
       |         CASE WHEN e.ts_us >= w.last_sent + $ThrottleTtlUs
       |              THEN e.ts_us ELSE w.last_sent END,
       |         CASE WHEN e.ts_us >= w.last_sent + $ThrottleTtlUs
       |              THEN 'sent' ELSE 'suppressed' END
       |  FROM e JOIN walk w
       |    ON e.user_id = w.user_id AND e.event_type = w.event_type
       |   AND e.rn = w.rn + 1)
       |SELECT user_id, event_type, event_id, ts_us, action
       |FROM walk ORDER BY user_id, event_type, ts_us, event_id""".stripMargin

  /** q154 — WATERMARK-BOUNDED streaming dedup:
    * `dropDuplicatesWithinWatermark` on (user_id, event_type). q62's
    * `dropDuplicates` keeps every key it has ever seen — state grows
    * with lifetime distinct keys, the thing that OOMs an unbounded
    * firehose. This variant drops a key's dedup entry once the
    * watermark passes its event time + the 2-day delay, so state is
    * proportional to the LAST TWO DAYS of traffic at any stream
    * length — the production shape for at-least-once ingestion where
    * duplicates arrive close to the original (retries, replays). The
    * documented trade: a duplicate arriving later than the delay
    * re-emits. Single-batch replay ⇒ no mid-stream eviction ⇒ result
    * equals global DISTINCT (the oracle); the eviction-then-re-emit
    * behavior and the within-delay suppression are pinned by
    * WatermarkDedupSpec's three-batch replay.
    *
    * Emitting only the KEY columns keeps the result independent of
    * which physical row wins the per-key race (q62 precedent).
    */
  private def q154(spark: SparkSession, dir: String): DataFrame = {
    val deduped = eventStream(spark, dir)
      .withWatermark("ts", "2 days")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
      .select(col("user_id"), col("event_type"))
    drain(spark, deduped, "append")
      .orderBy("user_id", "event_type")
  }

  private val q154Sql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** q173 — CHAINED STATEFUL operators (Spark 4 multi-stateful append
    * mode): watermark-bounded dedup feeding a tumbling-window
    * aggregate in ONE streaming query — daily active users per type,
    * where `dropDuplicatesWithinWatermark` on (user, type, day)
    * collapses each user's repeat events before the window count ever
    * sees them. Pre-3.4 Spark rejected this pipeline (one stateful op
    * per query); the chained form is the production shape because the
    * dedup state and the window state evict INDEPENDENTLY under the
    * shared watermark — neither grows with stream lifetime. The
    * surviving row per dedup key is whichever physical row won the
    * batch race, but its window assignment is deterministic anyway:
    * `day` is derived FROM ts, so every candidate row of a key lands
    * in the same window — the nondeterminism is quotiented out by
    * construction (the q154/q62 key-only lesson, extended to a
    * downstream consumer). Append-mode windows emit only once the
    * watermark (ms-floored max ts − 1 day) passes the window END; the
    * oracle replicates that cutoff, so the held-back trailing windows
    * are part of the checked contract (q159/q140 precedent).
    */
  private def q173(spark: SparkSession, dir: String): DataFrame = {
    val agg = eventStream(spark, dir)
      .withWatermark("ts", "1 day")
      .withColumn("day", date_trunc("day", col("ts")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "day")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_active"))
    drain(spark, agg, "append")
      .select(col("window.start").as("day"), col("event_type"), col("n_active"))
      .orderBy("day", "event_type")
  }

  private val q173Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, date_trunc('day', ts) AS day,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us
      |  FROM events),
      |wm AS (
      |  SELECT (MAX(ts_us) // 1000) * 1000 - 86400000000 AS wm_us FROM e),
      |d AS (SELECT DISTINCT user_id, event_type, day FROM e),
      |c AS (SELECT day, event_type, COUNT(*) AS n_active FROM d GROUP BY 1, 2)
      |SELECT CAST(day AS TIMESTAMP) AS day, event_type, n_active
      |FROM c, wm
      |WHERE epoch_us(day + INTERVAL 1 DAY) <= wm_us
      |ORDER BY day, event_type""".stripMargin

  /** q159 — stream-stream LEFT OUTER interval join: q65's attribution
    * join, but purchases with NO view in the preceding 24h must still
    * emit (with a null view_id) — the shape that distinguishes "no
    * match yet" from "no match ever", which only the watermark can
    * decide. A buffered purchase can emit its outer null only once
    * the global watermark guarantees no qualifying view can still
    * arrive (watermark > p_ts, since any future view has
    * v_ts ≥ watermark > p_ts ≥ required v_ts); Spark emits those
    * nulls in the post-data watermark-advance batch. Purchases above
    * the final watermark stay buffered and never emit an outer row —
    * the oracle mirrors that cutoff exactly (see the strict `<`
    * below), making the emission rule itself part of the checked
    * contract (q79/q140 precedent).
    */
  private def q159(spark: SparkSession, dir: String): DataFrame = {
    val views = eventStream(spark, dir)
      .filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts").as("v_ts"))
      .withWatermark("v_ts", "1 day")
    val purchases = eventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 day")
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("p_ts") >= col("v_ts") &&
        col("p_ts") <= col("v_ts") + expr("INTERVAL 1 DAY"),
      "left_outer")
    drain(spark, joined, "append")
      .select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"))
      .orderBy("user_id", "purchase_id", "view_id")
  }

  private val q159Sql =
    """WITH p AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'view'),
      |wm AS (SELECT LEAST((SELECT MAX(ts) FROM p), (SELECT MAX(ts) FROM v))
      |              - INTERVAL 1 DAY AS w),
      |matched AS (
      |  SELECT p.user_id, p.event_id AS purchase_id, v.event_id AS view_id
      |  FROM p JOIN v
      |    ON p.user_id = v.user_id
      |   AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))
      |       BETWEEN 0 AND 86400000000),
      |outer_null AS (
      |  SELECT p.user_id, p.event_id AS purchase_id, CAST(NULL AS BIGINT) AS view_id
      |  FROM p
      |  WHERE epoch_ms(CAST(p.ts AS TIMESTAMP)) < epoch_ms((SELECT w FROM wm))
      |    AND NOT EXISTS (
      |      SELECT 1 FROM v WHERE v.user_id = p.user_id
      |        AND epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(v.ts AS TIMESTAMP))
      |            BETWEEN 0 AND 86400000000))
      |SELECT user_id, purchase_id, view_id FROM matched
      |UNION ALL
      |SELECT user_id, purchase_id, view_id FROM outer_null
      |ORDER BY user_id, purchase_id, view_id""".stripMargin

  /** q163 — the Spark 4 `transformWithState` API (the successor to
    * `mapGroupsWithState`/`flatMapGroupsWithState`, q64/q139-q141):
    * a [[UserProfileProcessor StatefulProcessor]] keeps a per-user
    * profile in TYPED state primitives — two `ValueState[Long]`
    * (event count, exact cents) plus a `MapState[String, Long]` of
    * per-type counts, the state shape the older APIs force into one
    * monolithic case-class blob. MapState matters at scale: RocksDB
    * stores each map entry as its own key, so updating one
    * event-type counter rewrites ~16 bytes, not the whole profile
    * (drain() already pins the RocksDB provider, which
    * transformWithState requires). Each batch emits one summary row
    * per active user from final state — order-independent
    * aggregates and a (count, type) tie-break keep it deterministic
    * under any iterator order, so the single-batch replay is
    * oracle-exact and TwsProfileSpec's two-batch replay proves the
    * state actually carries.
    */
  private def q163(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = eventStream(spark, dir)
      .select(col("user_id"), col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
      .as[TwsEvent]
    drain(spark, transformedProfiles(ev).toDF(), "update")
      .orderBy("user_id")
  }

  /** The transformWithState pipeline behind q163 (shared with the
    * spec's multi-batch replay).
    */
  private[streaming] def transformedProfiles(
      ev: org.apache.spark.sql.Dataset[TwsEvent]): org.apache.spark.sql.Dataset[TwsProfileRow] = {
    import ev.sparkSession.implicits._
    ev.groupByKey(_.user_id)
      .transformWithState(new UserProfileProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Update())
  }

  private val q163Sql =
    """WITH tc AS (
      |  SELECT user_id, event_type, COUNT(*) AS cnt,
      |         CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS cents
      |  FROM events GROUP BY user_id, event_type),
      |ag AS (
      |  SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS n_events,
      |         CAST(COUNT(*) AS BIGINT) AS n_types,
      |         CAST(SUM(cents) AS BIGINT) AS value_cents, MAX(cnt) AS mx
      |  FROM tc GROUP BY user_id)
      |SELECT ag.user_id, ag.n_events, ag.n_types, ag.value_cents,
      |       MIN(tc.event_type) AS top_type, CAST(ag.mx AS BIGINT) AS top_n
      |FROM ag JOIN tc ON ag.user_id = tc.user_id AND tc.cnt = ag.mx
      |GROUP BY ag.user_id, ag.n_events, ag.n_types, ag.value_cents, ag.mx
      |ORDER BY ag.user_id""".stripMargin

  /** q250 — STREAMING INGESTION INTO THE LAKEHOUSE STORE: each
    * micro-batch of the event stream lands in the graft-manifest
    * table as an ATOMIC APPEND SNAPSHOT through the V2 commit
    * protocol, with the foreachBatch batchId as the commit's batch
    * tag — a REPLAYED batch (restart, retry) is detected at commit
    * time and skipped, so the store is exactly-once end to end
    * (q135's batch-id trick expressed inside the source's own commit
    * path; ManifestStreamIngestSpec forces the replay and proves
    * counts don't move). After the drain, the query answers from the
    * final snapshot; the ORACLE answers from the raw events table —
    * the hash gate certifies the whole stream→snapshot-chain→read
    * pipeline reassembled the data exactly. Money in cents, time in
    * epoch micros (store house rules).
    */
  private def q250(spark: SparkSession, dir: String): DataFrame = {
    val store = java.nio.file.Files.createTempDirectory("graft_q250_store").toString
    val ck = java.nio.file.Files.createTempDirectory("graft_q250_ck").toString
    val src = eventStream(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val q = src.writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId, store)
      }
      .start()
    q.processAllAvailable()
    q.stop()
    val result = spark.read.format("graft-manifest").option("path", store).load()
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n_events"), sum(col("price_cents")).as("value_cents"),
        min(col("ship_us")).as("first_us"), max(col("ship_us")).as("last_us"))
      .orderBy(col("flag"))
      .localCheckpoint()
    Seq(store, ck).foreach { d =>
      scala.util.Try(org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d)))
    }
    result
  }

  /** One micro-batch → one tagged append snapshot (exposed so the
    * spec can force a replay of an already-committed batch).
    */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long, store: String): Unit =
    batch.select(
        col("event_id").cast("long").as("ok"),
        unix_micros(col("ts").cast("timestamp")).as("ship_us"),
        col("event_type").as("flag"),
        lit(1L).as("qty"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("price_cents"))
      .write.format("graft-manifest").option("path", store)
      .option("batchtag", batchId.toString)
      .mode("append").save()

  private val q250Sql =
    """SELECT event_type AS flag, CAST(COUNT(*) AS BIGINT) AS n_events,
      |       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
      |         AS value_cents,
      |       CAST(MIN(epoch_us(ts)) AS BIGINT) AS first_us,
      |       CAST(MAX(epoch_us(ts)) AS BIGINT) AS last_us
      |FROM events
      |GROUP BY 1
      |ORDER BY flag""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q60_stream_daily",   q60, Some(q60Sql), headline = true),
    QuerySpec("q61_stream_sliding", q61, Some(q61Sql)),
    QuerySpec("q62_stream_dedup",   q62, Some(q62Sql)),
    QuerySpec("q63_session_window", q63, Some(q63Sql), headline = true),
    QuerySpec("q64_stateful_running", q64, Some(q64Sql), headline = true),
    QuerySpec("q65_stream_join",    q65, Some(q65Sql), headline = true),
    QuerySpec("q79_stream_pipeline", q79, Some(q79Sql), headline = true),
    QuerySpec("q85_stream_static_join", q85, Some(q85Sql)),
    QuerySpec("q102_stream_heavy_hitters", q102, Some(q102Sql)),
    QuerySpec("q113_stream_decontam", q113, Some(q113Sql)),
    QuerySpec("q118_stream_anomaly", q118, Some(q118Sql)),
    QuerySpec("q135_stream_etl_store", q135, Some(q135Sql)),
    QuerySpec("q188_stream_cdc_merge", q188, Some(q188Sql)),
    QuerySpec("q136_gap_fill", q136, Some(q136Sql)),
    QuerySpec("q139_user_state_machine", q139, Some(q139Sql)),
    QuerySpec("q173_chained_stateful", q173, Some(q173Sql)),
    QuerySpec("q140_session_close_timeout", q140, Some(q140Sql)),
    QuerySpec("q141_ttl_throttle", q141, Some(q141Sql)),
    QuerySpec("q154_stream_dedup_watermark", q154, Some(q154Sql)),
    QuerySpec("q159_stream_outer_join", q159, Some(q159Sql)),
    QuerySpec("q163_transform_with_state", q163, Some(q163Sql)),
    QuerySpec("q250_stream_lakehouse_ingest", q250, Some(q250Sql)),
  )
}

/** q139 typed-API records (product encoders). */
private[streaming] case class UserEvent(
  user_id: Long, event_id: Long, ts_us: Long, is_purchase: Int)
private[streaming] case class UserLifetimeState(
  nEvents: Long, nSessions: Long, nPurchases: Long,
  firstTsUs: Long, lastTsUs: Long, maxGapUs: Long)
private[streaming] case class UserLifetimeRow(
  user_id: Long, n_events: Long, n_sessions: Long, n_purchases: Long,
  first_ts_us: Long, last_ts_us: Long, max_gap_us: Long)

/** q140 typed-API records. `SessionEvent.ts` keeps the watermarked
  * timestamp column alive through the typed projection.
  */
private[streaming] case class SessionEvent(
  user_id: Long, event_id: Long, ts: java.sql.Timestamp, ts_us: Long)
private[streaming] case class OpenSession(startUs: Long, lastUs: Long, n: Long)

/** q141 typed-API records. `ThrottleEvent.ts` keeps the watermarked
  * column alive through the typed projection (q140 precedent).
  */
private[streaming] case class ThrottleEvent(
  user_id: Long, event_type: String, event_id: Long,
  ts: java.sql.Timestamp, ts_us: Long)
private[streaming] case class ThrottleState(lastSentUs: Long)
private[streaming] case class ThrottleRow(
  user_id: Long, event_type: String, event_id: Long, ts_us: Long,
  action: String)
private[streaming] case class ClosedSession(
  user_id: Long, session_start_us: Long, session_end_us: Long,
  n_events: Long, closed_by: String)

/** q163 typed-API records. */
private[streaming] case class TwsEvent(
  user_id: Long, event_type: String, cents: Long)
private[streaming] case class TwsProfileRow(
  user_id: Long, n_events: Long, n_types: Long, value_cents: Long,
  top_type: String, top_n: Long)

/** q163's `StatefulProcessor`: per-user profile split across typed
  * state primitives — two ValueState counters plus a MapState of
  * per-event-type counts (each map entry is its own store key under
  * RocksDB, so one counter update never rewrites the whole profile).
  * Emits one summary row per user per batch from final state; every
  * aggregate is order-independent and the top-type pick breaks ties
  * to the lexicographically smallest type, so emissions are
  * deterministic under any input-iterator order.
  */
private[streaming] class UserProfileProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, TwsEvent, TwsProfileRow] {
  import org.apache.spark.sql.streaming.{MapState, TTLConfig, ValueState}
  import org.apache.spark.sql.{Encoders => E}

  @transient private var total: ValueState[Long] = _
  @transient private var cents: ValueState[Long] = _
  @transient private var byType: MapState[String, Long] = _

  override def init(
      outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit = {
    total  = getHandle.getValueState[Long]("n_events", E.scalaLong, TTLConfig.NONE)
    cents  = getHandle.getValueState[Long]("cents", E.scalaLong, TTLConfig.NONE)
    byType = getHandle.getMapState[String, Long]("by_type", E.STRING, E.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[TwsEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[TwsProfileRow] = {
    var n = if (total.exists()) total.get() else 0L
    var c = if (cents.exists()) cents.get() else 0L
    rows.foreach { e =>
      n += 1
      c += e.cents
      val cur = if (byType.containsKey(e.event_type)) byType.getValue(e.event_type) else 0L
      byType.updateValue(e.event_type, cur + 1L)
    }
    total.update(n)
    cents.update(c)
    var nTypes = 0L
    var topType = ""
    var topN = -1L
    byType.iterator().foreach { case (t, cnt) =>
      nTypes += 1
      if (cnt > topN || (cnt == topN && t < topType)) { topType = t; topN = cnt }
    }
    Iterator.single(TwsProfileRow(key, n, nTypes, c, topType, topN))
  }
}
