package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** q281's event fold ([[StreamIngest.ingestEventFeed]]): the
  * CDC-feed-driven dup-cluster maintenance must
  *
  *   1. SPLIT a cluster when its bridge doc is deleted through the
  *      feed (the q276 delete algebra, streaming) — a connected
  *      component is not closed under vertex removal, so the fold
  *      must re-derive labels from the maintained PAIR state, never
  *      from the old labels;
  *   2. compose an UPDATE as preimage-delete + postimage-insert: an
  *      updated doc leaves its old cluster (tombstoned index rows)
  *      and joins the cluster its new text belongs to;
  *   3. be TRIGGER-BATCHING INVARIANT — one feed generation per
  *      trigger equals the whole feed in one trigger, because events
  *      apply grouped by feed gen ascending within a trigger;
  *   4. be COMPACTION-CADENCE INVARIANT — folding the overlay stack
  *      and applying tombstones physically changes no visible row.
  *
  * Texts reuse [[StreamIngestSpec]]'s planted geometry: A and B share
  * J = 1/3 (below the 0.5 accept), bridge D has J = 0.6 to each.
  * The real-corpus loop (manifest store DML → file-set-diff feed →
  * fold == scratch-over-final-corpus) is pinned tri-SF by the q281
  * DuckDB oracle gate.
  */
class CdcIndexLoopSpec extends SparkSpec {

  private val words = (1 to 14).map(i => s"w$i")
  private def line(from: Int, until: Int): String =
    words.slice(from - 1, until).mkString(" ")
  private val textA = line(1, 10)
  private val textB = line(5, 14)
  private val textD = line(3, 12)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  /** (gen, change_type, doc_id, text) rows in the staged-feed shape
    * (round 16: the text rides its own typed column; `flag` carries
    * the source name).
    */
  private def events(rows: (Int, String, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("gen", "change_type", "ok", "text")
      .select(col("gen"), col("change_type"), col("ok"),
        col("ok").as("ship_us"), lit("spec").as("flag"),
        length(col("text")).cast("long").as("qty"), lit(0L).as("price_cents"),
        col("text"))
  }

  /** Stage one parquet file per feed generation, mtimes ascending. */
  private def stage(gens: Seq[DataFrame]): Path = {
    val dir = Files.createTempDirectory("graft_q281_spec")
    gens.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory("graft_q281_part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = dir.resolve(f"g$i%02d.parquet")
      Files.move(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    dir
  }

  private val bootstrap = Seq(
    1L -> textA, 2L -> textA, 5L -> textB, 6L -> textB, 9L -> textD)

  private val feed = Seq(
    // gen 1: delete the bridge — {1,2,5,6,9} must SPLIT to {1,2} + {5,6}
    events((1, "delete", 9L, textD)),
    // gen 2: update 6 from B-text to A-text — 6 moves clusters,
    // 5 becomes a singleton
    events((2, "update_preimage", 6L, textB), (2, "update_postimage", 6L, textA)),
    // gen 3: insert 20 with B-text — pairs with the now-singleton 5
    events((3, "insert", 20L, textB)))

  private val expected = Map(
    1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 6L -> ((1L, 3L)),
    5L -> ((5L, 2L)), 20L -> ((5L, 2L)))

  private def run(filesPerTrigger: Int, compactEvery: Int)
      : (Map[Long, (Long, Long)], StreamIngest.EventRun) = {
    val dir = stage(feed)
    try {
      val r = StreamIngest.ingestEventFeed(spark, dir.toString,
        docs(bootstrap: _*), filesPerTrigger, compactEvery)
      (r.assign.collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap, r)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("fixture geometry: A-B below the accept threshold, D bridges both") {
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def j(a: Set[String], b: Set[String]) = a.intersect(b).size.toDouble / a.union(b).size
    assert(j(sh(textA), sh(textB)) < 0.5)
    assert(j(sh(textD), sh(textA)) >= 0.5 && j(sh(textD), sh(textB)) >= 0.5)
  }

  test("delete splits, update moves, insert re-pairs — per-generation triggers") {
    val (got, r) = run(filesPerTrigger = 1, compactEvery = 99)
    assert(r.nGens == 4, s"bootstrap + 3 feed generations, got ${r.nGens}")
    assert(got == expected, s"got $got, want $expected")
  }

  test("trigger-batching invariance: whole feed in one trigger folds identically") {
    val (got, r) = run(filesPerTrigger = 3, compactEvery = 99)
    assert(r.nGens == 4)
    assert(got == expected,
      s"gens must apply in feed order within the trigger: $got")
  }

  test("compaction-cadence invariance: fold after every generation, same rows") {
    val (got, r) = run(filesPerTrigger = 1, compactEvery = 1)
    assert(r.nCompactions >= 2, s"expected repeated compactions, got ${r.nCompactions}")
    assert(r.depths.forall(_ <= 1), s"stack must re-bound to 1 each time: ${r.depths}")
    assert(got == expected,
      s"compaction + physical tombstone apply must preserve the resolution: $got")
  }

  private def runFused(gens: Seq[DataFrame], boot: Seq[(Long, String)])
      : (Map[Long, (Long, Long)], StreamIngest.EventRun) = {
    val dir = stage(gens)
    try {
      val r = StreamIngest.ingestEventFeed(spark, dir.toString,
        docs(boot: _*), filesPerTrigger = gens.size, compactEvery = 99,
        fuseTrigger = true)
      (r.assign.collect()
        .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap, r)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("fused trigger: whole feed as ONE net-event pass folds identically") {
    val (got, r) = runFused(feed, bootstrap)
    assert(r.nGens == 4, s"feed generations still count through fusion: ${r.nGens}")
    // bootstrap pass + one fused pass = exactly two overlay writes
    assert(r.depths == Seq(1, 2), s"one fused maintenance pass, got ${r.depths}")
    assert(got == expected, s"fused fold must equal per-generation fold: $got")
  }

  test("fused trigger: in-trigger insert-then-delete and delete-then-reinsert net out") {
    // gen 1 inserts 30 (A-text) and deletes 5; gen 2 deletes 30 again
    // and re-inserts 5 with D-text. Net: 30 never lives, 5 is an
    // update to D-text — final corpus {1,2}A, {6}B?? — recompute:
    // bootstrap {1,2}=A, {5,6}=B, 9=D bridges all five.
    // net del={5,30}, ins={5:D}. Final corpus: 1,2=A; 6=B; 9=D; 5=D.
    // D bridges A and B, so everything is ONE cluster again.
    val interleaved = Seq(
      events((1, "insert", 30L, textA), (1, "delete", 5L, textB)),
      events((2, "delete", 30L, textA), (2, "insert", 5L, textD)))
    val (got, _) = runFused(interleaved, bootstrap)
    val want = Map(
      1L -> ((1L, 5L)), 2L -> ((1L, 5L)), 5L -> ((1L, 5L)),
      6L -> ((1L, 5L)), 9L -> ((1L, 5L)))
    assert(got == want, s"net-event fusion mis-folded the interleaving: $got")
    assert(!got.contains(30L), "a doc inserted and deleted in-trigger never lives")
  }
}
