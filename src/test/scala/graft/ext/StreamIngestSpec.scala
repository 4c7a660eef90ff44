package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** q263: the streaming ingest fold must be micro-batch-invariant
  * (1-file-per-trigger == all-at-once — every ingredient of the fold
  * is order-invariant, see [[StreamIngest]]'s scaladoc) and the
  * cross-batch MERGE path — a late-arriving doc bridging two clusters
  * formed in two EARLIER batches — must relabel both clusters to the
  * global min through the maintained band index, never a corpus
  * rescan. The driver corpus has no such bridge at any SF (near-dup
  * pairs are planted pairwise), so the merge runs on a planted
  * fixture; the real-corpus `fold == scratch` identity is pinned by
  * the tri-SF DuckDB oracle gate.
  *
  * Planted texts are consecutive windows over a shared word line:
  * A = w1..w10 and B = w5..w14 share 4 of 12 distinct 3-shingles
  * (J = 1/3, below the 0.5 accept), while bridge D = w3..w12 has
  * J = 0.6 to each — D must merge A's and B's clusters while A-B
  * alone must not. Banding is deterministic (md5): the fixture was
  * validated to produce both D-A and D-B band candidates.
  */
class StreamIngestSpec extends SparkSpec {

  private val words = (1 to 14).map(i => s"w$i")
  private def line(from: Int, until: Int): String =
    words.slice(from - 1, until).mkString(" ")

  private val textA = line(1, 10)
  private val textB = line(5, 14)
  private val textD = line(3, 12)

  private def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("planted").as("source"), length(col("text")).cast("long").as("n_chars"))
  }

  /** Stage each frame as ONE parquet file with ascending mtimes so the
    * file stream's modification-time ordering delivers them as
    * batch 1, 2, 3 under maxFilesPerTrigger=1.
    */
  private def stage(batches: Seq[DataFrame]): Path = {
    val dir = Files.createTempDirectory("graft_q263_spec")
    batches.zipWithIndex.foreach { case (df, i) =>
      val tmp = Files.createTempDirectory("graft_q263_part")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = tmp.toFile.listFiles().filter(_.getName.endsWith(".parquet")).head
      val dst = dir.resolve(f"b$i%02d.parquet")
      Files.move(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(1700000000000L + i * 60000L))
      org.apache.commons.io.FileUtils.deleteDirectory(tmp.toFile)
    }
    dir
  }

  private def run(dir: Path, filesPerTrigger: Int)
      : (Map[Long, (Long, Long)], StreamIngest.IngestRun) = {
    val r = StreamIngest.ingestClusters(spark, dir.toString, filesPerTrigger, trackSizes = true)
    (r.assign.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap, r)
  }

  test("fixture geometry: A-B below the accept threshold, D bridges both") {
    def sh(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    def j(a: Set[String], b: Set[String]) = a.intersect(b).size.toDouble / a.union(b).size
    assert(j(sh(textA), sh(textB)) < 0.5, "A-B must NOT be near-dups")
    assert(j(sh(textD), sh(textA)) >= 0.5 && j(sh(textD), sh(textB)) >= 0.5,
      "D must be a near-dup of both A and B")
  }

  test("cross-batch merge: a batch-3 doc bridges clusters built in batches 1 and 2") {
    val dir = stage(Seq(
      // batch 1 → cluster {1,2} label 1, plus untouched bystander 3
      docs(1L -> textA, 2L -> textA,
        3L -> "totally separate bystander content never touched again"),
      docs(5L -> textB, 6L -> textB),   // batch 2 → cluster {5,6} label 5
      docs(9L -> textD, 11L -> "solo doc with its own words entirely")))
    try {
      val (got, r) = run(dir, filesPerTrigger = 1)
      assert(r.nBatches == 3, s"expected 3 micro-batches, got ${r.nBatches}")
      // D bridges A's and B's clusters through the maintained band
      // index — all five docs collapse to the global min label 1
      Seq(1L, 2L, 5L, 6L, 9L).foreach { id =>
        assert(got(id) == ((1L, 5L)), s"doc $id: got ${got(id)}, want (1,5)")
      }
      assert(got(3L) == ((3L, 1L)), "bystander stays a singleton")
      assert(got(11L) == ((11L, 1L)), "edge-free doc stays a singleton")
      // KEPT-BY-REFERENCE: each trigger's assignment write (overlay)
      // covers ONLY the arriving batch plus the member rows of the
      // clusters it touches. Trigger 3 (2 batch docs, bridging the
      // 2-doc clusters {1,2} and {5,6}) must rewrite 2 + 4 = 6 rows —
      // NOT the 7-doc corpus: bystander doc 3 is never re-written
      // after its own arrival.
      assert(r.batchRows == Seq(3L, 2L, 2L), s"batch rows: ${r.batchRows}")
      assert(r.overlayRows == Seq(3L, 2L, 6L),
        s"overlay must rewrite only batch + touched clusters: ${r.overlayRows}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  private val mergeBatches = Seq(
    // batch 1 → cluster {1,2} label 1, plus untouched bystander 3
    (1L -> textA) :: (2L -> textA) ::
      (3L -> "totally separate bystander content never touched again") :: Nil,
    (5L -> textB) :: (6L -> textB) :: Nil, // batch 2 → cluster {5,6} label 5
    (9L -> textD) :: (11L -> "solo doc with its own words entirely") :: Nil)

  test("log-structured compaction: depth bounded by k, resolution preserved " +
      "across the boundary, write sizes between compactions unchanged") {
    val d1 = stage(mergeBatches.map(b => docs(b: _*)))
    val d2 = stage(mergeBatches.map(b => docs(b: _*)))
    try {
      // compactEvery=2: the stack folds after trigger 2, so the
      // trigger-3 bridge must find cluster membership in the
      // COMPACTED base — the hardest path (the pre-compaction
      // per-generation rows are gone)
      val r2 = StreamIngest.ingestClusters(spark, d1.toString, 1,
        trackSizes = true, compactEvery = 2)
      val rN = StreamIngest.ingestClusters(spark, d2.toString, 1,
        trackSizes = true, compactEvery = 99)
      assert(r2.nCompactions == 1 && rN.nCompactions == 0)
      // depth after each trigger: fold re-bounds the stack to 1
      assert(r2.depths == Seq(1, 1, 2), s"depths: ${r2.depths}")
      assert(rN.depths == Seq(1, 2, 3), s"depths: ${rN.depths}")
      assert(r2.depths.forall(_ <= 2), "stack depth must stay <= compactEvery")
      // a compaction changes no visible row: final assignments are
      // row-identical with and without it — including the post-
      // compaction merge relabel
      def m(r: StreamIngest.IngestRun): Map[Long, (Long, Long)] =
        r.assign.collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
      val (a2, aN) = (m(r2), m(rN))
      assert(a2 == aN, s"compaction must preserve the resolution: $a2 vs $aN")
      assert(a2(9L) == ((1L, 5L)), "bridge must merge through the compacted base")
      // kept-by-reference write sizes hold on BOTH cadences: trigger 3
      // rewrites batch(2) + touched clusters(4), never the corpus
      assert(r2.overlayRows == Seq(3L, 2L, 6L), s"overlay rows: ${r2.overlayRows}")
      assert(rN.overlayRows == Seq(3L, 2L, 6L), s"overlay rows: ${rN.overlayRows}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(d1.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(d2.toFile)
    }
  }

  test("point-lookup probe over base + tail equals the full resolution") {
    val dir = stage(mergeBatches.map(b => docs(b: _*)))
    try {
      val r = StreamIngest.ingestClusters(spark, dir.toString, 1,
        trackSizes = false, compactEvery = 2)
      assert(r.stack.size == 2, "expected compacted base + one tail overlay")
      val probe = StreamIngest.probeAssignment(r.stack, Seq(1L, 3L, 5L, 9L))
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      // full resolution ground truth from the run's own assignment
      val full = r.assign.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(probe == Seq(1L, 3L, 5L, 9L).map(id => id -> full(id)).toMap,
        s"probe must equal the full resolution on the probed ids: $probe")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir.toFile)
  }

  test("micro-batch invariance: 1-file-per-trigger equals all-at-once") {
    val batches = Seq(
      docs(1L -> textA, 2L -> textA),
      docs(5L -> textB, 6L -> textB),
      docs(9L -> textD, 11L -> "another unrelated text here"))
    val d1 = stage(batches)
    val d2 = stage(batches)
    try {
      val (perFile, r1) = run(d1, filesPerTrigger = 1)
      val (allAtOnce, r2) = run(d2, filesPerTrigger = 3)
      assert(r1.nBatches == 3 && r2.nBatches == 1)
      assert(perFile == allAtOnce,
        s"fold must be batching-invariant: $perFile vs $allAtOnce")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(d1.toFile)
      org.apache.commons.io.FileUtils.deleteDirectory(d2.toFile)
    }
  }
}
