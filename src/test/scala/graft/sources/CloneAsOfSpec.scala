package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shallow clone ([[ManifestSource.cloneShallow]]) and TIMESTAMP AS
  * OF (`manifest = asof:<ms>` over the timed commit log) on the
  * planted 12-row store. Pins:
  *   - a clone copies ZERO data files, reads byte-identically to the
  *     source pin, and answers stats-backed aggregates from metadata
  *     (every per-file statistic traveled with the entries);
  *   - DML isolation both ways: a merge on the clone rewrites LOCAL
  *     files and never touches the source; a delete on the source
  *     leaves the clone reading the immutable pre-delete files;
  *   - a clone of a masked snapshot applies the masks (dv refs
  *     re-based relatively);
  *   - the documented hazard: a SOURCE vacuum that collects files the
  *     clone references breaks the clone LOUDLY;
  *   - asof resolution: between-commit timestamps select the earlier
  *     commit, exact timestamps select their commit, pre-history
  *     fails loudly, and the asof read equals the version pin.
  */
class CloneAsOfSpec extends SparkSpec {

  private def plant(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_clone_src").toString
    (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def freshDst(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_clone_dst").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def load(root: String, pin: Option[String] = None): DataFrame = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load()
  }

  private def keys(root: String, pin: Option[String] = None): Set[Long] =
    load(root, pin).select(col("ok")).collect().map(_.getLong(0)).toSet

  private def cleanup(roots: String*): Unit = roots.foreach(r =>
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(r))))

  test("zero-copy clone: no data files, identical reads, stats answered from carried metadata") {
    val src = plant()
    val dst = freshDst()
    try {
      ManifestSource.cloneShallow(src, dst)
      assert(!new java.io.File(dst).listFiles().exists(_.getName.startsWith("part-")),
        "a shallow clone must copy zero data files")
      assert(keys(dst) == (1L to 12L).toSet)
      val n = load(dst).agg(count(lit(1))).head.getLong(0)
      assert(n == 12L)
      assert(ManifestScan.lastPlanned._1 == 0,
        "the clone must answer COUNT from its carried per-file stats")
    } finally cleanup(src, dst)
  }

  test("DML isolation both ways; source vacuum breaks the clone loudly") {
    val src = plant()
    val dst = freshDst()
    try {
      ManifestSource.cloneShallow(src, dst)
      // merge on the CLONE: local rewrite, source untouched
      ManifestSource.merge(spark, dst, Seq((5L, 5000L, "U", 5L, 999L)))
      assert(load(dst).filter(col("ok") === 5L).head.getString(2) == "U")
      assert(load(src).filter(col("ok") === 5L).head.getString(2) == "A",
        "a clone's merge must never leak into the source")
      // delete on the SOURCE: clone keeps reading the immutable
      // pre-delete files it references
      ManifestSource.deleteKeys(spark, src, Seq(9L))
      assert(keys(src) == (1L to 12L).toSet - 9L)
      assert(keys(dst) == (1L to 12L).toSet,
        "the clone references the pre-delete files — still all 12 rows")
      // the documented hazard: source vacuum collects the pre-delete
      // file the clone references — the clone fails LOUDLY
      ManifestSource.vacuum(src)
      intercept[Exception] { load(dst).collect() }
    } finally cleanup(src, dst)
  }

  test("a clone of a masked snapshot applies the masks") {
    val src = plant()
    val dst = freshDst()
    try {
      ManifestSource.deleteKeysMoR(src, Seq(5L))
      ManifestSource.cloneShallow(src, dst)
      assert(keys(dst) == (1L to 12L).toSet - 5L,
        "dv refs must re-base relatively and mask in the clone")
    } finally cleanup(src, dst)
  }

  test("asof: boundaries, loud pre-history failure, identity with the version pin") {
    val src = plant()
    try {
      def tick(): Unit = {
        val t = System.currentTimeMillis()
        while (System.currentTimeMillis() <= t) Thread.sleep(1)
      }
      tick()
      ManifestSource.deleteKeys(spark, src, Seq(5L))
      tick()
      ManifestSource.deleteKeys(spark, src, Seq(9L))
      val log = ManifestSource.readCommitLogTimed(src)
      assert(log.size == 3 && log.map(_._2).distinct.size == 3)
      val Seq((m0, t0), (m1, t1), (_, t2)) = log
      assert(keys(src, Some(s"asof:$t0")) == (1L to 12L).toSet)
      // between commits → the earlier snapshot
      assert(keys(src, Some(s"asof:${t1 - 1}")) == (1L to 12L).toSet)
      assert(keys(src, Some(s"asof:$t1")) == (1L to 12L).toSet - 5L)
      assert(keys(src, Some(s"asof:${t2 + 1000}")) == (1L to 12L).toSet -- Set(5L, 9L))
      intercept[IllegalArgumentException] {
        ManifestSource.resolveManifest(src, Some(s"asof:${t0 - 1}"))
      }
      // asof ≡ the version pin it resolves to
      assert(keys(src, Some(s"asof:$t1")) == keys(src, Some(m1)))
      assert(ManifestSource.resolveManifest(src, Some(s"asof:$t0")) == m0)
    } finally cleanup(src)
  }

  test("commit timestamps clamp monotone across a wall-clock step backwards") {
    val src = plant()
    try {
      // simulate a clock step: hand-write a log line stamped in the
      // future, then commit normally — the new line must clamp to it,
      // keeping asof's filter-by-ts-take-last resolution sound
      val future = System.currentTimeMillis() + 3600000L
      val cur = ManifestSource.resolveManifest(src, None)
      val w = new java.io.FileWriter(new java.io.File(src, "commits.log"), true)
      try w.write(s"$cur,$future,commit,=\n") finally w.close()
      ManifestSource.deleteKeys(spark, src, Seq(5L))
      val ts = ManifestSource.readCommitLogTimed(src).map(_._2)
      assert(ts == ts.sorted, s"commit timestamps must be nondecreasing, got $ts")
      assert(ts.last >= future, "the post-step commit must clamp up to the last logged ts")
    } finally cleanup(src)
  }
}
