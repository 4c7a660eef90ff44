package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** JOIN-STRATEGY DML — the DataFrame-source verbs
  * ([[ManifestSource.mergeDF]], [[ManifestSource.deleteKeysDF]],
  * [[ManifestSource.deleteKeysMoRDF]]) that remove the driver-held
  * bounded-batch contract. Pins:
  *   - content equivalence with the Seq paths on the same batch;
  *   - the rewrite is a REAL distributed join (shuffle join in the
  *     executed plan when broadcast is disabled — no driver
  *     materialization of the source anywhere);
  *   - conflict classification matches the Seq path's classes: a
  *     concurrent append that may share keys conflicts, a provably
  *     disjoint one rebases with both effects landing;
  *   - merge-on-read over a masked store: an update key whose row is
  *     masked resurrects via the insert arm;
  *   - extension columns are target-carried through a DF merge;
  *   - DF MoR delete is metadata-only with one executor-written
  *     sidecar per candidate file holding only that file's probing
  *     keys.
  */
class DmlDataFrameSpec extends SparkSpec {
  import spark.implicits._

  private def plant(nFiles: Int = 3, n: Long = 12L): String = {
    val root = java.nio.file.Files.createTempDirectory("graft_dmldf").toString
    (1L to n).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(nFiles, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def table(root: String) = spark.read.format("graft-manifest")
    .option("path", root).load()

  private def content(root: String): Set[Seq[Any]] =
    table(root).collect().map(_.toSeq).toSet

  private def cleanup(roots: String*): Unit = roots.foreach(r =>
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(r))))

  test("mergeDF == merge(Seq) on the same batch; insert count exact") {
    val a = plant(); val b = plant()
    try {
      val batch = Seq((5L, 5000L, "U", 5L, 999L), (9L, 9000L, "U", 9L, 888L),
        (100L, 50000L, "N", 1L, 5L))
      ManifestSource.merge(spark, a, batch)
      val (_, _, ins, _) = ManifestSource.mergeDF(spark, b,
        batch.toDF("ok", "ship_us", "flag", "qty", "price_cents"))
      assert(ins == 1L, "exactly the unmatched source row inserts")
      assert(content(a) == content(b),
        "the DataFrame path must land exactly where the Seq path does")
    } finally cleanup(a, b)
  }

  test("deleteKeysDF == deleteKeys(Seq); deleted count exact; dup keys harmless") {
    val a = plant(); val b = plant()
    try {
      ManifestSource.deleteKeys(spark, a, Seq(5L, 9L))
      val (_, _, del, _) = ManifestSource.deleteKeysDF(spark, b,
        Seq(5L, 9L, 9L, 77L).toDF("ok")) // dup + miss both harmless
      assert(del == 2L, s"exactly two rows match, got $del")
      assert(content(a) == content(b))
    } finally cleanup(a, b)
  }

  test("the rewrite is a distributed shuffle join — no driver materialization of the source") {
    val root = plant()
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        ManifestSource.mergeDF(spark, root,
          Seq((5L, 5000L, "U", 5L, 999L), (100L, 50000L, "N", 1L, 5L))
            .toDF("ok", "ship_us", "flag", "qty", "price_cents"))
        val plan = ManifestSource.lastDmlPlan
        assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
          s"with broadcast disabled the merge must shuffle-join, got:\n$plan")
        assert(plan.contains("FullOuter") || plan.contains("full_outer") ||
          plan.contains("FullOuterJoin"),
          s"merge joins full-outer (carry + update + insert in one pass):\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally cleanup(root)
  }

  test("conflict classes match the Seq path: key-overlapping append conflicts, disjoint rebases") {
    val root = plant()
    try {
      val m0 = ManifestSource.resolveManifest(root, None)
      // concurrent append lands AFTER the merge read its base
      (Seq((5L, 99000L, "X", 1L, 1L)).toDF("ok", "ship_us", "flag", "qty", "price_cents"))
        .coalesce(1).write.format("graft-manifest").option("path", root)
        .mode("append").save()
      intercept[ManifestSource.CommitConflictException] {
        ManifestSource.mergeDF(spark, root,
          Seq((5L, 5000L, "U", 5L, 999L)).toDF("ok", "ship_us", "flag", "qty", "price_cents"),
          base = Some(m0))
      }
      // a provably disjoint concurrent append rebases: both effects land
      val m1 = ManifestSource.resolveManifest(root, None)
      (Seq((300L, 70000L, "Z", 3L, 3L)).toDF("ok", "ship_us", "flag", "qty", "price_cents"))
        .coalesce(1).write.format("graft-manifest").option("path", root)
        .mode("append").save()
      ManifestSource.mergeDF(spark, root,
        Seq((6L, 6000L, "U", 6L, 777L)).toDF("ok", "ship_us", "flag", "qty", "price_cents"),
        base = Some(m1))
      val c = content(root)
      assert(c.exists(r => r.head == 300L), "the concurrent append must survive the rebase")
      assert(c.exists(r => r.head == 6L && r(4) == 777L), "the merge update must land")
    } finally cleanup(root)
  }

  test("merge over a masked store: a key hitting only masked rows resurrects via the insert arm") {
    val root = plant()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L))
      val (_, _, ins, _) = ManifestSource.mergeDF(spark, root,
        Seq((5L, 5100L, "R", 50L, 111L)).toDF("ok", "ship_us", "flag", "qty", "price_cents"))
      assert(ins == 1L, "a fully-masked target key must take the insert arm")
      val r5 = table(root).filter(col("ok") === 5L).collect()
      assert(r5.length == 1 && r5(0).getString(2) == "R" && r5(0).getLong(4) == 111L,
        "the resurrected row carries the source values")
    } finally cleanup(root)
  }

  test("extension columns are target-carried: updates keep extras, inserts surface null") {
    val root = plant()
    try {
      ManifestSource.addColumn(root, "score")
      (Seq((50L, 20000L, "E", 5L, 55L, 7L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score"))
        .coalesce(1).write.format("graft-manifest").option("path", root)
        .mode("append").save()
      ManifestSource.mergeDF(spark, root,
        Seq((50L, 20000L, "U", 5L, 550L), (200L, 60000L, "N", 2L, 6L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents"))
      val rows = table(root).filter(col("ok").isin(50L, 200L))
        .select(col("ok"), col("flag"), col("price_cents"), col("score"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSet
      assert(rows == Set((50L, "U", 550L, Some(7L)), (200L, "N", 6L, None)),
        s"update keeps the target's extras, insert is null, got $rows")
    } finally cleanup(root)
  }

  test("DF MoR delete: metadata-only, one sidecar per candidate file with only its probing keys") {
    val root = plant()
    try {
      val before = ManifestSource.readManifest(root,
        ManifestSource.resolveManifest(root, None))
      val (masked, total, sidecars, m) = ManifestSource.deleteKeysMoRDF(spark, root,
        Seq(5L, 9L).toDF("ok"))
      assert(masked >= 1 && masked <= total && sidecars.nonEmpty)
      val after = ManifestSource.readManifest(root, m)
      assert(after.map(e => (e.file, e.rows)) == before.map(e => (e.file, e.rows)),
        "metadata-only: no data file moves, physical stats unchanged")
      // each sidecar holds only keys whose bloom probes ITS file
      val dv = ManifestSource.readDvMap(root, m)
      val nameToEntry = after.map(e => e.file -> e).toMap
      dv.foreach { case (f, dvs) =>
        val ks = ManifestSource.readDvKeys(root, dvs)
        assert(ks.subsetOf(Set(5L, 9L)))
        ks.foreach(k => assert(nameToEntry(f).bloom.forall(
          ManifestSource.bloomMightContain(_, k)),
          s"sidecar key $k must bloom-probe its file $f"))
      }
      // the masks hold at read; materialization lands on the CoW state
      assert(content(root).forall(r => r.head != 5L && r.head != 9L))
      ManifestSource.rewriteDeletes(spark, root)
      val twin = plant()
      try {
        ManifestSource.deleteKeys(spark, twin, Seq(5L, 9L))
        assert(content(root) == content(twin),
          "DF MoR + materialize == Seq CoW delete")
      } finally cleanup(twin)
    } finally cleanup(root)
  }
}
