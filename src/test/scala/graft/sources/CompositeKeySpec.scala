package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 composite-key contract: a store declared with
  * `keycol=ok,price_cents` carries row identity on the TUPLE —
  * neither column alone is unique, and every verb (merge, delete,
  * compaction re-sort, retention) blooms and matches on the tuple.
  */
class CompositeKeySpec extends SparkSpec {
  import spark.implicits._

  /** 12 rows over a (grp, sub) identity smuggled into (ok,
    * price_cents): ok ∈ {1..4} × price_cents ∈ {10,20,30} — every ok
    * value repeats 3×, every price_cents value 4×, tuples unique.
    */
  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_comp_$tag")
      .toFile.getAbsolutePath
    (for { g <- 1L to 4L; s <- Seq(10L, 20L, 30L) } yield
      (g, g * 1000 + s, s"d$g-$s", g + s, s))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", d)
      .option("keycol", "ok,price_cents").mode("overwrite").save()
    d
  }

  private def readAll(root: String): Set[(Long, Long, String, Long, Long)] =
    spark.read.format("graft-manifest").option("path", root).load()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSet

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("merge matches on the tuple: same ok, different price_cents stay distinct") {
    val root = freshStore("m")
    try {
      // update (2, 20) only; insert (9, 10) — new tuple
      val src = Seq(
        (2L, 9999L, "UPD", 777L, 20L),
        (9L, 9001L, "NEW", 1L, 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      val (_, _, ins, _) = ManifestSource.mergeCompositeDF(spark, root, src)
      assert(ins == 1L, s"one true insert, got $ins")
      val rows = readAll(root)
      assert(rows.contains((2L, 9999L, "UPD", 777L, 20L)), "matched tuple updated")
      assert(rows.contains((2L, 2010L, "d2-10", 12L, 10L)),
        "same ok, other price_cents untouched")
      assert(rows.contains((2L, 2030L, "d2-30", 32L, 30L)))
      assert(rows.contains((9L, 9001L, "NEW", 1L, 10L)), "unmatched tuple inserted")
      assert(rows.size == 13)
    } finally cleanup(root)
  }

  test("delete removes exactly the named tuples") {
    val root = freshStore("d")
    try {
      val keys = Seq((3L, 20L), (4L, 30L)).toDF("ok", "price_cents")
      val (_, _, del, _) = ManifestSource.deleteKeysCompositeDF(spark, root, keys)
      assert(del == 2L, s"two tuples deleted, got $del")
      val rows = readAll(root)
      assert(rows.size == 10)
      assert(!rows.exists(r => r._1 == 3L && r._5 == 20L))
      assert(rows.exists(r => r._1 == 3L && r._5 == 10L), "other (3, *) tuples live")
      assert(rows.exists(r => r._1 == 4L && r._5 == 10L))
    } finally cleanup(root)
  }

  test("merge source with duplicate tuples is rejected") {
    val root = freshStore("dup")
    try {
      val src = Seq(
        (2L, 1L, "A", 1L, 20L), (2L, 2L, "B", 2L, 20L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      val e = intercept[IllegalArgumentException](
        ManifestSource.mergeCompositeDF(spark, root, src))
      assert(e.getMessage.contains("duplicate keys"))
    } finally cleanup(root)
  }

  test("mono-keyed verbs refuse a composite store; composite verbs refuse mono stores") {
    val root = freshStore("g")
    try {
      intercept[IllegalArgumentException](
        ManifestSource.merge(spark, root, Seq((1L, 1L, "x", 1L, 1L))))
      intercept[IllegalArgumentException](
        ManifestSource.mergeStr(spark, root, Seq(("x", 1L, 1L, 1L, 1L))))
      intercept[IllegalArgumentException](
        ManifestSource.deleteKeysMoR(root, Seq(1L)))
    } finally cleanup(root)
    // and a long-keyed store refuses the composite verbs
    val plain = java.nio.file.Files.createTempDirectory("graft_comp_plain")
      .toFile.getAbsolutePath
    try {
      Seq((1L, 1L, "x", 1L, 1L)).toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .write.format("graft-manifest").option("path", plain)
        .mode("overwrite").save()
      intercept[IllegalArgumentException](
        ManifestSource.mergeCompositeDF(spark, plain,
          Seq((1L, 1L, "x", 1L, 1L)).toDF("ok", "ship_us", "flag", "qty", "price_cents")))
    } finally cleanup(plain)
  }

  test("re-sort compaction and retention keep tuple-hashed blooms (merge still prunes)") {
    val root = freshStore("c")
    try {
      val (_, _, name) = ManifestSource.compactSorted(spark, root, targetRows = 5)
      assert(ManifestSource.readManifest(root, name).forall(_.bloom.isDefined))
      // a merge after the re-sort still matches by tuple
      val src = Seq((1L, 5555L, "U2", 5L, 30L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      val (_, _, ins, _) = ManifestSource.mergeCompositeDF(spark, root, src)
      assert(ins == 0L, "the tuple exists — update, not insert")
      assert(readAll(root).contains((1L, 5555L, "U2", 5L, 30L)))
      // retention rewrite recomputes tuple blooms too
      ManifestSource.deleteBelow(spark, root, cutoffUs = 2000L)
      val rows = readAll(root)
      assert(rows.forall(_._2 >= 2000L))
    } finally cleanup(root)
  }

  test("ok-equality scans on a composite store never bloom-prune wrongly") {
    val root = freshStore("p")
    try {
      val got = spark.read.format("graft-manifest").option("path", root).load()
        .filter(col("ok") === 3L).collect()
      assert(got.length == 3, s"all three (3, *) tuples must return, got ${got.length}")
    } finally cleanup(root)
  }
}
