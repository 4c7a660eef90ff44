package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Copy-on-write MERGE on the manifest source — pins the upsert
  * protocol around q267: matched rows replace in rewritten files,
  * unmatched source rows append as one new file, untouched files
  * carry by reference, the pre-merge snapshot stays pinnable, a
  * no-match candidate (bloom false positive / bloom-less legacy
  * file) is NOT spuriously rewritten, duplicate source keys are
  * rejected, and generations stay monotone across repeated merges.
  */
class ManifestMergeSpec extends SparkSpec {

  private def smallStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mrg_$tag").toFile.getAbsolutePath
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 1000L, "A", 1L, i))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def snap(path: String, m: Option[String] = None) = {
    val r = spark.read.format("graft-manifest").option("path", path)
    m.fold(r)(mm => r.option("manifest", mm)).load()
  }

  test("merge: update + insert + untouched-by-reference + pinned pre-merge snapshot") {
    val d = smallStore("upd")
    val v1 = ManifestSource.resolveManifest(d, None)
    val v1Entries = ManifestSource.readManifest(d, v1).map(_.file).toSet
    val (rewritten, kept, inserted, v2) = ManifestSource.merge(spark, d, Seq(
      (5L, 5000L, "U", 2L, 999L),     // update in the first range file
      (50L, 50000L, "U", 2L, 999L),   // update in a middle file
      (1000L, 999999L, "N", 3L, 7L))) // key in no file → insert
    assert(inserted == 1)
    assert(rewritten >= 1 && rewritten <= 2, s"only touched files rewrite ($rewritten)")
    assert(kept == 4 - rewritten)

    val after = snap(d).collect().map(r => r.getLong(0) ->
      (r.getString(2), r.getLong(4))).toMap
    assert(after.size == 101, "100 originals + 1 insert")
    assert(after(5L) == (("U", 999L)) && after(50L) == (("U", 999L)))
    assert(after(1000L) == (("N", 7L)))
    assert(after(6L) == (("A", 6L)), "non-matched rows must be untouched")

    // untouched files carry forward by REFERENCE (same names)
    val v2Entries = ManifestSource.readManifest(d, v2).map(_.file).toSet
    assert((v2Entries & v1Entries).size == kept,
      s"kept files must appear under their original names: $v2Entries vs $v1Entries")

    // the pre-merge snapshot still reads the original values
    val before = snap(d, Some(v1)).collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(before.size == 100 && before(5L) == 5L && !before.contains(1000L),
      "pinned pre-merge snapshot must be unaffected")
  }

  test("merge: a candidate with no actual match keeps its original file (no spurious rewrite)") {
    // hand-built bloom-less store: every file is a bloom candidate, so
    // an insert-only merge exercises the keep-original path directly
    val d = java.nio.file.Files.createTempDirectory("graft_mrg_fp").toFile.getAbsolutePath
    val fw = new java.io.PrintWriter(new java.io.File(d, "part-x.csv"), "UTF-8")
    try { fw.println("1,1000,A,1,10"); fw.println("2,2000,A,1,20") } finally fw.close()
    val mw = new java.io.PrintWriter(new java.io.File(d, "manifest.csv"), "UTF-8")
    try mw.println("part-x.csv,1000,2000,2") finally mw.close()

    val (rewritten, kept, inserted, v2) =
      ManifestSource.merge(spark, d, Seq((99L, 5000L, "N", 1L, 5L)))
    assert(rewritten == 0 && kept == 1 && inserted == 1)
    val files = ManifestSource.readManifest(d, v2).map(_.file)
    assert(files.contains("part-x.csv"), "the unmatched candidate must carry by reference")
    assert(snap(d).count() == 3)
  }

  test("merge: duplicate source keys are rejected; repeated merges stay monotone and pinnable") {
    val d = smallStore("dup")
    assertThrows[IllegalArgumentException](ManifestSource.merge(spark, d, Seq(
      (5L, 0L, "U", 0L, 0L), (5L, 0L, "U", 0L, 1L))))

    val (_, _, _, g1) = ManifestSource.merge(spark, d, Seq((5L, 5000L, "U", 1L, 111L)))
    val (_, _, _, g2) = ManifestSource.merge(spark, d, Seq((5L, 5000L, "V", 1L, 222L)))
    assert(g1 != g2 && ManifestSource.resolveManifest(d, None) == g2)
    def priceOf5(m: String) = snap(d, Some(m)).filter(col("ok") === 5)
      .head().getLong(4)
    assert(priceOf5(g1) == 111L && priceOf5(g2) == 222L,
      "each merge generation must remain pinnable with its own values")
  }
}
