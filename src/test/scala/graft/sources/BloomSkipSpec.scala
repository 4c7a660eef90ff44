package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom file index on `ok`: point lookups must prune files at
  * PLANNING (ManifestScan.lastPlanned), an absent key must plan
  * ~zero files, results must stay row-exact (residual re-applied),
  * and the OR-merged blooms of a compacted snapshot must keep
  * serving lookups.
  */
class BloomSkipSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_bloom_$tag").toFile.getAbsolutePath
    graft.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("ok"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
        col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"),
        (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("price_cents"))
      .repartitionByRange(24, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def lookup(path: String, key: Long) =
    spark.read.format("graft-manifest").option("path", path).load()
      .filter(col("ok") === key)

  test("present key: row-exact result with files pruned at planning") {
    val d = freshStore("hit")
    val expected = graft.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") === 1L).count()
    assert(expected > 0, "fixture assumption: orderkey 1 exists")
    assert(lookup(d, 1L).count() == expected)
    val (planned, total) = ManifestScan.lastPlanned
    assert(total >= 20 && planned < total,
      s"bloom should prune some of the $total files, planned $planned")
  }

  test("absent key: zero rows and a ~empty plan (the needle case)") {
    val d = freshStore("miss")
    assert(lookup(d, -1L).count() == 0L)
    val (planned, total) = ManifestScan.lastPlanned
    // 1024-bit blooms over ~2.5k keys/file: P(fp) ≈ (1-e^(-k n/m))^k;
    // allow a few false-positive opens but never a full scan
    assert(planned <= total / 2, s"absent key planned $planned of $total files")
  }

  test("compaction OR-merges blooms: lookups survive on the v2 snapshot") {
    val d = freshStore("compact")
    val expected = lookup(d, 1L).count()
    val (_, _, compacted) = ManifestSource.compact(spark, d, targetRows = 100000L)
    val v2 = spark.read.format("graft-manifest").option("path", d).load()
      .filter(col("ok") === 1L)
    assert(v2.count() == expected, "compacted snapshot must serve the same lookup")
    val entries = ManifestSource.readManifest(d, compacted)
    assert(entries.forall(_.bloom.isDefined), "compacted entries must carry OR-merged blooms")
  }

  test("a bloom-less manifest generation never prunes on ok (back-compat)") {
    val d = freshStore("legacy")
    // strip blooms, as a pre-index manifest would look
    val legacy = ManifestSource.readManifest(d, "manifest.csv").map(_.copy(bloom = None))
    val w = new java.io.PrintWriter(new java.io.File(d, "manifest.csv"), "UTF-8")
    try legacy.foreach(e => w.println(ManifestSource.entryLine(e))) finally w.close()
    assert(lookup(d, -1L).count() == 0L)
    val (planned, total) = ManifestScan.lastPlanned
    assert(planned == total, "no bloom → no pruning, full (correct) scan")
  }
}
