package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Vacuum-vs-pinned-reader safety — the one lakehouse lifecycle
  * interaction BloomSkipSpec/ManifestWriteSpec left unpinned:
  * retention rewrites and appends create new generations while
  * time-travel readers may hold an older one. Pins (1) a pinned
  * pre-retention snapshot reads every pre-delete row through a
  * concurrent deleteBelow, (2) vacuum's referenced set is the union
  * over ALL kept generations (files carried by reference between
  * generations survive), (3) a reader pinned to a KEPT generation is
  * byte-identical after vacuum, and (4) a reader pinned to a
  * VACUUMED generation fails cleanly at manifest resolution — never
  * partial data.
  */
class VacuumSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_vac_$tag").toFile.getAbsolutePath
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

  private def snap(path: String, m: String) = spark.read.format("graft-manifest")
    .option("path", path).option("manifest", m).load()

  private def fingerprint(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
    val r = df.agg(count(lit(1)), sum(col("price_cents"))).head()
    (r.getLong(0), r.getLong(1))
  }

  private val Cutoff = 820454400000000L // 1996-01-01Z

  test("a pinned pre-retention snapshot reads every row through a concurrent delete") {
    val d = freshStore("ret")
    val before = fingerprint(snap(d, "manifest.csv"))
    val (dropped, rewritten, _) = ManifestSource.deleteBelow(spark, d, Cutoff)
    assert(dropped > 0 && rewritten > 0, "fixture must exercise drop AND rewrite classes")
    // the pinned v1 reader sees the exact pre-delete table: retention
    // wrote part-d rewrites under NEW names and dropped files only
    // from the NEW manifest
    assert(fingerprint(snap(d, "manifest.csv")) == before,
      "pinned pre-delete snapshot must survive the retention rewrite untouched")
  }

  test("vacuum: union-referenced files survive, kept pins stay byte-identical, dead pins fail cleanly") {
    val d = freshStore("vac")
    val v1Fp = fingerprint(snap(d, "manifest.csv"))
    ManifestSource.deleteBelow(spark, d, Cutoff)
    val cur = ManifestSource.resolveManifest(d, None)
    assert(cur != "manifest.csv")
    val curFp = fingerprint(snap(d, cur))

    // keeping both generations: every file is referenced by the
    // union, so vacuum must delete NOTHING — files shared by
    // reference (the retained class lives in both manifests) must
    // not be torn out from under the kept v1 pin
    val (dm0, dd0) = ManifestSource.vacuum(d, keep = Seq("manifest.csv"))
    assert(dm0 == 0 && dd0 == 0, s"all-kept vacuum deleted ($dm0, $dd0)")
    assert(fingerprint(snap(d, "manifest.csv")) == v1Fp, "kept v1 pin must survive")
    assert(fingerprint(snap(d, cur)) == curFp, "current must survive")

    // dropping v1: its manifest and its EXCLUSIVE data files go; the
    // shared (carried-by-reference) files must remain for the
    // current snapshot
    val (dm1, dd1) = ManifestSource.vacuum(d)
    assert(dm1 == 1, s"exactly v1's manifest should die, got $dm1")
    assert(dd1 > 0, "v1's exclusive (expired + pre-rewrite) data files should be purged")
    assert(fingerprint(snap(d, cur)) == curFp, "current snapshot must be byte-identical after vacuum")
    ManifestSource.readManifest(d, cur).foreach { e =>
      assert(new java.io.File(d, e.file).exists(), s"referenced ${e.file} purged")
    }
    // a reader pinned to the vacuumed generation fails at manifest
    // resolution — a missing-file error, never a partial result
    intercept[java.io.FileNotFoundException] {
      ManifestSource.readManifest(d, "manifest.csv")
    }
    val e = intercept[Throwable] { snap(d, "manifest.csv").count() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(e).exists(_.isInstanceOf[java.io.FileNotFoundException]),
      s"dead pin must fail on the missing manifest, got $e")
  }

  test("vacuum sweeps stale write-then-move staging orphans, keeps fresh ones") {
    val d = freshStore("tmp")
    // a crash between writeString and atomicMove leaves these behind
    Seq("VERSION.tmp17", "checkpoint.tmp3", "commits.log.tmp3", "txn-cache.tmp9")
      .foreach(n => StoreFS.writeString(d, n, "orphan"))
    // age them past the token-stale threshold
    val old = System.currentTimeMillis() - ManifestSource.TokenStaleMs - 5000
    Seq("VERSION.tmp17", "checkpoint.tmp3", "commits.log.tmp3")
      .foreach(n => new java.io.File(d, n).setLastModified(old))
    // txn-cache.tmp9 stays FRESH — an in-flight flip must not be torn
    ManifestSource.vacuum(d)
    assert(!StoreFS.exists(d, "VERSION.tmp17"), "stale VERSION.tmp must be swept")
    assert(!StoreFS.exists(d, "checkpoint.tmp3"), "stale checkpoint.tmp must be swept")
    assert(!StoreFS.exists(d, "commits.log.tmp3"), "stale commits.log.tmp must be swept")
    assert(StoreFS.exists(d, "txn-cache.tmp9"), "fresh staging file must survive")
    // the table itself is untouched
    assert(snap(d, ManifestSource.resolveManifest(d, None)).count() > 0)
  }
}
