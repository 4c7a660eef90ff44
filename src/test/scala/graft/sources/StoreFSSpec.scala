package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The store's filesystem abstraction ([[StoreFS]]): every protocol
  * read/write routes through `org.apache.hadoop.fs.FileSystem`, so
  * the same verbs run against HDFS/S3A by giving the table directory
  * a scheme. The lifecycle test below drives a REAL store through an
  * explicit `file://` URI — which takes the NON-LOCAL branch of every
  * StoreFS primitive (Hadoop streams, listStatus, rename,
  * create-exclusive), proving the remote path end-to-end without a
  * cluster. The primitive tests pin the semantics the commit protocol
  * leans on.
  */
class StoreFSSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_fs_$tag").toFile.getAbsolutePath

  test("createExclusive is first-wins; delete releases") {
    val d = tmp("excl")
    assert(StoreFS.createExclusive(d, "commit.lock"))
    assert(!StoreFS.createExclusive(d, "commit.lock"))
    StoreFS.delete(d, "commit.lock")
    assert(StoreFS.createExclusive(d, "commit.lock"))
  }

  test("atomicMove replaces; lastLine seeks backwards; readRange tails") {
    val d = tmp("mv")
    StoreFS.writeString(d, "a.tmp", "one\ntwo\nthree\n")
    StoreFS.atomicMove(d, "a.tmp", "a")
    assert(!StoreFS.exists(d, "a.tmp") && StoreFS.exists(d, "a"))
    assert(StoreFS.lastLine(d, "a").contains("three"))
    StoreFS.appendString(d, "a", "four\n")
    assert(StoreFS.lastLine(d, "a").contains("four"))
    val tail = new String(StoreFS.readRange(d, "a", 4), "UTF-8")
    assert(tail == "two\nthree\nfour\n")
  }

  test("full store lifecycle through the file:// scheme (non-local branch)") {
    val local = tmp("uri")
    val d = "file://" + local
    (1L to 30L).map(i => (i, i * 1000L, s"f$i", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(2, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    // DML chain: merge (update + insert), CoW delete, MoR delete,
    // materialize, compactSorted, checkpoint, read back
    ManifestSource.merge(spark, d, Seq((5L, 5000L, "U", 9L, 9L),
      (99L, 99000L, "N", 1L, 1L)))
    ManifestSource.deleteKeys(spark, d, Seq(7L))
    ManifestSource.deleteKeysMoR(d, Seq(8L))
    ManifestSource.rewriteDeletes(spark, d)
    ManifestSource.compactSorted(spark, d, targetRows = 20)
    val cp = ManifestSource.checkpointCommitLog(d)
    assert(cp.baseCommits == 6L, s"six commits folded, got ${cp.baseCommits}")
    val rows = spark.read.format("graft-manifest").option("path", d).load()
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(rows.size == 29, s"30 + 1 insert - 2 deletes = 29, got ${rows.size}")
    assert(rows(5L) == "U" && rows(99L) == "N")
    assert(!rows.contains(7L) && !rows.contains(8L))
    // vacuum sweeps the orphaned generations through the same FS
    val (deadM, _) = ManifestSource.vacuum(d)
    assert(deadM > 0, "vacuum must collect superseded generations")
    assert(spark.read.format("graft-manifest").option("path", d).load()
      .count() == 29L)
  }
}
