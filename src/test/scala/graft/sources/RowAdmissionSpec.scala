package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-based admission control (`maxRowsPerTrigger`): the streaming
  * source batches commits by their ADDED-row counts from the commit
  * log's `rows=` field — metadata-only (no manifest or data file
  * opens at admission time), composing with `maxCommitsPerTrigger`,
  * never stalling on an oversized commit, and batching-invariant in
  * the folded totals.
  */
class RowAdmissionSpec extends SparkSpec {
  import spark.implicits._

  /** create 10 rows, then appends of 5, 20, and 3 rows. */
  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_adm_$tag")
      .toFile.getAbsolutePath
    def rows(from: Long, n: Long): DataFrame =
      (from until from + n).map(i => (i, i * 1000L, s"f$i", i, i))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
    rows(1, 10).coalesce(1)
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    Seq((100L, 5L), (200L, 20L), (300L, 3L)).foreach { case (from, n) =>
      rows(from, n).coalesce(1)
        .write.format("graft-manifest").option("path", d).mode("append").save()
    }
    d
  }

  private def batches(root: String, opts: Map[String, String]): Seq[Long] = {
    val sizes = scala.collection.mutable.ArrayBuffer[Long]()
    val ck = java.nio.file.Files.createTempDirectory("adm_ck").toString
    val r = spark.readStream.format("graft-manifest").option("path", root)
    val q = opts.foldLeft(r) { case (x, (k, v)) => x.option(k, v) }.load()
      .writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        sizes.synchronized { sizes += b.count() }; ()
      }
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    sizes.toSeq.filter(_ > 0)
  }

  test("commits batch by cumulative added rows; oversized commits still admit") {
    val root = freshStore("b")
    try {
      // budget 16: create(10)+append(5)=15 fits, append(20) spills to
      // its own batch (oversized but admitted alone), append(3) last
      assert(batches(root, Map("maxrowspertrigger" -> "16")) == Seq(15L, 20L, 3L))
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("row and commit caps compose; totals are batching-invariant") {
    val root = freshStore("c")
    try {
      // commit cap 1 dominates a loose row budget: one commit per batch
      assert(batches(root, Map("maxrowspertrigger" -> "1000",
        "maxcommitspertrigger" -> "1")) == Seq(10L, 5L, 20L, 3L))
      // no limits: everything in one batch; totals identical
      assert(batches(root, Map.empty).sum == 38L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
