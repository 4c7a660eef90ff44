package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** V2 write path: round-trip fidelity, zone maps from the write
  * itself, and — the part that matters — commit atomicity: a write
  * with a poisoned partition must leave NO manifest behind.
  */
class ManifestWriteSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_mwrite_$tag").toFile
    d.getAbsolutePath
  }

  private def sample = graft.Tables.lineitem(spark, sf)
    .select(col("l_orderkey").as("ok"),
      unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
      col("l_returnflag").as("flag"), col("l_quantity").cast("long").as("qty"),
      (col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
        .cast("long").as("price_cents"))

  test("write-read round trip through the V2 path; manifest zone maps are exact") {
    val dir = freshDir("rt")
    sample.repartitionByRange(6, col("ship_us"))
      .write.format("graft-manifest").option("path", dir).mode("overwrite").save()
    val back = spark.read.format("graft-manifest").option("path", dir).load()
    assert(back.count() == sample.count())
    assert(back.agg(sum("price_cents")).collect().head.getLong(0) ==
      sample.agg(sum("price_cents")).collect().head.getLong(0))
    val entries = ManifestSource.readManifest(dir, "manifest.csv")
    assert(entries.nonEmpty && entries.map(_.rows).sum == sample.count())
    val globalMin = entries.map(_.min).min
    val trueMin = sample.agg(min("ship_us")).collect().head.getLong(0)
    assert(globalMin == trueMin, "zone-map min must equal the data min")
  }

  test("a losing duplicate attempt's abort never touches the winner's committed file") {
    // speculation/retry: two ATTEMPTS of the same partition run; the
    // winner commits, the loser aborts. With taskId in the file name
    // each attempt owns its own file, so the abort deletes only the
    // loser's output.
    val dir = freshDir("spec")
    val factory = new ManifestWriterFactory(dir, "", ManifestSource.BaseCols,
      Seq('L', 'L', 'S', 'L', 'L'))
    val winner = factory.createWriter(0, taskId = 7L)
    val loser = factory.createWriter(0, taskId = 8L)
    val row = org.apache.spark.sql.catalyst.InternalRow(
      1L, 1000L, org.apache.spark.unsafe.types.UTF8String.fromString("N"), 2L, 300L)
    winner.write(row); loser.write(row)
    val msg = winner.commit().asInstanceOf[FileCommitMessage]
    loser.abort()
    assert(new java.io.File(dir, msg.file).exists(),
      "losing attempt's abort deleted the committed file")
    assert(msg.file.contains("-t7"), s"attempt id must be in the name: ${msg.file}")
    assert(!new java.io.File(dir, msg.file.replace("-t7", "-t8")).exists(),
      "loser's own file must be gone")
  }

  test("generation numbering is max-based: deletions and compact names never collide") {
    val dir = freshDir("gen")
    def touch(n: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, n), "UTF-8")
      try w.println("") finally w.close()
    }
    touch("manifest.csv")
    assert(ManifestSource.nextGeneration(dir) == 3L) // 1 and v2=2 reserved
    touch("manifest-gen5.csv") // e.g. survivors of an external cleanup
    assert(ManifestSource.nextGeneration(dir) == 6L,
      "must advance past the max generation, not count files")
    touch("manifest-v2.csv") // an interleaved compact never collides
    assert(ManifestSource.nextGeneration(dir) == 6L)
  }

  test("a poisoned partition aborts the whole write: no manifest, no committed table") {
    val dir = freshDir("abort")
    val someKey = sample.select("ok").limit(1).collect().head.getLong(0)
    val poisoned = sample.withColumn("qty",
      expr(s"CASE WHEN ok = ${someKey}L THEN qty DIV 0 ELSE qty END"))
    val failed = intercept[Throwable] {
      poisoned.repartitionByRange(6, col("ship_us"))
        .write.format("graft-manifest").option("path", dir).mode("overwrite").save()
    }
    assert(failed != null)
    assert(!new java.io.File(dir, "manifest.csv").exists(),
      "commit must never fire when any task failed")
  }
}
