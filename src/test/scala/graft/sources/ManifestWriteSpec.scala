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
