package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BINARY ('B') extension columns (round 16): opaque byte payloads as
  * first-class store columns — the multimodal-pipeline gap. Pins:
  *
  *   1. byte-EXACT round-trips of arbitrary binary (0x00, 0xFF,
  *      newline/comma bytes, an empty array) through create, append,
  *      extras-updating MERGE, keyed DELETE, and sorted compaction;
  *   2. addColumn('B') evolves metadata-only with NULL padding;
  *   3. column pruning: a scan that never touches the payload decodes
  *      zero payload pages (the storage projection excludes it);
  *   4. a binary column is refused as a key column, and SUM stats are
  *      never answered from binary extras (no stat exists).
  */
class BinaryColumnSpec extends SparkSpec {

  import ManifestSource._

  private def payload(i: Long): Array[Byte] =
    if (i == 3L) Array.empty[Byte]
    else Array[Byte](0, -1, i.toByte, '\n'.toByte, ','.toByte, (i * 7).toByte)

  private def mkStore(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bin").toString
    (1L to 10L).map(i => (i, i * 1000L, "A", i, i * 10L, payload(i)))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents", "payload")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root)
      .option("extracols", "payload:b")
      .mode("overwrite").save()
    root
  }

  private def load(root: String) =
    spark.read.format("graft-manifest").option("path", root).load()

  private def payloads(root: String): Map[Long, Option[Seq[Byte]]] =
    load(root).select(col("ok"), col("payload")).collect().map { r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None
        else Some(r.getAs[Array[Byte]](1).toSeq))
    }.toMap

  test("byte-exact lifecycle: create, append, merge-update, delete, compact") {
    import spark.implicits._
    val root = mkStore()
    try {
      assert(tableTypes(root, 6) == Seq('L', 'L', 'S', 'L', 'L', 'B'))
      val got0 = payloads(root)
      assert((1L to 10L).forall(i => got0(i).contains(payload(i).toSeq)),
        s"creation write must round-trip bytes exactly, got $got0")
      // append one more (non-UTF8 bytes again)
      Seq((11L, 11000L, "B", 11L, 110L, Array[Byte](-128, 127, 0)))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "payload")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      // extras-updating MERGE rewrites doc 5's payload
      val newBytes = Array[Byte](9, 0, -9, 9)
      mergeDF(spark, root, Seq((5L, 5000L, "Z", 5L, 50L, newBytes))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "payload"))
      deleteKeysDF(spark, root, Seq(7L).toDF("ok"))
      compactSorted(spark, root, targetRows = 50L)
      val got = payloads(root)
      assert(!got.contains(7L))
      assert(got(5L).contains(newBytes.toSeq), "merged payload must update")
      assert(got(11L).contains(Seq[Byte](-128, 127, 0)))
      assert(got(3L).contains(Seq.empty[Byte]),
        "an empty byte array is a value, not NULL")
      assert((1L to 10L).filterNot(i => i == 5 || i == 7)
        .forall(i => got(i).contains(payload(i).toSeq)),
        "untouched payloads must survive every rewrite byte-identically")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("addColumn('B'): metadata-only evolution, NULL padding") {
    import spark.implicits._
    val root = mkStore()
    try {
      addColumn(root, "thumb", 'B')
      assert(tableTypes(root, 7) == Seq('L', 'L', 'S', 'L', 'L', 'B', 'B'))
      Seq((20L, 20000L, "C", 1L, 10L, Array[Byte](1), Array[Byte](2, 2)))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "payload", "thumb")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val t = load(root).select(col("ok"), col("thumb")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None
          else Some(r.getAs[Array[Byte]](1).toSeq))).toMap
      assert(t(20L).contains(Seq[Byte](2, 2)))
      assert((1L to 10L).forall(t(_).isEmpty), "pre-evolution rows read NULL")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("column pruning: a payload-free projection decodes no payload pages") {
    val root = mkStore()
    try {
      load(root).select(col("ok"), col("qty")).collect()
      assert(!ManifestScan.lastReadColumns.contains("payload"),
        s"payload must not be decoded, read: ${ManifestScan.lastReadColumns}")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("a binary column is refused as key; no SUM stat for binary extras") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_bin_key").toString
    try {
      val e = intercept[Exception] {
        (1L to 3L).map(i => (i, i * 1000L, "A", i, i * 10L, payload(i)))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents", "payload")
          .write.format("graft-manifest").option("path", root)
          .option("extracols", "payload:b")
          .option("keycol", "ok,payload").mode("overwrite").save()
      }
      assert(e.getMessage != null && (e.getMessage.contains("B-typed") ||
        e.getMessage.contains("BIGINT or STRING")),
        s"binary key member must be refused, got: ${e.getMessage}")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
