package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-14 columnar-data-plane contract: the store's V2
  * required-columns pushdown now reaches the STORAGE layer — a
  * single-column scan decodes ONE parquet column chunk, not the whole
  * row ([[ManifestScan.lastReadColumns]] is the observability hook,
  * the [[ManifestScan.lastPlanned]] pattern). Masked reads widen the
  * projection by exactly the key columns the mask must test.
  */
class ColumnPruneSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_prune_$tag")
      .toFile.getAbsolutePath
    (1L to 100L).map(i => (i, i * 1000L, s"f$i", i % 7, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def cleanup(root: String): Unit =
    scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))

  test("single-column scan projects one storage column") {
    val root = freshStore("one")
    try {
      // a bare SUM would be stats-answered from the manifest (zero
      // data files open — the better plan); collect forces a real scan
      val df = spark.read.format("graft-manifest").option("path", root).load()
        .select(col("qty"))
      val got = df.collect().map(_.getLong(0)).sum
      assert(got == (1L to 100L).map(_ % 7).sum)
      assert(ManifestScan.readColumnsByDir.get(root) == Seq("qty"),
        s"single-column scan must read one storage column, " +
          s"read ${ManifestScan.readColumnsByDir.get(root)}")
    } finally cleanup(root)
  }

  test("the V2 plan itself carries the pruned ReadSchema") {
    val root = freshStore("plan")
    try {
      val df = spark.read.format("graft-manifest").option("path", root).load()
        .select(col("flag"), col("qty"))
      val plan = df.queryExecution.executedPlan.toString
      // the scan's readSchema is the pruned two-column shape — the
      // other three base columns never appear below the scan
      assert(df.queryExecution.optimizedPlan.schema.fieldNames.toSeq ==
        Seq("flag", "qty"))
      df.collect()
      assert(ManifestScan.readColumnsByDir.get(root) == Seq("flag", "qty"),
        s"got ${ManifestScan.readColumnsByDir.get(root)}; plan was\n$plan")
    } finally cleanup(root)
  }

  test("a deletion-vector mask widens the projection by the key columns only") {
    // ONE data file so every partition reader carries the mask — a
    // multi-file store's unmasked partitions record the narrower
    // projection and the per-dir hook keeps whichever landed last
    val root = java.nio.file.Files.createTempDirectory("graft_prune_mask")
      .toFile.getAbsolutePath
    (1L to 100L).map(i => (i, i * 1000L, s"f$i", i % 7, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .coalesce(1)
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    try {
      ManifestSource.deleteKeysMoR(root, Seq(5L, 6L))
      val df = spark.read.format("graft-manifest").option("path", root).load()
        .select(col("qty"))
      val got = df.collect().map(_.getLong(0)).sum
      assert(got == (1L to 100L).filterNot(i => i == 5L || i == 6L).map(_ % 7).sum)
      // qty + the mask's key columns (ok, flag) — never the full row
      assert(ManifestScan.readColumnsByDir.get(root) == Seq("ok", "flag", "qty"),
        s"masked single-column scan reads key+projected columns, " +
          s"read ${ManifestScan.readColumnsByDir.get(root)}")
    } finally cleanup(root)
  }

  test("typed named shape: a DOUBLE-extra scan prunes to that one storage column") {
    val root = java.nio.file.Files.createTempDirectory("graft_prune_typed")
      .toFile.getAbsolutePath
    (1L to 100L).map(i => (i, i * 1000L, s"f$i", i % 7, i * 10L, i * 0.25, s"g$i"))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", root)
      .option("extracols", "score:d,tag:s")
      .mode("overwrite").save()
    try {
      val df = spark.read.format("graft-manifest").option("path", root).load()
        .select(col("score"))
      val got = df.collect().map(_.getDouble(0)).sum
      assert(math.abs(got - (1L to 100L).map(_ * 0.25).sum) < 1e-9)
      assert(ManifestScan.readColumnsByDir.get(root) == Seq("score"),
        s"typed single-column scan must decode one storage column, " +
          s"read ${ManifestScan.readColumnsByDir.get(root)}")
      // the string extra prunes independently
      val tags = spark.read.format("graft-manifest").option("path", root).load()
        .select(col("tag")).collect().map(_.getString(0)).toSet
      assert(tags == (1L to 100L).map(i => s"g$i").toSet)
      assert(ManifestScan.readColumnsByDir.get(root) == Seq("tag"))
    } finally cleanup(root)
  }
}
