package graft.scale

import graft.SparkSpec
import graft.sources.ManifestSource
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** q278's replication loop on a planted chain: after emit → stream →
  * apply, the REPLICA must equal the SOURCE's final snapshot
  * row-for-row (the defining property of log replication), and the
  * result must not depend on trigger batching (1 feed file per
  * trigger == all files at once), because each generation's events
  * apply as one MERGE/DELETE in feed order either way.
  */
class Q278ReplicationSpec extends SparkSpec {

  private def rows(root: String): Set[Seq[Any]] =
    spark.read.format("graft-manifest").option("path", root).load()
      .collect().map(_.toSeq).toSet

  test("replica == source after streaming the feed; batching-invariant") {
    import spark.implicits._
    val dirs = Seq("src", "r1", "r2").map { k =>
      k -> java.nio.file.Files.createTempDirectory(s"graft_q278spec_$k").toString
    }.toMap
    val stage = java.nio.file.Files.createTempDirectory("graft_q278spec_stage").toString
    try {
      val base = (1L to 12L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      dirs.values.foreach { r =>
        base.repartitionByRange(3, col("ship_us"))
          .write.format("graft-manifest").option("path", r).mode("overwrite").save()
      }
      val src = dirs("src")
      // three-generation chain: merge (update 4 + insert 100), keyed
      // delete {2, 5}, retention below 4500 (drops 1 and 3 — 2 and 5
      // are already gone; 4 survives retention? 4000 < 4500 → gone)
      val m0 = ManifestSource.resolveManifest(src, None)
      val (_, _, _, m1) = ManifestSource.merge(spark, src,
        Seq((4L, 4000L, "U", 4L, 80L), (100L, 9000L, "N", 1L, 5L)))
      val (_, _, _, m2) = ManifestSource.deleteKeys(spark, src, Seq(2L, 5L))
      ManifestSource.deleteBelow(spark, src, 4500L)
      val m3 = ManifestSource.resolveManifest(src, None)
      Seq((1, m0, m1), (2, m1, m2), (3, m2, m3)).foreach { case (g, a, b) =>
        val sub = s"$stage/b$g"
        Layout.manifestChangeFeed(spark, src, a, b)
          .select(lit(g).as("gen"), col("change_type"), col("ok"), col("ship_us"),
            col("flag"), col("qty"), col("price_cents"))
          .coalesce(1).write.mode("overwrite").parquet(sub)
        new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet"))
          .foreach(f => f.setLastModified(1000000L * g))
      }
      Layout.streamFeedApply(spark, dirs("r1"), s"$stage/*", filesPerTrigger = 1)
      Layout.streamFeedApply(spark, dirs("r2"), s"$stage/*", filesPerTrigger = 3)
      val srcRows = rows(src)
      // sanity: the chain really exercised all three verbs
      assert(srcRows == Set(
        Seq[Any](6L, 6000L, "A", 6L, 60L), Seq[Any](7L, 7000L, "A", 7L, 70L),
        Seq[Any](8L, 8000L, "A", 8L, 80L), Seq[Any](9L, 9000L, "A", 9L, 90L),
        Seq[Any](10L, 10000L, "A", 10L, 100L), Seq[Any](11L, 11000L, "A", 11L, 110L),
        Seq[Any](12L, 12000L, "A", 12L, 120L), Seq[Any](100L, 9000L, "N", 1L, 5L)),
        s"source final snapshot drifted: $srcRows")
      assert(rows(dirs("r1")) == srcRows, "replica (1 file/trigger) != source")
      assert(rows(dirs("r2")) == srcRows, "replica (all-at-once) != source")
    } finally dirs.values.toSeq :+ stage foreach { d =>
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d)))
    }
  }
}
