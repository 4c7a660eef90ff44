package graft.scale

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q270's batching-invariance claim: the seq-grouped apply makes any
  * trigger batching that respects log order fold to the same final
  * table — one file per trigger (three merge-generation chains) and
  * all files in one trigger (one foreachBatch applying three
  * sequences internally) must agree row-for-row.
  */
class Q270CdcSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_q270spec_$tag")
      .toFile.getAbsolutePath
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 1000L, "A", 1L, i))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def stageEvents(): String = {
    import spark.implicits._
    val stage = java.nio.file.Files.createTempDirectory("graft_q270spec_ev").toString
    val batches = Seq(
      // seq 0: bulk update; seq 1: override + insert; seq 2: update of the insert
      Seq((0, 10L, 10000L, "U", 2L, 111L), (0, 20L, 20000L, "U", 2L, 222L)),
      Seq((1, 10L, 10000L, "V", 3L, 333L), (1, 500L, 500000L, "N", 1L, 5L)),
      Seq((2, 500L, 500000L, "W", 9L, 9L)))
    batches.zipWithIndex.foreach { case (b, i) =>
      val sub = s"$stage/b$i"
      b.toDF("seq", "ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1).write.mode("overwrite").parquet(sub)
      new java.io.File(sub).listFiles().filter(_.getName.endsWith(".parquet"))
        .foreach(f => f.setLastModified(1000000L * (i + 1)))
    }
    stage
  }

  private def readAll(d: String) = spark.read.format("graft-manifest")
    .option("path", d).load()
    .collect().map(r => r.getLong(0) -> (r.getString(2), r.getLong(3), r.getLong(4)))
    .toMap

  test("per-file triggers == single trigger; last-wins lands on every class") {
    val stage = stageEvents()
    try {
      val d1 = freshStore("one")
      Layout.streamCdcApply(spark, d1, s"$stage/*", filesPerTrigger = 1)
      val perFile = readAll(d1)

      val d2 = freshStore("all")
      Layout.streamCdcApply(spark, d2, s"$stage/*", filesPerTrigger = 3)
      assert(readAll(d2) == perFile,
        "trigger batching changed the folded table — apply is not seq-grouped")

      assert(perFile(10L) == (("V", 3L, 333L)), "seq-1 override must win over seq-0")
      assert(perFile(20L) == (("U", 2L, 222L)), "un-overridden seq-0 update must stick")
      assert(perFile(500L) == (("W", 9L, 9L)), "seq-2 update of the seq-1 insert must win")
      assert(perFile(30L) == (("A", 1L, 30L)), "untouched rows must survive")
      assert(perFile.size == 101)
    } finally {
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(stage)))
    }
  }
}
