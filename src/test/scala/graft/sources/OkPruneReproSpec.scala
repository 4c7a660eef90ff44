package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OkPruneReproSpec extends SparkSpec {
  test("repro: ok-equality read on a string-keyed store") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_okprune").toString
    try {
      (1L to 12L).map(i => (i, i * 1000L, f"d$i%02d", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .repartitionByRange(3, col("ship_us"))
        .write.format("graft-manifest").option("path", root)
        .option("keycol", "flag").mode("overwrite").save()
      val got = spark.read.format("graft-manifest").option("path", root).load()
        .filter(col("ok") === 5L).collect()
      assert(got.length == 1, s"ok=5 must return one row, got ${got.length}")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
