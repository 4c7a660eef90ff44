package graft.streaming

import graft.{SparkSpec, Tables}
import graft.sources.ManifestSource
import org.apache.spark.sql.functions._

/** q250's commit path: replaying an already-committed batch tag must
  * be a no-op (exactly-once ingestion), and the snapshot chain must
  * assemble the exact union.
  */
class ManifestStreamIngestSpec extends SparkSpec {

  test("replayed batch commits are skipped; union is exact") {
    val store = java.nio.file.Files.createTempDirectory("graft_ingest_spec").toString
    val ev = Tables.events(spark, sf)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val b0 = ev.filter(col("event_id") % 2 === 0)
    val b1 = ev.filter(col("event_id") % 2 === 1)

    StreamingQueries.ingestBatch(b0, 0L, store)
    StreamingQueries.ingestBatch(b1, 1L, store)
    def table = spark.read.format("graft-manifest").option("path", store).load()
    val total = ev.count()
    assert(table.count() == total, "two batches must union to the full stream")
    val manifestBefore = ManifestSource.resolveManifest(store, None)

    // REPLAY batch 0 (restart semantics): commit must detect the tag
    StreamingQueries.ingestBatch(b0, 0L, store)
    assert(table.count() == total, "replayed batch must not double rows")
    assert(ManifestSource.resolveManifest(store, None) == manifestBefore,
      "replay must not advance the snapshot pointer")

    // a NEW batch still commits after the replay
    StreamingQueries.ingestBatch(b1.limit(0), 2L, store) // empty batch: harmless
    StreamingQueries.ingestBatch(
      ev.filter(col("event_id") === -1), 3L, store) // also empty
    assert(table.count() == total)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(store))
  }
}
