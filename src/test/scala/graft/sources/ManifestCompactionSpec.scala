package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q245: compaction must shrink the file count, commit via the
  * VERSION pointer, keep v1 pinnable (time travel), preserve the
  * exact row multiset, and leave zone-map pruning effective.
  */
class ManifestCompactionSpec extends SparkSpec {

  test("q245: fewer files, atomic snapshot, v1 == v2, pruning survives") {
    graft.SparkEntry.queries("q245_manifest_compaction")(spark, sf).collect()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    val path = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_manifest_$tag").getAbsolutePath

    val compacted = ManifestSource.resolveManifest(path, None)
    assert(compacted.startsWith("manifest-gen"),
      s"compaction must commit a generation-numbered snapshot, got $compacted")
    val v1 = ManifestSource.readManifest(path, "manifest.csv")
    val v2 = ManifestSource.readManifest(path, compacted)
    assert(v2.length < v1.length / 2, s"compaction too weak: ${v1.length} -> ${v2.length}")
    assert(v1.map(_.rows).sum == v2.map(_.rows).sum, "row counts must be conserved")

    def snap(m: String) = spark.read.format("graft-manifest")
      .option("path", path).option("manifest", m).load()
    val a = snap("manifest.csv").groupBy("flag")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("s")).collect().toSet
    val b = snap(compacted).groupBy("flag")
      .agg(count(lit(1)).as("n"), sum("price_cents").as("s")).collect().toSet
    assert(a == b, "compaction changed data")

    // pruning on the compacted snapshot: a 1-year window must still
    // skip most of the 7-year span
    snap(compacted)
      .filter(col("ship_us") >= 852076800000000L && col("ship_us") < 883612800000000L)
      .count()
    val (planned, total) = ManifestScan.lastPlanned
    assert(total == v2.length && planned < total,
      s"compacted zone maps must still prune: $planned of $total")
  }
}
