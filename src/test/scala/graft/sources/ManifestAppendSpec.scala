package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q249: append commits create a NEW snapshot generation — the base
  * manifest still reads exactly batch 1 (time travel across appends),
  * the pointer names the merged generation, and the union is exact.
  */
class ManifestAppendSpec extends SparkSpec {

  test("append isolation: base snapshot = batch 1, latest = union") {
    graft.SparkEntry.queries("q249_manifest_append")(spark, sf).collect()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    val root = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_manifest_app_$tag").getAbsolutePath

    val current = ManifestSource.resolveManifest(root, None)
    assert(current.startsWith("manifest-gen"), s"pointer must name an append generation: $current")

    def snap(m: String) = spark.read.format("graft-manifest")
      .option("path", root).option("manifest", m).load()
    val lo = 852076800000000L // 1997-01-01Z, the q249 batch split
    val base = snap("manifest.csv")
    val latest = snap(current)
    assert(base.filter(col("ship_us") >= lo).count() == 0,
      "base snapshot must contain only the pre-append batch")
    val truth = graft.Tables.lineitem(spark, sf).count()
    assert(latest.count() == truth, "latest snapshot must be the exact union")
    assert(base.count() + latest.filter(col("ship_us") >= lo).count() == truth)
  }
}
