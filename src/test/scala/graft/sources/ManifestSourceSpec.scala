package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** graft-manifest DSv2 source: file-level zone-map pruning must
  * actually shrink planInputPartitions, residual re-application must
  * keep row-level semantics exact, and column pruning must reach the
  * reader.
  */
class ManifestSourceSpec extends SparkSpec {

  private lazy val path: String = {
    // materialize the store via the registered query (writes + reads)
    graft.SparkEntry.queries("q244_manifest_skipping")(spark, sf).collect()
    val tag = java.lang.Long.toHexString(sf.hashCode.toLong & 0xffffffffL)
    new java.io.File(sys.props("java.io.tmpdir"), s"graft_manifest_$tag").getAbsolutePath
  }

  private def table = spark.read.format("graft-manifest").option("path", path)
    .option("manifest", "manifest.csv").load()

  test("range predicate prunes files at planning; results stay row-exact") {
    val lo = 852076800000000L // 1997-01-01Z
    val hi = 883612800000000L
    val all = table.count()
    val filtered = table.filter(col("ship_us") >= lo && col("ship_us") < hi)
    val n = filtered.count()
    val (planned, total) = ManifestScan.lastPlanned
    assert(total > 20, s"expected a multi-file store, got $total")
    assert(planned < total / 2, s"pruning too weak: $planned of $total files planned")
    assert(n < all && n > 0)
    // row-exactness at file boundaries: the residual filter must drop
    // out-of-range rows from boundary files
    assert(filtered.filter(col("ship_us") < lo || col("ship_us") >= hi).count() == 0)
    // parity with the parquet source of truth
    val truth = graft.Tables.lineitem(spark, sf)
      .filter(unix_micros(col("l_shipdate").cast("timestamp")).between(lo, hi - 1)).count()
    assert(n == truth, s"manifest path $n != parquet truth $truth")
  }

  test("unfilterable predicates plan a full scan; column pruning reaches the reader") {
    table.filter(col("flag") === "R").count()
    val (planned, total) = ManifestScan.lastPlanned
    assert(planned == total, "flag predicates have no zone maps - full scan expected")
    val pruned = table.select(col("qty"))
    val scanDesc = pruned.queryExecution.executedPlan.toString
    assert(scanDesc.contains("qty"), scanDesc)
    assert(pruned.agg(sum(col("qty"))).collect().head.getLong(0) > 0)
  }
}
