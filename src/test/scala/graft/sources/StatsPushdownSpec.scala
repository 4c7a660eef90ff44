package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Aggregate pushdown on the manifest source — pins that the shapes
  * the manifest statistics can answer EXACTLY are stats-answered
  * (zero data files opened), and that everything else falls back to
  * a real scan with correct results.
  */
class StatsPushdownSpec extends SparkSpec {

  private def store(tag: String, rows: Seq[(Long, Long, String, Long, Long)]): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_stats_$tag").toFile.getAbsolutePath
    import spark.implicits._
    rows.toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", d).mode("overwrite").save()
    d
  }

  private def read(d: String) =
    spark.read.format("graft-manifest").option("path", d).load()

  test("count/min/max/sum answer from the manifest with zero data files opened") {
    val rows = (1L to 90L).map(i => (i, i * 1000L, "A", 2L, i))
    val d = store("hit", rows)
    val r = read(d)
      .agg(count(lit(1)).as("n"), min(col("ship_us")).as("mn"),
        max(col("ship_us")).as("mx"), sum(col("qty")).as("sq"),
        sum(col("price_cents")).as("sp"))
      .head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((90L, 1000L, 90000L, 180L, (1L to 90L).sum)))
    val (planned, total) = ManifestScan.lastPlanned
    assert(total == 3 && planned == 0,
      s"stats-answered query must open no data files (planned $planned of $total)")
  }

  test("SUM against a legacy sums-less manifest falls back; count/min/max still stats-answer") {
    val rows = (1L to 30L).map(i => (i, i * 1000L, "A", 1L, i))
    val d = store("leg", rows)
    // strip the sums pair (keep blooms) — a pre-sums generation
    val legacy = ManifestSource.readManifest(d, "manifest.csv").map(_.copy(sums = None))
    val w = new java.io.PrintWriter(new java.io.File(d, "manifest.csv"), "UTF-8")
    try legacy.foreach(e => w.println(ManifestSource.entryLine(e))) finally w.close()

    val s = read(d).agg(sum(col("qty"))).head().getLong(0)
    assert(s == 30L)
    assert(ManifestScan.lastPlanned._1 > 0, "sums-less manifest must fall back for SUM")

    val c = read(d).agg(count(lit(1)), min(col("ship_us"))).head()
    assert((c.getLong(0), c.getLong(1)) == ((30L, 1000L)))
    assert(ManifestScan.lastPlanned._1 == 0, "count/min need no sums pair")
  }

  test("unsupported shapes fall back to a real scan and stay correct") {
    val rows = (1L to 40L).map(i => (i, i * 1000L, if (i % 2 == 0) "A" else "B", 1L, i))
    val d = store("fb", rows)

    // a non-stats aggregate (AVG) must scan
    val s = read(d).agg(avg(col("qty")).as("q")).head().getDouble(0)
    assert(s == 1.0)
    assert(ManifestScan.lastPlanned._1 > 0, "AVG must fall back to reading files")

    // SUM of a column without a maintained sums stat must scan
    val so = read(d).agg(sum(col("ok"))).head().getLong(0)
    assert(so == (1L to 40L).sum)
    assert(ManifestScan.lastPlanned._1 > 0, "SUM(ok) must fall back")

    // grouping must scan
    val g = read(d).groupBy(col("flag")).agg(count(lit(1))).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(g == Map("A" -> 20L, "B" -> 20L))
    assert(ManifestScan.lastPlanned._1 > 0, "grouped agg must fall back")

    // a filter above the aggregate must scan (stats can't apply
    // row-level predicates)
    val f = read(d).filter(col("ship_us") >= 21000L)
      .agg(count(lit(1))).head().getLong(0)
    assert(f == 20L)
    assert(ManifestScan.lastPlanned._1 > 0, "filtered agg must fall back")

    // min/max on a NON-zone-map column must scan
    val m = read(d).agg(min(col("ok"))).head().getLong(0)
    assert(m == 1L)
    assert(ManifestScan.lastPlanned._1 > 0, "min(ok) must fall back")
  }

  test("stats answer tracks lifecycle rewrites (compaction adds, merge recomputes)") {
    val rows = (1L to 60L).map(i => (i, i * 1000L, "A", 1L, i))
    val d = store("cmp", rows)
    ManifestSource.compact(spark, d, targetRows = 40)
    val r = read(d)
      .agg(count(lit(1)), min(col("ship_us")), max(col("ship_us")),
        sum(col("qty")), sum(col("price_cents"))).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      == ((60L, 1000L, 60000L, 60L, (1L to 60L).sum)),
      "post-compaction manifest stats must still be exact (sums add)")
    assert(ManifestScan.lastPlanned._1 == 0)

    // MERGE rewrites the touched file and recomputes its sums; the
    // post-merge stats answer must reflect the update, still 0 files
    ManifestSource.merge(spark, d, Seq((10L, 10000L, "U", 5L, 1000L)))
    val m = read(d).agg(sum(col("qty")), sum(col("price_cents"))).head()
    assert((m.getLong(0), m.getLong(1))
      == ((60L - 1L + 5L, (1L to 60L).sum - 10L + 1000L)),
      "post-merge sums must reflect the rewritten row")
    assert(ManifestScan.lastPlanned._1 == 0)
  }
}
