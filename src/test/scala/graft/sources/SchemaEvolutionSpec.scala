package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema evolution on the manifest store
  * ([[ManifestSource.addColumn]]): the q283 mechanics at file
  * granularity. Evolution is a METADATA-ONLY commit (same entries,
  * extended `#schema:` header), so:
  *
  *   1. mixed-generation reads pad pre-evolution rows with NULL;
  *   2. a reader pinned to the pre-evolution generation sees the OLD
  *      shape (schema is per snapshot — the Iceberg contract);
  *   3. SUM over the new column answers from per-file extras stats
  *      with ZERO data files opened, EXACTLY, across mixed
  *      generations — and NULL on an evolved-but-not-yet-written
  *      store (the old-only fallback answer);
  *   4. a DML rewrite of an evolved file CARRIES extension values
  *      (merge updates base columns only) and recomputes their stats;
  *   5. an append whose schema is not a prefix of the table's fails
  *      loudly — appends cannot evolve the schema implicitly.
  */
class SchemaEvolutionSpec extends SparkSpec {

  import ManifestSource._

  private def freshStore(n: Long): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_evo").toString
    (1L to n).map(i => (i, i * 1000L, "A", i, i * 10L))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", root).mode("overwrite").save()
    root
  }

  private def load(root: String, pin: Option[String] = None) = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load()
  }

  test("metadata-only evolution: NULL padding, per-snapshot schema, time travel") {
    val root = freshStore(20L)
    try {
      val m0 = resolveManifest(root, None)
      val filesBefore = readManifest(root, m0).map(_.file).toSet
      addColumn(root, "disc")
      val m1 = resolveManifest(root, None)
      assert(m1 != m0, "evolution must commit a new generation")
      assert(readManifest(root, m1).map(_.file).toSet == filesBefore,
        "evolution must touch no data file")
      assert(manifestSchema(root, m1) == BaseCols :+ "disc")
      // old generation still reads the OLD shape
      assert(load(root, Some(m0)).columns.toSeq == BaseCols)
      // evolved read: all rows pre-date the column → NULL everywhere
      val df = load(root)
      assert(df.columns.toSeq == BaseCols :+ "disc")
      assert(df.filter(col("disc").isNotNull).isEmpty)
      // append rows WITH the column; mixed read pads old rows only
      import spark.implicits._
      Seq((100L, 50000L, "B", 1L, 10L, 7L), (101L, 51000L, "B", 1L, 20L, 9L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "disc")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val got = load(root).select(col("ok"), col("disc")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      assert(got(100L).contains(7L) && got(101L).contains(9L))
      assert((1L to 20L).forall(got(_).isEmpty), "pre-evolution rows must read NULL")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("SUM over the new column answers from stats, zero files opened, exact") {
    val root = freshStore(20L)
    try {
      addColumn(root, "disc")
      def sumDisc(): Option[Long] = {
        val r = load(root).agg(sum(col("disc"))).head
        if (r.isNullAt(0)) None else Some(r.getLong(0))
      }
      // old-only store: stats answer NULL (the exact all-null SUM)
      assert(sumDisc().isEmpty)
      assert(ManifestScan.lastPlanned._1 == 0,
        s"stats-answered scan must open no files: ${ManifestScan.lastPlanned}")
      import spark.implicits._
      // one appended file with values (incl. a NULL that must be
      // skipped by both the stat and the real scan)
      Seq((100L, 50000L, "B", 1L, 10L, Some(7L)), (101L, 51000L, "B", 1L, 20L, None),
          (102L, 52000L, "B", 1L, 30L, Some(5L)))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "disc")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      assert(sumDisc().contains(12L), "mixed-generation stats SUM must be exact")
      assert(ManifestScan.lastPlanned._1 == 0,
        s"mixed-generation SUM must still be stats-answered: ${ManifestScan.lastPlanned}")
      // cross-check against a stats-proof real scan (filter disables
      // aggregate pushdown)
      val real = load(root).filter(col("ok") >= 0).agg(sum(col("disc"))).head.getLong(0)
      assert(real == 12L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("DML rewrite of an evolved file carries extension values and restates stats") {
    val root = freshStore(8L)
    try {
      addColumn(root, "disc")
      import spark.implicits._
      Seq((100L, 50000L, "B", 1L, 10L, 7L), (101L, 51000L, "B", 1L, 20L, 9L),
          (102L, 52000L, "B", 1L, 30L, 5L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "disc")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      // MERGE updates base columns of ok=101; its disc must CARRY
      ManifestSource.merge(spark, root, Seq((101L, 51000L, "U", 9L, 999L)))
      val got = load(root).filter(col("ok") === 101L)
        .select(col("flag"), col("price_cents"), col("disc")).head
      assert(got.getString(0) == "U" && got.getLong(1) == 999L && got.getLong(2) == 9L,
        s"merge must update base cols and carry the extension value: $got")
      // keyed delete drops ok=100; the rewritten file's extras stat
      // restates to the survivors' sum — stats SUM stays exact
      ManifestSource.deleteKeys(spark, root, Seq(100L))
      val s = load(root).agg(sum(col("disc"))).head.getLong(0)
      assert(s == 14L, s"post-DML stats SUM must restate exactly: $s")
      assert(ManifestScan.lastPlanned._1 == 0, "still stats-answered after DML")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("an append with an unknown column fails loudly") {
    val root = freshStore(8L)
    try {
      import spark.implicits._
      val ex = intercept[Exception] {
        Seq((100L, 50000L, "B", 1L, 10L, 7L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents", "mystery")
          .write.format("graft-manifest").option("path", root).mode("append").save()
      }
      // Spark's analyzer rejects the unknown column against the
      // table's (per-generation) schema before our builder's own
      // prefix check even runs — either failure is the loud one
      assert(ex.getMessage.contains("addColumn") ||
        ex.getMessage.contains("TOO_MANY_DATA_COLUMNS"),
        s"must fail loudly on an unknown column: ${ex.getMessage}")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
