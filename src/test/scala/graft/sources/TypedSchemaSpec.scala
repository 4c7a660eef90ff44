package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** TYPED, NAMED store schema (round 15): extension columns declare a
  * type — BIGINT ('L'), DOUBLE ('D'), or STRING ('S') — recorded as
  * table-level metadata (`SCHEMA_TYPES`, positional and immutable per
  * position like `KEYCOL`), and data files carry the REAL column
  * names in their parquet schema. Pins:
  *
  *   1. a truncate write with DOUBLE + STRING extras declares the
  *      types; reads surface the declared Spark types and exact
  *      values;
  *   2. the full DML lifecycle on a typed store — append, MERGE
  *      (DataFrame source), keyed DELETE, sorted compaction — carries
  *      DOUBLE/STRING extras byte-identically through every rewrite;
  *   3. typed addColumn evolves metadata-only: pre-evolution rows
  *      read NULL, a pinned pre-evolution manifest reads the old
  *      shape;
  *   4. stats-answered SUM refuses DOUBLE extras (no BIGINT sum stat
  *      exists) and scans instead — exact either way — while BIGINT
  *      extras still answer from the manifest with zero file opens;
  *   5. an append whose extra types mismatch the declared vector
  *      fails loudly;
  *   6. a shallow clone carries the declared types.
  */
class TypedSchemaSpec extends SparkSpec {

  import ManifestSource._

  private def typedStore(): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_typed").toString
    (1L to 20L).map(i =>
        (i, i * 1000L, "A", i, i * 10L, i * 0.5, s"t$i"))
      .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
      .repartitionByRange(4, col("ship_us"))
      .write.format("graft-manifest").option("path", root)
      .option("extracols", "score:d,tag:s")
      .mode("overwrite").save()
    root
  }

  private def load(root: String, pin: Option[String] = None) = {
    val r = spark.read.format("graft-manifest").option("path", root)
    pin.fold(r)(m => r.option("manifest", m)).load()
  }

  private def scoreTag(root: String): Map[Long, (Option[Double], Option[String])] =
    load(root).select(col("ok"), col("score"), col("tag")).collect().map { r =>
      r.getLong(0) -> ((if (r.isNullAt(1)) None else Some(r.getDouble(1)),
        if (r.isNullAt(2)) None else Some(r.getString(2))))
    }.toMap

  test("truncate write declares DOUBLE/STRING extras; reads are typed and exact") {
    val root = typedStore()
    try {
      assert(StoreFS.exists(root, "SCHEMA_TYPES"))
      assert(tableTypes(root, 7) == Seq('L', 'L', 'S', 'L', 'L', 'D', 'S'))
      val df = load(root)
      assert(df.schema("score").dataType == DoubleType)
      assert(df.schema("tag").dataType == StringType)
      val got = scoreTag(root)
      assert((1L to 20L).forall(i => got(i) == ((Some(i * 0.5), Some(s"t$i")))))
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("DML lifecycle carries typed extras through append, merge, delete, compaction") {
    import spark.implicits._
    val root = typedStore()
    try {
      // APPEND with the full typed shape
      Seq((100L, 50000L, "B", 1L, 10L, 9.25, "hot"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      // MERGE (DataFrame source): base columns update, extras carry
      val src = Seq((5L, 5500L, "Z", 50L, 500L), (200L, 60000L, "C", 2L, 20L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
      mergeDF(spark, root, src)
      // DELETE a typed row
      deleteKeysDF(spark, root, Seq(7L).toDF("ok"))
      // COMPACT (sorted rewrite reads + rewrites every row)
      compactSorted(spark, root, targetRows = 50L)
      val got = scoreTag(root)
      assert(!got.contains(7L), "deleted key must be gone")
      assert(got(5L) == ((Some(2.5), Some("t5"))),
        s"merged row must KEEP its typed extras, got ${got(5L)}")
      assert(got(100L) == ((Some(9.25), Some("hot"))))
      assert(got(200L) == ((None, None)), "inserted row has no extras")
      assert((1L to 20L).filterNot(i => i == 5 || i == 7)
        .forall(i => got(i) == ((Some(i * 0.5), Some(s"t$i")))),
        "untouched rows must survive every rewrite byte-identically")
      // base-column update from the merge actually landed
      val r5 = load(root).filter(col("ok") === 5L)
        .select(col("flag"), col("qty")).head()
      assert(r5.getString(0) == "Z" && r5.getLong(1) == 50L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("typed addColumn: metadata-only, NULL padding, pinned old shape") {
    import spark.implicits._
    val root = typedStore()
    try {
      val m0 = resolveManifest(root, None)
      addColumn(root, "weight", 'D')
      assert(tableTypes(root, 8) == Seq('L', 'L', 'S', 'L', 'L', 'D', 'S', 'D'))
      Seq((101L, 52000L, "B", 1L, 10L, 1.5, "x", 0.125))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag", "weight")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val df = load(root)
      assert(df.schema("weight").dataType == DoubleType)
      val w = df.select(col("ok"), col("weight")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
        .toMap
      assert(w(101L).contains(0.125))
      assert((1L to 20L).forall(w(_).isEmpty), "pre-evolution rows read NULL")
      // pinned pre-evolution generation: old shape, no weight column
      assert(!load(root, Some(m0)).columns.contains("weight"))
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("stats-answered SUM refuses DOUBLE extras, still answers BIGINT extras") {
    import spark.implicits._
    val root = typedStore()
    try {
      addColumn(root, "bonus") // default 'L'
      Seq((102L, 53000L, "B", 1L, 10L, 1.0, "y", 7L),
          (103L, 54000L, "B", 1L, 10L, 2.0, "y", 9L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag", "bonus")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      // BIGINT extra: answers from the manifest, zero file opens
      val sumL = load(root).agg(sum(col("bonus"))).head().getLong(0)
      assert(sumL == 16L)
      assert(ManifestScan.lastPlanned._1 == 0,
        "SUM over a BIGINT extra must stats-answer with zero data files")
      // DOUBLE extra: must fall back to a real scan — and be exact
      val sumD = load(root).agg(sum(col("score"))).head().getDouble(0)
      assert(math.abs(sumD - ((1 to 20).map(_ * 0.5).sum + 3.0)) < 1e-9)
      assert(ManifestScan.lastPlanned._1 > 0,
        "SUM over a DOUBLE extra has no stat and must read files")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("append type coercion: safe casts land typed, unsafe casts fail loudly") {
    import spark.implicits._
    val root = typedStore()
    try {
      // BIGINT into the DOUBLE column: Spark's output resolver upcasts
      // against the table schema (inferSchema reports score: double),
      // so the value lands as a real DOUBLE
      Seq((300L, 70000L, "B", 1L, 10L, 5L, "z"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      assert(scoreTag(root)(300L) == ((Some(5.0), Some("z"))))
      // STRING into the DOUBLE column: no safe cast — analysis rejects
      val e = intercept[Exception] {
        Seq((301L, 71000L, "B", 1L, 10L, "oops", "z"))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
          .coalesce(1)
          .write.format("graft-manifest").option("path", root).mode("append").save()
      }
      assert(e.getMessage != null &&
        (e.getMessage.contains("CAST") || e.getMessage.contains("cast") ||
          e.getMessage.contains("INCOMPATIBLE")),
        s"string-into-double append must fail the cast check, got: ${e.getMessage}")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("a table-CREATING batch append records the declared types") {
    import spark.implicits._
    // mode("append") to a FRESH path: the r15 round only wired
    // writeTypes through the truncate and streaming-first-epoch paths —
    // the batch-append path silently created the table with default
    // (BIGINT) metadata while the files carried doubles/strings, so a
    // reader declaring the extras BIGINT mis-decoded them
    val root = java.nio.file.Files.createTempDirectory("graft_typed_ap").toString
    try {
      (1L to 10L).map(i => (i, i * 1000L, "A", i, i * 10L, i * 0.25, s"t$i"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root)
        .option("extracols", "score:d,tag:s")
        .mode("append").save()
      assert(StoreFS.exists(root, "SCHEMA_TYPES"),
        "a table-creating append must record the write's type vector")
      assert(tableTypes(root, 7) == Seq('L', 'L', 'S', 'L', 'L', 'D', 'S'))
      val df = load(root)
      assert(df.schema("score").dataType == DoubleType)
      assert(df.schema("tag").dataType == StringType)
      val got = scoreTag(root)
      assert((1L to 10L).forall(i => got(i) == ((Some(i * 0.25), Some(s"t$i")))))
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("an unknown extracols type suffix fails loudly, never defaults to BIGINT") {
    val e = intercept[IllegalArgumentException] {
      parseExtraHint("score:f")
    }
    assert(e.getMessage.contains("score:f"))
    // the valid suffixes still parse, either case
    assert(parseExtraHint("a:l,b:D,c:s").map(_.dataType.simpleString) ==
      Seq("bigint", "double", "string"))
  }

  test("a manifest pin into a pre-truncate incarnation is refused loudly") {
    import spark.implicits._
    val root = typedStore()
    try {
      // grow a second generation so a gen-numbered manifest exists
      Seq((100L, 50000L, "B", 1L, 10L, 9.25, "hot"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "score", "tag")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val preTruncGen = resolveManifest(root, None)
      assert(preTruncGen != "manifest.csv")
      // truncate into a RETYPED table (no extras — all-default types)
      (1L to 5L).map(i => (i, i * 1000L, "A", i, i * 10L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root)
        .mode("overwrite").save()
      // the old generation file is still on disk, but pinning it would
      // decode the OLD table's typed files under the NEW type vector
      val e = intercept[IllegalArgumentException] {
        load(root, Some(preTruncGen)).collect()
      }
      assert(e.getMessage.contains("predates") &&
        e.getMessage.contains("truncate"), s"got: ${e.getMessage}")
      // restore across the truncate refuses identically
      val e2 = intercept[IllegalArgumentException] {
        restore(root, preTruncGen)
      }
      assert(e2.getMessage.contains("predates"))
      // the current incarnation reads normally, and new generations pin
      assert(load(root).count() == 5L)
      Seq((6L, 6000L, "B", 6L, 60L))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents")
        .coalesce(1)
        .write.format("graft-manifest").option("path", root).mode("append").save()
      val postGen = resolveManifest(root, None)
      assert(load(root, Some(postGen)).count() == 6L,
        "post-truncate generations must stay pinnable")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("a shallow clone carries the declared types") {
    val root = typedStore()
    val dst = java.nio.file.Files.createTempDirectory("graft_typed_clone").toString
    try {
      cloneShallow(root, dst)
      assert(tableTypes(dst, 7) == Seq('L', 'L', 'S', 'L', 'L', 'D', 'S'))
      val got = load(dst).select(col("ok"), col("score")).collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got(4L) == 2.0)
    } finally Seq(root, dst).foreach(d =>
      scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(d))))
  }
}
