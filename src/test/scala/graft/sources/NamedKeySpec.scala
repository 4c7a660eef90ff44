package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NAMED TYPED-KEY stores (round 16): row identity carried by a
  * declared STRING extension column (`keycol=doc_key` where `doc_key`
  * is a `:s` extra), or by a composite tuple that includes one. Pins:
  *
  *   1. the full join-strategy DML lifecycle on the named key — MERGE
  *      (update + insert), CoW DELETE, MoR DELETE masks in the
  *      `#key:doc_key` arity-1 tuple dialect, rewriteDeletes;
  *   2. key-type-exactness (the OkPruneReproSpec rule): `ok` and
  *      `flag` equality on a named-key store must NOT prune through
  *      the doc_key-hashed blooms, while `doc_key` equality prunes;
  *   3. sidecar %-escaping round-trips keys containing the dialect's
  *      own meta-characters (',', '%');
  *   4. keycol declaration validation: Long mono keys, DOUBLE key
  *      members, and unknown columns are refused at creation;
  *   5. a composite key may include a typed extra member.
  */
class NamedKeySpec extends SparkSpec {

  import ManifestSource._

  private def mkStore(keys: Seq[String] = (1L to 12L).map(i => s"d$i")): String = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_nkey").toString
    keys.zipWithIndex.map { case (k, i0) =>
        val i = i0 + 1L; (i, i * 1000L, "A", i, i * 10L, k)
      }
      .toDF("ok", "ship_us", "flag", "qty", "price_cents", "doc_key")
      .repartitionByRange(3, col("ship_us"))
      .write.format("graft-manifest").option("path", root)
      .option("extracols", "doc_key:s")
      .option("keycol", "doc_key").mode("overwrite").save()
    root
  }

  private def load(root: String) =
    spark.read.format("graft-manifest").option("path", root).load()

  test("named-key DML lifecycle: merge, CoW delete, MoR mask, rewrite") {
    import spark.implicits._
    val root = mkStore()
    try {
      assert(keyCols(root) == Seq("doc_key"))
      // MERGE: update d5's base values in place; insert a fresh key
      val src = Seq((105L, 5500L, "Z", 50L, 500L, "d5"),
          (200L, 60000L, "B", 2L, 20L, "new1"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "doc_key")
      val (_, _, nIns, _) = mergeStrDF(spark, root, src)
      assert(nIns == 1L, s"one unmatched key must insert, got $nIns")
      val afterMerge = load(root).select(col("doc_key"), col("ok"), col("flag"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(afterMerge("d5") == ((105L, "Z")), "matched key must update in place")
      assert(afterMerge("new1") == ((200L, "B")))
      assert(afterMerge.size == 13)
      // CoW delete by named key
      deleteKeysStrDF(spark, root, Seq("d3").toDF("doc_key"))
      assert(load(root).filter(col("doc_key") === "d3").isEmpty)
      // MoR mask by named key: metadata-only, reads mask in-stream
      val before = resolveManifest(root, None)
      deleteKeysStrMoRDF(spark, root, Seq("d7").toDF("doc_key"))
      val mMor = resolveManifest(root, None)
      assert(readDvMap(root, mMor).nonEmpty, "MoR must attach masks")
      assert(load(root).filter(col("doc_key") === "d7").isEmpty,
        "masked key must vanish at read time")
      assert(load(root).count() == 11L)
      // pinned pre-delete snapshot still sees the row (time travel)
      assert(spark.read.format("graft-manifest").option("path", root)
        .option("manifest", before).load()
        .filter(col("doc_key") === "d7").count() == 1L)
      // physical rewrite clears the masks, content unchanged
      rewriteDeletes(spark, root)
      assert(readDvMap(root, resolveManifest(root, None)).isEmpty)
      assert(load(root).count() == 11L)
      assert(load(root).filter(col("doc_key") === "d7").isEmpty)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("key-type-exact pruning: ok/flag equality never prunes, doc_key does") {
    val root = mkStore()
    try {
      // the OkPruneReproSpec rule generalized: blooms hash doc_key, so
      // an ok- or flag-equality must read through (no wrongful prune)
      assert(load(root).filter(col("ok") === 5L).count() == 1L)
      assert(load(root).filter(col("flag") === "A").count() == 12L)
      // the named key itself prunes at planning
      val got = load(root).filter(col("doc_key") === "d5").collect()
      assert(got.length == 1 && got.head.getAs[Long]("ok") == 5L)
      val (planned, total) = ManifestScan.lastPlanned
      assert(planned < total,
        s"doc_key equality must bloom-prune ($planned/$total)")
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("sidecar escaping round-trips keys carrying ',' and '%'") {
    import spark.implicits._
    val root = mkStore(Seq("plain", "a,b", "p%25q", "x%y", "comma,then%pct",
      "k6", "k7", "k8", "k9", "k10", "k11", "k12"))
    try {
      deleteKeysStrMoRDF(spark, root, Seq("a,b", "x%y").toDF("doc_key"))
      val left = load(root).select(col("doc_key")).collect()
        .map(_.getString(0)).toSet
      assert(!left.contains("a,b") && !left.contains("x%y"),
        "masked meta-character keys must vanish")
      assert(left.contains("p%25q") && left.contains("comma,then%pct"),
        "unmasked meta-character keys must survive the escape round-trip")
      assert(left.size == 10)
      rewriteDeletes(spark, root)
      assert(load(root).count() == 10L)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }

  test("keycol validation: Long mono, DOUBLE member, unknown column refused") {
    import spark.implicits._
    def attempt(keycol: String, hint: String,
        extra: (String, org.apache.spark.sql.Column)): Unit = {
      val root = java.nio.file.Files.createTempDirectory("graft_nkey_bad").toString
      try {
        (1L to 3L).map(i => (i, i * 1000L, "A", i, i * 10L))
          .toDF("ok", "ship_us", "flag", "qty", "price_cents")
          .withColumn(extra._1, extra._2)
          .write.format("graft-manifest").option("path", root)
          .option("extracols", hint)
          .option("keycol", keycol).mode("overwrite").save()
      } finally scala.util.Try(org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root)))
    }
    val eLong = intercept[Exception] {
      attempt("bonus", "bonus:l", "bonus" -> (col("ok") * 2))
    }
    assert(eLong.getMessage.contains("STRING"),
      s"Long mono key must be refused, got: ${eLong.getMessage}")
    val eDbl = intercept[Exception] {
      attempt("ok,score", "score:d", "score" -> (col("ok") * 0.5))
    }
    assert(eDbl.getMessage != null &&
      (eDbl.getMessage.contains("DOUBLE") || eDbl.getMessage.contains("D-typed")),
      s"DOUBLE key member must be refused, got: ${eDbl.getMessage}")
    val eUnk = intercept[Exception] {
      attempt("nosuch", "tag:s", "tag" -> lit("x"))
    }
    assert(eUnk.getMessage.contains("nosuch"))
  }

  test("a composite key may include a typed extra member") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_nkey_comp").toString
    try {
      // key = (ok mod 3, src) — neither unique alone
      (1L to 12L).map(i => (i % 3, i * 1000L, "A", i, i * 10L, s"s${i / 3}"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "src")
        .repartitionByRange(3, col("ship_us"))
        .write.format("graft-manifest").option("path", root)
        .option("extracols", "src:s")
        .option("keycol", "ok,src").mode("overwrite").save()
      assert(keyCols(root) == Seq("ok", "src"))
      // update one tuple's non-key values; insert a fresh tuple
      val src = Seq((1L, 99000L, "U", 77L, 770L, "s1"),
          (2L, 98000L, "N", 88L, 880L, "s9"))
        .toDF("ok", "ship_us", "flag", "qty", "price_cents", "src")
      val (_, _, nIns, _) = mergeCompositeDF(spark, root, src)
      assert(nIns == 1L)
      val got = load(root).select(col("ok"), col("src"), col("qty"))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(got((1L, "s1")) == 77L, "matched tuple must update")
      assert(got((2L, "s9")) == 88L, "unmatched tuple must insert")
      assert(got.size == 13)
      // delete by tuple incl. the extra member
      deleteKeysCompositeDF(spark, root,
        Seq((0L, "s1")).toDF("ok", "src"))
      assert(load(root).filter(col("ok") === 0L && col("src") === "s1").isEmpty)
    } finally scala.util.Try(org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root)))
  }
}
