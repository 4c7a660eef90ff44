package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decode/feature-extract as partition-wise batch
  * functions (BASELINE.json north star).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * deterministic fake (seeded from the bytes — clearly marked below);
  * everything around it — binary column handling, schema, partition
  * batch shape, feature vector type — is real and tested. On a real
  * cluster the fake body is swapped for a JNI/library call with the
  * same `Iterator[batch] => Iterator[batch]` shape (the Scala
  * equivalent of a `mapInPandas` batch UDF).
  */
object Multimodal extends Serializable {

  /** q50 — binary ingestion + metadata projection (oracle-checked):
    * text bytes stand in for media payloads; octet length and digest
    * are the typed metadata a media pipeline carries alongside the
    * blob.
    */
  private def q50(spark: SparkSession, dir: String): DataFrame = {
    val d   = Tables.documents(spark, dir)
    val img = to_binary(col("text"), lit("utf-8"))
    d.select(
        col("doc_id"),
        length(img).as("n_bytes"),
        md5(img).as("digest"),
        (length(img) % 640).as("width"),
        // byte-based like width (and like the q50b decode stub, which
        // only sees payload bytes — chars ≠ bytes for multi-byte text)
        ((length(img).cast("long") * 3) % 480).as("height"))
      .orderBy("doc_id")
  }

  private val q50Sql =
    """SELECT doc_id,
      |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
      |       md5(text) AS digest,
      |       CAST(octet_length(encode(text)) % 640 AS INT) AS width,
      |       CAST((octet_length(encode(text)) * 3) % 480 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  /** One decoded media row. `features` is the fixed-width embedding a
    * real decoder would emit.
    */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Int,
      width: Int,
      height: Int,
      features: Array[Float])

  /** Feature width the stub decoder emits — public so specs can assert
    * against it instead of hardcoding the literal.
    */
  val FeatureDim = 8

  /** q50b — the decode/feature-extract stage (rows-only check):
    * partition-wise batch processing over the binary column via
    * `mapPartitions` — one iterator pass per partition, no per-row
    * driver involvement, the exact shape a batched media decoder
    * needs.
    *
    * STUB: the "decode" below fabricates deterministic features from
    * the payload bytes (rolling hash per stripe). A real deployment
    * replaces ONLY the body of `decode` with the codec call.
    */
  private def q50b(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"), to_binary(col("text"), lit("utf-8")).as("payload"))
      .as[(Long, Array[Byte])]

    def decode(docId: Long, payload: Array[Byte]): MediaFeatures = {
      // ---- STUB decode: deterministic fake, NOT a real codec ----
      val stripe = math.max(1, payload.length / FeatureDim)
      val feats = Array.tabulate(FeatureDim) { i =>
        var h = 17L
        var j = i * stripe
        val end = math.min(payload.length, (i + 1) * stripe)
        while (j < end) { h = h * 31 + (payload(j) & 0xff); j += 1 }
        // floorMod: the rolling hash overflows Long and Scala's % keeps
        // the dividend's sign — features must land in [0,1)
        java.lang.Math.floorMod(h, 1000L).toFloat / 1000f
      }
      MediaFeatures(docId, payload.length, payload.length % 640,
        (payload.length * 3) % 480, feats)
    }

    // One scalar column per feature dim (not a raw array<float>): the
    // driver's rows-only check sorts every output column, and an array
    // column is unsortable there; wide scalar columns are also the
    // friendlier layout for columnar storage of fixed-width features.
    val featCols = (0 until FeatureDim).map(i => col("features").getItem(i).as(s"f$i"))
    d.mapPartitions(it => it.map { case (id, bytes) => decode(id, bytes) })
      .toDF()
      .select(Seq(col("doc_id"), col("n_bytes"), col("width"), col("height")) ++ featCols: _*)
      .orderBy("doc_id")
  }

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q50_multimodal_meta",   q50, Some(q50Sql)),
    QuerySpec("q50b_decode_features",  q50b, None),
  )
}
