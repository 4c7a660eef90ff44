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

  /** Frame width (chars) for q50c's frame interpretation. Payload
    * text is ASCII in this corpus, so char frames = byte frames; the
    * oracle relies on that equivalence (documented, spec-checked).
    */
  private val FrameLen = 16

  /** One frame-sampled "video": stride-th frames digested. */
  final case class FrameSample(
      doc_id: Long, n_frames: Int, stride: Int, n_sampled: Int, sample_digest: String)

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** q50c — frame sampling (oracle-checked): treat the payload as a
    * sequence of fixed-width frames and keep every stride-th one (the
    * video keyframe-sampling step of a multimodal pipeline), stride
    * driven by per-row metadata. Same partition-batch shape as q50b —
    * one `mapPartitions` iterator pass, no shuffle before the
    * contract sort; a real deployment replaces the substring slicing
    * with the demuxer call, keeping schema and batch shape. The
    * sampling arithmetic is pure integer math and the digest is md5,
    * so the whole op is engine-portable and the oracle verifies the
    * SAMPLED BYTES (via digest), not just counts.
    */
  private def q50c(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val nFrames = (text.length + FrameLen - 1) / FrameLen
        val stride = (id % 4 + 2).toInt
        val sampled = (0 until nFrames by stride)
          .map(i => text.substring(i * FrameLen, math.min(text.length, (i + 1) * FrameLen)))
        FrameSample(id, nFrames, stride, sampled.length, md5hex(sampled.mkString))
      })
      .toDF()
      .orderBy("doc_id")
  }

  private val q50cSql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         CAST(ceil(len(text) / $FrameLen.0) AS INT) AS nf,
       |         CAST(doc_id % 4 + 2 AS INT) AS stride
       |  FROM documents),
       |s AS (SELECT doc_id, nf, stride, i,
       |             substr(text, i * $FrameLen + 1, $FrameLen) AS frame
       |      FROM (SELECT *, unnest(range(0, nf)) AS i FROM f)
       |      WHERE i % stride = 0)
       |SELECT doc_id, MIN(nf) AS n_frames, MIN(stride) AS stride,
       |       CAST(COUNT(*) AS INT) AS n_sampled,
       |       md5(string_agg(frame, '' ORDER BY i)) AS sample_digest
       |FROM s GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Thumbnail edge (pixels) for q50d. */
  private val ThumbDim = 8

  final case class Resized(doc_id: Long, w: Int, h: Int, thumb_digest: String)

  /** q50d — resize (oracle-checked): interpret the payload as a w×h
    * byte grid (w from per-row metadata) and nearest-neighbor
    * downsample to an 8×8 thumbnail — the resize step of an image
    * pipeline, with the codec call stubbed by direct byte sampling.
    * Pure integer source-index arithmetic (`(r·h)/8·w + (c·w)/8`,
    * clamped), digest over the 64 sampled chars, so the oracle
    * verifies the exact sampled pixels. Partition-batch shape as
    * q50b/q50c.
    */
  private def q50d(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val n = text.length
        val w = n % 63 + 2
        val h = (n + w - 1) / w
        val thumb = new StringBuilder(ThumbDim * ThumbDim)
        var r = 0
        while (r < ThumbDim) {
          var c = 0
          while (c < ThumbDim) {
            val idx = math.min(n - 1, (r * h / ThumbDim) * w + (c * w / ThumbDim))
            thumb += text.charAt(idx)
            c += 1
          }
          r += 1
        }
        Resized(id, w, h, md5hex(thumb.result()))
      })
      .toDF()
      .orderBy("doc_id")
  }

  private val q50dSql =
    s"""WITH d AS (
       |  SELECT doc_id, text, len(text) AS n,
       |         CAST(len(text) % 63 + 2 AS INT) AS w
       |  FROM documents),
       |g AS (SELECT *, CAST((n + w - 1) // w AS INT) AS h FROM d),
       |px AS (
       |  SELECT doc_id, w, h, i,
       |         substr(text,
       |                CAST(LEAST(n - 1, ((i // $ThumbDim) * h // $ThumbDim) * w
       |                                  + ((i % $ThumbDim) * w // $ThumbDim)) AS INT) + 1,
       |                1) AS px
       |  FROM (SELECT *, unnest(range(0, ${ThumbDim * ThumbDim})) AS i FROM g))
       |SELECT doc_id, MIN(w) AS w, MIN(h) AS h,
       |       md5(string_agg(px, '' ORDER BY i)) AS thumb_digest
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q50_multimodal_meta",   q50, Some(q50Sql)),
    QuerySpec("q50b_decode_features",  q50b, None),
    QuerySpec("q50c_frame_sampling",   q50c, Some(q50cSql)),
    QuerySpec("q50d_resize_thumb",     q50d, Some(q50dSql)),
  )
}
