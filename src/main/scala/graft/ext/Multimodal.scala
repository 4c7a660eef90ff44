package graft.ext

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decode/feature-extract as partition-wise batch
  * functions (BASELINE.json north star).
  *
  * STUB BOUNDARY (round 9): every media family now has a REAL
  * round-trip path. IMAGE — q50e runs genuine `javax.imageio` PNG and
  * BMP codecs (JDK-stdlib, offline) through the partition-batch seam,
  * oracle-checked end to end via the lossless-round-trip trick
  * documented there. AUDIO — q50f round-trips WAV PCM through
  * `javax.sound.sampled.AudioSystem` under the same trick. VIDEO —
  * q50g wraps real-codec PNG frames in a genuine AVI RIFF container
  * (repo-authored encoder/parser per the public RIFF/AVI layout; the
  * JDK ships no video API) and certifies container parse + per-frame
  * codec decode through the same lossless gate. The q50b
  * rolling-hash "decode" remains as the clearly-marked deterministic
  * stand-in demonstrating the generic feature-vector seam: on a real
  * cluster its fake body is swapped for a JNI/library call with the
  * same `Iterator[batch] => Iterator[batch]` shape (the Scala
  * equivalent of a `mapInPandas` batch UDF).
  */
object Multimodal extends Serializable {

  // ImageIO's default FILE cache creates (and deletes) one temp file
  // in java.io.tmpdir PER encode/decode call — q50g's round-trip is
  // ~30k calls per run, and a tmpdir bloated by hundreds of earlier
  // queries' store directories turned the r14 full-sweep q50g from
  // ~5s to ~29s (isolated runs were unaffected — classic
  // state-dependent slowdown). Our frames are tiny; the MEMORY cache
  // is strictly faster and immune to tmpdir state.
  javax.imageio.ImageIO.setUseCache(false)

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

  /** q50b — the decode/feature-extract stage (ORACLE-CHECKED):
    * partition-wise batch processing over the binary column via
    * `mapPartitions` — one iterator pass per partition, no per-row
    * driver involvement, the exact shape a batched media decoder
    * needs.
    *
    * STUB: the "decode" below fabricates deterministic features from
    * the payload bytes (rolling hash per stripe). A real deployment
    * replaces ONLY the body of `decode` with the codec call. The stub
    * arithmetic is chosen to be ENGINE-PORTABLE so DuckDB re-derives
    * every feature (the rolling fold as a recursive CTE stepping one
    * byte per iteration): the hash folds mod the prime 1000003 —
    * `h·31 + byte < 2^26`, no overflow anywhere (DuckDB ERRORS on
    * BIGINT overflow, so a mod-2^64 hash would be unmirrorable) — and
    * features quantize to `(h mod 1024)/1024`, a power-of-two divisor
    * so the float32 value widens to EXACTLY the double DuckDB
    * computes (k/1000 would differ in low bits between f32 and f64
    * rounding and break the hash gate). Relies on the ASCII corpus
    * (byte = `ord(char)`), same guard as q50c/q50d.
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
        while (j < end) { h = (h * 31 + (payload(j) & 0xff)) % 1000003L; j += 1 }
        (h % 1024).toFloat / 1024f
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

  /** DuckDB mirror of the q50b stub: the per-stripe rolling fold is a
    * recursive CTE advancing one byte per iteration — all (doc,
    * stripe) states step in parallel, so iterations = longest stripe,
    * not corpus size (NOTES.md: the q70 precedent at sf0.1).
    */
  private val q50bSql = {
    val featAggs = (0 until FeatureDim)
      .map(i => s"MAX(CASE WHEN i = $i THEN (h % 1024) / 1024.0 END) AS f$i")
      .mkString(",\n       |         ")
    s"""WITH RECURSIVE d AS (
       |  SELECT doc_id, text, CAST(octet_length(encode(text)) AS INT) AS n FROM documents),
       |st AS (
       |  SELECT doc_id, text, n, GREATEST(1, n // $FeatureDim) AS stripe,
       |         unnest(range(0, $FeatureDim)) AS i
       |  FROM d),
       |roll AS (
       |  SELECT doc_id, text, i,
       |         CAST(i * stripe AS BIGINT) AS j,
       |         CAST(LEAST(n, (i + 1) * stripe) AS BIGINT) AS e,
       |         17::BIGINT AS h
       |  FROM st
       |  UNION ALL
       |  SELECT doc_id, text, i, j + 1, e,
       |         (h * 31 + ord(substr(text, CAST(j AS INT) + 1, 1))) % 1000003
       |  FROM roll WHERE j < e),
       |f AS (SELECT doc_id, i, h FROM roll WHERE j >= e),
       |feat AS (
       |  SELECT doc_id,
       |         $featAggs
       |  FROM f GROUP BY doc_id)
       |SELECT d.doc_id, d.n AS n_bytes, CAST(d.n % 640 AS INT) AS width,
       |       CAST((d.n * 3) % 480 AS INT) AS height,
       |       ${(0 until FeatureDim).map(i => s"f$i").mkString(", ")}
       |FROM d JOIN feat USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Frame width (chars) for q50c's frame interpretation. Payload
    * text is ASCII in this corpus, so char frames = byte frames; the
    * oracle relies on that equivalence (documented, spec-checked).
    */
  private val FrameLen = 16

  /** q50c — frame sampling (oracle-checked): treat the payload as a
    * sequence of fixed-width frames and keep every stride-th one (the
    * video keyframe-sampling step of a multimodal pipeline), stride
    * driven by per-row metadata. Pure Catalyst column composition —
    * sequence/filter over frame indices, `substr` slicing, one md5 —
    * so the scan stays columnar with no DeserializeToObject in the
    * plan and no shuffle before the contract sort (the earlier
    * `mapPartitions` formulation paid object ser/de for what is
    * relational integer math; the partition-batch seam a REAL codec
    * needs is demonstrated where the codec actually sits, q50b). The
    * oracle verifies the SAMPLED BYTES (via digest), not just counts.
    */
  private def q50c(spark: SparkSession, dir: String): DataFrame = {
    val n = length(col("text"))
    val nf = floor((n + lit(FrameLen - 1)) / lit(FrameLen)).cast("int")
    val stride = (col("doc_id") % 4 + 2).cast("int")
    // guard nf = 0: sequence(0, -1) would generate a DESCENDING range
    val idxs = when(nf > 0, filter(sequence(lit(0), nf - 1), i => i % stride === 0))
      .otherwise(array().cast("array<int>"))
    // transform + array_join, NOT aggregate + concat: the sequential
    // fold re-copies the accumulator string per step (quadratic chars)
    // and measured 8s at sf0.1 in q50d's 64-step form; one substr per
    // element and a single join is linear
    val sampled = array_join(
      transform(idxs, i => col("text").substr(i * FrameLen + 1, lit(FrameLen))), "")
    Tables.documents(spark, dir)
      .select(col("doc_id"), nf.as("n_frames"), stride.as("stride"),
        size(idxs).as("n_sampled"),
        md5(to_binary(sampled, lit("utf-8"))).as("sample_digest"))
      .orderBy("doc_id")
  }

  // LEFT JOIN from all docs (not GROUP BY over sampled frames alone):
  // an empty text has nf = 0 and no frame rows, but the Spark side
  // still emits its row (n_sampled 0, digest md5('')) — the oracle
  // must too, or the gate breaks on row count the day the corpus
  // gains an empty document (q50d handles the same edge with its
  // GREATEST clamp).
  private val q50cSql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         CAST(ceil(len(text) / $FrameLen.0) AS INT) AS nf,
       |         CAST(doc_id % 4 + 2 AS INT) AS stride
       |  FROM documents),
       |s AS (SELECT doc_id, i,
       |             substr(text, i * $FrameLen + 1, $FrameLen) AS frame
       |      FROM (SELECT *, unnest(range(0, nf)) AS i FROM f)
       |      WHERE i % stride = 0),
       |a AS (SELECT doc_id, CAST(COUNT(*) AS INT) AS n_sampled,
       |             md5(string_agg(frame, '' ORDER BY i)) AS dg
       |      FROM s GROUP BY doc_id)
       |SELECT f.doc_id, f.nf AS n_frames, f.stride,
       |       COALESCE(a.n_sampled, 0) AS n_sampled,
       |       COALESCE(a.dg, md5('')) AS sample_digest
       |FROM f LEFT JOIN a USING (doc_id) ORDER BY f.doc_id""".stripMargin

  /** Thumbnail edge (pixels) for q50d. */
  private val ThumbDim = 8

  /** q50d — resize (oracle-checked): interpret the payload as a w×h
    * byte grid (w from per-row metadata) and nearest-neighbor
    * downsample to an 8×8 thumbnail — the resize step of an image
    * pipeline, with the codec call stubbed by direct byte sampling.
    * Pure integer source-index arithmetic (`(r·h)/8·w + (c·w)/8`,
    * clamped to [0, n−1]), digest over the 64 sampled chars, so the
    * oracle verifies the exact sampled pixels. Catalyst column
    * composition like q50c — columnar scan, no DeserializeToObject
    * (integer division via floor(double): every operand is < 2^31, so
    * the double quotient is exact and floor ≡ integer division). An
    * empty payload needs no guard in this form: every clamped index
    * is 0 and `substr("", 1, 1)` contributes "", digesting to
    * md5("") — the same sentinel the oracle's GREATEST-clamped rows
    * produce.
    */
  private def q50d(spark: SparkSession, dir: String): DataFrame = {
    def idiv(a: Column, b: Column): Column = floor(a / b).cast("int")
    // n/w/h land as row attributes FIRST: referenced unhoisted inside
    // the 64-element lambda, each mention would re-evaluate its full
    // expression per element — length() alone is an O(len) char scan,
    // reintroducing the O(64·len) cost the native gather removes
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      .withColumn("w", (col("n") % 63 + 2).cast("int"))
      .withColumn("h", idiv(col("n") + col("w") - 1, col("w")))
    // index arithmetic as a Catalyst transform (cheap int ops); the
    // gather itself through the native chars_at — 64 `substr` calls
    // per row would each rescan the string to locate the char position
    // (O(64·len), measured ~8s at sf0.1 vs 0.3s for the whole op)
    val positions = transform(sequence(lit(0), lit(ThumbDim * ThumbDim - 1)), i => {
      val r = idiv(i, lit(ThumbDim))
      val c = i % ThumbDim
      greatest(lit(0),
        least(col("n") - 1,
          idiv(r * col("h"), lit(ThumbDim)) * col("w") + idiv(c * col("w"), lit(ThumbDim))))
    })
    val thumb = graft.functions.chars_at(col("text"), positions)
    base
      .select(col("doc_id"), col("w"), col("h"),
        md5(to_binary(thumb, lit("utf-8"))).as("thumb_digest"))
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
       |                CAST(GREATEST(0, LEAST(n - 1, ((i // $ThumbDim) * h // $ThumbDim) * w
       |                                  + ((i % $ThumbDim) * w // $ThumbDim))) AS INT) + 1,
       |                1) AS px
       |  FROM (SELECT *, unnest(range(0, ${ThumbDim * ThumbDim})) AS i FROM g))
       |SELECT doc_id, MIN(w) AS w, MIN(h) AS h,
       |       md5(string_agg(px, '' ORDER BY i)) AS thumb_digest
       |FROM px GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** q120 — CROSS-PAYLOAD duplicate-frame detection: the multimodal
    * family's corpus-level op (q50–q50d are all per-row). Every
    * payload splits into its [[FrameLen]] frames (the q50c framing),
    * each frame leaves the scan as an md5 digest, and a frame digest
    * seen in ≥2 distinct payloads marks every occurrence as shared —
    * the "duplicated video segment / repeated image tile" signal a
    * multimodal training pipeline deduplicates on, reported per doc
    * as a shared-frame ratio in exact micros. Exact-duplicate
    * payloads light up completely; partially-overlapping payloads
    * light up on their aligned common frames.
    *
    * Scale shape: frames shuffle as fixed-width digests keyed by
    * digest (never payload bytes, never doc×doc), the shared-digest
    * table is bounded by duplicate volume, and the report is one
    * per-doc partial agg. Docs with empty payloads have no frames and
    * are excluded by both engines.
    */
  private def q120(spark: SparkSession, dir: String): DataFrame = {
    val n = length(col("text"))
    val nf = floor((n + lit(FrameLen - 1)) / lit(FrameLen)).cast("int")
    val frames = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"), nf.as("nf"))
      .filter(col("nf") > 0)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(0), col("nf") - 1)).as("i"))
      .select(col("doc_id"),
        md5(to_binary(col("text").substr(col("i") * FrameLen + 1, lit(FrameLen)),
          lit("utf-8"))).as("fh"))
    val shared = frames.groupBy(col("fh"))
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("fh"))
    frames.join(shared.withColumn("hit", lit(1L)), Seq("fh"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_frames"),
        sum(coalesce(col("hit"), lit(0L))).as("n_shared_frames"))
      .withColumn("shared_micro", expr("(n_shared_frames * 1000000) DIV n_frames"))
      .orderBy("doc_id")
  }

  private val q120Sql =
    s"""WITH f AS (
       |  SELECT doc_id, text,
       |         CAST(ceil(len(text) / $FrameLen.0) AS INT) AS nf
       |  FROM documents),
       |fr AS (
       |  SELECT doc_id, md5(substr(text, i * $FrameLen + 1, $FrameLen)) AS fh
       |  FROM (SELECT doc_id, text, unnest(range(0, nf)) AS i FROM f)),
       |sh AS (SELECT fh FROM fr GROUP BY fh HAVING COUNT(DISTINCT doc_id) >= 2)
       |SELECT fr.doc_id, COUNT(*) AS n_frames,
       |       CAST(SUM(CASE WHEN sh.fh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_frames,
       |       CAST((SUM(CASE WHEN sh.fh IS NOT NULL THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
       |         AS shared_micro
       |FROM fr LEFT JOIN sh ON fr.fh = sh.fh
       |GROUP BY fr.doc_id ORDER BY fr.doc_id""".stripMargin

  /** Pixel-synthesis formula shared by the q50e engine side and its
    * oracle: channel values of the w×h image for `doc_id` at (x, y).
    * Pure mod-256 integer arithmetic so DuckDB re-derives each pixel.
    */
  private[ext] def q50ePixel(docId: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((docId + 3L * x + 5L * y) % 256).toInt,
    ((2L * docId + x + 7L * y) % 256).toInt,
    ((x.toLong * y + docId) % 256).toInt)

  /** One decoded q50e row; `thumb` is the canonical string of the 64
    * nearest-neighbor-sampled pixels ("r,g,b" joined by ";").
    */
  final case class DecodedImage(
      doc_id: Long, fmt: String, w: Int, h: Int, n_png_bytes: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, thumb: String)

  /** q50e — REAL IMAGE CODEC ROUND-TRIP (oracle-checked): per doc,
    * synthesize a small w×h RGB image from a deterministic pixel
    * formula, ENCODE it with the genuine `javax.imageio` writer (PNG
    * for even doc_ids, BMP for odd — two real, lossless, JDK-stdlib
    * codecs), then DECODE the encoded bytes with `ImageIO.read` and
    * extract features from the DECODED pixels: exact per-channel
    * sums and the q50d-style 8×8 nearest-neighbor thumbnail digest.
    * All of it runs inside one `mapPartitions` batch — the partition
    * seam q50b demonstrates, now with a real codec in the middle.
    *
    * Why this is oracle-checkable without a codec in DuckDB: PNG and
    * 24-bit BMP are LOSSLESS, so decode(encode(pixels)) == pixels
    * bit-for-bit, and the oracle can re-derive every feature straight
    * from the synthesis formula. The hash gate therefore certifies
    * the full encode→bytes→decode path end to end: any codec
    * corruption, channel swap, row-order bug, or stride error in the
    * engine's decode handling would change the sums or the thumbnail
    * digest and hash-mismatch. The encoded SIZE is deliberately NOT
    * in the output (PNG byte counts are encoder-implementation
    * detail); the spec pins it positive instead.
    *
    * Scale shape: map-only per-row codec work (the embarrassingly
    * parallel regime media decode lives in at 100 TB), no shuffle
    * before the contract sort; image dims are bounded (≤ 31×31) so a
    * row's working set is constant.
    */
  private def q50e(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the codec map is CPU-heavy and embarrassingly parallel, but the
    // testdata table is ONE parquet file = one scan partition — fan the
    // bounded id column out to every core before the per-row codec
    // work (at 100 TB the scan has thousands of partitions and this
    // repartition of an 8-byte column is noise)
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val decoded = ids.mapPartitions { it =>
      it.map { docId =>
        val w = (16 + docId % 16).toInt
        val h = (16 + (docId * 7) % 16).toInt
        val fmt = if (docId % 2 == 0) "png" else "bmp"
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val (r, g, b) = q50ePixel(docId, x, y)
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        require(javax.imageio.ImageIO.write(img, fmt, bos),
          s"no $fmt writer — javax.imageio missing from this JVM")
        val payload = bos.toByteArray // the opaque binary column
        // ---- REAL decode: the genuine ImageIO PNG/BMP reader ----
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))
        var (sr, sg, sb) = (0L, 0L, 0L)
        y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = back.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        val thumb = (0 until ThumbDim * ThumbDim).map { i =>
          val sx = ((i % ThumbDim) * w) / ThumbDim
          val sy = ((i / ThumbDim) * h) / ThumbDim
          val p = back.getRGB(sx, sy)
          s"${(p >> 16) & 0xff},${(p >> 8) & 0xff},${p & 0xff}"
        }.mkString(";")
        DecodedImage(docId, fmt, w, h, payload.length, sr, sg, sb, thumb)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("fmt"), col("w"), col("h"),
        col("sum_r"), col("sum_g"), col("sum_b"),
        md5(to_binary(col("thumb"), lit("utf-8"))).as("thumb_digest"))
      .orderBy("doc_id")
  }

  private val q50eSql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'bmp' END AS fmt,
       |         CAST(16 + doc_id % 16 AS INT) AS w,
       |         CAST(16 + (doc_id * 7) % 16 AS INT) AS h
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, w, h, x, y,
       |         (doc_id + 3 * x + 5 * y) % 256 AS r,
       |         (2 * doc_id + x + 7 * y) % 256 AS g,
       |         (x * y + doc_id) % 256 AS b
       |  FROM (SELECT *, unnest(range(0, h)) AS y
       |        FROM (SELECT *, unnest(range(0, w)) AS x FROM d))),
       |sums AS (
       |  SELECT doc_id, CAST(SUM(r) AS BIGINT) AS sum_r,
       |         CAST(SUM(g) AS BIGINT) AS sum_g, CAST(SUM(b) AS BIGINT) AS sum_b
       |  FROM px GROUP BY doc_id),
       |th AS (
       |  SELECT doc_id,
       |         md5(string_agg(
       |           ((doc_id + 3 * sx + 5 * sy) % 256) || ',' ||
       |           ((2 * doc_id + sx + 7 * sy) % 256) || ',' ||
       |           ((sx * sy + doc_id) % 256), ';' ORDER BY i)) AS thumb_digest
       |  FROM (SELECT doc_id, i,
       |               ((i % $ThumbDim) * w) // $ThumbDim AS sx,
       |               ((i // $ThumbDim) * h) // $ThumbDim AS sy
       |        FROM (SELECT *, unnest(range(0, ${ThumbDim * ThumbDim})) AS i FROM d))
       |  GROUP BY doc_id)
       |SELECT d.doc_id, d.fmt, d.w, d.h, sums.sum_r, sums.sum_g, sums.sum_b,
       |       th.thumb_digest
       |FROM d JOIN sums USING (doc_id) JOIN th USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  /** Sample-synthesis formula shared by the q50f engine side and its
    * oracle: signed 16-bit PCM sample i of `doc_id`'s waveform. Pure
    * non-negative integer arithmetic before the bias so Spark's and
    * DuckDB's `%` agree exactly.
    */
  private[ext] def q50fSample(docId: Long, i: Long): Int =
    ((docId * 131L + 17L * i + i * i) % 65536L - 32768L).toInt

  /** Strided digest width (samples) for the q50f waveform digest. */
  private[ext] val WaveDigestN = 64

  /** One decoded q50f row; `wave` is the canonical string of the 64
    * strided samples joined by ";".
    */
  final case class DecodedAudio(
      doc_id: Long, n_samples: Int, sample_rate: Int, bits: Int,
      channels: Int, sum_s: Long, energy: Long, zero_x: Long, wave: String)

  /** q50f — REAL AUDIO CODEC ROUND-TRIP (oracle-checked): per doc,
    * synthesize 800–1600 samples of 16-bit mono PCM from a
    * deterministic integer formula, ENCODE to a genuine WAV container
    * with `javax.sound.sampled.AudioSystem` (JDK stdlib — the audio
    * analog of q50e's `javax.imageio`), then DECODE the WAV bytes
    * back through `AudioSystem.getAudioInputStream` and extract
    * features from the DECODED stream: header metadata (rate/bits/
    * channels — certifies the fmt-chunk parse), exact sample sum,
    * integer energy (Σs², bounded < 2^41 so BIGINT-exact), signed
    * zero-crossing count, and an md5 digest of 64 strided samples.
    *
    * WAV PCM is LOSSLESS, so decode(encode(samples)) == samples
    * byte-for-byte and the DuckDB oracle re-derives every feature
    * straight from the synthesis formula — the hash gate certifies
    * the full encode→container→decode path (any endianness slip,
    * header misparse, off-by-one frame, or sign error changes a sum
    * or the digest). With q50e this narrowed the honest stub boundary
    * to VIDEO only — closed in turn by q50g's AVI container path.
    *
    * Scale shape: map-only per-row codec work, no shuffle before the
    * contract sort; ≤1600 samples ⇒ constant per-row working set.
    */
  private def q50f(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the codec map is CPU-heavy and embarrassingly parallel, but the
    // testdata table is ONE parquet file = one scan partition — fan the
    // bounded id column out to every core before the per-row codec
    // work (at 100 TB the scan has thousands of partitions and this
    // repartition of an 8-byte column is noise)
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val decoded = ids.mapPartitions { it =>
      it.map { docId =>
        val n = (800L + (docId * 13L) % 801L).toInt
        val raw = new Array[Byte](2 * n)
        var i = 0
        while (i < n) {
          val s = q50fSample(docId, i)
          raw(2 * i) = (s & 0xff).toByte
          raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(raw), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(
          ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        val payload = bos.toByteArray // the opaque binary column
        // ---- REAL decode: the genuine JDK WAV reader ----
        val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        val bf = back.getFormat
        require(bf.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
          && !bf.isBigEndian, s"unexpected decoded encoding: $bf")
        val data = back.readAllBytes()
        val m = data.length / 2
        var (sum, energy, zeroX) = (0L, 0L, 0L)
        var prev = 0
        i = 0
        while (i < m) {
          val s = (data(2 * i + 1) << 8) | (data(2 * i) & 0xff)
          sum += s; energy += s.toLong * s
          if (i > 0 && (prev < 0) != (s < 0)) zeroX += 1
          prev = s
          i += 1
        }
        val wave = (0 until WaveDigestN).map { k =>
          val idx = (k * m) / WaveDigestN
          (data(2 * idx + 1) << 8) | (data(2 * idx) & 0xff)
        }.mkString(";")
        DecodedAudio(docId, m, bf.getSampleRate.toInt, bf.getSampleSizeInBits,
          bf.getChannels, sum, energy, zeroX, wave)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("n_samples"), col("sample_rate"),
        col("bits"), col("channels"), col("sum_s"), col("energy"),
        col("zero_x"), md5(to_binary(col("wave"), lit("utf-8"))).as("wave_digest"))
      .orderBy("doc_id")
  }

  private val q50fSql =
    s"""WITH d AS (
       |  SELECT doc_id, CAST(800 + (doc_id * 13) % 801 AS INT) AS n
       |  FROM documents),
       |smp AS (
       |  SELECT doc_id, n, i,
       |         (doc_id * 131 + 17 * i + i * i) % 65536 - 32768 AS s
       |  FROM (SELECT doc_id, n, unnest(range(0, n)) AS i FROM d)),
       |agg AS (
       |  SELECT doc_id,
       |         CAST(SUM(s) AS BIGINT) AS sum_s,
       |         CAST(SUM(s * s) AS BIGINT) AS energy,
       |         CAST(COUNT(*) FILTER (
       |           WHERE prev IS NOT NULL AND (prev < 0) != (s < 0)) AS BIGINT) AS zero_x
       |  FROM (SELECT doc_id, s,
       |               LAG(s) OVER (PARTITION BY doc_id ORDER BY i) AS prev
       |        FROM smp)
       |  GROUP BY doc_id),
       |wv AS (
       |  SELECT doc_id,
       |         md5(string_agg(
       |           (doc_id * 131 + 17 * sidx + sidx * sidx) % 65536 - 32768,
       |           ';' ORDER BY k)) AS wave_digest
       |  FROM (SELECT doc_id, k, (k * n) // $WaveDigestN AS sidx
       |        FROM (SELECT doc_id, n, unnest(range(0, $WaveDigestN)) AS k FROM d))
       |  GROUP BY doc_id)
       |SELECT d.doc_id, d.n AS n_samples,
       |       8000 AS sample_rate, 16 AS bits, 1 AS channels,
       |       agg.sum_s, agg.energy, agg.zero_x, wv.wave_digest
       |FROM d JOIN agg USING (doc_id) JOIN wv USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  // ------------------------------------------------------------------
  // q50g — VIDEO: a genuine AVI (RIFF) container wrapping real-codec
  // PNG frames. The JDK ships no video API, so the CONTAINER layer is
  // repo-authored straight from the public RIFF/AVI layout (chunk
  // fourCCs + little-endian sizes + even padding + idx1 index); the
  // per-frame CODEC inside is the genuine `javax.imageio` PNG codec
  // (same one q50e certifies). Together they close the last stub:
  // every media family (image/audio/video) now round-trips through a
  // real container or codec path.
  // ------------------------------------------------------------------

  /** Per-frame pixel-synthesis formula shared by the q50g engine side
    * and its oracle: channel values of frame `f` at (x, y). Pure
    * non-negative mod-256 integer arithmetic so DuckDB re-derives
    * every pixel of every frame.
    */
  private[ext] def q50gPixel(docId: Long, f: Int, x: Int, y: Int): (Int, Int, Int) = (
    ((docId + 3L * x + 5L * y + 11L * f) % 256).toInt,
    ((2L * docId + x + 7L * y + 13L * f) % 256).toInt,
    ((x.toLong * y + docId + f.toLong * f) % 256).toInt)

  /** Strided digest width (samples across frames) for q50g. */
  private[ext] val VideoDigestN = 64

  /** Header metadata recovered by [[aviDecode]]'s container parse:
    * everything q50g reports about shape/timing comes from HERE (the
    * parsed avih/strh/strf chunks), not from the synthesis inputs.
    */
  private[ext] final case class AviMeta(
      microSecPerFrame: Long, totalFrames: Int, width: Int, height: Int,
      handler: String, rate: Int, scale: Int)

  private def leChunk(id: String, body: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(body.length + 9)
    bos.write(id.getBytes("US-ASCII"))
    val n = body.length
    bos.write(n & 0xff); bos.write((n >> 8) & 0xff)
    bos.write((n >> 16) & 0xff); bos.write((n >> 24) & 0xff)
    bos.write(body)
    if ((n & 1) == 1) bos.write(0) // RIFF chunks pad to even sizes
    bos.toByteArray
  }

  private def leList(kind: String, body: Array[Byte]): Array[Byte] =
    leChunk("LIST", kind.getBytes("US-ASCII") ++ body)

  private def le32(vs: Long*): Array[Byte] = {
    val out = new Array[Byte](4 * vs.length)
    vs.zipWithIndex.foreach { case (v, i) =>
      out(4 * i) = (v & 0xff).toByte
      out(4 * i + 1) = ((v >> 8) & 0xff).toByte
      out(4 * i + 2) = ((v >> 16) & 0xff).toByte
      out(4 * i + 3) = ((v >> 24) & 0xff).toByte
    }
    out
  }

  private def le16(vs: Int*): Array[Byte] = {
    val out = new Array[Byte](2 * vs.length)
    vs.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = (v & 0xff).toByte
      out(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    out
  }

  /** ENCODE: wrap already-encoded frame payloads in a standard AVI
    * RIFF container — `RIFF('AVI ' LIST(hdrl avih LIST(strl strh
    * strf)) LIST(movi 00dc…) idx1)` — with the MPNG (Motion-PNG)
    * stream handler fourCC, little-endian sizes, even-size chunk
    * padding (PNG payloads have odd lengths, so the pad path really
    * runs), and a keyframe idx1 index whose offsets are relative to
    * the `movi` fourCC per the AVI 1.0 convention.
    */
  private[ext] def aviEncode(
      frames: Seq[Array[Byte]], w: Int, h: Int, rate: Int): Array[Byte] = {
    val maxF = frames.map(_.length).max
    val avih = leChunk("avih", le32(
      1000000L / rate, 0L, 0L, 0x10L /*AVIF_HASINDEX*/, frames.length.toLong,
      0L, 1L, maxF.toLong, w.toLong, h.toLong, 0L, 0L, 0L, 0L))
    val strh = leChunk("strh",
      "vids".getBytes("US-ASCII") ++ "MPNG".getBytes("US-ASCII") ++
        le32(0L, 0L, 0L, 1L /*scale*/, rate.toLong, 0L, frames.length.toLong,
          maxF.toLong, 0L, 0L) ++ le16(0, 0, w, h))
    val strf = leChunk("strf", le32(40L, w.toLong, h.toLong) ++ le16(1, 24) ++
      "MPNG".getBytes("US-ASCII") ++ le32(w.toLong * h * 3, 0L, 0L, 0L, 0L))
    val hdrl = leList("hdrl", avih ++ leList("strl", strh ++ strf))
    // assemble movi, tracking each chunk's offset from the movi fourCC
    val moviBody = new java.io.ByteArrayOutputStream()
    moviBody.write("movi".getBytes("US-ASCII"))
    val idx = new java.io.ByteArrayOutputStream()
    frames.foreach { fb =>
      val off = moviBody.size() // == 4 for the first chunk
      moviBody.write(leChunk("00dc", fb))
      idx.write("00dc".getBytes("US-ASCII"))
      idx.write(le32(0x10L /*AVIIF_KEYFRAME*/, off.toLong, fb.length.toLong))
    }
    val movi = leChunk("LIST", moviBody.toByteArray)
    leChunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
      leChunk("idx1", idx.toByteArray))
  }

  /** DECODE: parse the RIFF structure back — verify the RIFF/`AVI `
    * magic, walk the chunk tree honoring little-endian sizes and even
    * padding, read shape/timing metadata out of avih/strh/strf,
    * require the vids/MPNG stream header, collect the `00dc` frame
    * payloads, and cross-check the idx1 index (entry count, per-entry
    * offsets and sizes) against the frames actually found. Returns
    * the parsed header metadata and the raw frame payloads (still
    * codec-encoded; the caller runs the real PNG decoder on each).
    */
  private[ext] def aviDecode(b: Array[Byte]): (AviMeta, Vector[Array[Byte]]) = {
    def u32(o: Int): Long = (b(o) & 0xffL) | (b(o + 1) & 0xffL) << 8 |
      (b(o + 2) & 0xffL) << 16 | (b(o + 3) & 0xffL) << 24
    def cc(o: Int): String = new String(b, o, 4, "US-ASCII")
    require(b.length >= 12 && cc(0) == "RIFF" && cc(8) == "AVI ",
      "not an AVI RIFF stream")
    require(u32(4) == b.length - 8, "RIFF size does not span the stream")

    var avih: Option[Array[Long]] = None       // the 14 avih dwords
    var strhHandler: String = ""
    var strhRate, strhScale = 0L
    var frames = Vector.empty[Array[Byte]]
    var frameOffs = Vector.empty[Long]         // offsets from movi fourCC
    var idx1 = Vector.empty[(String, Long, Long)] // (id, offset, size)
    // located by a linear top-level pre-scan so 00dc offsets can be
    // checked against idx1's movi-fourCC-relative convention
    var moviBodyStart = -1
    var o = 12
    while (o + 8 <= b.length && moviBodyStart < 0) {
      if (cc(o) == "LIST" && cc(o + 8) == "movi") moviBodyStart = o + 12
      o += 8 + u32(o + 4).toInt + (u32(o + 4).toInt & 1)
    }
    require(moviBodyStart > 0, "no movi list in the container")

    def walk(from: Int, to: Int, ctx: String): Unit = {
      var o = from
      while (o + 8 <= to) {
        val id = cc(o)
        val size = u32(o + 4).toInt
        val body = o + 8
        require(body + size <= to, s"chunk $id overruns its parent $ctx")
        id match {
          case "LIST" =>
            walk(body + 4, body + size, cc(body))
          case "avih" =>
            avih = Some(Array.tabulate(14)(i => u32(body + 4 * i)))
          case "strh" =>
            require(cc(body) == "vids", s"unexpected stream type ${cc(body)}")
            strhHandler = cc(body + 4)
            strhScale = u32(body + 20); strhRate = u32(body + 24)
          case "00dc" if ctx == "movi" =>
            // offset convention: from the movi fourCC, which sits 4
            // bytes before the list body start
            frameOffs :+= (o - (moviBodyStart - 4)).toLong
            frames :+= java.util.Arrays.copyOfRange(b, body, body + size)
          case "idx1" =>
            (0 until size / 16).foreach { i =>
              idx1 :+= ((cc(body + 16 * i), u32(body + 16 * i + 8),
                u32(body + 16 * i + 12)))
            }
          case _ => () // strf and unknown chunks: tolerated, skipped
        }
        o = body + size + (size & 1) // even-padding skip
      }
    }
    walk(12, b.length, "AVI ")

    val hdr = avih.getOrElse(sys.error("no avih header chunk"))
    val meta = AviMeta(hdr(0), hdr(4).toInt, hdr(8).toInt, hdr(9).toInt,
      strhHandler, strhRate.toInt, strhScale.toInt)
    require(meta.totalFrames == frames.length,
      s"avih says ${meta.totalFrames} frames, movi holds ${frames.length}")
    require(idx1.length == frames.length, "idx1 entry count != frame count")
    idx1.zip(frameOffs.zip(frames)).foreach { case ((iid, ioff, isz), (off, fb)) =>
      require(iid == "00dc" && ioff == off && isz == fb.length,
        s"idx1 entry ($iid,$ioff,$isz) != movi chunk at $off size ${fb.length}")
    }
    (meta, frames)
  }

  /** One decoded q50g row; `strided` is the canonical string of the
    * 64 strided "r,g,b" samples across frames, joined by ";".
    */
  final case class DecodedVideo(
      doc_id: Long, n_frames: Int, w: Int, h: Int, fps: Int,
      sum_r: Long, sum_g: Long, sum_b: Long, motion: Long, strided: String)

  /** q50g — REAL VIDEO CONTAINER ROUND-TRIP (oracle-checked): per
    * doc, synthesize 3–6 small RGB frames from a deterministic
    * per-frame pixel formula, encode each frame with the genuine
    * `javax.imageio` PNG codec, wrap the encoded frames in a genuine
    * AVI RIFF container ([[aviEncode]] — MPNG stream, idx1 keyframe
    * index, even-size padding), then DECODE: parse the container back
    * ([[aviDecode]] — magic, chunk walk, header metadata, index
    * cross-check) and run the real PNG decoder on every recovered
    * frame payload. Features come from the DECODED side only:
    * shape/timing (frame count, dimensions, fps = rate/scale) from
    * the parsed headers, exact per-channel sums over all decoded
    * frames, an inter-frame MOTION metric (Σ |Δred| between
    * consecutive decoded frames — the temporal feature a video
    * pipeline computes), and an md5 digest of 64 strided pixels
    * spread across frames.
    *
    * Why this is oracle-checkable without a video stack in DuckDB:
    * PNG is lossless and the AVI container is a byte-exact framing,
    * so decode(encode(frames)) == frames pixel-for-pixel and the
    * oracle re-derives every feature from the synthesis formula. The
    * hash gate certifies the whole encode→container→parse→decode
    * path: a size-field slip, a padding bug, frame reordering, an
    * index mismatch, or any codec corruption changes a sum, the
    * motion, or the digest.
    *
    * Scale shape: map-only per-row container+codec work (the
    * embarrassingly parallel regime media transcode lives in at
    * 100 TB), no shuffle before the contract sort; ≤6 frames of
    * ≤16×16 keep the per-row working set constant.
    */
  private def q50g(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // the codec map is CPU-heavy and embarrassingly parallel, but the
    // testdata table is ONE parquet file = one scan partition — fan the
    // bounded id column out to every core before the per-row codec
    // work (at 100 TB the scan has thousands of partitions and this
    // repartition of an 8-byte column is noise)
    val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
    val decoded = ids.mapPartitions { it =>
      it.map { docId =>
        val w = (8 + docId % 9).toInt
        val h = (8 + (docId * 5) % 9).toInt
        val nf = (3 + docId % 4).toInt
        val encFrames = (0 until nf).map { f =>
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val (r, g, bl) = q50gPixel(docId, f, x, y)
              img.setRGB(x, y, (r << 16) | (g << 8) | bl)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          require(javax.imageio.ImageIO.write(img, "png", bos),
            "no png writer — javax.imageio missing from this JVM")
          bos.toByteArray
        }
        val payload = aviEncode(encFrames, w, h, rate = 10) // the binary column
        // ---- REAL decode: container parse + genuine PNG codec ----
        val (meta, rawFrames) = aviDecode(payload)
        require(meta.handler == "MPNG", s"unexpected handler ${meta.handler}")
        val imgs = rawFrames.map { fb =>
          val im = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
          require(im.getWidth == meta.width && im.getHeight == meta.height,
            "decoded frame dims != container header dims")
          im
        }
        var (sr, sg, sb, motion) = (0L, 0L, 0L, 0L)
        imgs.zipWithIndex.foreach { case (im, f) =>
          var y = 0
          while (y < meta.height) {
            var x = 0
            while (x < meta.width) {
              val p = im.getRGB(x, y)
              val r = (p >> 16) & 0xff
              sr += r; sg += (p >> 8) & 0xff; sb += p & 0xff
              if (f > 0)
                motion += math.abs(r - ((imgs(f - 1).getRGB(x, y) >> 16) & 0xff))
              x += 1
            }
            y += 1
          }
        }
        val strided = (0 until VideoDigestN).map { k =>
          val f = k % meta.totalFrames
          val pix = (k * 131) % (meta.width * meta.height)
          val p = imgs(f).getRGB(pix % meta.width, pix / meta.width)
          s"${(p >> 16) & 0xff},${(p >> 8) & 0xff},${p & 0xff}"
        }.mkString(";")
        DecodedVideo(docId, meta.totalFrames, meta.width, meta.height,
          meta.rate / meta.scale, sr, sg, sb, motion, strided)
      }
    }
    decoded.toDF()
      .select(col("doc_id"), col("n_frames"), col("w"), col("h"), col("fps"),
        col("sum_r"), col("sum_g"), col("sum_b"), col("motion"),
        md5(to_binary(col("strided"), lit("utf-8"))).as("frame_digest"))
      .orderBy("doc_id")
  }

  private val q50gSql =
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(8 + doc_id % 9 AS INT) AS w,
       |         CAST(8 + (doc_id * 5) % 9 AS INT) AS h,
       |         CAST(3 + doc_id % 4 AS INT) AS nf
       |  FROM documents),
       |px AS (
       |  SELECT doc_id, f, x, y,
       |         (doc_id + 3 * x + 5 * y + 11 * f) % 256 AS r,
       |         (2 * doc_id + x + 7 * y + 13 * f) % 256 AS g,
       |         (x * y + doc_id + f * f) % 256 AS b
       |  FROM (SELECT *, unnest(range(0, nf)) AS f
       |        FROM (SELECT *, unnest(range(0, h)) AS y
       |              FROM (SELECT *, unnest(range(0, w)) AS x FROM d)))),
       |sums AS (
       |  SELECT doc_id, CAST(SUM(r) AS BIGINT) AS sum_r,
       |         CAST(SUM(g) AS BIGINT) AS sum_g, CAST(SUM(b) AS BIGINT) AS sum_b
       |  FROM px GROUP BY doc_id),
       |mot AS (
       |  SELECT doc_id, CAST(SUM(ABS(
       |           (doc_id + 3 * x + 5 * y + 11 * f) % 256 -
       |           (doc_id + 3 * x + 5 * y + 11 * (f - 1)) % 256)) AS BIGINT) AS motion
       |  FROM (SELECT doc_id, x, y, unnest(range(1, nf)) AS f
       |        FROM (SELECT *, unnest(range(0, h)) AS y
       |              FROM (SELECT *, unnest(range(0, w)) AS x FROM d)))
       |  GROUP BY doc_id),
       |dig AS (
       |  SELECT doc_id,
       |         md5(string_agg(
       |           ((doc_id + 3 * sx + 5 * sy + 11 * f) % 256) || ',' ||
       |           ((2 * doc_id + sx + 7 * sy + 13 * f) % 256) || ',' ||
       |           ((sx * sy + doc_id + f * f) % 256), ';' ORDER BY k)) AS frame_digest
       |  FROM (SELECT doc_id, k, k % nf AS f,
       |               ((k * 131) % (w * h)) % w AS sx,
       |               ((k * 131) % (w * h)) // w AS sy
       |        FROM (SELECT *, unnest(range(0, $VideoDigestN)) AS k FROM d))
       |  GROUP BY doc_id)
       |SELECT d.doc_id, d.nf AS n_frames, d.w, d.h, 10 AS fps,
       |       sums.sum_r, sums.sum_g, sums.sum_b, mot.motion, dig.frame_digest
       |FROM d JOIN sums USING (doc_id) JOIN mot USING (doc_id)
       |       JOIN dig USING (doc_id)
       |ORDER BY d.doc_id""".stripMargin

  def specs: Seq[QuerySpec] = Seq(
    QuerySpec("q50_multimodal_meta",   q50, Some(q50Sql)),
    QuerySpec("q50e_codec_roundtrip",  q50e, Some(q50eSql)),
    QuerySpec("q50f_audio_roundtrip",  q50f, Some(q50fSql)),
    QuerySpec("q50g_video_roundtrip",  q50g, Some(q50gSql)),
    QuerySpec("q50b_decode_features",  q50b, Some(q50bSql)),
    QuerySpec("q50c_frame_sampling",   q50c, Some(q50cSql)),
    QuerySpec("q50d_resize_thumb",     q50d, Some(q50dSql)),
    QuerySpec("q120_dup_frames", q120, Some(q120Sql)),
  )
}
