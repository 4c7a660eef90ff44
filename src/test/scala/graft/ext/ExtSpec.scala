package graft.ext

import graft.{SparkSpec, SparkEntry}

/** Behavior checks for the rows-only (non-oracle) extension queries,
  * run over sf0.001 where the planted near-dup structure is known
  * (28 pairs with 3-shingle Jaccard ≥ 0.5, incl. (120,360) and
  * (328,428)).
  */
class ExtSpec extends SparkSpec {

  private def run(name: String) = SparkEntry.queries(name)(spark, sf)

  /** Write a synthetic documents.parquet dir (q86/q87/q53b/q89 specs
    * construct corpora with hand-computable expectations).
    */
  private def writeDocs(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    rows.map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q87 chunking: window boundaries, overlap, and digests (synthetic)") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val dir = writeDocs(Seq(
      (0L, doc(100), "en", "srcA"), // starts 0, 48: chunks of 64 and 52
      (1L, doc(64), "en", "srcA"),  // exactly one window
      (2L, doc(10), "en", "srcA"),  // short doc: one small chunk
      (3L, doc(65), "en", "srcA"))) // starts 0, 48: chunks of 64 and 17
    val got = SparkEntry.queries("q87_doc_chunking")(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx")) ->
        (r.getAs[Int]("chunk_tokens"), r.getAs[String]("chunk_digest"))).toMap
    assert(got.keySet == Set((0L, 0), (0L, 1), (1L, 0), (2L, 0), (3L, 0), (3L, 1)))
    assert(got.view.mapValues(_._1).toMap == Map(
      (0L, 0) -> 64, (0L, 1) -> 52, (1L, 0) -> 64, (2L, 0) -> 10,
      (3L, 0) -> 64, (3L, 1) -> 17))
    // overlapping second window of doc 0 covers tokens 49..100
    val expect01 = (49 to 100).map(i => s"w$i").mkString(" ")
    assert(got((0L, 1))._2 == md5hex(expect01))
  }

  test("q53b exact source similarity matches hand-computed Jaccard (synthetic)") {
    val dir = writeDocs(Seq(
      (0L, "a b c d", "en", "src0"), // shingles {a b c, b c d}
      (1L, "a b c e", "en", "src1"), // shingles {a b c, b c e}
      (2L, "x y z", "en", "src2")))  // disjoint from both
    val got = SparkEntry.queries("q53b_source_similarity_sql")(spark, dir).collect()
      .map(r => (r.getAs[String]("a_source"), r.getAs[String]("b_source")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("na"), r.getAs[Long]("nb"),
          r.getAs[Double]("jaccard"))).toMap
    assert(got == Map(
      ("src0", "src1") -> ((1L, 2L, 2L, 1.0 / 3)),
      ("src0", "src2") -> ((0L, 2L, 1L, 0.0)),
      ("src1", "src2") -> ((0L, 2L, 1L, 0.0))))
  }

  test("q88 sharding: fixed-size cuts of a deterministic total order (synthetic)") {
    val docs = (0L until 200L).map(i => (i, s"tok$i text body $i", "en", s"src${i % 4}"))
    val dir = writeDocs(docs)
    val rows = SparkEntry.queries("q88_shard_manifest")(spark, dir).collect()
    val sizes = rows.map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(sizes == Map(0L -> 64L, 1L -> 64L, 2L -> 64L, 3L -> 8L))
    // shard key ranges tile the global order: max(shard i) < min(shard i+1)
    val ranges = rows.sortBy(_.getAs[Long]("shard"))
      .map(r => (r.getAs[String]("first_key"), r.getAs[String]("last_key")))
    ranges.foreach { case (lo, hi) => assert(lo <= hi) }
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo)
      case _ =>
    }
    // deterministic: a rerun produces the identical manifest
    val again = SparkEntry.queries("q88_shard_manifest")(spark, dir).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q93 centroid similarity: full matrix, exact ints, direction sanity (synthetic)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    // labels 0 and 1 share a direction (0 holds two copies), label 2
    // is the complementary corner — after the affine int8 mapping the
    // shared direction must give cosine ≈ 1, the complement ≈ −1
    Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
      (2L, Array(1f, 0f), 1),
      (3L, Array(0f, 1f), 2))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q93_centroid_similarity")(spark, dir).collect()
      .map(r => (r.getAs[Int]("a_label"), r.getAs[Int]("b_label")) ->
        r.getAs[Double]("cosine")).toMap
    assert(got.keySet == Set((0, 1), (0, 2), (1, 2)))
    assert(math.abs(got((0, 1)) - 1.0) < 1e-12)
    assert(math.abs(got((1, 2)) + 1.0) < 1e-12)
    // and on the real corpus: all pairs present, cosines bounded
    val real = run("q93_centroid_similarity").collect()
    val labels = real.flatMap(r =>
      Seq(r.getAs[Int]("a_label"), r.getAs[Int]("b_label"))).distinct.length
    assert(real.length == labels * (labels - 1) / 2)
    assert(real.forall(r => math.abs(r.getAs[Double]("cosine")) <= 1.0 + 1e-9))
  }

  test("q92 repetition: duplicate 3-gram ratio, short-doc guard (synthetic)") {
    val dir = writeDocs(Seq(
      (0L, "a b c a b c a b", "en", "src0"), // grams: abc bca cab abc bca cab → 6 grams, 3 distinct
      (1L, "x y", "en", "src0"),             // < 3 words → no grams
      (2L, "p q r s", "en", "src0")))        // 2 grams, both distinct
    val got = SparkEntry.queries("q92_gopher_repetition")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_grams"), r.getAs[Int]("n_distinct"), r.getAs[Long]("dup_micro"))).toMap
    assert(got == Map(
      0L -> ((6, 3, 500000L)),
      1L -> ((0, 0, 0L)),
      2L -> ((2, 2, 0L))))
  }

  test("q97 corpus version: total = XOR of sources, changes iff content changes") {
    def fingerprints(dir: String) =
      SparkEntry.queries("q97_corpus_version")(spark, dir).collect()
        .map(r => Option(r.getAs[String]("source")) -> r.getAs[Long]("version_xor")).toMap
    val base = Seq(
      (0L, "alpha beta gamma", "en", "srcA"), (1L, "delta epsilon", "en", "srcA"),
      (2L, "zeta eta theta", "en", "srcB"))
    val v1 = fingerprints(writeDocs(base))
    // grand total (null source) is the XOR of the per-source rows
    assert(v1(None) == (v1(Some("srcA")) ^ v1(Some("srcB"))))
    // identical corpus → identical fingerprint
    assert(fingerprints(writeDocs(base)) == v1)
    // one changed text → that source and the total change, others don't
    val v2 = fingerprints(writeDocs(base.updated(1, (1L, "delta epsilon CHANGED", "en", "srcA"))))
    assert(v2(Some("srcA")) != v1(Some("srcA")))
    assert(v2(Some("srcB")) == v1(Some("srcB")))
    assert(v2(None) != v1(None))
  }

  test("q95 eval sample: exactly K per source, deterministic") {
    val rows = run("q95_eval_sample").collect()
    val perSource = rows.groupBy(_.getAs[String]("source")).view.mapValues(_.length).toMap
    assert(perSource.nonEmpty && perSource.values.forall(_ == 8), perSource)
    val again = run("q95_eval_sample").collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("q96 budget selection: greedy cutoff is tight and quality-monotone") {
    val rows = run("q96_quality_budget").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("quality_micro"),
        r.getAs[Long]("n_tokens"), r.getAs[Boolean]("kept")))
    val budget = 3 * rows.map(_._3).sum / 10
    val kept = rows.filter(_._4)
    val dropped = rows.filterNot(_._4)
    assert(kept.nonEmpty && dropped.nonEmpty)
    val keptSum = kept.map(_._3).sum
    assert(keptSum <= budget, s"kept $keptSum > budget $budget")
    // levels strictly above the boundary are fully kept; strictly
    // below fully dropped (only the boundary level may be split)
    val boundary = kept.map(_._2).min
    assert(rows.filter(_._2 > boundary).forall(_._4))
    assert(rows.filter(_._2 < boundary).forall(!_._4))
    // tightness: the first dropped doc in greedy order would overflow
    def md5hexId(id: Long) = md5hex(s"$id:q96")
    val firstDropped = dropped.minBy(d => (-d._2, md5hexId(d._1), d._1))
    assert(keptSum + firstDropped._3 > budget,
      s"greedy would also fit doc ${firstDropped._1}")
  }

  test("q90 rarity: hand-computed hapax/rare counts (synthetic)") {
    // corpus counts: a=3, b=2, c=1, q=1, z=1 (hapax = 1, rare ≤ 3)
    val dir = writeDocs(Seq(
      (0L, "a a b q", "en", "src0"),
      (1L, "a b c z", "en", "src0")))
    val got = SparkEntry.queries("q90_rarity_audit")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_hapax"),
          r.getAs[Long]("n_rare"), r.getAs[Long]("hapax_micro"))).toMap
    assert(got == Map(
      0L -> ((4L, 1L, 4L, 250000L)),  // a,a,b rare (cnt 3,3,2) + q hapax
      1L -> ((4L, 2L, 4L, 500000L)))) // c,z hapax; a,b rare
  }

  test("q87/q89 plan shapes: map-only chunking, heap-based vocab top-K") {
    // q87's only exchange is the deterministic output orderBy (range
    // partitioning) — the generate/slice/digest pipeline itself never
    // shuffles, so chunking stays a pure scan stage at any SF
    val p87 = run("q87_doc_chunking").queryExecution.executedPlan.toString
    assert(!p87.contains("Exchange hashpartitioning"), p87)
    // q89's top-K is a per-partition heap merge, not a global sort of
    // the vocabulary
    val p89 = run("q89_vocab_build").queryExecution.executedPlan.toString
    assert(p89.contains("TakeOrderedAndProject"), p89)
  }

  test("q89 vocab: rank, tie-break, and exact coverage (synthetic)") {
    val dir = writeDocs(Seq(
      (0L, "a a a b b c", "en", "src0"),
      (1L, "a b d", "en", "src0")))
    val got = SparkEntry.queries("q89_vocab_build")(spark, dir).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("token"),
        r.getAs[Long]("cnt"), r.getAs[Long]("coverage_micro")))
    assert(got.toSeq == Seq(
      (1, "a", 4L, 444444L), (2, "b", 3L, 333333L),
      (3, "c", 1L, 111111L), (4, "d", 1L, 111111L)))
  }

  test("q46 MinHash+LSH finds the planted near-dup pairs") {
    val pairs = run("q46_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(pairs.contains((120L, 360L)))
    assert(pairs.contains((328L, 428L)))
    // estimates stay in [0,1]
    val ests = run("q46_minhash_lsh").collect().map(_.getAs[Double]("est_jaccard"))
    assert(ests.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("q46 MinHash agrees with exact q45 on high-similarity pairs") {
    val exact = run("q45_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val est = run("q46_minhash_lsh").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // every exact near-dup pair is recalled by the LSH pipeline
    assert(exact.subsetOf(est), s"missed: ${exact -- est}")
  }

  test("q47 SimHash: planted near-dups have small hamming distance") {
    val sims = run("q47_simhash").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(120L), sims(360L)) <= 12)
    assert(hamming(sims(328L), sims(428L)) <= 12)
    // a random unrelated pair should be far
    assert(hamming(sims(1L), sims(2L)) >= 10)
  }

  test("q43b rolling hash: deterministic, collision-free on distinct docs") {
    val a = run("q43b_rolling_hash").collect().map(_.getAs[Long]("fingerprint64"))
    val b = run("q43b_rolling_hash").collect().map(_.getAs[Long]("fingerprint64"))
    assert(a.sameElements(b))
    assert(a.distinct.length == a.length)
  }

  test("q49 LSH ANN: produces ranked candidates with valid cosines") {
    val rows = run("q49_ann_lsh").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("cos_rounded")).forall(c => c >= -1.0001 && c <= 1.0001))
    // per query, ranks are 1..n without gaps
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.toSeq == (1 to ranks.length).toSeq)
    }
  }

  test("q49b/q52b exact ANN twins: ranked output, integer-consistent cosines, recall vs q48") {
    val exact = run("q48_ann_bruteforce").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    for ((name, floor) <- Seq("q49b_ann_lsh_exact" -> 0.2, "q52b_ann_ivf_exact" -> 0.1)) {
      val rows = run(name).collect()
      assert(rows.nonEmpty, name)
      rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
        val ranks = rs.map(_.getAs[Int]("rn")).sorted
        assert(ranks.toSeq == (1 to ranks.length).toSeq, name)
      }
      // the reported cosine is exactly the double derived from the
      // integer dot/norm columns — the oracle-exactness invariant
      rows.foreach { r =>
        val c = r.getAs[Long]("dot").toDouble /
          (math.sqrt(r.getAs[Long]("qnorm2").toDouble) * math.sqrt(r.getAs[Long]("cnorm2").toDouble))
        assert(c == r.getAs[Double]("cosine"), name)
        assert(c >= -1.0001 && c <= 1.0001, name)
      }
      // deterministic LSH/IVF in QUANTIZED space vs FLOAT exact top-k:
      // overlap floor only documents non-degeneracy (params are demo
      // scale; the oracle is the correctness gate)
      val got = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
      val recall = (exact & got).size.toDouble / exact.size
      assert(recall >= floor, s"$name recall $recall")
    }
  }

  test("q122 BoW dedup: reordered and repetition-padded copies group correctly (synthetic)") {
    // 0/1: exact reorderings (same multiset) — the signal q44 misses;
    // 2: same vocabulary, different counts (padded copy) → same set
    //    group, extra multiset; 3: distinct vocabulary → no group
    val dir = writeDocs(Seq(
      (0L, "alpha beta gamma delta", "en", "s"),
      (1L, "delta gamma beta alpha", "en", "s"),
      (2L, "alpha alpha beta gamma delta", "en", "s"),
      (3L, "epsilon zeta", "en", "s")))
    val rows = SparkEntry.queries("q122_bow_dedup")(spark, dir).collect()
    assert(rows.length == 1) // one non-singleton group: {0, 1, 2}
    val r = rows.head
    assert(r.getAs[Long]("canonical_id") == 0L)
    assert(r.getAs[Long]("n_docs") == 3L)
    // docs 0 and 1 share a multiset; doc 2's differs → 2 multisets
    assert(r.getAs[Long]("n_multisets") == 2L)
  }

  test("q126 phrase search: planted phrase with overlapping occurrences (synthetic)") {
    // "x y z" is the top trigram by doc frequency (3 docs); doc 0 has
    // two occurrences (positions 0 and 3), doc 1 one at position 2
    // after a near-miss prefix, doc 2 one at position 0, doc 3 none
    val dir = writeDocs(Seq(
      (0L, "x y z x y z", "en", "s"),
      (1L, "x y x y z", "en", "s"),
      (2L, "x y z q q q", "en", "s"),
      (3L, "z y x p p p", "en", "s")))
    val got = SparkEntry.queries("q126_phrase_search")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("phrase"), r.getAs[Long]("n_occurrences"), r.getAs[Int]("first_pos")))
      .toMap
    assert(got.keySet == Set(0L, 1L, 2L))
    assert(got.values.map(_._1).toSet == Set("x y z"))
    assert(got(0L) == (("x y z", 2L, 0)))
    assert(got(1L) == (("x y z", 1L, 2)))
    assert(got(2L) == (("x y z", 1L, 0)))
  }

  test("q121 semantic decontam: flags are a subset of brute-force cross-split pairs, with recall") {
    // brute-force quantized-cosine truth over the real embeddings:
    // every (train, heldout) pair with cos >= threshold
    import org.apache.spark.sql.functions._
    val flagged = run("q121_semantic_decontam").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_heldout_neighbors")).toMap
    // derive truth via the exact q51-style pair scan in quantized space
    val emb = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("ve"))
    val comps = emb.select(col("vec_id"), posexplode(col("ve")).as(Seq("pos", "x")))
    val ranges = comps.groupBy(col("pos")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val code = when(col("mx") === col("mn"), lit(0L))
      .otherwise(least(greatest((floor((col("x") - col("mn")) * 254.0 / (col("mx") - col("mn"))) - 127)
        .cast("long"), lit(-127L)), lit(127L)))
    val codes = comps.join(broadcast(ranges), "pos").select(col("vec_id"), col("pos"), code.as("c"))
      .collect().groupBy(_.getAs[Long]("vec_id"))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("c")).toArray }
    def bucket(id: Long): Long = {
      val h = md5hex(id.toString)
      java.lang.Long.parseLong(h.substring(0, 15), 16) % 100
    }
    val train = codes.keys.filter(bucket(_) < 80).toSeq
    val held = codes.keys.filter(bucket(_) >= 90).toSeq
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum.toDouble)
      val nb = math.sqrt(b.map(x => x * x).sum.toDouble)
      if (na == 0 || nb == 0) -2.0 else dot / (na * nb)
    }
    val truth = train.map { t =>
      t -> held.count(h => cos(codes(t), codes(h)) >= 0.35)
    }.filter(_._2 > 0).toMap
    // soundness: every flagged vec is truly contaminated, never over-counted
    flagged.foreach { case (id, n) =>
      assert(truth.contains(id), s"vec $id flagged but not in truth")
      assert(n <= truth(id), s"vec $id: flagged $n > true ${truth(id)}")
    }
    // recall of the OR-amplified family on the real corpus
    val recall = flagged.size.toDouble / math.max(1, truth.size)
    assert(recall >= 0.2, s"semantic decontam recall $recall (${flagged.size}/${truth.size})")
  }

  test("q50b decode stub: full coverage, fixed feature width, deterministic") {
    // features are flattened to one scalar column per dim (f0..f7) so
    // every output column is sortable by the driver's rows-only check
    def feats(rs: Array[org.apache.spark.sql.Row]): Seq[List[Float]] =
      rs.map(r => (0 until Multimodal.FeatureDim).map(i => r.getAs[Float](s"f$i")).toList).toSeq
    val df = run("q50b_decode_features")
    // the feature columns are exactly f0..f{FeatureDim-1}, nothing else
    assert(df.columns.filter(_.startsWith("f")).toSeq ==
      (0 until Multimodal.FeatureDim).map(i => s"f$i"))
    val rows = df.collect()
    assert(rows.length == 500)
    val f1 = feats(rows)
    assert(f1.forall(f => f.forall(v => v >= 0f && v < 1f)))
    assert(f1 == feats(run("q50b_decode_features").collect()))
  }

  test("q50e real codec: PNG and BMP round-trip losslessly and the query covers every doc") {
    // losslessness fixture — the assumption the q50e oracle rests on:
    // decode(encode(pixels)) must be bit-exact for both formats
    Seq("png", "bmp").foreach { fmt =>
      val img = new java.awt.image.BufferedImage(
        4, 3, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 3; x <- 0 until 4)
        img.setRGB(x, y, ((x * 37 + y) << 16) | ((y * 91 + x) << 8) | (x * y * 53 % 256))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer in this JVM")
      val bytes = bos.toByteArray
      assert(bytes.length > 0, s"$fmt encoder produced no bytes")
      val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      for (y <- 0 until 3; x <- 0 until 4)
        assert((back.getRGB(x, y) & 0xffffff) == (img.getRGB(x, y) & 0xffffff),
          s"$fmt not lossless at ($x,$y)")
    }
    val rows = run("q50e_codec_roundtrip").collect()
    assert(rows.length == 500, "every doc must decode")
    val fmts = rows.map(_.getAs[String]("fmt")).toSet
    assert(fmts == Set("png", "bmp"), s"both real codecs must be exercised: $fmts")
    // channel sums must match the synthesis formula exactly — the
    // decoded-pixel fidelity check, independent of the oracle
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h) = (r.getAs[Int]("w"), r.getAs[Int]("h"))
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (pr, pg, pb) = Multimodal.q50ePixel(id, x, y)
        sr += pr; sg += pg; sb += pb
      }
      assert((r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"))
        == ((sr, sg, sb)), s"decoded channel sums diverge for doc $id")
    }
  }

  test("q50f real audio codec: WAV PCM round-trips losslessly and features match the formula") {
    // losslessness fixture — the assumption the q50f oracle rests on:
    // decode(encode(samples)) must be byte-exact for 16-bit PCM WAV
    val n = 123
    val raw = new Array[Byte](2 * n)
    for (i <- 0 until n) {
      val s = Multimodal.q50fSample(7L, i.toLong)
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(raw), fmt, n.toLong),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray
    assert(wav.length > 2 * n, "WAV container must wrap the data chunk")
    val back = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    assert(java.util.Arrays.equals(back.readAllBytes(), raw), "WAV PCM not lossless")

    val rows = run("q50f_audio_roundtrip").collect()
    assert(rows.length == 500, "every doc must decode")
    // decoded-stream fidelity, independent of the oracle: sums,
    // energy, and zero crossings re-derived from the formula
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val m = r.getAs[Int]("n_samples")
      assert(m == (800L + (id * 13L) % 801L).toInt, s"frame count wrong for doc $id")
      assert((r.getAs[Int]("sample_rate"), r.getAs[Int]("bits"), r.getAs[Int]("channels"))
        == ((8000, 16, 1)), s"decoded header wrong for doc $id")
      var (sum, energy, zeroX) = (0L, 0L, 0L)
      var prev = 0
      for (i <- 0 until m) {
        val s = Multimodal.q50fSample(id, i.toLong)
        sum += s; energy += s.toLong * s
        if (i > 0 && (prev < 0) != (s < 0)) zeroX += 1
        prev = s
      }
      assert((r.getAs[Long]("sum_s"), r.getAs[Long]("energy"), r.getAs[Long]("zero_x"))
        == ((sum, energy, zeroX)), s"decoded features diverge for doc $id")
    }
  }

  test("q50g real video container: AVI round-trips losslessly and features match the formula") {
    // container fixture — the assumption the q50g oracle rests on:
    // aviDecode(aviEncode(frames)) must return the header metadata
    // and the exact frame payloads (including odd-size pad handling)
    val f0 = Array[Byte](1, 2, 3)            // odd size — exercises padding
    val f1 = Array[Byte](4, 5, 6, 7)
    val f2 = Array[Byte](8)
    val avi = Multimodal.aviEncode(Seq(f0, f1, f2), w = 5, h = 4, rate = 10)
    assert(new String(avi, 0, 4, "US-ASCII") == "RIFF")
    val (meta, back) = Multimodal.aviDecode(avi)
    assert(meta == Multimodal.AviMeta(100000L, 3, 5, 4, "MPNG", 10, 1))
    assert(back.map(_.toSeq) == Seq(f0.toSeq, f1.toSeq, f2.toSeq),
      "frame payloads must survive the container byte-exactly")
    // a corrupted size field must be rejected, not silently misparsed
    val bad = avi.clone(); bad(4) = (bad(4) + 1).toByte
    assertThrows[IllegalArgumentException](Multimodal.aviDecode(bad))

    val rows = run("q50g_video_roundtrip").collect()
    assert(rows.length == 500, "every doc must decode")
    // decoded-frame fidelity, independent of the oracle: channel sums
    // and motion re-derived from the per-frame formula
    rows.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val (w, h, nf) = (r.getAs[Int]("w"), r.getAs[Int]("h"), r.getAs[Int]("n_frames"))
      assert((w, h, nf) ==
        (((8 + id % 9).toInt, (8 + id * 5 % 9).toInt, (3 + id % 4).toInt)))
      assert(r.getAs[Int]("fps") == 10, "fps must come from the parsed strh")
      var (sr, sg, sb, motion) = (0L, 0L, 0L, 0L)
      for (f <- 0 until nf; y <- 0 until h; x <- 0 until w) {
        val (pr, pg, pb) = Multimodal.q50gPixel(id, f, x, y)
        sr += pr; sg += pg; sb += pb
        if (f > 0) motion += math.abs(pr - Multimodal.q50gPixel(id, f - 1, x, y)._1)
      }
      assert((r.getAs[Long]("sum_r"), r.getAs[Long]("sum_g"), r.getAs[Long]("sum_b"),
        r.getAs[Long]("motion")) == ((sr, sg, sb, motion)),
        s"decoded video features diverge for doc $id")
    }
  }

  test("q52 IVF ANN: valid ranked output and nontrivial recall vs exact q48") {
    val exact = run("q48_ann_bruteforce").collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val rows = run("q52_ann_ivf").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Int]("rn")).sorted
      assert(ranks.toSeq == (1 to ranks.length).toSeq)
    }
    val ivf = rows.map(r => (r.getAs[Long]("qid"), r.getAs[Long]("vec_id"))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    // nprobe=4 of K=16 clusters scans ~25% of the data; on this
    // near-uniform random testdata recall tracks coverage, so demand
    // at least non-degenerate overlap
    assert(recall >= 0.1, s"IVF recall $recall")
  }

  test("q53 source-similarity sketch: full matrix, deterministic, bounded") {
    val rows = run("q53_source_similarity").collect()
    assert(rows.length == 190) // C(20,2) source pairs
    assert(rows.forall { r =>
      val e = r.getAs[Double]("est_jaccard"); e >= 0.0 && e <= 1.0
    })
    val again = run("q53_source_similarity").collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("q53 union sketch equals the sketch of the concatenated corpus") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // element-wise min of per-doc signatures == signature of all docs'
    // shingles together (the property that makes the aggregator exact)
    val docs = graft.Tables.documents(spark, sf).filter(col("source") === "src0")
    val perDoc = docs.select(
      graft.functions.minhash_signature(graft.functions.word_shingles(col("text"), 3), 32).as("sig"))
      .as[Array[Long]].collect()
    val manual = perDoc.reduce((a, b) => a.zip(b).map { case (x, y) => math.min(x, y) })
    val union = docs
      // sort before concatenating: collect_list order is undefined
      .select(array_join(array_sort(collect_list(col("text"))), " ").as("all"))
      .select(graft.functions.minhash_signature(graft.functions.word_shingles(col("all"), 3), 32).as("sig"))
      .as[Array[Long]].collect()(0)
    // shingle sets differ only at document boundaries (cross-doc
    // 3-grams) — so the mins agree on the vast majority of slots
    val agree = manual.zip(union).count { case (a, b) => a == b }
    assert(agree >= 28, s"only $agree/32 slots agree")
  }

  test("q45 finds short-document duplicate pairs (support-threshold exemption)") {
    import spark.implicits._
    // a 3-word doc has exactly ONE 3-shingle: a jac-1.0 duplicate pair
    // shares a single shingle and must survive the support>=2 filter
    val dir = java.nio.file.Files.createTempDirectory("graft_docs").toString
    Seq(
      (0L, "tiny dup doc", "en", "srcA", 12L),
      (1L, "tiny dup doc", "en", "srcA", 12L),
      (2L, "a completely different longer document with many more words inside it", "en", "srcA", 70L),
      (3L, "yet another unrelated document full of some other interesting words", "en", "srcB", 67L),
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pairs = SparkEntry.queries("q45_ngram_jaccard")(spark, dir).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"), r.getAs[Double]("jaccard")))
    assert(pairs.toSeq == Seq((0L, 1L, 1.0)), s"got ${pairs.toSeq}")
  }

  test("q51b blocked near-dup: recall >= 0.9 vs exact q51, no false positives") {
    val exact = run("q51_embedding_neardup").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val blocked = run("q51b_embedding_neardup_blocked").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    // every blocked pair passed the same exact-cosine verify, so the
    // blocked result can only MISS pairs, never invent them
    assert(blocked.subsetOf(exact), s"false positives: ${blocked -- exact}")
    val recall = (exact & blocked).size.toDouble / math.max(1, exact.size)
    assert(recall >= 0.9, s"LSH-blocked recall $recall (${blocked.size}/${exact.size})")
  }

  test("q33b approx percentiles within rank tolerance of exact q33") {
    import org.apache.spark.sql.functions._
    // the sketch's guarantee is on RANK (error ≤ n/accuracy), not on
    // value — neighboring order statistics can be far apart in value
    // space — so assert the approx value lands within ±1 order
    // statistic of the target rank per group
    val vals = graft.Tables.orders(spark, sf)
      .select(col("o_orderpriority").as("mode"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("c"))
      .groupBy(_._1).map { case (m, vs) => m -> vs.map(_._2).sorted }
    val approx = run("q33b_approx_percentiles").collect()
      .map(r => r.getString(0) -> (r.getAs[Long]("median_cents"), r.getAs[Long]("p90_cents"))).toMap
    def bounds(sorted: Array[Long], q: Double): (Long, Long) = {
      val pos = q * (sorted.length - 1)
      val lo = math.max(0, math.floor(pos).toInt - 1)
      val hi = math.min(sorted.length - 1, math.ceil(pos).toInt + 1)
      (sorted(lo), sorted(hi))
    }
    vals.foreach { case (m, sorted) =>
      val (amed, ap90) = approx(m)
      val (mLo, mHi) = bounds(sorted, 0.5)
      val (pLo, pHi) = bounds(sorted, 0.9)
      assert(amed >= mLo && amed <= mHi, s"$m median $amed outside [$mLo,$mHi]")
      assert(ap90 >= pLo && ap90 <= pHi, s"$m p90 $ap90 outside [$pLo,$pHi]")
    }
  }

  test("q27b approx distinct is within rsd of exact") {
    val approx = run("q27b_approx_distinct").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_custs")).toMap
    val exact = run("q27_distinct_counts").collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_custs")).toMap
    exact.foreach { case (q, n) =>
      assert(math.abs(approx(q) - n) <= math.max(2.0, n * 0.05), s"$q: $n vs ${approx(q)}")
    }
  }

  test("q59 dup clusters: a valid connected-components partition of the q45 pair graph") {
    val comp = run("q59_dup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("comp_id"), r.getAs[Long]("comp_size"))).toMap
    val pairs = run("q45_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    // every near-dup pair collapses into one cluster (incl. transitively)
    pairs.foreach { case (a, b) =>
      assert(comp(a)._1 == comp(b)._1, s"pair ($a,$b) split across clusters")
    }
    // the cluster id is the min member (the canonical survivor)
    val members = comp.toSeq.groupBy(_._2._1)
    members.foreach { case (cid, ms) =>
      assert(ms.map(_._1).min == cid, s"cluster $cid id is not the min member")
      assert(ms.forall(_._2._2 == ms.size), s"cluster $cid size mismatch")
    }
    // docs with no edge are singletons; docs with an edge are not
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    comp.foreach { case (id, (_, size)) =>
      if (inGraph(id)) assert(size >= 2) else assert(size == 1 && comp(id)._1 == id)
    }
  }

  test("q59 clusters actually merge transitive chains (pairs < clusters would miss)") {
    val r = run("q59_dup_clusters").collect()
    val multi = r.filter(_.getAs[Long]("comp_size") > 1)
    val nPairs = run("q45_ngram_jaccard").count()
    val nClusters = multi.map(_.getAs[Long]("comp_id")).distinct.length
    // 28 planted pairs collapse into fewer clusters — transitivity is real
    assert(multi.nonEmpty && nClusters < nPairs,
      s"$nClusters clusters from $nPairs pairs: no transitive merging happened")
  }

  test("q91 star contraction equals q59 label propagation on the real pair graph") {
    val viaProp = run("q59_dup_clusters").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("comp_id"), r.getAs[Long]("comp_size")))
    val viaStar = run("q91_dup_clusters_star").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("comp_id"), r.getAs[Long]("comp_size")))
    assert(viaProp.sameElements(viaStar))
  }

  test("star contraction handles deep graphs the one-hop bound rejects (synthetic)") {
    import spark.implicits._
    // a 200-node path: diameter 199, far beyond label propagation's
    // 16-round bound — the adversarial case the star algorithm exists
    // for. Ids shuffled so the min is in the middle of the chain.
    val ids = new scala.util.Random(7).shuffle((0L until 200L).toVector)
    val edges = ids.sliding(2).map(p => (p(0), p(1))).toSeq.toDF("a_id", "b_id")
    val labels = graft.ext.DupGraph.connectedComponentsStar(edges).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(labels.keySet == (0L until 200L).toSet)
    assert(labels.values.forall(_ == 0L))
    // and two disjoint paths stay disjoint
    val two = (ids.sliding(2).map(p => (p(0), p(1))).toSeq ++
      ids.sliding(2).map(p => (p(0) + 1000, p(1) + 1000)).toSeq).toDF("a_id", "b_id")
    val l2 = graft.ext.DupGraph.connectedComponentsStar(two).collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Long]("comp")).toMap
    assert(l2.filter(_._1 < 1000).values.forall(_ == 0L))
    assert(l2.filter(_._1 >= 1000).values.forall(_ == 1000L))
  }

  test("q82 dedup corpus: exactly the q59 cluster survivors, dup mass conserved") {
    val comp = run("q59_dup_clusters").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("comp_id"), r.getAs[Long]("comp_size"))).toMap
    val kept = run("q82_dedup_corpus").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_dups_absorbed")).toMap
    // survivors are exactly the canonical (min) members
    assert(kept.keySet == comp.filter { case (id, (cid, _)) => id == cid }.keySet)
    // each survivor absorbed its cluster minus itself; total mass = corpus
    kept.foreach { case (id, absorbed) => assert(absorbed == comp(id)._2 - 1) }
    assert(kept.size + kept.values.sum == comp.size,
      "dropped docs + survivors must partition the corpus")
  }

  test("q67 decontamination: flagged docs are train-split and share a real 8-gram") {
    import org.apache.spark.sql.functions._
    val flagged = run("q67_decontaminate").collect()
    assert(flagged.nonEmpty, "no contamination found — the check is vacuous")
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    def bucket(id: Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 100
    }
    def grams(t: String) = t.split(" ", -1).sliding(8).map(_.mkString(" ")).toSet
    val testGrams = docs.keys.filter(bucket(_) >= 90)
      .flatMap(id => grams(docs(id))).toSet
    flagged.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(bucket(id) < 80, s"flagged doc $id is not in the train split")
      assert(grams(docs(id)).exists(testGrams), s"doc $id shares no 8-gram with test")
      assert(r.getAs[Long]("n_shared_grams") >= 1 && r.getAs[Long]("n_test_docs") >= 1)
    }
  }

  test("q98 span removal: matches a driver-side reference replay on the real corpus") {
    // independent reference implementation: plain Scala over the
    // collected sf0.001 corpus (500 docs), replaying the operator's
    // contract — mask every token covered by an 8-gram present in >= 2
    // distinct docs (whole text as one span when < 8 tokens)
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val W = 8
    def spans(text: String): Seq[(Int, Int, String)] = { // (start, width, gram)
      val ws = text.split(" ", -1)
      if (ws.length < W) Seq((0, ws.length, text))
      else (0 to ws.length - W).map(i => (i, W, ws.slice(i, i + W).mkString(" ")))
    }
    val gramDocs = docs.toSeq
      .flatMap { case (id, t) => spans(t).map(s => s._3 -> id) }
      .groupMap(_._1)(_._2).view.mapValues(_.distinct.size).toMap
    val expected = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val covered = spans(t).filter(s => gramDocs(s._3) >= 2)
        .flatMap(s => s._1 until (s._1 + s._2)).toSet
      val clean = ws.zipWithIndex.collect { case (w, i) if !covered(i) => w }
      id -> ((ws.length.toLong, covered.size.toLong, md5hex(clean.mkString(" "))))
    }
    val got = run("q98_dup_span_removal").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_removed"), r.getAs[String]("clean_md5")))).toMap
    assert(got == expected)
    // the corpus really exercises both sides: some docs lose spans,
    // none lose everything unless they are exact duplicates
    assert(expected.values.exists(v => v._2 > 0 && v._2 < v._1),
      "no partially-masked doc — the span mask is vacuous on this corpus")
  }

  test("q98 span removal is surgical: unique remainder survives (synthetic)") {
    val shared = (1 to 8).map(i => s"s$i").mkString(" ") // one duplicated 8-gram
    val dir = writeDocs(Seq(
      (0L, s"u1 u2 u3 $shared u4 u5 u6", "en", "srcA"),
      (1L, s"v1 v2 $shared v3 v4 v5 v6", "en", "srcB"),
      (2L, "w1 w2 w3 w4 w5 w6 w7 w8 w9", "en", "srcC"))) // untouched
    val got = SparkEntry.queries("q98_dup_span_removal")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_removed"), r.getAs[String]("clean_md5")))).toMap
    assert(got(0L) == ((8L, md5hex("u1 u2 u3 u4 u5 u6"))))
    assert(got(1L) == ((8L, md5hex("v1 v2 v3 v4 v5 v6"))))
    assert(got(2L) == ((0L, md5hex("w1 w2 w3 w4 w5 w6 w7 w8 w9"))))
  }

  test("q100 prototypicality: flagged sets match a driver-side integer replay") {
    // replay the exact quantized arithmetic in plain Scala: corpus-wide
    // per-dim ranges -> int8 codes -> BIGINT centroid sums -> per-vector
    // dot/norms -> cosine ranking, bottom-5 per label
    val vecs = graft.Tables.embeddings(spark, sf)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("label"),
        r.getAs[Seq[Float]]("embedding").map(_.toDouble).toArray))
    val dims = vecs.head._3.length
    val mn = (0 until dims).map(d => vecs.map(_._3(d)).min)
    val mx = (0 until dims).map(d => vecs.map(_._3(d)).max)
    def codeOf(x: Double, d: Int): Long =
      if (mx(d) == mn(d)) 0L
      else math.min(127L, math.max(-127L,
        math.floor((x - mn(d)) * 254.0 / (mx(d) - mn(d))).toLong - 127L))
    val coded = vecs.map { case (id, l, e) =>
      (id, l, Array.tabulate(dims)(d => codeOf(e(d), d)))
    }
    val sums = coded.groupBy(_._2).view.mapValues { vs =>
      Array.tabulate(dims)(d => vs.map(_._3(d)).sum)
    }.toMap
    val expected = coded.groupBy(_._2).toSeq.flatMap { case (l, vs) =>
      val s = sums(l)
      val snorm2 = s.map(x => x * x).sum
      vs.map { case (id, _, c) =>
        val dot = (0 until dims).map(d => c(d) * s(d)).sum
        val cnorm2 = c.map(x => x * x).sum
        val cos = dot.toDouble / (math.sqrt(cnorm2.toDouble) * math.sqrt(snorm2.toDouble))
        (l, id, dot, cnorm2, snorm2, cos)
      }.sortBy(v => (v._6, v._2)).take(5).zipWithIndex
        .map { case (v, i) => (v._1, i + 1) -> ((v._2, v._3, v._4, v._5)) }
    }.toMap
    val got = run("q100_prototypicality").collect().map(r =>
      (r.getAs[Int]("label"), r.getAs[Int]("rank")) ->
        ((r.getAs[Long]("vec_id"), r.getAs[Long]("dot"),
          r.getAs[Long]("cnorm2"), r.getAs[Long]("snorm2")))).toMap
    assert(got == expected)
    assert(got.size == sums.size * 5)
  }

  test("q101 BPE pair stats: counts match a driver replay; single-token docs contribute nothing") {
    // corpus replay
    val texts = graft.Tables.documents(spark, sf)
      .select("text").collect().map(_.getString(0))
    val counts = texts.flatMap(t => t.split(" ", -1).sliding(2).filter(_.length == 2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
    val expected = counts.sortBy { case ((l, r), c) => (-c, l, r) }.take(20)
      .map { case ((l, r), c) => (l, r, c) }
    val got = run("q101_bpe_pair_stats").collect()
      .map(r => (r.getAs[String]("left_tok"), r.getAs[String]("right_tok"),
        r.getAs[Long]("cnt"))).toSeq
    assert(got == expected)
    // synthetic: a single-token doc must not produce a phantom pair
    val dir = writeDocs(Seq((0L, "solo", "en", "srcA"), (1L, "a b a b", "en", "srcA")))
    val syn = SparkEntry.queries("q101_bpe_pair_stats")(spark, dir).collect()
      .map(r => (r.getAs[String]("left_tok"), r.getAs[String]("right_tok")) ->
        r.getAs[Long]("cnt")).toMap
    assert(syn == Map(("a", "b") -> 2L, ("b", "a") -> 1L))
  }

  test("q103 merge apply: greedy overlap rule and a corpus replay") {
    // greedy left-to-right: "x x x" under top pair (x,x) merges ONLY
    // the first two; doc 1 makes (x,x) the clear top pair (count 3)
    val dir = writeDocs(Seq(
      (0L, "x x x y", "en", "srcA"),
      (1L, "x x p x x q", "en", "srcA")))
    val syn = SparkEntry.queries("q103_bpe_merge_apply")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_merges"), r.getAs[String]("merged_md5")))).toMap
    assert(syn(0L) == ((1L, md5hex("x_x x y"))))
    assert(syn(1L) == ((2L, md5hex("x_x p x_x q"))))

    // real corpus: replay pair counting + greedy merge driver-side
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val counts = docs.flatMap { case (_, t) =>
      t.split(" ", -1).sliding(2).filter(_.length == 2).map(p => (p(0), p(1)))
    }.groupBy(identity).view.mapValues(_.length).toSeq
    val (a, b) = counts.minBy { case ((l, r), c) => (-c, l, r) }._1
    def mergeGreedy(ws: Array[String]): Array[String] = {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < ws.length) {
        if (i < ws.length - 1 && ws(i) == a && ws(i + 1) == b) {
          out += s"${a}_$b"; i += 2
        } else { out += ws(i); i += 1 }
      }
      out.toArray
    }
    val expected = docs.map { case (id, t) =>
      val ws = t.split(" ", -1)
      val m = mergeGreedy(ws)
      id -> ((ws.length.toLong, (ws.length - m.length).toLong, md5hex(m.mkString(" "))))
    }.toMap
    val got = run("q103_bpe_merge_apply").collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_tokens_before"),
        r.getAs[Long]("n_merges"), r.getAs[String]("merged_md5")))).toMap
    assert(got == expected)
    assert(expected.values.exists(_._2 > 0), "top pair never fired — vacuous corpus check")
  }

  test("q72 repetition removal: no consecutive duplicates remain, token counts consistent") {
    val rows = run("q72_repetition_removal").collect()
    assert(rows.length == 500)
    var removedAny = false
    rows.foreach { r =>
      val before = r.getAs[Int]("n_before")
      val after = r.getAs[Int]("n_after")
      val toks = r.getAs[String]("compressed").split(" ", -1)
      assert(toks.length == after && after <= before)
      // fixpoint: a second compression pass changes nothing
      assert(toks.sliding(2).forall(p => p.length < 2 || p(0) != p(1)),
        s"doc ${r.getAs[Long]("doc_id")} still has a consecutive repeat")
      if (after < before) removedAny = true
    }
    assert(removedAny, "corpus contains repeated runs; none were removed")
  }

  test("q73 bloom blocklist: no false negatives, FPs bounded, src0 fully self-matched") {
    val rows = run("q73_bloom_blocklist").collect()
    assert(rows.map(_.getAs[String]("source")).length == 20) // every source reported
    var bloomTotal = 0L; var exactTotal = 0L; var docsTotal = 0L
    rows.foreach { r =>
      val bloom = r.getAs[Long]("n_bloom_hits")
      val exact = r.getAs[Long]("n_exact_hits")
      assert(exact <= bloom, s"${r.getAs[String]("source")}: bloom missed an exact hit")
      if (r.getAs[String]("source") == "src0")
        assert(exact == r.getAs[Long]("n_docs"), "src0 docs must all match their own blocklist")
      bloomTotal += bloom; exactTotal += exact; docsTotal += r.getAs[Long]("n_docs")
    }
    // false-positive rate stays under 5% of the non-matching corpus
    val fps = bloomTotal - exactTotal
    assert(fps <= 0.05 * (docsTotal - exactTotal), s"$fps false positives on $docsTotal docs")
  }

  test("q50c/q50d: sampling invariants hold and the corpus is ASCII (char = byte framing)") {
    import org.apache.spark.sql.functions._
    // the q50b/q50c/q50d oracles slice by CHAR (ord = byte) while the
    // ops conceptually slice bytes — equivalent only while payloads
    // are ASCII; if the corpus ever grows multi-byte text this must
    // fail loudly
    val nonAscii = graft.Tables.documents(spark, sf)
      .filter(length(col("text")) =!= octet_length(to_binary(col("text"), lit("utf-8"))))
      .count()
    assert(nonAscii == 0, "corpus no longer ASCII: q50b/q50c/q50d framing must switch to bytes")
    // q50c/q50d are pure Catalyst compositions: the columnar scan must
    // reach the project with no object-serialization boundary
    Seq("q50c_frame_sampling", "q50d_resize_thumb").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString
      assert(!plan.contains("DeserializeToObject"), s"$q plan left codegen:\n$plan")
    }
    val fs = run("q50c_frame_sampling").collect()
    fs.foreach { r =>
      val stride = r.getAs[Int]("stride")
      assert(stride >= 2 && stride <= 5)
      val expect = (r.getAs[Int]("n_frames") + stride - 1) / stride
      assert(r.getAs[Int]("n_sampled") == expect)
      assert(r.getAs[String]("sample_digest").matches("[0-9a-f]{32}"))
    }
    val rz = run("q50d_resize_thumb").collect()
    rz.foreach { r =>
      val (w, h) = (r.getAs[Int]("w"), r.getAs[Int]("h"))
      assert(w >= 2 && w <= 64 && h >= 1)
      assert(r.getAs[String]("thumb_digest").matches("[0-9a-f]{32}"))
    }
    // deterministic across runs
    assert(run("q50d_resize_thumb").collect().map(_.getAs[String]("thumb_digest"))
      .sameElements(rz.map(_.getAs[String]("thumb_digest"))))
  }

  test("q86 curation: all six verdicts reachable, gate precedence holds (synthetic)") {
    import spark.implicits._
    val good = "the quick brown fox jumps over lazy dogs and cats of every kind to win is fun"
    val dup  = "the bright red ship sails far beyond and east of every port to rest is calm"
    val mis  = "the tall green tree stands high above and north of every field to grow is slow"
    val junk = Seq.fill(20)("7").mkString(" ")
    val long = (0 to 5000).map(i => s"w$i").mkString(" ")
    val rows = Seq(
      (0L, good, "en"), (1L, dup, "en"), (2L, dup, "en"),
      (3L, mis, "de"), (4L, junk, "en"),
      (5L, "tiny doc here", "en"), (6L, long, "en"))
    val dir = java.nio.file.Files.createTempDirectory("graft_cur").toString
    rows.map { case (id, t, l) => (id, t, l, "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q86_curated_corpus")(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("verdict")).toMap
    assert(got == Map(
      0L -> "kept", 1L -> "kept", 2L -> "duplicate", 3L -> "lang_mismatch",
      4L -> "low_quality", 5L -> "too_short", 6L -> "too_long"), s"got $got")
  }

  test("q83 semantic dedup: survivors match a union-find over the q51b pairs") {
    val pairs = run("q51b_embedding_neardup_blocked").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = graft.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0))
    val roots = ids.map(i => i -> find(i)).toMap
    val expected = ids.filter(i => roots(i) == i)
      .map(i => i -> (ids.count(roots(_) == i) - 1).toLong).toMap
    val got = run("q83_semantic_dedup_corpus").collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("n_dups_absorbed")).toMap
    assert(got == expected)
    assert(got.values.sum + got.size == ids.length) // mass conservation
  }

  test("q84 mixture: temperature upweights small sources, budget respected") {
    val rows = run("q84_mixture_sample").collect()
    assert(rows.length == 20)
    // each rate tracks the continuous α=0.5 formula (floor(sqrt) can
    // locally break pairwise monotonicity at perfect-square edges, so
    // assert against the formula, not neighbor ordering)
    val toks = rows.map(r => r.getString(0) -> r.getAs[Long]("src_tokens")).toMap
    val budget = 0.3 * toks.values.sum
    val sumSqrt = toks.values.map(t => math.sqrt(t.toDouble)).sum
    rows.foreach { r =>
      val t = toks(r.getString(0))
      val ideal = 1e6 * budget * math.sqrt(t.toDouble) / (sumSqrt * t)
      val got = r.getAs[Long]("rate_micro")
      assert(got > 0 && got <= 1000000L)
      assert(math.abs(got - ideal) < 0.02 * ideal + 2000,
        s"${r.getString(0)}: rate $got far from continuous $ideal")
    }
    // and the big picture: small sources are upweighted vs large ones
    val bySize = rows.sortBy(_.getAs[Long]("src_tokens"))
    val small5 = bySize.take(5).map(_.getAs[Long]("rate_micro").toDouble).sum / 5
    val large5 = bySize.takeRight(5).map(_.getAs[Long]("rate_micro").toDouble).sum / 5
    assert(small5 > large5, s"small-source avg rate $small5 !> large $large5")
    // the md5-threshold sample lands near the 30% token budget
    val total = rows.map(_.getAs[Long]("src_tokens")).sum
    val kept = rows.map(_.getAs[Long]("kept_tokens")).sum
    assert(math.abs(kept - 0.3 * total) < 0.05 * total,
      s"kept $kept vs budget ${0.3 * total}")
  }

  test("packNextFit handles oversized docs and bucket boundaries (synthetic)") {
    // budget 10; bucket 1: 6,6 split; bucket 2: oversized 25 alone,
    // then 4+5 share, 9 overflows to a new seq
    val in = Iterator(
      (1L, 1, 6), (2L, 1, 6),
      (3L, 2, 25), (4L, 2, 4), (5L, 2, 5), (6L, 2, 9))
    val out = TrainPrep.packNextFit(in, 10).toSeq
    assert(out == Seq(
      (1L, 1, 0L, 6), (2L, 1, 1L, 6),
      (3L, 2, 0L, 25), (4L, 2, 1L, 4), (5L, 2, 1L, 5), (6L, 2, 2L, 9)))
  }

  test("q70 packing: sequences respect the token budget and are contiguous") {
    val rows = run("q70_sequence_packing").collect().map(r =>
      (r.getAs[Int]("bucket"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Int]("n_tokens")))
    assert(rows.length == 500) // every doc is packed exactly once
    val bySeq = rows.groupBy(r => (r._1, r._2))
    bySeq.foreach { case ((b, s), ds) =>
      val total = ds.map(_._4).sum
      // a sequence only exceeds the budget if a single oversized doc owns it
      assert(total <= TrainPrep.TokenBudget || ds.length == 1,
        s"bucket $b seq $s overflows: $total tokens in ${ds.length} docs")
    }
    rows.groupBy(_._1).foreach { case (b, ds) =>
      val seqs = ds.map(_._2).distinct.sorted
      assert(seqs.sameElements(0L until seqs.length), s"bucket $b seq ids not contiguous")
      // next-fit in doc_id order: seq_id is monotone in doc_id
      val ordered = ds.sortBy(_._3).map(_._2)
      assert(ordered.sameElements(ordered.sorted), s"bucket $b seq not monotone")
    }
  }
}
