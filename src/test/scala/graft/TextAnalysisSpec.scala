package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, TextAnalysis => TA}

class TextAnalysisSpec extends SparkSpecBase {
  import spark.implicits._

  test("languageId identifies marker-bearing sentences; und for none") {
    val df = Seq(
      "the cat is one of a kind and proud",
      "der hund und die katze das ist gut",
      "el gato es de la casa que veo",
      "le chat et les chiens des villes",
      "xyzzy plugh").toDF("t")
    val langs = df.select(TA.languageId($"t")).as[String].collect().toSeq
    assert(langs === Seq("en", "de", "es", "fr", "und"))
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq("Hello, world! x2").toDF("t")
    val r = df.select(TA.tokenCount($"t"), TA.bpeishTokenCount($"t"))
      .collect()(0)
    assert(r.getInt(0) === 3)
    // hello , world ! x 2 -> 6
    assert(r.getInt(1) === 6)
  }

  test("fingerprint is stable under token reorder and duplication") {
    val df = Seq(
      ("a", "spark makes big data small"),
      ("b", "small data big makes spark spark"),
      ("c", "entirely other words")).toDF("id", "t")
    val fps = df.select($"id", TA.fingerprint($"t")).as[(String, String)]
      .collect().toMap
    assert(fps("a") === fps("b"))
    assert(fps("a") !== fps("c"))
  }

  test("qualityFeatures computes deterministic bounded score") {
    val docs = Seq((1L, "the quick brown fox and the lazy dog of doom is here"))
      .toDF("doc_id", "text")
    val r = TA.qualityFeatures(docs, "doc_id", "text").collect()(0)
    val q = r.getAs[Double]("quality")
    assert(q > 0.0 && q <= 1.0)
    assert(r.getAs[Int]("n_tokens") === 12)
  }

  test("multimodal decodeMeta is deterministic; non-image bytes are bin") {
    val docs = Seq((1L, "abc"), (2L, "defgh")).toDF("doc_id", "text")
    val blobs = Multimodal.attachBlobs(docs, "doc_id", "text")
    val m1 = Multimodal.decodeMeta(spark, blobs).collect().sortBy(_.getLong(0))
    val m2 = Multimodal.decodeMeta(spark, blobs).collect().sortBy(_.getLong(0))
    assert(m1.toSeq === m2.toSeq)
    assert(m1(0).getAs[Int]("byte_len") === 3)
    // text cast to binary is not an image container: honest fallback
    assert(m1.forall(_.getAs[String]("format") === "bin"))
    assert(m1.forall(_.getAs[Int]("width") === 0))
  }

  test("multimodal decodeMeta recovers real encoder dimensions per format") {
    val docs = Seq(0L, 1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val blobs = Multimodal.syntheticMediaBlobs(spark, docs)
    val m = Multimodal.decodeMeta(spark, blobs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc_id 0 -> png 16x16; 1 -> jpeg 19x21; 2 -> gif 22x26 @3 frames
    assert(m(0L).getAs[String]("format") === "png")
    assert(m(0L).getAs[Int]("width") === 16 && m(0L).getAs[Int]("height") === 16)
    assert(m(1L).getAs[String]("format") === "jpeg")
    assert(m(1L).getAs[Int]("width") === 19 && m(1L).getAs[Int]("height") === 21)
    assert(m(2L).getAs[String]("format") === "gif")
    assert(m(2L).getAs[Int]("width") === 22 && m(2L).getAs[Int]("height") === 26)
    assert(m(2L).getAs[Int]("n_frames") === 3)
    assert(m(5L).getAs[String]("format") === "gif" &&
      m(5L).getAs[Int]("n_frames") === 2)
  }

  test("bigramLogProb: corpus-typical text outscores gibberish; short docs null") {
    // repeated bigrams ("the cat sat") train the LM; the gibberish doc's
    // bigrams appear once each, so its smoothed probabilities are lower
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the mat again"),
      (4L, "zyx qwv plk mnb vcx"),
      (5L, "single"),
      (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TA.bigramLogProb(docs, "doc_id", "text")
      .orderBy("id").collect()
    val scores = r.map(row =>
      if (row.isNullAt(1)) None else Some(row.getDouble(1)))
    // the three corpus-typical docs each beat the gibberish doc
    for (i <- 0 to 2)
      assert(scores(i).get > scores(3).get,
        s"doc ${i + 1} (${scores(i)}) must outscore gibberish (${scores(3)})")
    // no bigrams -> no score, not a fabricated number
    assert(scores(4).isEmpty && scores(5).isEmpty)
  }

  test("bigramLogProbAgainst: unseen eval grams take the add-one floor ln(1/V)") {
    val train = Seq((1L, "the cat sat"), (2L, "the cat ran")).toDF("doc_id", "text")
    // vocabulary = {the, cat, sat, ran} -> V = 4
    val eval = Seq((10L, "zz qq")).toDF("doc_id", "text")
    val r = TA.bigramLogProbAgainst(train, eval, "doc_id", "text")
      .collect()(0)
    // one bigram "zz qq": c12 = 0, c1(zz) = 0 -> ln((0+1)/(0+4))
    assert(math.abs(r.getDouble(1) - math.log(0.25)) < 1e-6)
    // and a train-typical doc scores strictly higher
    val r2 = TA.bigramLogProbAgainst(train,
        Seq((11L, "the cat sat")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()(0)
    assert(r2.getDouble(1) > r.getDouble(1))
  }

  test("multimodal meta gate: parser, Catalyst recompute, and ImageIO agree") {
    val docs = (0L to 11L).toDF("doc_id")
    val blobs = Multimodal.syntheticMediaBlobs(spark, docs)
    val mism = Multimodal.metaMismatches(
        Multimodal.decodeMeta(spark, blobs), Multimodal.expectedMeta(blobs))
      .unionByName(Multimodal.imageIoMismatches(spark, blobs))
    assert(mism.count() === 0)
    // the Catalyst recompute actually covered the fixed-offset formats
    // (8 of 12 docs are png or gif), not vacuously zero rows
    assert(Multimodal.expectedMeta(blobs).count() === 8)
  }

  test("multimodal meta gate has teeth: a tampered field fires it") {
    val docs = Seq(0L, 2L).toDF("doc_id") // one png, one gif
    val blobs = Multimodal.syntheticMediaBlobs(spark, docs)
    val tampered = Multimodal.decodeMeta(spark, blobs)
      .withColumn("width", when($"doc_id" === 2L, $"width" + 1).otherwise($"width"))
    val mism = Multimodal.metaMismatches(tampered, Multimodal.expectedMeta(blobs))
    assert(mism.select("doc_id").as[Long].collect().toSeq === Seq(2L))
    // the ImageIO half fires where the decoders genuinely disagree: a
    // GIF whose last frame is a bare truncated descriptor — the
    // structural walk counts 3 descriptors, ImageIO counts 2 complete
    // frames
    import graft.sources.MediaCodec
    val hacked = MediaCodec.encodeGif(6, 4, 2).dropRight(1) ++
      Array[Byte](0x2c, 0, 0, 0, 0, 6, 0, 4, 0, 0, 2)
    assert(MediaCodec.sniff(hacked).nFrames === 3)
    val blob = Seq((9L, hacked)).toDF("doc_id", "content")
    assert(Multimodal.imageIoMismatches(spark, blob).count() === 1)
  }

  test("multimodal sampleFrames explodes stride-sampled frames") {
    val docs = Seq((1L, "0123456789abcdef")).toDF("doc_id", "text")
    val blobs = Multimodal.attachBlobs(docs, "doc_id", "text")
    val frames = Multimodal.sampleFrames(spark, blobs, stride = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getInt(1) % 2 === 0))
  }

  test("multimodal resize rewrites bytes + meta to the target dimensions") {
    val docs = Seq((1L, "0123456789abcdef"), (2L, "xy")).toDF("doc_id", "text")
    val blobs = Multimodal.attachBlobs(docs, "doc_id", "text")
    val r = Multimodal.resize(spark, blobs, width = 32, height = 32)
      .collect().sortBy(_.getLong(0))
    assert(r.forall(_.getAs[Int]("width") === 32))
    assert(r.forall(_.getAs[Int]("height") === 32))
    assert(r.forall(_.getAs[Array[Byte]]("content").nonEmpty))
    // deterministic: same input, same output bytes
    val r2 = Multimodal.resize(spark, blobs, 32, 32).collect().sortBy(_.getLong(0))
    assert(r.map(_.getAs[Array[Byte]]("content").toSeq).toSeq ===
      r2.map(_.getAs[Array[Byte]]("content").toSeq).toSeq)
  }

  test("multimodal resize is a REAL resample: output images re-sniff to target dims") {
    import graft.sources.MediaCodec
    val docs = Seq(1L, 2L, 3L).toDF("doc_id") // png, jpeg, gif round-robin... ids 1,2,3
    val blobs = Multimodal.syntheticMediaBlobs(spark, docs)
    val out = Multimodal.resize(spark, blobs, width = 24, height = 20).collect()
    assert(out.length === 3)
    out.foreach { row =>
      val p = MediaCodec.sniff(row.getAs[Array[Byte]]("content"))
      assert(p.format === row.getAs[String]("format"),
        "resample must re-encode in the source container")
      assert(p.width === 24 && p.height === 20,
        s"the RESIZED blob's own headers must read 24x20, got ${p.width}x${p.height}")
    }
    // and ImageIO agrees the outputs are decodable real images
    out.foreach { row =>
      val m = MediaCodec.imageIoMeta(row.getAs[Array[Byte]]("content"))
      assert(m.exists(x => x.width === 24 && x.height === 20))
    }
  }

  test("multimodal featureExtract feeds the similarity operators directly") {
    import graft.operators.Similarity
    // 1 and 3 are identical blobs -> identical embeddings -> cosine 1.0
    val docs = Seq((1L, "same bytes"), (2L, "other content"), (3L, "same bytes"))
      .toDF("doc_id", "text")
    val emb = Multimodal.featureExtract(spark,
      Multimodal.attachBlobs(docs, "doc_id", "text"))
    assert(emb.schema("embedding").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false))
    val top = Similarity.bruteForceTopK(
        emb.filter($"doc_id" === 1L), emb, "doc_id", "embedding", k = 1)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().head
    assert(top === ((1L, 3L, 1.0)))
  }

  test("featureExtract routes images through the pixel descriptor, non-images through the text encoder") {
    import graft.sources.MediaCodec
    val text2 = "definitely not an image"
    val blobs = Seq(
      (1L, MediaCodec.encodePng(8, 6, 0xff0000)),
      (2L, text2.getBytes("UTF-8"))).toDF("doc_id", "content")
    val fe = Multimodal.featureExtract(spark, blobs)
      .as[(Long, Seq[Float])].collect().toMap
    val pf = Multimodal.pixelFeatures(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // decodable image: the REAL grid-pooled descriptor, bit-identical
    assert(pf(1L)._2, "PNG must be flagged as pixels")
    assert(fe(1L) === pf(1L)._1)
    // solid red -> R slots hot: proves this is pixels, not a byte hash
    assert(math.abs(fe(1L)(0) - 0.5f) < 1e-6)
    // non-image: the REAL text encoder — bit-identical to
    // hashedTfEmbedding run directly on the decoded text at the same
    // dimension (one implementation, no JVM twin to drift)
    assert(!pf(2L)._2)
    assert(fe(2L) === pf(2L)._1)
    val direct = Seq(Tuple1(text2)).toDF("t")
      .select(transform(
        TA.hashedTfEmbedding($"t", 12), x => x.cast("float"))
        .as("e"))
      .as[Seq[Float]].collect().head
    assert(fe(2L) === direct)
  }

  test("mixed image+text corpus is one total relation the similarity operators consume") {
    import graft.sources.MediaCodec
    import graft.operators.Similarity
    // two images (same solid color, different sizes -> same descriptor
    // direction), two text docs sharing tokens, one text doc apart
    val blobs = Seq(
      (1L, MediaCodec.encodePng(8, 6, 0x0000ff)),
      (2L, MediaCodec.encodePng(16, 12, 0x0000ff)),
      (10L, "the quick brown fox jumps".getBytes("UTF-8")),
      (11L, "quick the fox brown jumps".getBytes("UTF-8")),
      (12L, "entirely disjoint vocabulary here".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val emb = Multimodal.featureExtract(spark, blobs)
    assert(emb.count() === 5, "every modality lands in the relation")
    // text twins (same token bag) are exact neighbors; the image query
    // retrieves the other image, never a text doc
    val topText = Similarity.bruteForceTopK(
        emb.filter($"doc_id" === 10L), emb, "doc_id", "embedding", k = 1)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().head
    assert(topText === ((10L, 11L, 1.0)))
    val topImg = Similarity.bruteForceTopK(
        emb.filter($"doc_id" === 1L), emb, "doc_id", "embedding", k = 1)
      .select("qid", "nid", "sim").as[(Long, Long, Double)].collect().head
    assert(topImg._2 === 2L && math.abs(topImg._3 - 1.0) < 1e-9)
  }

  test("imageIoMetaTable + join gate equals the one-pass gate; tampered meta still fires") {
    import graft.sources.MediaCodec
    val blobs = Seq(
      (1L, MediaCodec.encodePng(12, 7, 0x112233)),
      (2L, MediaCodec.encodeGif(9, 5, 3)),
      (3L, "no pixels here".getBytes("UTF-8"))).toDF("doc_id", "content")
    val iio = Multimodal.imageIoMetaTable(spark, blobs)
    // the table decodes images and leaves non-images null-formatted
    val rows = iio.orderBy("doc_id")
      .as[(Long, Option[String], Option[Int], Option[Int], Option[Int])]
      .collect().toSeq
    assert(rows.head === ((1L, Some("png"), Some(12), Some(7), Some(1))))
    assert(rows(1) === ((2L, Some("gif"), Some(9), Some(5), Some(3))))
    assert(rows(2)._2.isEmpty)
    // join form == one-pass form (both empty on honest decode)
    val decoded = Multimodal.decodeMeta(spark, blobs)
    assert(Multimodal.imageIoMismatchesFrom(decoded, iio).count() === 0)
    assert(Multimodal.imageIoMismatches(spark, blobs).count() === 0)
    // a tampered decoded width must fire the join gate
    val tampered = decoded.withColumn("width",
      when($"doc_id" === 1L, 99).otherwise($"width"))
    assert(Multimodal.imageIoMismatchesFrom(tampered, iio).count() === 1)
  }

  test("pixelFeatures pools REAL pixels: solid-color PNG yields the color direction") {
    import graft.sources.MediaCodec
    // solid pure-red 8x6 PNG: every grid cell mean is (1, 0, 0) ->
    // normalized embedding is 1/sqrt(cells) on R slots, 0 elsewhere
    val blobs = Seq((1L, MediaCodec.encodePng(8, 6, 0xff0000)))
      .toDF("doc_id", "content")
    val f = Multimodal.pixelFeatures(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().head
    assert(f._3, "PNG must take the pixel path")
    val v = f._2
    assert(v.length === 12)
    val rSlots = Seq(0, 3, 6, 9)
    rSlots.foreach(i => assert(math.abs(v(i) - 0.5f) < 1e-6, s"slot $i = ${v(i)}"))
    (0 until 12).filterNot(rSlots.contains)
      .foreach(i => assert(v(i) === 0.0f, s"slot $i = ${v(i)}"))
  }

  test("pixelFeatures separates spatial layout: half-red/half-blue differs from solid") {
    import graft.sources.MediaCodec
    import java.awt.image.BufferedImage
    // hand-build a 8x8 PNG, top half red, bottom half blue
    val img = new BufferedImage(8, 8, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 8; x <- 0 until 8)
      img.setRGB(x, y, if (y < 4) 0xff0000 else 0x0000ff)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val blobs = Seq((1L, bos.toByteArray)).toDF("doc_id", "content")
    val v = Multimodal.pixelFeatures(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().head._2
    // top cells (0,1): red channel hot; bottom cells (2,3): blue hot
    assert(v(0) > 0.4f && v(2) === 0.0f && v(3 + 0) > 0.4f)
    assert(v(6 + 2) > 0.4f && v(6) === 0.0f && v(9 + 2) > 0.4f)
  }

  test("pixelFeatures: non-image bytes take the text-embedding fallback, flagged") {
    val blobs = Seq((1L, "not an image at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val f = Multimodal.pixelFeatures(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().head
    assert(!f._3)
    assert(f._2.length === 12)
    assert(math.abs(f._2.map(x => x.toDouble * x).sum - 1.0) < 1e-5)
    // tokenless bytes embed as the ZERO vector (hashedTfEmbedding's
    // empty-input contract) — "nothing to describe" stays honest
    // instead of the old byte-hash manufacturing a direction
    val empty = Multimodal.pixelFeatures(spark,
        Seq((2L, Array.emptyByteArray)).toDF("doc_id", "content"), grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().head
    assert(!empty._3 && empty._2.forall(_ === 0.0f))
  }

  test("pixelProfile agrees with the single-purpose decoders in one pass") {
    import graft.sources.MediaCodec
    val blobs = Seq(
      (1L, MediaCodec.encodePng(10, 4, 0x336699)),
      (2L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "content")
    val prof = Multimodal.pixelProfile(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean, Option[Double], Option[Double],
        Option[Double], Option[Long])].collect().sortBy(_._1)
    val feats = Multimodal.pixelFeatures(spark, blobs, grid = 2)
      .as[(Long, Seq[Float], Boolean)].collect().sortBy(_._1)
    assert(prof.map(p => (p._1, p._2, p._3)).toSeq === feats.toSeq)
    val img = prof(0)
    assert(img._7 === Some(40L))
    assert(math.abs(img._4.get - 0x33 / 255.0) < 1e-9)
    assert(math.abs(img._5.get - 0x66 / 255.0) < 1e-9)
    assert(math.abs(img._6.get - 0x99 / 255.0) < 1e-9)
    val bin = prof(1)
    assert(!bin._3 && bin._4.isEmpty && bin._7.isEmpty)
  }

  test("x83eg gate: empty on the real twin fixture; tampered descriptors fire each clause") {
    val blobs = Multimodal.twinFormatBlobs(spark, off = 100L)
    val feats = Multimodal.pixelFeatures(spark, blobs, grid = 2)
    assert(Multimodal.pixelEmbedGateRows(feats, off = 100L).count() === 0)

    // teeth 1: a non-decoding blob fires 'decoded' (and its partner,
    // now twinless, loses its identity-1.0 neighbor)
    val broken = blobs
      .withColumn("content",
        when(col("doc_id") === 0L, lit("junk".getBytes("UTF-8")))
          .otherwise(col("content")))
    val f1 = Multimodal.pixelFeatures(spark, broken, grid = 2)
    val c1 = Multimodal.pixelEmbedGateRows(f1, off = 100L)
      .select("clause").as[String].collect().toSet
    assert(c1.contains("decoded") && c1.contains("identity"), c1)

    // teeth 2: perturbing one descriptor (keeping it decodable) fires
    // 'identity' for the pair — the twins no longer match at 1.0
    val f2 = feats.withColumn("embedding",
      when(col("doc_id") === 100L,
        transform(col("embedding"), x => x * lit(0.5f) + lit(0.1f)))
        .otherwise(col("embedding")))
    val c2 = Multimodal.pixelEmbedGateRows(f2, off = 100L)
      .select("clause").as[String].collect().toSet
    assert(c2.contains("identity"), c2)

    // teeth 3: swapping two twins' ids fires 'twin' (rank-1 is still a
    // perfect-cosine image, just not the declared partner)
    val f3 = feats.withColumn("doc_id",
      when(col("doc_id") === 100L, lit(101L))
        .when(col("doc_id") === 101L, lit(100L))
        .otherwise(col("doc_id")))
    val c3 = Multimodal.pixelEmbedGateRows(f3, off = 100L)
      .select("clause").as[String].collect().toSet
    assert(c3.contains("twin"), c3)
  }

  test("dHash is exactly invariant under a clip-free brightness shift") {
    // ids 1 and 2: coprime XOR params -> structurally unrelated images
    // (ids sharing a power-of-2 param ratio, e.g. 1 vs 3, produce
    // SCALED copies of one pattern and legitimately hash alike)
    val docs = Seq(1L, 2L).toDF("doc_id")
    val base = Multimodal.gradientBlobs(spark, docs)
    val shifted = Multimodal.brightnessShift(spark, base, 20)
    val h0 = Multimodal.dHash(spark, base).as[(Long, Long)].collect().toMap
    val h1 = Multimodal.dHash(spark, shifted).as[(Long, Long)].collect().toMap
    assert(h0.size === 2 && h0 === h1)
    // and structurally different images hash far apart
    val d12 = java.lang.Long.bitCount(h0(1L) ^ h0(2L))
    assert(d12 > 3, s"distance $d12")
  }

  test("hammingPairsFromSignatures pairs shift twins, not strangers") {
    import graft.operators.Dedup
    val docs = Seq(1L, 2L).toDF("doc_id")
    val base = Multimodal.gradientBlobs(spark, docs)
    val shifted = Multimodal.brightnessShift(spark, base, 20)
      .select(($"doc_id" + 100L).as("doc_id"), $"content")
    val sigs = Multimodal.dHash(spark, base.unionByName(shifted))
      .select($"doc_id".as("id"), $"dhash".as("sig"))
    val pairs = Dedup.hammingPairsFromSignatures(sigs, maxDist = 3)
      .as[(Long, Long, Int)].collect().toSeq.sortBy(_._1)
    assert(pairs === Seq((1L, 101L, 0), (2L, 102L, 0)))
  }

  test("pixelChannelStats recovers the exact solid color on lossless PNG") {
    import graft.sources.MediaCodec
    val blobs = Seq((1L, MediaCodec.encodePng(10, 4, 0x336699)))
      .toDF("doc_id", "content")
    val s = Multimodal.pixelChannelStats(spark, blobs)
      .as[(Long, Double, Double, Double, Long)].collect().head
    assert(s._5 === 40L)
    assert(math.abs(s._2 - 0x33 / 255.0) < 1e-9)
    assert(math.abs(s._3 - 0x66 / 255.0) < 1e-9)
    assert(math.abs(s._4 - 0x99 / 255.0) < 1e-9)
  }

  test("hashedTfEmbedding: unit norm, order-invariant, count-sensitive, zero on empty") {
    import org.apache.spark.sql.functions.col
    val dim = 16
    val vecs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "delta gamma beta alpha"), // permutation: identical bag
      (3L, "alpha alpha beta gamma delta"), // extra count: different vec
      (4L, "")
    ).toDF("id", "text")
      .select(col("id"), TA.hashedTfEmbedding(col("text"), dim).as("v"))
      .as[(Long, Seq[Double])].collect().toMap
    def nrm(v: Seq[Double]) = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(nrm(vecs(1L)) - 1.0) < 1e-9, "non-empty docs are unit vectors")
    assert(vecs(1L) === vecs(2L), "bag-of-words: token order must not matter")
    assert(vecs(1L) !== vecs(3L), "token multiplicity must matter")
    assert(vecs(4L).forall(_ == 0.0) && vecs(4L).size === dim,
      "empty text is the zero vector, not NaN")
  }
}
