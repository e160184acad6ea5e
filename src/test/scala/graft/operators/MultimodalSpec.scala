package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MultimodalSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
  lazy val media = Multimodal.synthesize(docs).cache()

  test("synthesize → decodeMeta round-trips the header fields") {
    import spark.implicits._
    val meta = Multimodal.decodeMeta(media)
    val joined = meta.toDF().join(docs, col("media_id") === col("doc_id"))
    assert(meta.filter(!_.valid).count() === 0)
    val bad = joined.filter(
      col("width") =!= lit(32) + (col("doc_id") % 8) * 16 ||
      col("height") =!= lit(32) + (col("doc_id") % 4) * 32 ||
      col("sample_rate") =!= lit(8000) + (col("doc_id") % 4) * 8000 ||
      col("n_frames") =!= lit(8) + (col("doc_id") % 32) ||
      col("payload_len") =!= octet_length(col("text")))
    assert(bad.count() === 0)
  }

  test("corrupt and truncated records become valid=false, not task failures") {
    import spark.implicits._
    val broken = Seq(
      Multimodal.MediaRecord(1L, 0, Array[Byte](1, 2, 3)),               // truncated
      Multimodal.MediaRecord(2L, 0, "XXXX0123456789abcdef".getBytes)).toDS() // bad magic
    val meta = Multimodal.decodeMeta(broken).collect()
    assert(meta.forall(!_.valid))
  }

  test("extractFeatures: fixed dim, deterministic, payload-sensitive") {
    val f = Multimodal.extractFeatures(media)
    val rows = f.collect()
    assert(rows.forall(_.features.length === Multimodal.FeatureDim))
    val again = Multimodal.extractFeatures(media).collect()
      .map(r => r.media_id -> r.features.toSeq).toMap
    assert(rows.forall(r => again(r.media_id) === r.features.toSeq))
    // histogram buckets sum to ~1
    rows.take(20).foreach { r =>
      val s = r.features.drop(3).sum
      assert(math.abs(s - 1.0f) < 1e-3, s"histogram sum $s")
    }
  }

  test("features feed straight into the ANN operator (plumbing compatibility)") {
    import spark.implicits._
    val f = Multimodal.extractFeatures(media).toDF()
      .select(col("media_id"), col("features"))
    val out = SimilaritySearch.bruteForceTopK(f, f.filter(col("media_id") < 3),
      "media_id", "features", k = 5)
    assert(out.count() === 15)
  }

  test("resizeShapes: aspect-preserving fit, never upscales") {
    val meta = Multimodal.decodeMeta(media)
    val r = Multimodal.resizeShapes(meta, 64, 64).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, h, ow, oh) = (row.getInt(1), row.getInt(2), row.getInt(3), row.getInt(4))
      assert(ow <= 64 && oh <= 64)
      assert(ow <= w && oh <= h)
      // aspect ratio preserved within integer-floor tolerance
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) < 0.1)
    }
  }

  test("resizeImages: REAL pixel resample — valid BMP out, solid color preserved") {
    import spark.implicits._
    import graft.core.media.BmpCodec
    // 100x40 solid orange + a 10x10 gradient that must not upscale
    val solid = BmpCodec.encodeSolid(100, 40, 0xff8000)
    val grad = BmpCodec.encode(10, 10,
      Array.tabulate(100)(i => (i * 2) << 16 | (i % 10) << 8 | i))
    val ds = Seq(
      Multimodal.MediaRecord(1L, Multimodal.KindImage, solid),
      Multimodal.MediaRecord(2L, Multimodal.KindImage, grad),
      Multimodal.MediaRecord(3L, Multimodal.KindImage, Array[Byte](1, 2))).toDS()
    val out = Multimodal.resizeImages(ds, 32, 32).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3)))).toMap
    assert(out.keySet === Set(1L, 2L))              // corrupt record dropped
    val (w1, h1, b1) = out(1L)
    assert(w1 === 32 && h1 === 12)                  // floor(40 * 32/100)
    val img1 = BmpCodec.decode(b1).toOption.get     // output is a real BMP
    assert(img1.width === 32 && img1.height === 12)
    assert(img1.pixels.forall(_ === 0xff8000))      // solid color survives
    val (w2, h2, b2) = out(2L)
    assert(w2 === 10 && h2 === 10)                  // never upscales
    // nearest-neighbor identity when dims unchanged
    assert(BmpCodec.decode(b2).toOption.get.pixels
      .sameElements(BmpCodec.decode(grad).toOption.get.pixels))
  }

  test("sampleFrameImages: REAL frames decoded, re-encoded, stride-sampled") {
    import spark.implicits._
    import graft.core.media.BmpCodec
    // synthesizeMedia emits REAL BMP-frame video containers (2-5 frames)
    val real = Multimodal.synthesizeMedia(docs)
    val out = Multimodal.sampleFrameImages(real, stride = 2)
    val byMedia = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](4)))
      .groupBy(_._1)
    val videos = real.collect().filter(_.kind == Multimodal.KindVideo)
      .map(_.media_id).toSet
    assert(byMedia.keySet === videos)
    for ((id, fs) <- byMedia.take(5)) {
      val nf = 2 + (id % 4).toInt
      assert(fs.map(_._2).sorted.sameElements(0 until nf by 2))
      // every sampled frame is a standalone decodable 16x16 BMP
      fs.foreach { f =>
        val img = BmpCodec.decode(f._3).toOption.get
        assert(img.width === 16 && img.height === 16)
        // solid gray frame c = (id*5 + frame_idx) % 256 survives the round trip
        val c = ((id * 5 + f._2) % 256).toInt
        assert(img.pixels.forall(_ === ((c << 16) | (c << 8) | c)))
      }
    }
  }

  test("sampleFrames: stride coverage with in-payload offsets") {
    val meta = Multimodal.decodeMeta(media)
    val frames = Multimodal.sampleFrames(meta, stride = 4)
    val byMedia = frames.collect().groupBy(_.media_id)
    val metaMap = meta.collect().map(m => m.media_id -> m).toMap
    assert(byMedia.nonEmpty)
    for ((id, fs) <- byMedia) {
      val m = metaMap(id)
      assert(fs.length === (m.n_frames + 3) / 4)
      assert(fs.map(_.frame_idx).sorted.sameElements(0 until m.n_frames by 4))
      fs.foreach(fr => assert(fr.byte_offset >= 16 && fr.byte_offset <= 16 + m.payload_len))
    }
  }

  test("synthesizeMedia -> decodeStats: real decoded pixel/sample stats " +
       "match their closed forms") {
    val stats = Multimodal.decodeStats(Multimodal.synthesizeMedia(docs))
      .collect().map(s => s.media_id -> s).toMap
    assert(stats.nonEmpty)
    assert(stats.values.forall(_.valid), "all synthesized media must decode")
    for ((id, s) <- stats) s.kind match {
      case Multimodal.KindImage =>
        assert(s.width === 16 + (id % 8).toInt * 8)
        assert(s.height === 16 + (id % 4).toInt * 8)
        assert(s.stat1 === ((id * 3) % 256).toDouble) // mean R, exact
        assert(s.stat2 === ((id * 7) % 256).toDouble) // mean B, exact
      case Multimodal.KindAudio =>
        assert(s.n_samples === 800 + (id % 16).toInt * 104)
        assert(s.sample_rate === 8000 + (id % 4).toInt * 8000)
        assert(s.stat1 === (1000 + (id % 100) * 10).toDouble) // RMS exact
        assert(s.stat2 === 0.0)                               // mean exact
      case Multimodal.KindVideo =>
        assert(s.n_frames === 2 + (id % 4).toInt)
        assert(s.width === 16 && s.height === 16)
        assert(s.stat1 === ((id * 5) % 256).toDouble)             // first frame
        assert(s.stat2 === ((id * 5 + s.n_frames - 1) % 256).toDouble) // last
    }
  }

  test("PNG decodes through ImageIO: exact pixel stats, resize, features") {
    import spark.implicits._
    import graft.core.media.{BmpCodec, ImageIoCodec}
    // lossless PNG of a known raster: decoded stats have closed forms
    val solidPng = ImageIoCodec.encodePng(20, 10, Array.fill(200)(0x406080))
    assert(ImageIoCodec.isPng(solidPng))
    val ds = Seq(
      Multimodal.MediaRecord(1L, Multimodal.KindImage, solidPng),
      Multimodal.MediaRecord(2L, Multimodal.KindImage,
        solidPng.take(12)), // truncated PNG → corrupt, not a task failure
      Multimodal.MediaRecord(3L, Multimodal.KindImage,
        BmpCodec.encodeSolid(8, 8, 0x102030))).toDS()
    val stats = Multimodal.decodeStats(ds).collect().map(s => s.media_id -> s).toMap
    assert(stats(1L).valid && stats(1L).width === 20 && stats(1L).height === 10)
    assert(stats(1L).stat1 === 0x40.toDouble) // mean R exact (lossless)
    assert(stats(1L).stat2 === 0x80.toDouble) // mean B exact
    assert(!stats(2L).valid, "truncated PNG must degrade to valid=false")
    assert(stats(3L).valid, "BMP fast path unaffected")
    // PNG rides the same resize kernel as BMP, emitting a real BMP
    val resized = Multimodal.resizeImages(ds, 10, 10).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3)))).toMap
    assert(resized.keySet === Set(1L, 3L))
    val (w, h, b) = resized(1L)
    assert(w === 10 && h === 5) // aspect-preserving fit of 20x10 into 10x10
    assert(BmpCodec.decode(b).toOption.get.pixels.forall(_ === 0x406080))
    // features: dims + channel means from the decoded raster
    val f = Multimodal.MediaCodec.decodePayload(solidPng)
    assert(f(0) === 20f && f(1) === 10f && f(2) === 0x40.toFloat &&
      f(3) === 0x60.toFloat && f(4) === 0x80.toFloat)
  }

  test("JPEG decodes through ImageIO: correct dims, approximate color") {
    import graft.core.media.ImageIoCodec
    // write a JPEG with the JDK encoder, read it back through the dispatch
    val img = new java.awt.image.BufferedImage(24, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(new java.awt.Color(200, 100, 50)); g.fillRect(0, 0, 24, 16); g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    assert(ImageIoCodec.isJpeg(jpeg))
    Multimodal.MediaCodec.decode(jpeg) match {
      case Multimodal.MediaCodec.DecodedImage(d) =>
        assert(d.width === 24 && d.height === 16)
        // lossy: means land near the source color
        assert(math.abs(d.meanR - 200) < 8 && math.abs(d.meanB - 50) < 8)
      case other => fail(s"expected DecodedImage, got $other")
    }
  }

  test("MediaCodec dispatch: real BMP/WAV features vs opaque fallback") {
    import graft.core.media.{BmpCodec, WavCodec}
    val img = Multimodal.MediaCodec.decodePayload(BmpCodec.encodeSolid(8, 4, 0x102030))
    assert(img(0) === 8f && img(1) === 4f)
    assert(img(2) === 0x10.toFloat && img(3) === 0x20.toFloat && img(4) === 0x30.toFloat)
    val wav = Multimodal.MediaCodec.decodePayload(
      WavCodec.encode(8000, 1, Array.tabulate(64)(i => if (i % 2 == 0) 500 else -500)))
    assert(wav(0) === 64f && wav(1) === 8000f)
    assert(wav(3) === 500f) // RMS
    assert(wav(4) === 1f)   // alternating signs: every adjacent pair crosses
    // corrupt media -> zero features, no exception
    val bad = Multimodal.MediaCodec.decodePayload("BMgarbage".getBytes)
    assert(bad.forall(_ === 0f))
  }

  test("batch processing preserves partitioning (no shuffle in the decode path)") {
    val m4 = Multimodal.synthesize(docs.repartition(4))
    assert(m4.rdd.getNumPartitions === 4)
    assert(Multimodal.decodeMeta(m4).rdd.getNumPartitions === 4)
  }
}
