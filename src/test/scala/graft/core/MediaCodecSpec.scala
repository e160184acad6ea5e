package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.core.media.{BmpCodec, WavCodec}

/** Pure-JVM media codec tests: round-trips with known statistics,
  * hand-built fixtures for decode-only layouts (32bpp, top-down BMP;
  * 8-bit and chunk-laden WAV), and corrupt-input rejection. */
class MediaCodecSpec extends AnyFunSuite {

  // ---------------- BMP ----------------

  test("BMP round-trip: arbitrary raster survives encode/decode exactly") {
    val rnd = new scala.util.Random(11)
    for (w <- Seq(1, 3, 16, 33); h <- Seq(1, 2, 7)) {
      val px = Array.fill(w * h)(rnd.nextInt() & 0xffffff)
      val img = BmpCodec.decode(BmpCodec.encode(w, h, px))
        .fold(e => fail(s"${w}x$h: $e"), identity)
      assert(img.width === w && img.height === h)
      assert(img.pixels.toSeq === px.toSeq, s"${w}x$h pixels differ")
    }
  }

  test("BMP solid-color means are exact") {
    val img = BmpCodec.decode(BmpCodec.encodeSolid(20, 10, 0x40A0F0))
      .fold(fail(_), identity)
    assert(img.meanR === 0x40.toDouble)
    assert(img.meanG === 0xA0.toDouble)
    assert(img.meanB === 0xF0.toDouble)
  }

  test("BMP decodes 32bpp and top-down layouts") {
    // hand-build a 2x2 top-down 32bpp image: rows in natural order
    val w = 2; val h = 2
    val b = new Array[Byte](54 + w * h * 4)
    b(0) = 'B'; b(1) = 'M'
    def le32(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o+1) = (v>>8).toByte; b(o+2) = (v>>16).toByte; b(o+3) = (v>>24).toByte }
    def le16(o: Int, v: Int): Unit = { b(o) = v.toByte; b(o+1) = (v>>8).toByte }
    le32(2, b.length); le32(10, 54); le32(14, 40)
    le32(18, w); le32(22, -h) // negative height = top-down
    le16(26, 1); le16(28, 32); le32(30, 0)
    // pixels BGRA, row 0 = red green, row 1 = blue white
    val colors = Seq(0xFF0000, 0x00FF00, 0x0000FF, 0xFFFFFF)
    colors.zipWithIndex.foreach { case (c, i) =>
      val o = 54 + i * 4
      b(o) = c.toByte; b(o+1) = (c>>8).toByte; b(o+2) = (c>>16).toByte; b(o+3) = 0xff.toByte
    }
    val img = BmpCodec.decode(b).fold(fail(_), identity)
    assert(img.pixels.toSeq === colors)
  }

  test("BMP rejects corrupt input with reasons, never throws") {
    assert(BmpCodec.decode(Array[Byte]()).isLeft)
    assert(BmpCodec.decode("XXnot a bmp".getBytes).isLeft)
    assert(BmpCodec.decode(BmpCodec.encodeSolid(4, 4, 0).take(30)).isLeft)
    val rle = BmpCodec.encodeSolid(4, 4, 0)
    rle(30) = 1 // compression = BI_RLE8
    assert(BmpCodec.decode(rle).left.exists(_.contains("compression")))
    val depth = BmpCodec.encodeSolid(4, 4, 0)
    depth(28) = 8 // 8bpp palette
    assert(BmpCodec.decode(depth).left.exists(_.contains("bit depth")))
    val overrun = BmpCodec.encodeSolid(4, 4, 0)
    overrun(18) = 100.toByte // width 100 but data for 4
    assert(BmpCodec.decode(overrun).left.exists(_.contains("out of bounds")))
  }

  // ---------------- WAV ----------------

  test("WAV round-trip: samples, rate, channels survive exactly") {
    val rnd = new scala.util.Random(13)
    val samples = Array.fill(999)(rnd.nextInt(65536) - 32768)
    val a = WavCodec.decode(WavCodec.encode(44100, 1, samples)).fold(fail(_), identity)
    assert(a.sampleRate === 44100 && a.channels === 1 && a.bitsPerSample === 16)
    assert(a.samples.toSeq === samples.toSeq)
  }

  test("WAV square-wave statistics are exact") {
    val amp = 1200
    val s = Array.tabulate(800)(i => if ((i / 4) % 2 == 0) amp else -amp)
    val a = WavCodec.decode(WavCodec.encode(16000, 1, s)).fold(fail(_), identity)
    assert(a.rms === amp.toDouble)   // |sample| constant -> RMS exact
    assert(a.mean === 0.0)           // n divisible by period
    // sign flips every 4 samples: 199 crossings over 799 adjacent pairs
    assert(math.abs(a.zeroCrossingRate - 199.0 / 799) < 1e-12)
  }

  test("WAV decodes 8-bit audio and skips unknown chunks (with odd padding)") {
    // hand-build: RIFF [junk chunk len 3 + pad] [fmt 8-bit] [data]
    val data = Array[Byte](0, 64, 127.toByte, 128.toByte, 255.toByte)
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0) // padded to 4
    val fmt = new Array[Byte](24)
    def le32(b: Array[Byte], o: Int, v: Int): Unit = { b(o)=v.toByte; b(o+1)=(v>>8).toByte; b(o+2)=(v>>16).toByte; b(o+3)=(v>>24).toByte }
    def le16(b: Array[Byte], o: Int, v: Int): Unit = { b(o)=v.toByte; b(o+1)=(v>>8).toByte }
    "fmt ".getBytes.copyToArray(fmt, 0)
    le32(fmt, 4, 16); le16(fmt, 8, 1); le16(fmt, 10, 1); le32(fmt, 12, 8000)
    le32(fmt, 16, 8000); le16(fmt, 20, 1); le16(fmt, 22, 8)
    val dataChunk = "data".getBytes ++ Array[Byte](5, 0, 0, 0) ++ data ++ Array[Byte](0)
    val body = junk ++ fmt ++ dataChunk
    val hdr = new Array[Byte](12)
    "RIFF".getBytes.copyToArray(hdr, 0)
    le32(hdr, 4, 4 + body.length)
    "WAVE".getBytes.copyToArray(hdr, 8)
    val a = WavCodec.decode(hdr ++ body).fold(fail(_), identity)
    assert(a.bitsPerSample === 8 && a.sampleRate === 8000)
    assert(a.samples.toSeq === Seq(-128, -64, -1, 0, 127))
  }

  test("WAV rejects corrupt input with reasons, never throws") {
    assert(WavCodec.decode(Array[Byte]()).isLeft)
    assert(WavCodec.decode("RIFFxxxxAIFF0000".getBytes).isLeft)
    val f = WavCodec.encode(8000, 1, Array(1, 2, 3))
    f(20) = 3 // IEEE float format
    assert(WavCodec.decode(f).left.exists(_.contains("PCM")))
    val trunc = WavCodec.encode(8000, 1, Array.fill(100)(5)).take(60)
    assert(WavCodec.decode(trunc).left.exists(_.contains("overruns")))
    val noData = WavCodec.encode(8000, 1, Array[Int]()).take(44 - 8) ++
      Array[Byte]() // drop the data chunk header entirely
    assert(WavCodec.decode(noData).isLeft)
  }
}
