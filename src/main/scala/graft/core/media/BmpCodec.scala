package graft.core.media

/** Minimal, real BMP codec — pure JVM, no libraries (the container ships no
  * imaging stack, so the pipeline's image path uses the one raster format
  * that decodes with ~100 lines of integer arithmetic).
  *
  * Supported on decode: 'BM' files with a BITMAPINFOHEADER (or any later
  * 40+-byte info header), uncompressed (BI_RGB) 24- or 32-bit pixels,
  * bottom-up (positive height) or top-down (negative height) row order,
  * arbitrary pixel-data offset, rows padded to 4 bytes (24bpp). Everything
  * else returns Left(reason) — callers treat that as a corrupt/unsupported
  * record, never an exception (PERMISSIVE decode, like the seqfile reader).
  *
  * Encode emits the canonical 54-byte header + bottom-up 24bpp rows; output
  * is accepted by any image viewer and by this decoder (round-trip specs).
  */
object BmpCodec {

  /** Decoded raster: pixels row-major, top-to-bottom, packed 0xRRGGBB. */
  final case class BmpImage(width: Int, height: Int, pixels: Array[Int]) {
    def meanChannel(shift: Int): Double = {
      var s = 0L
      var i = 0
      while (i < pixels.length) { s += (pixels(i) >>> shift) & 0xff; i += 1 }
      if (pixels.length == 0) 0.0 else s.toDouble / pixels.length
    }
    def meanR: Double = meanChannel(16)
    def meanG: Double = meanChannel(8)
    def meanB: Double = meanChannel(0)
  }

  import ByteIO.{le16, le32, putLe16, putLe32}

  def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte

  def decode(b: Array[Byte]): Either[String, BmpImage] = {
    if (!isBmp(b)) return Left("not a BMP: missing 'BM' magic")
    if (b.length < 54) return Left(s"truncated BMP: ${b.length} bytes")
    val pixelOff = le32(b, 10)
    val infoSize = le32(b, 14)
    if (infoSize < 40) return Left(s"unsupported info header size $infoSize")
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val topDown = rawHeight < 0
    // |Int.MinValue| is not representable; Long abs avoids the wrap
    val heightL = math.abs(rawHeight.toLong)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    if (width <= 0 || heightL == 0) return Left(s"bad dimensions ${width}x$rawHeight")
    if (compression != 0) return Left(s"unsupported compression $compression (BI_RGB only)")
    if (bpp != 24 && bpp != 32) return Left(s"unsupported bit depth $bpp (24/32 only)")
    val bytesPerPx = bpp / 8
    // ALL size arithmetic in Long space: a crafted width like 0x40000000
    // wraps Int products negative and would slip past the bounds check,
    // then crash in allocation — breaking the Left-on-corrupt contract.
    val rowStrideL = ((width.toLong * bytesPerPx + 3) / 4) * 4
    val need = pixelOff.toLong + rowStrideL * heightL
    if (pixelOff.toLong < 14L + infoSize || need > b.length)
      return Left(s"pixel data out of bounds: offset $pixelOff, need $need of ${b.length}")
    // need <= b.length (an Int) bounds width*height*bytesPerPx, so these
    // narrowing casts are exact
    val height = heightL.toInt
    val rowStride = rowStrideL.toInt
    val px = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      var o = pixelOff + srcRow * rowStride
      var x = 0
      val base = y * width
      while (x < width) {
        // BMP stores BGR(A)
        val bl = b(o) & 0xff
        val g = b(o + 1) & 0xff
        val r = b(o + 2) & 0xff
        px(base + x) = (r << 16) | (g << 8) | bl
        o += bytesPerPx
        x += 1
      }
      y += 1
    }
    Right(BmpImage(width, height, px))
  }

  /** Encode a row-major top-to-bottom 0xRRGGBB raster as 24bpp bottom-up. */
  def encode(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad raster ${width}x$height with ${pixels.length} pixels")
    val rowStride = ((width * 3 + 3) / 4) * 4
    val size = 54 + rowStride * height
    val out = new Array[Byte](size)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, size)
    putLe32(out, 10, 54)        // pixel offset
    putLe32(out, 14, 40)        // BITMAPINFOHEADER
    putLe32(out, 18, width)
    putLe32(out, 22, height)    // positive = bottom-up
    putLe16(out, 26, 1)         // planes
    putLe16(out, 28, 24)        // bpp
    putLe32(out, 34, rowStride * height) // image size
    var y = 0
    while (y < height) {
      var o = 54 + (height - 1 - y) * rowStride
      var x = 0
      val base = y * width
      while (x < width) {
        val p = pixels(base + x)
        out(o) = p.toByte            // B
        out(o + 1) = (p >> 8).toByte // G
        out(o + 2) = (p >> 16).toByte // R
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** Solid-color image — the arithmetic-oracle fixture shape. */
  def encodeSolid(width: Int, height: Int, rgb: Int): Array[Byte] =
    encode(width, height, Array.fill(width * height)(rgb))

  /** Nearest-neighbor resample (the standard cheap thumbnail transform):
    * output pixel (x,y) copies input pixel (x*W/outW, y*H/outH). Pure
    * integer source indexing — deterministic on any platform. */
  def resize(img: BmpImage, outW: Int, outH: Int): BmpImage = {
    require(outW > 0 && outH > 0, s"bad target ${outW}x$outH")
    if (outW == img.width && outH == img.height) img
    else {
      val out = new Array[Int](outW * outH)
      var y = 0
      while (y < outH) {
        val sy = (y.toLong * img.height / outH).toInt
        val srcBase = sy * img.width
        val dstBase = y * outW
        var x = 0
        while (x < outW) {
          out(dstBase + x) = img.pixels(srcBase + (x.toLong * img.width / outW).toInt)
          x += 1
        }
        y += 1
      }
      BmpImage(outW, outH, out)
    }
  }
}
