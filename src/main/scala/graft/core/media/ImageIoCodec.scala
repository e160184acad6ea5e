package graft.core.media

/** PNG/JPEG/GIF decode via the JDK's own `javax.imageio.ImageIO` — pure-JDK
  * and headless (no native codec stack, no display: the PNG/JPEG readers
  * ship inside every JDK). Output is the same `BmpImage` raster the BMP
  * path produces, so every downstream kernel — feature extraction, resize,
  * re-encode, frame handling — is format-agnostic.
  *
  * Kept separate from BmpCodec (hand-rolled integer arithmetic) because the
  * failure modes differ: ImageIO throws from deep inside plugin readers on
  * hostile bytes, so everything here is wrapped to the same Left-on-corrupt
  * contract the other media codecs follow. */
object ImageIoCodec {

  // Executors have no display; set headless before the first AWT-adjacent
  // class loads. Harmless if the JVM already runs headless.
  System.setProperty("java.awt.headless", "true")

  def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P'.toByte && b(2) == 'N'.toByte && b(3) == 'G'.toByte

  def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 &&
      (b(2) & 0xff) == 0xff

  def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
      b(2) == 'F'.toByte && b(3) == '8'.toByte

  def isSupported(b: Array[Byte]): Boolean = isPng(b) || isJpeg(b) || isGif(b)

  /** Decode to a top-to-bottom row-major 0xRRGGBB raster. Any reader
    * failure — truncated stream, hostile header, unsupported subformat —
    * comes back as Left, never an exception. */
  def decode(bytes: Array[Byte]): Either[String, BmpCodec.BmpImage] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) Left("ImageIO found no reader for payload")
      else {
        val w = img.getWidth
        val h = img.getHeight
        if (w <= 0 || h <= 0) Left(s"bad decoded dimensions ${w}x$h")
        else {
          val px = img.getRGB(0, 0, w, h, null, 0, w) // packed ARGB
          var i = 0
          while (i < px.length) { px(i) &= 0xffffff; i += 1 } // drop alpha
          Right(BmpCodec.BmpImage(w, h, px))
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        Left(s"ImageIO decode failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }

  /** PNG encode of a 0xRRGGBB raster (lossless — exact round-trip with
    * decode). Used by specs/fixtures; JPEG writing is deliberately not
    * offered (lossy output has no closed-form oracle). */
  def encodePng(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad raster ${width}x$height with ${pixels.length} pixels")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }
}
