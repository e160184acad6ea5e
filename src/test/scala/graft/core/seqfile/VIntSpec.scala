package graft.core.seqfile

import org.scalatest.funsuite.AnyFunSuite

class VIntSpec extends AnyFunSuite {

  // Known Hadoop WritableUtils encodings (hand-derived from the wire format
  // the reference decodes, Parser.hs:131-152 / decode.c:40-72).
  val known: Seq[(Long, Array[Byte])] = Seq(
    0L -> Array[Byte](0),
    1L -> Array[Byte](1),
    127L -> Array[Byte](127),
    -1L -> Array[Byte](-1),
    -112L -> Array[Byte](-112),
    128L -> Array[Byte](-113, -128.toByte), // 1-byte positive, tag -113, payload 0x80
    255L -> Array[Byte](-113, -1),
    256L -> Array[Byte](-114, 1, 0),
    -113L -> Array[Byte](-121, 112), // negative: tag -121, payload = ~(-113) = 112
    -256L -> Array[Byte](-121, -1), // ~(-256) = 255
    65535L -> Array[Byte](-114, -1, -1),
    76924L -> Array[Byte](-115, 1, 0x2c, 0x7c), // observed in text-int.seq block header
    Long.MaxValue -> Array[Byte](-120, 127, -1, -1, -1, -1, -1, -1, -1),
  )

  test("known Hadoop encodings decode correctly") {
    for ((v, bytes) <- known) {
      assert(VInt.readLong(bytes, 0) === v, s"decoding ${bytes.mkString(",")}")
      assert(VInt.decodeSize(bytes(0)) === bytes.length)
    }
  }

  test("known Hadoop encodings round-trip through our writer") {
    for ((v, bytes) <- known) {
      val buf = new Array[Byte](9)
      val n = VInt.write(buf, 0, v)
      assert(buf.take(n).toSeq === bytes.toSeq, s"encoding $v")
    }
  }

  test("round-trip property over full Long range (seeded fuzz)") {
    val rnd = new java.util.Random(42)
    val cases = Iterator.fill(20000)(rnd.nextLong()) ++
      Iterator.range(-1000, 1000).map(_.toLong) ++
      Iterator(Long.MinValue, Long.MaxValue, Int.MinValue.toLong, Int.MaxValue.toLong) ++
      // values around every byte-length boundary
      (0 to 62).iterator.flatMap(s => Seq((1L << s) - 1, 1L << s, -(1L << s), -(1L << s) - 1))
    for (v <- cases) {
      val buf = new Array[Byte](9)
      val n = VInt.write(buf, 0, v)
      assert(n === VInt.encodedSize(v), s"size of $v")
      assert(n === VInt.decodeSize(buf(0)), s"decodeSize of $v")
      assert(VInt.readLong(buf, 0) === v, s"round-trip of $v")
    }
  }

  test("single-byte boundary is exactly [-112, 127]") {
    assert(VInt.encodedSize(-112L) === 1)
    assert(VInt.encodedSize(-113L) === 2)
    assert(VInt.encodedSize(127L) === 1)
    assert(VInt.encodedSize(128L) === 2)
  }
}
