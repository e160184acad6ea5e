package graft.core.seqfile

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the buffered positioned reader the whole codec sits on. */
class SeqInputSpec extends AnyFunSuite {

  private class MemInput(data: Array[Byte]) extends SeekableInput {
    var reads = 0
    val length: Long = data.length
    def readAt(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
      reads += 1
      if (pos >= data.length) return -1
      val n = math.min(len, (data.length - pos).toInt)
      System.arraycopy(data, pos.toInt, buf, off, n)
      n
    }
    def close(): Unit = ()
  }

  test("readByte across buffer refills with a tiny buffer") {
    val data = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val in = new SeqInput(new MemInput(data), bufSize = 7)
    for (i <- 0 until 1000)
      assert(in.readByte() === (data(i) & 0xff), s"at $i")
    assert(in.readByte() === -1, "EOF")
  }

  test("seek backwards and re-read") {
    val data = Array.tabulate[Byte](100)(_.toByte)
    val in = new SeqInput(new MemInput(data), bufSize = 16)
    in.seek(50)
    assert(in.readByte() === 50)
    in.seek(10)
    assert(in.readByte() === 10)
    in.seek(99)
    assert(in.readByte() === 99)
    assert(in.readByte() === -1)
  }

  test("vint spanning a buffer refill boundary decodes correctly") {
    // place a 3-byte vint right at a 8-byte buffer boundary
    val prefix = new Array[Byte](7)
    val v = new Array[Byte](9)
    val n = VInt.write(v, 0, 76924L) // 4-byte encoding
    val data = prefix ++ v.take(n)
    val in = new SeqInput(new MemInput(data), bufSize = 8)
    in.seek(7)
    assert(in.readVLong() === 76924L)
  }

  test("readFully straddling EOF throws EOFException with position") {
    val data = new Array[Byte](10)
    val in = new SeqInput(new MemInput(data))
    in.seek(5)
    val ex = intercept[java.io.EOFException](in.readFully(20))
    assert(ex.getMessage.contains("EOF"))
  }

  test("readVLong sees partial reads (1-byte-at-a-time input)") {
    val v = new Array[Byte](9)
    val n = VInt.write(v, 0, Long.MinValue)
    val drip = new SeekableInput {
      val length: Long = n
      def readAt(pos: Long, buf: Array[Byte], off: Int, len: Int): Int = {
        if (pos >= n) return -1
        buf(off) = v(pos.toInt); 1 // always one byte per call
      }
      def close(): Unit = ()
    }
    val in = new SeqInput(drip)
    assert(in.readVLong() === Long.MinValue)
  }
}
