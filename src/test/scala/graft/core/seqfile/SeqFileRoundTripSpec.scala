package graft.core.seqfile

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Writer → reader round-trips across the full 8-type codec matrix
  * (reference type table: src/Data/Hadoop/Writable.hs:73-106), plus interop:
  * our writer's output read by Hadoop's own SequenceFile.Reader (hadoop-client
  * is on the Spark classpath). */
class SeqFileRoundTripSpec extends AnyFunSuite {

  private def roundTrip(kt: WritableType, vt: WritableType, records: Seq[(Any, Any)],
                        blockSize: Int = 1 << 20): Seq[(Any, Any)] = {
    val tmp = Files.createTempFile("rt", ".seq")
    val w = new SeqFileWriter(Files.newOutputStream(tmp), kt, vt,
      blockSize = blockSize, syncSeed = 7L)
    records.foreach { case (k, v) => w.append(k, v) }
    w.close()
    val r = SeqFile.open(tmp.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Any, Any)]
    try {
      for (b <- r; i <- 0 until b.count)
        out += ((extract(b.keys.get, i), extract(b.values.get, i)))
    } finally { r.close(); Files.delete(tmp) }
    out.toSeq
  }

  private def extract(c: ColumnData, i: Int): Any = c match {
    case NullColumn(_) => null
    case ShortColumn(v) => v(i)
    case IntColumn(v) => v(i)
    case LongColumn(v) => v(i)
    case FloatColumn(v) => v(i)
    case DoubleColumn(v) => v(i)
    case b: BinaryColumn => b.sliceString(i)
  }

  test("Text/IntWritable round-trip incl. empty and multi-byte UTF-8 strings") {
    val recs: Seq[(Any, Any)] =
      Seq(("", 0), ("hello", 1), ("héllo wörld", -42), ("日本語テキスト", Int.MaxValue),
          ("x" * 300, Int.MinValue)) // 300 chars → 2-byte inner vint
    assert(roundTrip(WritableType.TextW, WritableType.IntW, recs) === recs)
  }

  test("LongWritable/DoubleWritable round-trip") {
    val recs: Seq[(Any, Any)] = Seq((0L, 0.0), (Long.MaxValue, math.Pi),
      (Long.MinValue, -1.5e300), (42L, Double.MinPositiveValue))
    assert(roundTrip(WritableType.LongW, WritableType.DoubleW, recs) === recs)
  }

  test("Short/Float round-trip") {
    val recs: Seq[(Any, Any)] = Seq((1.toShort, 1.5f), (Short.MinValue, -0.0f),
      (Short.MaxValue, Float.MaxValue))
    assert(roundTrip(WritableType.ShortW, WritableType.FloatW, recs) === recs)
  }

  test("BytesWritable values round-trip incl. empty") {
    val recs: Seq[(Any, Any)] = Seq((1, Array[Byte]()), (2, Array[Byte](1, 2, 3)),
      (3, Array.tabulate[Byte](1000)(_.toByte)))
    val got = roundTrip(WritableType.IntW, WritableType.BytesW,
      recs.map { case (k, v) => (k, v: Any) })
    // compare bytes structurally
    assert(got.map(_._1) === recs.map(_._1))
    // BinaryColumn extract gives String; redo with raw compare
    val tmp = Files.createTempFile("rtb", ".seq")
    val w = new SeqFileWriter(Files.newOutputStream(tmp), WritableType.IntW,
      WritableType.BytesW, syncSeed = 7L)
    recs.foreach { case (k, v) => w.append(k, v) }
    w.close()
    val r = SeqFile.open(tmp.toString)
    val vals = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    try for (b <- r; i <- 0 until b.count)
      vals += b.values.get.asInstanceOf[BinaryColumn].slice(i)
    finally { r.close(); Files.delete(tmp) }
    assert(vals.zip(recs.map(_._2)).forall { case (a, e) =>
      java.util.Arrays.equals(a, e.asInstanceOf[Array[Byte]]) })
  }

  test("NullWritable key round-trip") {
    val recs: Seq[(Any, Any)] = Seq((null, "a"), (null, "b"))
    assert(roundTrip(WritableType.NullW, WritableType.TextW, recs) === recs)
  }

  test("multi-block file: small blockSize forces many blocks; split reading agrees") {
    val recs: Seq[(Any, Any)] = (0 until 50000).map(i => (i.toLong, s"record-$i": Any))
    val tmp = Files.createTempFile("mb", ".seq")
    val w = new SeqFileWriter(Files.newOutputStream(tmp), WritableType.LongW,
      WritableType.TextW, blockSize = 32 * 1024, syncSeed = 7L)
    recs.foreach { case (k, v) => w.append(k, v) }
    w.close()
    val h = SeqFile.readHeader(tmp.toString)
    val len = tmp.toFile.length()
    // read via 7 uneven splits and compare with whole-file read
    val bounds = (0 to 7).map(i => len * i / 7)
    val bySplit = bounds.zip(bounds.tail).flatMap { case (s, e) =>
      val in = new LocalSeekableInput(tmp)
      val rd = new SeqBlockReader(in, h, s, e)
      try rd.flatMap(b => (0 until b.count)
        .map(i => (b.keys.get.asInstanceOf[LongColumn].values(i),
                   b.values.get.asInstanceOf[BinaryColumn].sliceString(i)))).toList
      finally rd.close()
    }
    assert(bySplit.size === recs.size)
    assert(bySplit === recs.map { case (k, v) => (k, v) })
    val blocks = { val r = SeqFile.open(tmp.toString); try r.size finally r.close() }
    assert(blocks > 5, s"expected many blocks, got $blocks")
    Files.delete(tmp)
  }

  test("interop: our writer's file is readable by Hadoop's SequenceFile.Reader") {
    val tmp = Files.createTempFile("hadoop-rt", ".seq")
    val w = new SeqFileWriter(Files.newOutputStream(tmp), WritableType.TextW,
      WritableType.LongW, metadata = Seq("graft.origin" -> "roundtrip"), syncSeed = 7L)
    val recs = (0 until 1000).map(i => (s"k%05d".format(i), i * 7L))
    recs.foreach { case (k, v) => w.append(k, v) }
    w.close()
    try {
      val conf = new org.apache.hadoop.conf.Configuration()
      val reader = new org.apache.hadoop.io.SequenceFile.Reader(conf,
        org.apache.hadoop.io.SequenceFile.Reader.file(
          new org.apache.hadoop.fs.Path(tmp.toString)))
      val key = new org.apache.hadoop.io.Text()
      val value = new org.apache.hadoop.io.LongWritable()
      val got = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (reader.next(key, value)) got += ((key.toString, value.get()))
      // nonempty metadata must survive the trip (count is big-endian on the
      // wire — the one place we deliberately diverge from the reference's
      // little-endian read, Parser.hs:72-75)
      val meta = reader.getMetadata.getMetadata
      reader.close()
      assert(meta.get(new org.apache.hadoop.io.Text("graft.origin")) ===
        new org.apache.hadoop.io.Text("roundtrip"))
      assert(got.toSeq === recs)
    } finally Files.delete(tmp)
  }
}
