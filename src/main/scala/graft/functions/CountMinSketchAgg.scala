package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Count-Min sketch over a string column: fixed (depth × width) counter
  * matrix, deterministic seeded hashes — a sublinear heavy-hitter /
  * frequency-estimate aggregate for corpus statistics at 100 TB scale
  * (token frequencies, URL counts) where exact groupBy output would itself
  * be huge.
  *
  * Exposed as a typed `Aggregator` (the user-facing custom-aggregate
  * surface): merge is cell-wise addition, so partial aggregation and
  * shuffle-combine work exactly like built-in aggregates. Estimates
  * overcount only: est(x) >= true(x), with error <= 2N/width at ~97.5%
  * confidence for depth 4.
  */
class CountMinSketchAgg(depth: Int = 4, width: Int = 1024)
  extends Aggregator[String, Array[Long], CountMinSketch] {

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], value: String): Array[Long] = {
    if (value != null) {
      val bytes = value.getBytes("UTF-8")
      var d = 0
      while (d < depth) {
        val h = HashKernels.fnv1a64(bytes, 0, bytes.length, d * 0x9e3779b97f4a7c15L)
        buf(d * width + java.lang.Math.floorMod(h, width.toLong).toInt) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): CountMinSketch =
    CountMinSketch(depth, width, buf)

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[CountMinSketch] = Encoders.product[CountMinSketch]
}

case class CountMinSketch(depth: Int, width: Int, counters: Array[Long]) {
  /** Frequency estimate (always >= true count). */
  def estimate(value: String): Long = {
    val bytes = value.getBytes("UTF-8")
    var min = Long.MaxValue
    var d = 0
    while (d < depth) {
      val h = HashKernels.fnv1a64(bytes, 0, bytes.length, d * 0x9e3779b97f4a7c15L)
      val c = counters(d * width + java.lang.Math.floorMod(h, width.toLong).toInt)
      if (c < min) min = c
      d += 1
    }
    min
  }

  def totalAdds: Long = {
    var s = 0L
    var i = 0
    while (i < width) { s += counters(i); i += 1 }
    s
  }
}
