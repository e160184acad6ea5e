package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** KLL-style streaming quantile sketch (Karnin, Lang, Liberty, FOCS 2016)
  * with DETERMINISTIC alternating-parity compaction.
  *
  * Why this exists: `ExactPercentiles` (sort-based) and the built-in
  * `percentile()` both materialize per-group value lists — exact, but at
  * 100 TB a single hot group is a sort of billions of rows. This sketch is
  * the standard mergeable alternative: fixed O(k·log(n/k)) state per group,
  * map-side partial aggregation combines sketches through Spark's normal
  * partial-agg path, and the shuffle carries kilobytes per group instead of
  * the group's values. The price is a bounded RANK error (estimates are
  * always actual data values whose true rank is within eps·n of the target;
  * eps ~ c·log2(n/k)/k for the deterministic variant — measured, not just
  * claimed: `KllQuantileAggSpec` asserts the bound on adversarial orders and
  * Verify emits the observed sf rank error into the evidence file).
  *
  * Determinism: classic KLL flips a random coin per compaction to pick the
  * even- or odd-indexed survivors; we flip a per-level PARITY counter
  * instead. Error cancels pairwise across consecutive compactions of a
  * level exactly as with fair coins, the sketch stays reproducible for a
  * fixed reduce/merge order, and no RNG state rides the shuffle. (Across
  * Spark runs, partition merge ORDER may vary — results are approximate by
  * contract, so the gate is rows-only with measured-error evidence.)
  *
  * Level h holds items of weight 2^h. Capacities shrink geometrically
  * below the top level (cap_h = max(8, ceil(k·(2/3)^(top-h)))) per the KLL
  * paper, so total state is ~3k doubles regardless of n. True min/max are
  * tracked exactly (compaction may discard extremes; q=0 and q=1 must not
  * drift).
  */
final class KllSketch(val k: Int) extends Serializable {
  var n: Long = 0L
  var minV: Double = Double.PositiveInfinity
  var maxV: Double = Double.NegativeInfinity
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty)
  val parity: ArrayBuffer[Int] = ArrayBuffer(0)

  private def capacity(h: Int): Int = {
    val top = levels.length - 1
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, (top - h).toDouble)).toInt)
  }

  def update(v: Double): Unit = {
    n += 1
    if (v < minV) minV = v
    if (v > maxV) maxV = v
    levels(0) += v
    if (levels(0).length > capacity(0)) compactFrom(0)
  }

  /** Compact any over-capacity levels starting at `h`, cascading upward.
    * A compaction sorts the buffer and moves the even- or odd-indexed half
    * (by the level's alternating parity) of an EVEN-length prefix up with
    * doubled weight; the other half is discarded. An odd buffer retains
    * its last (max) element at the current level — compacting an odd count
    * would drift total retained weight by ±2^h per compaction (classic KLL
    * compacts an even count and leaves one item behind), whereas the
    * retained item keeps its exact weight, so Σ len·2^h == n always. */
  private def compactFrom(h0: Int): Unit = {
    var h = h0
    var overfull = h < levels.length && levels(h).length > capacity(h)
    while (overfull) {
      val buf = levels(h).toArray
      java.util.Arrays.sort(buf)
      if (h + 1 >= levels.length) { // new top level: capacities re-shrink
        levels += ArrayBuffer.empty
        parity += 0
      }
      val p = parity(h)
      parity(h) = 1 - p
      levels(h).clear()
      val evenLen = buf.length & ~1
      if (evenLen < buf.length) levels(h) += buf(buf.length - 1)
      var i = p
      while (i < evenLen) {
        levels(h + 1) += buf(i)
        i += 2
      }
      h += 1 // only the level we pushed into can now overflow
      overfull = levels(h).length > capacity(h)
    }
  }

  def mergeWith(o: KllSketch): KllSketch = {
    n += o.n
    if (o.minV < minV) minV = o.minV
    if (o.maxV > maxV) maxV = o.maxV
    while (levels.length < o.levels.length) {
      levels += ArrayBuffer.empty
      parity += 0
    }
    var h = 0
    while (h < o.levels.length) {
      levels(h) ++= o.levels(h)
      h += 1
    }
    // restore capacity invariants bottom-up (a compaction can overflow the
    // level above, which the inner cascade of compactFrom handles)
    h = 0
    while (h < levels.length) {
      if (levels(h).length > capacity(h)) compactFrom(h)
      h += 1
    }
    this
  }

  /** Estimate the value at quantile q in [0, 1]: the smallest retained
    * value whose cumulative weight reaches q·n (q=0 -> exact min,
    * q=1 -> exact max). */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    if (n == 0) return Double.NaN
    if (q == 0.0) return minV
    if (q == 1.0) return maxV
    var m = 0
    var h = 0
    while (h < levels.length) { m += levels(h).length; h += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var i = 0
    h = 0
    while (h < levels.length) {
      val w = 1L << h
      val buf = levels(h)
      var j = 0
      while (j < buf.length) { vals(i) = buf(j); wts(i) = w; i += 1; j += 1 }
      h += 1
    }
    // sort (value, weight) pairs by value
    val idx = (0 until m).sortBy(i => vals(i))
    val target = q * n
    var cum = 0.0
    var r = 0
    while (r < m) {
      cum += wts(idx(r))
      if (cum >= target) return vals(idx(r))
      r += 1
    }
    maxV
  }

  def totalRetained: Int = levels.iterator.map(_.length).sum
}

/** Spark Aggregator wrapping [[KllSketch]]: emits the estimates for the
  * configured quantiles as an array (same order as `qs`). Null inputs are
  * skipped. Use via `udaf(new KllQuantileAgg(...))`. */
class KllQuantileAgg(k: Int, qs: Array[Double])
  extends Aggregator[java.lang.Double, KllSketch, Array[Double]] {

  require(k >= 16 && k <= (1 << 16), s"k must be in [16, 65536], got $k")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0,1]")

  override def zero: KllSketch = new KllSketch(k)

  override def reduce(b: KllSketch, v: java.lang.Double): KllSketch = {
    if (v != null && !v.isNaN) b.update(v.doubleValue())
    b
  }

  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.mergeWith(b)

  override def finish(r: KllSketch): Array[Double] = qs.map(r.quantile)

  // javaSerialization, not kryo: kryo's FieldSerializer needs
  // --add-opens into java.base for the nested ArrayBuffers, which a plain
  // `java -cp` launcher (no spark-submit module opens) doesn't grant; the
  // sketch is ~3k doubles so serialization cost is irrelevant
  override def bufferEncoder: Encoder[KllSketch] =
    Encoders.javaSerialization[KllSketch]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}
