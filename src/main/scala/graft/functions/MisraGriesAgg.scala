package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items summary over a string column.
  *
  * A capacity-k summary guarantees that every item with true frequency
  * f > N/k is present in the final summary (with counter >= f - N/k) — the
  * classic deterministic heavy-hitters sketch. Summaries are MERGEABLE
  * (Agarwal et al., "Mergeable Summaries", PODS 2012): add counters, then
  * if more than k survive, subtract the (k+1)-th largest counter from all
  * and drop the non-positive — the merged summary keeps the same error
  * bound. That makes this a well-behaved Spark aggregate: map-side partial
  * summaries combine through the normal partial-aggregation path, and the
  * shuffle carries at most k (token, counter) pairs per partition instead
  * of one row per DISTINCT token.
  *
  * The counters are LOWER bounds after decrements, so this aggregate alone
  * is approximate; `operators.HeavyHitters` composes it with an exact
  * count of the surviving candidates to produce an EXACT, oracle-checkable
  * answer (the sketch only bounds what must be re-counted).
  */
class MisraGriesAgg(capacity: Int)
  extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {

  require(capacity >= 1 && capacity <= (1 << 20),
    s"Misra-Gries capacity must be in [1, 1M], got $capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(buf: mutable.HashMap[String, Long],
                      value: String): mutable.HashMap[String, Long] = {
    if (value != null) {
      buf.get(value) match {
        case Some(c) => buf.update(value, c + 1)
        case None =>
          if (buf.size < capacity) buf.update(value, 1L)
          else decrementAll(buf, 1L) // O(k), amortized O(1)/item: each
                                     // trigger cancels k+1 occurrences
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > capacity) {
      // subtract the (k+1)-th largest counter from every entry; at most k
      // strictly-positive entries survive, preserving the N/k error bound
      val cs = a.values.toArray
      java.util.Arrays.sort(cs)
      decrementAll(a, cs(cs.length - capacity - 1))
    }
    a
  }

  private def decrementAll(m: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    m.foreach { case (t, c) => if (c <= by) dead += t else m.update(t, c - by) }
    dead.foreach(m.remove)
  }

  override def finish(buf: mutable.HashMap[String, Long]): Map[String, Long] =
    buf.toMap

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
