package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern substring matcher — the blocklist kernel.
  *
  * A corpus-curation pipeline screens every document against a pattern set
  * (banned phrases, contamination canaries, PII trigger strings). The naive
  * plan — `OR` of `contains(text, p)` per pattern, or a cross join with a
  * pattern table — re-scans the text once per pattern: O(|text|·|P|).
  * Aho-Corasick matches ALL patterns in ONE pass over the bytes,
  * O(|text| + matches), independent of pattern count — at 100 TB with a
  * 10k-phrase blocklist that is the difference between 1× and 10,000× scan
  * cost.
  *
  * Classic construction (Aho & Corasick 1975, CACM 18(6)): byte-level trie
  * + BFS failure links + output-set closure. Matching follows goto edges,
  * falling back along failure links on a miss — amortized O(1) per input
  * byte (fail ascents are bounded by depth descents). Matching over UTF-8
  * bytes is exact for substring semantics: a valid UTF-8 pattern occurs as
  * a byte substring iff it occurs as a character substring.
  *
  * The automaton is built once per JVM from the (small, driver-held)
  * pattern list and referenced from generated code via `addReferenceObj`
  * (the compiled-regex pattern of `RegExpExtract` — matching stays inside
  * whole-stage codegen). Memory: one trie node per distinct pattern-prefix
  * byte; edges in an open-addressed long→int table — ~16 bytes/edge, so
  * even a 100k-phrase blocklist is a few MB broadcast with the task
  * closure.
  */
final class AcAutomaton(val patterns: Array[String]) extends Serializable {
  require(patterns.nonEmpty, "empty pattern list")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  // --- trie over pattern bytes -------------------------------------------
  // edges: open-addressed hash (node << 8 | byte) -> next node id
  private val patBytes: Array[Array[Byte]] =
    patterns.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  private val nodeCountUpper = patBytes.map(_.length).sum + 1

  private val edgeCap: Int = {
    var c = 16
    while (c < nodeCountUpper * 2) c <<= 1
    c
  }
  private val edgeKeys = new Array[Long](edgeCap) // 0 = empty (key is k+1)
  private val edgeVals = new Array[Int](edgeCap)

  @inline private def slot(k: Long): Int = {
    var h = k * 0x9e3779b97f4a7c15L
    h ^= h >>> 32
    (h & (edgeCap - 1)).toInt
  }
  private def edgePut(node: Int, b: Int, next: Int): Unit = {
    val k = (node.toLong << 8) | b
    var i = slot(k)
    while (edgeKeys(i) != 0 && edgeKeys(i) != k + 1) i = (i + 1) & (edgeCap - 1)
    edgeKeys(i) = k + 1
    edgeVals(i) = next
  }
  @inline private def edgeGet(node: Int, b: Int): Int = {
    val k = (node.toLong << 8) | b
    var i = slot(k)
    while (true) {
      if (edgeKeys(i) == k + 1) return edgeVals(i)
      if (edgeKeys(i) == 0) return -1
      i = (i + 1) & (edgeCap - 1)
    }
    -1
  }

  private var numNodes = 1
  private val failLink = new Array[Int](nodeCountUpper)
  // pattern id terminating at node, else -1 (one per node: duplicate
  // patterns are rejected below, and closure handles suffix overlaps)
  private val termPat = Array.fill(nodeCountUpper)(-1)

  // insert patterns
  patBytes.zipWithIndex.foreach { case (bs, pid) =>
    var node = 0
    var i = 0
    while (i < bs.length) {
      val b = bs(i) & 0xff
      val nxt = edgeGet(node, b)
      if (nxt >= 0) node = nxt
      else {
        edgePut(node, b, numNodes)
        node = numNodes
        numNodes += 1
      }
      i += 1
    }
    require(termPat(node) == -1,
      s"duplicate pattern '${patterns(pid)}' (also pattern ${termPat(node)})")
    termPat(node) = pid
  }

  // BFS failure links + output closure head: outHead(n) = nearest node on
  // the fail chain (inclusive) that terminates a pattern, else -1 — match
  // enumeration walks only terminating nodes, O(matches) not O(depth).
  private val outHead = Array.fill(numNodes)(-1)
  private val childBytes: Array[Array[Int]] = {
    // per-node sorted outgoing byte list for BFS (rebuilt from edges)
    val builders = Array.fill(numNodes)(List.empty[Int])
    for (i <- 0 until edgeCap if edgeKeys(i) != 0) {
      val k = edgeKeys(i) - 1
      val node = (k >>> 8).toInt
      builders(node) = (k & 0xff).toInt :: builders(node)
    }
    builders.map(_.sorted.toArray)
  }
  locally {
    val queue = new java.util.ArrayDeque[Integer]()
    childBytes(0).foreach { b =>
      val c = edgeGet(0, b)
      failLink(c) = 0
      outHead(c) = if (termPat(c) >= 0) c else -1
      queue.add(c)
    }
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      childBytes(u).foreach { b =>
        val c = edgeGet(u, b)
        var f = failLink(u)
        var fc = edgeGet(f, b)
        while (fc < 0 && f != 0) { f = failLink(f); fc = edgeGet(f, b) }
        failLink(c) = if (fc >= 0 && fc != c) fc else 0
        outHead(c) =
          if (termPat(c) >= 0) c
          else outHead(failLink(c))
        queue.add(c)
      }
    }
  }

  private val patUtf8: Array[UTF8String] = patterns.map(UTF8String.fromString)

  @inline private def step(node0: Int, b: Int): Int = {
    var node = node0
    var nxt = edgeGet(node, b)
    while (nxt < 0 && node != 0) { node = failLink(node); nxt = edgeGet(node, b) }
    if (nxt >= 0) nxt else 0
  }

  /** Distinct matched patterns, in pattern-list order (array<string>). */
  def matchedPatterns(text: UTF8String): ArrayData = {
    val bytes = text.getBytes
    val seen = new Array[Boolean](patterns.length)
    var found = 0
    var node = 0
    var i = 0
    while (i < bytes.length && found < patterns.length) {
      node = step(node, bytes(i) & 0xff)
      var o = outHead(node)
      while (o >= 0) {
        val pid = termPat(o)
        if (!seen(pid)) { seen(pid) = true; found += 1 }
        o = outHead(failLink(o))
      }
      i += 1
    }
    val out = new Array[Any](found)
    var pid = 0
    var j = 0
    while (pid < patterns.length) {
      if (seen(pid)) { out(j) = patUtf8(pid); j += 1 }
      pid += 1
    }
    new GenericArrayData(out)
  }

  /** True iff any pattern occurs — early-exits on the first hit, the cheap
    * screen for `filterClean`. */
  def anyMatch(text: UTF8String): Boolean = {
    val bytes = text.getBytes
    var node = 0
    var i = 0
    while (i < bytes.length) {
      node = step(node, bytes(i) & 0xff)
      if (outHead(node) >= 0) return true
      i += 1
    }
    false
  }

  /** Total occurrence count over all patterns (overlaps counted). */
  def countOccurrences(text: UTF8String): Long = {
    val bytes = text.getBytes
    var node = 0
    var i = 0
    var n = 0L
    while (i < bytes.length) {
      node = step(node, bytes(i) & 0xff)
      var o = outHead(node)
      while (o >= 0) { n += 1; o = outHead(failLink(o)) }
      i += 1
    }
    n
  }
}

object AcAutomaton {
  /** Per-JVM automaton cache keyed by the pattern list — expression copies
    * (serialized to every task) share one built automaton per executor.
    * BOUNDED (LRU, access-ordered): a long-lived executor evaluating many
    * distinct blocklists must not accumulate unbounded automata (each
    * potentially MBs). 64 entries comfortably covers every concurrent
    * query's pattern lists; an evicted automaton is simply rebuilt on next
    * use (construction is milliseconds for realistic lists). */
  private val MaxCached = 64
  private val cache =
    new java.util.LinkedHashMap[Seq[String], AcAutomaton](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], AcAutomaton]): Boolean =
        size() > MaxCached
    }
  def forPatterns(patterns: Seq[String]): AcAutomaton = cache.synchronized {
    var a = cache.get(patterns)
    if (a == null) { a = new AcAutomaton(patterns.toArray); cache.put(patterns, a) }
    a
  }
}
