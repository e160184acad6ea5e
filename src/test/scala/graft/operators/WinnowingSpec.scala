package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class WinnowingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  /** Single-threaded reference: same k-gram md5-60bit hash, full windows
    * only (truncated-window fallback when fewer than w k-grams). */
  private def refFingerprints(text: String, k: Int, w: Int): Set[Long] = {
    val t = text.trim.toLowerCase
    if (t.length < k) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val hashes = (0 to t.length - k).map(i => h(t.substring(i, i + k)))
    val n = hashes.length
    val starts = 0 until math.max(1, n - w + 1)
    starts.map(p => hashes.slice(p, math.min(p + w, n)).min).toSet
  }

  test("fingerprints match the single-threaded reference on varied docs") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "completely different content here with no overlap at all",
      4L -> "tiny",            // exactly one k-gram at k=4? (len 4 < k=5 -> none)
      5L -> "abcdef",          // 2 k-grams < w -> truncated-window fallback
      6L -> "aaaaaaaaaa",      // all k-grams identical -> 1 fingerprint
      7L -> "  WHITESPACE and CASE  ")
    val df = docs.toDF("doc_id", "text")
    val got = Winnowing.fingerprints(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for ((id, text) <- docs) {
      val want = refFingerprints(text, 5, 4)
      assert(got.getOrElse(id, Set.empty) === want, s"doc $id")
    }
    assert(!got.contains(4L)) // shorter than k: no fingerprints
  }

  test("winnowing guarantee: shared substring >= w+k-1 chars => shared fingerprint") {
    val common = "this exact phrase is long enough to guarantee a match"
    val df = Seq(
      1L -> s"prefix junk one $common suffix alpha",
      2L -> s"other beginning text $common and another ending",
      3L -> "nothing in common with those two documents at all, none")
      .toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text", k = 5, w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    val pairs = Winnowing.overlapPairs(df, "doc_id", "text",
        k = 5, w = 4, threshold = 0.1, maxDf = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
  }

  test("overlap = shared / min(sizes), threshold filters, ids ordered") {
    val df = Seq(
      1L -> "alpha beta gamma delta epsilon zeta",
      2L -> "alpha beta gamma delta epsilon zeta",    // identical -> overlap 1.0
      3L -> "unrelated words entirely distinct tokens")
      .toDF("doc_id", "text")
    val rows = Winnowing.overlapPairs(df, "doc_id", "text",
        k = 5, w = 4, threshold = 0.5, maxDf = 64)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(rows.keySet === Set((1L, 2L)))
    assert(rows((1L, 2L)) === 1.0)
  }

  test("maxDf drops boilerplate fingerprints from the join") {
    // 40 docs all sharing one phrase: with maxDf < 40 the shared phrase's
    // fingerprints can't pair anything; each doc's unique tail produces no
    // cross-doc hashes, so no pairs at all survive.
    val docs = (1 to 40).map(i => i.toLong -> s"the shared boilerplate line unique$i")
    val df = docs.toDF("doc_id", "text")
    val withCap = Winnowing.overlapPairs(df, "doc_id", "text",
      k = 5, w = 4, threshold = 0.3, maxDf = 10).count()
    val noCap = Winnowing.overlapPairs(df, "doc_id", "text",
      k = 5, w = 4, threshold = 0.3, maxDf = 1000).count()
    assert(withCap === 0L)
    assert(noCap > 0L)
  }
}
