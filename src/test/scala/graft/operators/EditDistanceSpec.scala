package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import scala.util.Random

class EditDistanceSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  /** Brute-force truth over the SAME normalized heads the operator uses. */
  private def truth(rows: Seq[(Long, String)], k: Int, headLen: Int): Set[(Long, Long, Int)] = {
    val heads = rows.map { case (id, t) => (id, t.toLowerCase.trim.take(headLen)) }
      .filter(_._2.nonEmpty)
    (for {
      (ia, ha) <- heads; (ib, hb) <- heads
      if ia < ib && math.abs(ha.length - hb.length) <= k
      d = lev(ha, hb) if d <= k
    } yield (ia, ib, d)).toSet
  }

  private def run(rows: Seq[(Long, String)], k: Int, headLen: Int): Set[(Long, Long, Int)] =
    Dedup.editDistancePairs(rows.toDF("doc_id", "text"), "doc_id", "text", k, headLen)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet

  test("closed-form cases: exact dup, in-range edits, out-of-range, shifts") {
    val rows = Seq(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy dog",       // dist 0
      3L -> "the quick brown fox jumped over the lazy dog",      // dist 2 (s->ed)
      4L -> "Xthe quick brown fox jumps over the lazy dog",      // front insert: dist 1
      5L -> "a completely different sentence about nothing at all",
      6L -> "the quick brown cat walks under the lazy dog")      // several edits
    val k = 3
    val out = run(rows, k, headLen = 60)
    val want = truth(rows, k, 60)
    assert(out === want)
    assert(out.contains((1L, 2L, 0)) && out.contains((1L, 3L, 2)) && out.contains((1L, 4L, 1)))
    assert(!out.exists { case (a, b, _) => a == 5L || b == 5L })
  }

  test("tiny strings route through the tiny bucket and still pair exactly") {
    val rows = Seq(1L -> "ab", 2L -> "ac", 3L -> "abcd", 4L -> "zzzzzzzzzz")
    val k = 2
    val out = run(rows, k, headLen = 40)
    assert(out === truth(rows, k, 40))
    assert(out.contains((1L, 2L, 1)))   // both len <= k
    assert(out.contains((1L, 3L, 2)))   // tiny vs short normal
  }

  test("fuzz: blocking is complete — operator equals brute force") {
    val rnd = new Random(42)
    val alphabet = "abcde"
    def randStr(n: Int) = (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    def mutate(s: String, edits: Int): String = {
      var cur = s
      for (_ <- 1 to edits) {
        val op = rnd.nextInt(3)
        val p = if (cur.isEmpty) 0 else rnd.nextInt(cur.length)
        cur = op match {
          case 0 if cur.nonEmpty => cur.updated(p, alphabet(rnd.nextInt(alphabet.length)))
          case 1 => cur.take(p) + alphabet(rnd.nextInt(alphabet.length)) + cur.drop(p)
          case _ if cur.nonEmpty => cur.take(p) + cur.drop(p + 1)
          case _ => cur
        }
      }
      cur
    }
    // 20 base strings, 3 mutated copies each (0-5 edits) — plenty of pairs
    // inside and outside the threshold, lengths straddling the band
    val bases = (0 until 20).map(_ => randStr(12 + rnd.nextInt(25)))
    val rows = bases.zipWithIndex.flatMap { case (b, i) =>
      (0 until 3).map(j => ((i * 10 + j).toLong, if (j == 0) b else mutate(b, rnd.nextInt(6))))
    }
    val k = 3
    assert(run(rows, k, headLen = 50) === truth(rows, k, 50))
  }

  test("head truncation bounds the comparison window") {
    val common = "shared prefix " * 10   // 140 chars, > headLen
    val rows = Seq(1L -> (common + "tail one"), 2L -> (common + "completely different tail"))
    // identical inside the 60-char head -> dist 0 despite different tails
    assert(run(rows, 2, headLen = 60) === Set((1L, 2L, 0)))
  }
}
