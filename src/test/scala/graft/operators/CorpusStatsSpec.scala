package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class CorpusStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("entropyProfile closed forms: uniform, degenerate, empty") {
    val df = Seq(
      (1L, "aabb"),           // chars {a:2,b:2} -> 1 bit; tokens {aabb:1} -> 0
      (2L, "aaaa"),           // 0 bits/char
      (3L, "ab cd"),          // chars {a,b,' ',c,d} each 1/5 -> log2(5); 2 distinct tokens -> 1 bit
      (4L, ""),               // empty -> all zeros
      (5L, "x x y y"))        // tokens {x:2,y:2} -> 1 bit
      .toDF("doc_id", "text")
    val out = CorpusStats.entropyProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((4L, 1.0, 1L, 0.0)))
    assert(out(2L) === ((4L, 0.0, 1L, 0.0)))
    assert(math.abs(out(3L)._2 - math.log(5) / math.log(2)) < 2e-4)
    assert(out(3L)._4 === 1.0)
    assert(out(4L) === ((0L, 0.0, 0L, 0.0)))
    assert(out(5L)._3 === 4L)
    assert(out(5L)._4 === 1.0)
  }

  test("entropyProfile normalizes case before counting") {
    val df = Seq((1L, "AAaa")).toDF("doc_id", "text")
    val r = CorpusStats.entropyProfile(df, "doc_id", "text").collect().head
    assert(r.getDouble(2) === 0.0)   // all 'a' after lowercasing
  }

  test("distinctNgramStats counts positional n-grams with multiplicity") {
    val df = Seq(
      ("s1", "a b a b"),   // uni: 4 tot, 2 distinct; bi: 3 tot ("a b","b a","a b") 2 distinct; tri: 2 tot, 2 distinct
      ("s1", "c c"),       // adds: uni 2 tot 1 distinct(c); bi 1 tot ("c c"); tri 0
      ("s2", "x"))         // uni only; bi/tri empty
      .toDF("source", "text")
    val out = CorpusStats.distinctNgramStats(df, "source", "text")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // s1: uni 6 tot {a,b,c}=3 distinct; bi 4 tot {"a b","b a","c c"}=3;
    //     tri 2 tot {"a b a","b a b"}=2
    assert(out("s1") === ((6L, 3L, 3L, 2L, 0.5, 0.75, 1.0)))
    // s2: 1 token, no bigrams/trigrams -> zero counts, zero ratios
    assert(out("s2") === ((1L, 1L, 0L, 0L, 1.0, 0.0, 0.0)))
  }

  test("scriptProfile: mixed scripts, fractions, dominant, empty doc") {
    val df = Seq(
      (1L, "hello world"),        // 10 latin, 1 space
      (2L, "привет мир"),         // 9 cyrillic, 1 space
      (3L, "abc 漢字 123"),       // 3 latin, 2 han, 3 digit, 2 space
      (4L, ""),                   // empty
      (5L, "!!! ???"))            // punctuation only -> other
      .toDF("doc_id", "text")
    val out = CorpusStats.scriptProfile(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = out(1L)
    assert(r1.getLong(1) === 11L)
    assert(r1.getDouble(2) === math.rint(10.0 / 11 * 1e4) / 1e4) // latin_frac
    assert(r1.getString(13) === "latin")

    val r2 = out(2L)
    assert(r2.getDouble(3) === math.rint(9.0 / 10 * 1e4) / 1e4)  // cyrillic_frac
    assert(r2.getString(13) === "cyrillic")

    val r3 = out(3L)
    assert(r3.getLong(1) === 10L)
    assert(r3.getDouble(2) === 0.3)   // latin
    assert(r3.getDouble(4) === 0.2)   // han
    assert(r3.getDouble(10) === 0.3)  // digit
    assert(r3.getDouble(11) === 0.2)  // space
    assert(r3.getString(13) === "latin")

    val r4 = out(4L)
    assert(r4.getLong(1) === 0L)
    assert(r4.getDouble(2) === 0.0)
    assert(r4.getString(13) === "none")

    val r5 = out(5L)
    assert(r5.getString(13) === "none")           // no script chars at all
    assert(r5.getDouble(12) === math.rint(6.0 / 7 * 1e4) / 1e4) // other_frac
  }

  test("scriptProfile dominant tie breaks by fixed priority order") {
    // 2 latin + 2 cyrillic chars: tie -> latin (listed first)
    val df = Seq((1L, "abпр")).toDF("doc_id", "text")
    val r = CorpusStats.scriptProfile(df, "doc_id", "text").collect().head
    assert(r.getString(13) === "latin")
  }

  test("vocabStats: hand-computed TTR / hapax / coverage / slope") {
    // slice s: tokens = a a a b b c -> freq a:3 b:2 c:1
    // ranks: a=1, b=2, c=3; n_tokens 6, n_types 3, hapax 1
    val df = Seq(("s", "a a a"), ("s", "b b c")).toDF("source", "text")
    val r = CorpusStats.vocabStats(df, "source", "text", topN = 2, slopeN = 3)
      .collect().head
    assert(r.getString(0) === "s")
    assert(r.getLong(1) === 6L)
    assert(r.getLong(2) === 3L)
    assert(r.getDouble(3) === 0.5)       // 3/6
    assert(math.abs(r.getDouble(4) - 0.333333) < 1e-6)
    assert(math.abs(r.getDouble(5) - 5.0 / 6) < 1e-6) // top-2 coverage
    // OLS of ln f on ln r over (1,3),(2,2),(3,1):
    val xs = Seq(1.0, 2.0, 3.0).map(math.log)
    val ys = Seq(3.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (n * xs.zip(ys).map { case (x, y) => x * y }.sum - xs.sum * ys.sum) /
      (n * xs.map(x => x * x).sum - xs.sum * xs.sum)
    assert(math.abs(r.getDouble(6) - math.rint(slope * 1000) / 1000) < 1e-9)
  }

  test("vocabStats: single-type slice reports slope 0") {
    val df = Seq(("s", "only only only")).toDF("source", "text")
    val r = CorpusStats.vocabStats(df, "source", "text").collect().head
    assert(r.getLong(2) === 1L)
    assert(r.getDouble(6) === 0.0)
  }

  test("oovRate: vocab cut by frequency then token, empty doc covered") {
    // global freq: a:4 b:3 c:2 d:1; vocabSize=2 -> vocab {a,b}
    val df = Seq(
      (1L, "a a b c"),     // 4 tokens, oov: c -> 1
      (2L, "a a b b c d"), // 6 tokens, oov: c,d -> 2
      (3L, ""))            // no tokens
      .toDF("doc_id", "text")
    val out = CorpusStats.oovRate(df, "doc_id", "text", vocabSize = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) === ((4L, 1L, 0.25)))
    assert(out(2L) === ((6L, 2L, math.rint(2.0 / 6 * 1e6) / 1e6)))
    assert(out(3L) === ((0L, 0L, 0.0)))
  }

  test("oovRate ties at the vocab boundary break by token string") {
    // freq: b:2 a:2 c:1; vocabSize=1 -> rank by (freq desc, token asc): a
    val df = Seq((1L, "b a b a c")).toDF("doc_id", "text")
    val r = CorpusStats.oovRate(df, "doc_id", "text", vocabSize = 1)
      .collect().head
    assert(r.getLong(1) === 5L)
    assert(r.getLong(2) === 3L)   // b,b,c OOV; a,a in vocab
  }
}
