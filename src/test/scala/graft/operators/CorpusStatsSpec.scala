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
}
