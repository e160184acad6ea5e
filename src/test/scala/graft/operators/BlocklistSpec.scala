package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class BlocklistSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def run(rows: Seq[(Long, String)], terms: Seq[String]) =
    Blocklist.annotate(rows.toDF("doc_id", "text"), "doc_id", "text", terms)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap

  test("token terms count occurrences and distinct terms; clean docs get zeros") {
    val out = run(Seq(
      1L -> "bad bad other words good",
      2L -> "totally clean document here",
      3L -> "bad ugly bad ugly bad"),
      Seq("bad", "ugly", "absent"))
    assert(out(1L) === ((2L, 1L, 0L, true)))
    assert(out(2L) === ((0L, 0L, 0L, false)))
    assert(out(3L) === ((5L, 2L, 0L, true)))
  }

  test("matching is case-insensitive on both sides and substring-safe") {
    val out = run(Seq(
      1L -> "BAD things and BADGER",    // badger is NOT a 'bad' token hit
      2L -> "embedded badword stays unmatched"),
      Seq("Bad"))
    assert(out(1L) === ((1L, 1L, 0L, true)))
    assert(out(2L) === ((0L, 0L, 0L, false)))
  }

  test("multi-word entries route to the phrase path, overlapping matches counted") {
    val out = run(Seq(
      1L -> "the the the",              // "the the" matches at 0 and 1
      2L -> "no phrase here the end"),
      Seq("the the"))
    assert(out(1L) === ((0L, 0L, 2L, true)))
    assert(out(2L) === ((0L, 0L, 0L, false)))
  }

  test("mixed term and phrase lists combine into one blocked flag") {
    val out = run(Seq(
      1L -> "spam call now",
      2L -> "call now or never",
      3L -> "neither one"),
      Seq("spam", "call now"))
    assert(out(1L) === ((1L, 1L, 1L, true)))
    assert(out(2L) === ((0L, 0L, 1L, true)))
    assert(out(3L) === ((0L, 0L, 0L, false)))
  }

  test("empty blocklist is rejected") {
    intercept[IllegalArgumentException] {
      Blocklist.annotate(Seq((1L, "x")).toDF("doc_id", "text"), "doc_id", "text", Nil)
    }
  }
}
