package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class PhraseSearchSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def search(docs: Seq[(Long, String)],
                     phrases: Seq[(Int, String)]): Map[(Int, Long), (Long, Int)] = {
    import spark.implicits._
    TextRanking.phraseSearch(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        phrases.toDF("q_id", "phrase"), "q_id", "phrase")
      .collect()
      .map(r => ((r.getAs[Int]("q_id"), r.getAs[Long]("doc_id")),
        (r.getAs[Long]("n_matches"), r.getAs[Int]("first_pos"))))
      .toMap
  }

  test("anchors, counts, and first positions — including overlaps") {
    val docs = Seq(
      1L -> "a b a b a",   // "a b a" matches at anchors 0 and 2 (overlap)
      2L -> "x a b c y",
      3L -> "b a")
    val out = search(docs, Seq(1 -> "a b a", 2 -> "a b c", 3 -> "b a"))
    assert(out((1, 1L)) === ((2L, 0)))          // overlapping anchors counted
    assert(out((2, 2L)) === ((1L, 1)))
    assert(out((3, 1L)) === ((2L, 1)))          // "b a" at pos 1 and pos 3
    assert(out((3, 3L)) === ((1L, 0)))
    assert(!out.contains((2, 1L)) && !out.contains((2, 3L)))
  }

  test("repeated tokens inside a phrase require genuinely consecutive copies") {
    val docs = Seq(
      1L -> "the cat the the dog",  // "the the" only at anchor 2
      2L -> "the the the")          // anchors 0 and 1
    val out = search(docs, Seq(1 -> "the the"))
    assert(out((1, 1L)) === ((1L, 2)))
    assert(out((1, 2L)) === ((2L, 0)))
  }

  test("matching is on the normalized token stream (case, whitespace runs)") {
    val docs = Seq(1L -> "  Foo   BAR\tbaz ")
    val out = search(docs, Seq(1 -> "foo bar", 2 -> "BAR BAZ"))
    assert(out((1, 1L)) === ((1L, 0)))
    assert(out((2, 1L)) === ((1L, 1)))
  }

  test("no partial matches: phrase longer than the document, or truncated at the end") {
    val docs = Seq(1L -> "a b", 2L -> "c a b")
    // "a b c" never completes: doc 1 is too short, doc 2 ends after "a b"
    val out = search(docs, Seq(1 -> "a b c"))
    assert(out.isEmpty)
  }

  test("absent phrases produce no rows rather than zero rows") {
    val out = search(Seq(1L -> "a b c"), Seq(1 -> "zz yy"))
    assert(out.isEmpty)
  }

  test("an empty/whitespace phrase matches nothing (not everything)") {
    val out = search(Seq(1L -> "a b c"), Seq(1 -> "", 2 -> "   ", 3 -> "b"))
    assert(out.keySet === Set((3, 1L)))
  }
}
