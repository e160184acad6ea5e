package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class DecontaminationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("id", "text")

  // benchmark doc 100: "the quick brown fox jumps over the lazy dog"
  private val bench = df(100L -> "the quick brown fox jumps over the lazy dog")

  test("contaminationReport flags docs by single-bench distinct-trigram overlap") {
    val corpus = df(
      // verbatim copy: shares all 7 distinct trigrams
      1L -> "the quick brown fox jumps over the lazy dog",
      // partial: "the quick brown" + "quick brown fox" = 2 shared trigrams
      2L -> "we saw the quick brown fox yesterday afternoon",
      // one shared trigram only -> below minOverlap=2
      3L -> "the quick brown bear slept",
      // nothing shared
      4L -> "completely unrelated text with no collisions at all")
    val out = Decontamination.contaminationReport(corpus, bench,
        "id", "text", "id", "text", n = 3, minOverlap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(out === Set((1L, 1L, 7L, 100L), (2L, 1L, 2L, 100L)))
  }

  test("worst_bench_id picks the largest overlap, ties toward smallest bench id") {
    val b2 = df(
      10L -> "alpha beta gamma delta epsilon",     // 3 distinct trigrams
      20L -> "alpha beta gamma delta epsilon",     // identical bench doc (tie)
      30L -> "alpha beta gamma delta zeta")        // overlap 2 with doc 1
    val corpus = df(1L -> "alpha beta gamma delta epsilon extra")
    val out = Decontamination.contaminationReport(corpus, b2,
        "id", "text", "id", "text", n = 3, minOverlap = 2).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 3L)   // n_bench_hits: all three bench docs hit
    assert(r.getLong(2) === 3L)   // max_overlap
    assert(r.getLong(3) === 10L)  // tie between 10 and 20 -> smaller id
  }

  test("decontaminate removes exactly the flagged docs") {
    val corpus = df(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "we saw the quick brown fox yesterday afternoon",
      3L -> "the quick brown bear slept",
      4L -> "completely unrelated text with no collisions at all")
    val kept = Decontamination.decontaminate(corpus, bench,
        "id", "text", "id", "text", n = 3, minOverlap = 2)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(3L, 4L))
  }

  test("overlapMatrix: shared distinct n-grams and Jaccard vs hand computation") {
    val corpus = Seq(
      (1L, "a", "the quick brown fox jumps high"),
      (2L, "a", "the quick brown fox jumps high"),   // dup doc: distinct-ness per source
      (3L, "b", "the quick brown fox sleeps"),
      (4L, "c", "nothing in common here at all")).toDF("id", "source", "text")
    val out = Decontamination.overlapMatrix(corpus, "source", "text", n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    // source a: 3-grams {t q b, q b f, b f j, f j h} (4 distinct; dup doc adds none)
    // source b: {t q b, q b f, b f s} (3); shared with a = {t q b, q b f} = 2
    assert(out.keySet === Set(("a", "b")))  // c shares nothing -> omitted
    val (sh, ta, tb, j) = out(("a", "b"))
    assert((sh, ta, tb) === ((2L, 4L, 3L)))
    assert(math.abs(j - 2.0 / (4 + 3 - 2)) < 1e-9)
  }

  test("benchmark side is broadcast — corpus never shuffles for the join") {
    val corpus = df((1L to 50L).map(i => i -> s"doc $i words here and there plus filler $i"): _*)
    val plan = Decontamination.contaminationReport(corpus, bench,
      "id", "text", "id", "text", n = 3, minOverlap = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join of the benchmark side:\n$plan")
  }
}
