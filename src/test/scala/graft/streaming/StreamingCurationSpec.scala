package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.LangIdNb

class StreamingCurationSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private lazy val model =
    { import spark.implicits._
      LangIdNb.train(LangIdNb.fixture.toDF("lang", "s"), "lang", "s") }

  private def docsDF(rows: Seq[(Long, String)]) =
    { import spark.implicits._; rows.toDF("doc_id", "text") }

  private def curatedIds(base: String): Set[Long] =
    StreamingCuration.curated(spark, base, "doc_id")
      .select("doc_id").collect().map(_.getLong(0)).toSet

  // Three near-identical English texts (word-trigram Jaccard >= 0.8
  // pairwise for A~B and B~C by construction) and one far text.
  private val tA = "the quick brown fox jumps over the lazy dog near the " +
    "old stone bridge by the river every single morning without fail"
  private val tB = tA + " honestly"                  // ~A (high overlap)
  private val tC = tA + " honestly truly"            // ~B (and ~A here)
  private val tFar = "science and technology shape the way people live " +
    "and work across many different countries and historic eras today"

  test("first-seen-wins across batches; a dropped doc still suppresses later dups") {
    val base = java.nio.file.Files.createTempDirectory("scur").toString
    StreamingCuration.processBatch(docsDF(Seq(1L -> tA, 2L -> tFar)), 0L,
      "doc_id", "text", model, "en", base)
    StreamingCuration.processBatch(docsDF(Seq(3L -> tB)), 1L,
      "doc_id", "text", model, "en", base)
    // batch 2: doc 4 duplicates B (dropped at batch 1) — it must STILL
    // drop: seen content suppresses future dups regardless of its fate
    StreamingCuration.processBatch(docsDF(Seq(4L -> tC)), 2L,
      "doc_id", "text", model, "en", base)
    assert(curatedIds(base) === Set(1L, 2L))
  }

  test("within-batch ties keep the smaller id; non-admitted languages never index") {
    val base = java.nio.file.Files.createTempDirectory("scur2").toString
    val de = "der schnelle braune fuchs springt ueber den faulen hund " +
      "an der alten bruecke jeden morgen ohne ausnahme wirklich"
    StreamingCuration.processBatch(
      docsDF(Seq(10L -> tA, 11L -> tB, 12L -> de)), 0L,
      "doc_id", "text", model, "en", base)
    // 11 drops (same-batch dup of 10); 12 fails admission
    assert(curatedIds(base) === Set(10L))
    // a later German near-dup of doc 12 is ALSO not admitted — and doc
    // 12 never made it into the index, so nothing about it matters
    StreamingCuration.processBatch(docsDF(Seq(13L -> (de + " heute"))), 1L,
      "doc_id", "text", model, "en", base)
    assert(curatedIds(base) === Set(10L))
  }

  test("replayed micro-batch is idempotent: pair log, index, and curated lake identical") {
    val base = java.nio.file.Files.createTempDirectory("scur3").toString
    val tOther = "reading books in the quiet evening helps curious minds " +
      "travel through distant ages and imaginary worlds beyond the stars"
    StreamingCuration.processBatch(docsDF(Seq(1L -> tA, 2L -> tFar)), 0L,
      "doc_id", "text", model, "en", base)
    StreamingCuration.processBatch(docsDF(Seq(3L -> tB, 4L -> tOther)), 1L,
      "doc_id", "text", model, "en", base)
    def state() = (
      curatedIds(base),
      spark.read.parquet(s"$base/pairs").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet,
      StreamingCuration.curated(spark, base, "doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
    val before = state()
    // crash-replay: foreachBatch re-delivers batch 1
    StreamingCuration.processBatch(docsDF(Seq(3L -> tB, 4L -> tOther)), 1L,
      "doc_id", "text", model, "en", base)
    assert(state() === before)
    assert(before._1 === Set(1L, 2L, 4L))
  }

  test("lineage: batch column is the arrival batch, n_tok the whitespace token count") {
    val base = java.nio.file.Files.createTempDirectory("scur4").toString
    StreamingCuration.processBatch(docsDF(Seq(1L -> tA)), 0L,
      "doc_id", "text", model, "en", base)
    StreamingCuration.processBatch(docsDF(Seq(5L -> tFar)), 3L,
      "doc_id", "text", model, "en", base)
    val rows = StreamingCuration.curated(spark, base, "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows === Set(
      (1L, 0L, tA.split("\\s+").length.toLong),
      (5L, 3L, tFar.split("\\s+").length.toLong)))
  }
}
