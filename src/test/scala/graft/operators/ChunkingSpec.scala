package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class ChunkingSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import spark.implicits._

  test("overlapping windows: boundaries, short tail, reassembled text") {
    val df = Seq((1L, "t0 t1 t2 t3 t4 t5 t6")).toDF("doc_id", "text") // 7 tokens
    val out = Chunking.tokenChunks(df, "doc_id", "text", chunkSize = 4, stride = 3)
      .orderBy("chunk_idx").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (0, 0, 4, "t0 t1 t2 t3"),
      (1, 3, 4, "t3 t4 t5 t6"),   // overlap of 1 token with the previous
      (2, 6, 1, "t6")))           // short tail
  }

  test("non-overlapping when stride == chunkSize; empty docs produce no chunks") {
    val df = Seq((1L, "a b c d e"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = Chunking.tokenChunks(df, "doc_id", "text", chunkSize = 2, stride = 2)
    assert(out.filter(col("doc_id") =!= 1L).count() === 0)
    val c1 = out.orderBy("chunk_idx").collect().map(r => r.getString(4))
    assert(c1.toSeq === Seq("a b", "c d", "e"))
    // full coverage, no token duplicated at stride == chunkSize
    assert(out.agg(sum("n_chunk_tokens")).head().getLong(0) === 5L)
  }

  test("seeded fuzz vs Scala brute force (80 random docs, random params)") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 80L).map { i =>
      val n = rnd.nextInt(30)
      (i, Array.fill(n)("w" + rnd.nextInt(12)).mkString(" "))
    }
    val (cs, st) = (1 + rnd.nextInt(6), 1 + rnd.nextInt(5))
    val got = Chunking.tokenChunks(docs.toDF("doc_id", "text"), "doc_id", "text", cs, st)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> ((r.getInt(2), r.getInt(3), r.getString(4))))
      .toMap
    val expected = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
      (0 until toks.length by st).zipWithIndex.map { case (start, idx) =>
        val chunk = toks.slice(start, start + cs)
        (id, idx) -> ((start, chunk.length, chunk.mkString(" ")))
      }
    }.toMap
    assert(got === expected, s"chunkSize=$cs stride=$st")
  }

  test("chunk count is ceil(n / stride) on a real table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val expected = docs
      .select(ceil(size(graft.functions.TextAnalysis.tokens(col("text"))) / 30.0).as("nc"))
      .agg(sum(col("nc"))).head().getLong(0)
    val got = Chunking.tokenChunks(docs, "doc_id", "text", 40, 30).count()
    assert(got === expected)
  }
}
