package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/** Stream == batch for NEAR-dup dedup: micro-batches deduped against the
  * standing MinHash band index must produce exactly the pair set a single
  * full-corpus minHashLshPairs run produces — signatures are pure
  * functions of text, so the equality is exact, not probabilistic. */
class StreamingNearDedupSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def tmpDir(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.toString
  }

  // near-dup clusters spanning micro-batch boundaries: docs 1/11/21 are
  // light perturbations of one base text (cross-batch pairs), 2/12 exact
  // near-dups in different batches, the rest unrelated
  private val base =
    "the quick brown fox jumps over the lazy dog near the river bank today " +
      "while the miller grinds wheat into flour for the village bakery stand " +
      "and the ferryman poles his barge across the slow green water carrying " +
      "sacks of grain baskets of apples and one sleeping cat toward the far " +
      "landing where carts wait under the old stone bridge beside the mill"
  private def docs: Seq[(Long, String)] = Seq(
    1L -> base,
    11L -> (base + " again"),
    21L -> base.replace("today", "tonight"),
    2L -> "completely different content about spark catalyst optimizer rules and whole stage codegen performance tuning at scale",
    12L -> "completely different content about spark catalyst optimizer rules and whole stage codegen performance tuning at large scale",
    3L -> "unrelated short text one two three four five six seven eight nine ten eleven twelve",
    13L -> "another unrelated document mentioning minhash lsh bands and jaccard similarity over shingles of words",
    23L -> "third unrelated text with totally distinct vocabulary covering graph algorithms pagerank triangles and funnels"
  )

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("foreachBatch query over 3 micro-batches equals one-shot batch run") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val indexDir = tmpDir("snd-index")
    val pairsDir = tmpDir("snd-pairs")
    val ckpt = tmpDir("snd-ckpt")
    val stream = MemoryStream[(Long, String)]
    val q = StreamingNearDedup.start(
      stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
      n = 3, threshold = 0.8, indexDir = indexDir, pairsDir = pairsDir,
      checkpointDir = ckpt)
    // 3 micro-batches; the near-dup cluster members arrive in DIFFERENT
    // batches so every pair crosses a batch boundary or lands within one
    docs.grouped(3).foreach { g => stream.addData(g); q.processAllAvailable() }
    q.stop()
    val streamed = pairsOf(spark.read.option("basePath", pairsDir)
      .parquet(pairsDir).select("id_a", "id_b", "jaccard"))
    val batch = pairsOf(Dedup.minHashLshPairs(
      docs.toDF("doc_id", "text"), "doc_id", "text", n = 3, threshold = 0.8))
    assert(streamed === batch)
    // the planted clusters must actually be found (anti-vacuity)
    val ids = streamed.map(p => (p._1, p._2))
    assert(ids.contains((1L, 11L)) && ids.contains((1L, 21L))
      && ids.contains((11L, 21L)) && ids.contains((2L, 12L)))
  }

  test("replayed micro-batch is idempotent (partition overwrite + batch<id filter)") {
    import spark.implicits._
    val indexDir = tmpDir("snd-replay")
    val all = docs.toDF("doc_id", "text")
    val b0 = all.filter(col("doc_id") < 10)
    val b1 = all.filter(col("doc_id") >= 10 && col("doc_id") < 20)
    StreamingNearDedup.processBatch(b0, 0L, "doc_id", "text", 3, 0.8, indexDir)
      .count()
    val first = pairsOf(StreamingNearDedup.processBatch(
      b1, 1L, "doc_id", "text", 3, 0.8, indexDir)
      .select("id_a", "id_b", "jaccard"))
    // crash-replay of batch 1: same output, no self-pairing against the
    // index rows its previous attempt already wrote
    val replayed = pairsOf(StreamingNearDedup.processBatch(
      b1, 1L, "doc_id", "text", 3, 0.8, indexDir)
      .select("id_a", "id_b", "jaccard"))
    assert(first === replayed)
    assert(first.map(p => (p._1, p._2)).contains((1L, 11L)))
  }
}
