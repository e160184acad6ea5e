package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

import graft.operators.Dedup

/** A local FS whose rename RETURNS FALSE for compaction step-2 moves
  * (dst name "compact-*") while the flag is set — the exact Hadoop
  * failure mode compactPartitioned must survive. Everything else
  * (parquet writes, committer renames of part-* files) delegates. */
class FailingRenameFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("failrename:///")
  override def rename(src: org.apache.hadoop.fs.Path,
                      dst: org.apache.hadoop.fs.Path): Boolean =
    if (FailingRenameFileSystem.fail.get() && dst.getName.startsWith("compact-"))
      false
    else super.rename(src, dst)
}
object FailingRenameFileSystem {
  val fail = new java.util.concurrent.atomic.AtomicBoolean(false)
}

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
    .config("spark.hadoop.fs.failrename.impl",
      classOf[FailingRenameFileSystem].getName)
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

  test("mid-run index compaction changes nothing: pair outputs identical") {
    import spark.implicits._
    val all = docs.toDF("doc_id", "text")
    def ingest(indexDir: String,
               compactAfter: Option[Long]): Set[(Long, Long, Double)] = {
      var got = Set.empty[(Long, Long, Double)]
      (0L until 4L).foreach { i =>
        val b = all.filter(pmod(col("doc_id"), lit(4)) === i)
        got ++= pairsOf(StreamingNearDedup.processBatch(
          b, i, "doc_id", "text", 3, 0.8, indexDir)
          .select("id_a", "id_b", "jaccard"))
        if (compactAfter.contains(i))
          StreamingNearDedup.compactIndex(spark, indexDir, i)
      }
      got
    }
    val plain = ingest(tmpDir("snd-nocompact"), None)
    val compactedDir = tmpDir("snd-compact")
    val compacted = ingest(compactedDir, Some(1L))
    assert(compacted === plain)
    assert(plain.map(p => (p._1, p._2)).contains((1L, 11L))) // anti-vacuity
    // the compaction actually collapsed partitions 0..1 into batch=1
    val bandParts = new java.io.File(s"$compactedDir/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet
    assert(bandParts === Set("batch=1", "batch=2", "batch=3"))
  }

  test("start(compactEvery=2): >=3 auto-compactions, pair log identical to cadence-off, partitions bounded") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def run(compactEvery: Int, tag: String): (Set[(Long, Long, Double)], String, String) = {
      val indexDir = tmpDir(s"snd-ce-idx-$tag")
      val pairsDir = tmpDir(s"snd-ce-pairs-$tag")
      val stream = MemoryStream[(Long, String)]
      val q = StreamingNearDedup.start(
        stream.toDF().toDF("doc_id", "text"), "doc_id", "text",
        n = 3, threshold = 0.8, indexDir = indexDir, pairsDir = pairsDir,
        checkpointDir = tmpDir(s"snd-ce-ckpt-$tag"), compactEvery = compactEvery)
      // one doc per micro-batch -> 8 batches; cadence 2 fires the
      // compactor at ids 2, 4, 6 (three auto-compactions mid-run)
      docs.foreach { d => stream.addData(d); q.processAllAvailable() }
      q.stop()
      val got = pairsOf(spark.read.option("basePath", pairsDir)
        .parquet(pairsDir).select("id_a", "id_b", "jaccard"))
      (got, indexDir, pairsDir)
    }
    val (plain, _, _) = run(compactEvery = 0, "off")
    val (compacted, indexDir, pairsDir) = run(compactEvery = 2, "on")
    assert(compacted === plain)
    assert(plain.map(p => (p._1, p._2)).contains((1L, 11L))) // anti-vacuity
    def batchParts(dir: String): Set[String] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .map(_.getName).toSet
    // last compaction ran at id=6 merging <=5; batches 6 and 7 arrived after
    val bounded = Set("batch=5", "batch=6", "batch=7")
    assert(batchParts(s"$indexDir/bands") === bounded)
    assert(batchParts(s"$indexDir/shingles") === bounded)
    assert(batchParts(pairsDir) === bounded)
  }

  test("compactPartitioned aborts the delete phase when a rename fails (rows never lost)") {
    import spark.implicits._
    // Hadoop's FileSystem.rename signals most failures by RETURNING FALSE,
    // not throwing — inject exactly that through a local-FS subclass that
    // fails step-2 moves (dst "compact-*") while a flag is set. (POSIX
    // permission tricks don't work here: the suite runs as root.)
    val rawDir = tmpDir("snd-renamefail")
    val indexDir = s"failrename:$rawDir"
    val all = docs.toDF("doc_id", "text")
    (0L until 2L).foreach { i =>
      StreamingNearDedup.processBatch(
        all.filter(pmod(col("doc_id"), lit(2)) === i),
        i, "doc_id", "text", 3, 0.8, indexDir).count()
    }
    val before = spark.read.option("basePath", s"$indexDir/bands")
      .parquet(s"$indexDir/bands").drop("batch").distinct().count()
    FailingRenameFileSystem.fail.set(true)
    try {
      val ex = intercept[java.io.IOException] {
        StreamingNearDedup.compactIndex(spark, indexDir, 1L)
      }
      assert(ex.getMessage.contains("rename"))
      // the absorbed source partition must still exist — nothing deleted
      assert(new java.io.File(s"$rawDir/bands/batch=0").exists())
    } finally FailingRenameFileSystem.fail.set(false)
    val after = spark.read.option("basePath", s"$indexDir/bands")
      .parquet(s"$indexDir/bands").drop("batch").distinct().count()
    assert(after === before)
    // and a rerun with renames healthy completes normally
    StreamingNearDedup.compactIndex(spark, indexDir, 1L)
    val merged = spark.read.option("basePath", s"$indexDir/bands")
      .parquet(s"$indexDir/bands").drop("batch").distinct().count()
    assert(merged === before)
    assert(!new java.io.File(s"$rawDir/bands/batch=0").exists())
  }

  test("compaction is duplicate-tolerant: a crash-window copy of an index file changes nothing") {
    import spark.implicits._
    val indexDir = tmpDir("snd-dup")
    val all = docs.toDF("doc_id", "text")
    (0L until 2L).foreach { i =>
      StreamingNearDedup.processBatch(
        all.filter(pmod(col("doc_id"), lit(2)) === i),
        i, "doc_id", "text", 3, 0.8, indexDir).count()
    }
    // a FRESH doc (ids are disjoint across batches by contract) that
    // near-dups the 1/11/21 cluster already in the index
    val probe = Seq(31L -> (base + " anew")).toDF("doc_id", "text")
    val clean = pairsOf(StreamingNearDedup.processBatch(
      probe, 2L, "doc_id", "text", 3, 0.8,
      indexDir).select("id_a", "id_b", "jaccard"))
    assert(clean.map(p => (p._1, p._2)).contains((1L, 31L))) // anti-vacuity
    // simulate the interrupted-compaction window: rows present in BOTH an
    // absorbed partition and the merged one — here, a verbatim file copy
    // of batch=0's rows into batch=1 (ids stay visible twice under the
    // batch<=id filter)
    Seq("bands", "shingles").foreach { half =>
      val src = new java.io.File(s"$indexDir/$half/batch=0").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.copy(src.toPath,
        new java.io.File(s"$indexDir/$half/batch=1", s"dup-${src.getName}").toPath)
    }
    val withDups = pairsOf(StreamingNearDedup.processBatch(
      probe, 2L, "doc_id", "text", 3, 0.8,
      indexDir).select("id_a", "id_b", "jaccard"))
    assert(withDups === clean)
    // and the next compaction's distinct() absorbs the duplicates for good
    StreamingNearDedup.compactIndex(spark, indexDir, 2L)
    val afterCompact = pairsOf(StreamingNearDedup.processBatch(
      probe.select((col("doc_id") + 10L).as("doc_id"), col("text")),
      3L, "doc_id", "text", 3, 0.8,
      indexDir).select("id_a", "id_b", "jaccard"))
    // 41 carries 31's text, so it sees exactly 31's standing pairs plus 31
    // itself (jaccard 1.0) — exact-set equality, post-compaction
    val expected = clean.map { case (a, _, j) => (a, 41L, j) } + ((31L, 41L, 1.0))
    assert(afterCompact === expected)
  }
}
