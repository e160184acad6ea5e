package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Streaming ingest into the standing ANN indexes: micro-batches land
  * via the idempotent per-batchId append, so Structured Streaming's
  * same-id replay of an uncommitted batch gives exactly-once. Pins (a)
  * real multi-batch landing (one hive partition per micro-batch), (b)
  * streamed-index serve == from-scratch, (c) a restart against a
  * completed checkpoint ingests nothing again. */
class StreamingIndexIngestSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  lazy val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
  lazy val queries = emb.filter(col("vec_id") < 10)
  lazy val standing = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
  lazy val odds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)

  private def batchDirs(path: String): Set[String] =
    Option(new java.io.File(path).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("batch="))
      .map(_.getName).toSet

  private def stageAndStream(root: String): org.apache.spark.sql.DataFrame = {
    odds.repartition(3).write.mode("ignore").parquet(s"$root/src")
    spark.readStream.schema(emb.schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/src")
  }

  test("LSH ingestStream: one partition per micro-batch, serve == from-scratch lshTopK") {
    val root = java.nio.file.Files.createTempDirectory("lsh-stream").toString
    SimilaritySearch.buildLshIndex(standing, "vec_id", "embedding",
      bitsPerBand = 12, numBands = 32).save(s"$root/index")
    LshIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt",
      bitsPerBand = 12, numBands = 32).awaitTermination()
    // 3 staged files under maxFilesPerTrigger=1 -> batches 0..2, landed
    // as batch=1..3 (batch=0 is the standing save)
    assert(batchDirs(s"$root/index/bands") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3"))
    assert(batchDirs(s"$root/index/vectors") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3"))
    val served = SimilaritySearch.searchLshIndex(
        LshIndex.load(spark, s"$root/index"), queries, "vec_id", "embedding",
        10, bitsPerBand = 12, numBands = 32, flipBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    val scratch = SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding",
        10, bitsPerBand = 12, numBands = 32, flipBits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(served === scratch)
    assert(served.nonEmpty)

    // restart against the completed checkpoint: the source is drained,
    // so NOTHING re-ingests — partitions and serve are unchanged
    val beforeBands = LshIndex.load(spark, s"$root/index").bands.count()
    LshIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt",
      bitsPerBand = 12, numBands = 32).awaitTermination()
    assert(batchDirs(s"$root/index/bands") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3"))
    assert(LshIndex.load(spark, s"$root/index").bands.count() === beforeBands)
  }

  test("PQ ingestStream: streamed index == from-scratch encode under the frozen codebooks") {
    val root = java.nio.file.Files.createTempDirectory("pq-stream").toString
    SimilaritySearch.buildPqIndex(standing, "vec_id", "embedding").save(s"$root/index")
    PqIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt").awaitTermination()
    assert(batchDirs(s"$root/index/codes") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3"))
    val streamed = PqIndex.load(spark, s"$root/index")
    assert(streamed.codes.count() === emb.count())
    val scratch = PqIndex(streamed.codebooks,
      SimilaritySearch.encodePq(streamed.codebooks, emb, "vec_id", "embedding"))
    def serve(ix: PqIndex) =
      SimilaritySearch.searchPqIndex(ix, emb, queries, "vec_id", "embedding", 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getDouble(3))).toSet
    assert(serve(streamed) === serve(scratch))
  }

  test("ingestStream guard: a FRESH checkpoint colliding with landed batches fails fast") {
    val root = java.nio.file.Files.createTempDirectory("pq-guard").toString
    SimilaritySearch.buildPqIndex(standing, "vec_id", "embedding").save(s"$root/index")
    // first stream completes: batches land as batch=1..3
    PqIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt").awaitTermination()
    val landed = batchDirs(s"$root/index/codes")
    assert(landed === Set("batch=0", "batch=1", "batch=2", "batch=3"))
    // a SECOND stream with a FRESH checkpoint and the default baseBatch=1
    // is the silent-data-loss shape (streaming batchIds restart at 0 ->
    // overwrite of batch=1..): the guard refuses before anything starts
    val ex = intercept[IllegalStateException] {
      PqIndex.ingestStream(s"$root/index", stageAndStream(root),
        "vec_id", "embedding", checkpoint = s"$root/ckpt2")
    }
    assert(ex.getMessage.contains("baseBatch"))
    assert(batchDirs(s"$root/index/codes") === landed)
    // same fresh checkpoint with a CLEARING baseBatch starts fine and
    // lands its batches above the standing ones
    PqIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt2", baseBatch = 4L)
      .awaitTermination()
    assert(batchDirs(s"$root/index/codes") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3",
        "batch=4", "batch=5", "batch=6"))
    // LSH family shares the guard (bands + vectors halves)
    SimilaritySearch.buildLshIndex(standing, "vec_id", "embedding",
      bitsPerBand = 12, numBands = 32).save(s"$root/lsh")
    LshIndex.append(s"$root/lsh", odds, "vec_id", "embedding",
      bitsPerBand = 12, numBands = 32, batchId = 2L)
    intercept[IllegalStateException] {
      LshIndex.ingestStream(s"$root/lsh", stageAndStream(root),
        "vec_id", "embedding", checkpoint = s"$root/lsh-ckpt",
        bitsPerBand = 12, numBands = 32, baseBatch = 2L)
    }
  }

  test("IVF-PQ ingestStream: streamed micro-batches run the fused assign+encode kernel") {
    val root = java.nio.file.Files.createTempDirectory("ivfpq-stream").toString
    SimilaritySearch.buildIvfPqIndex(standing, "vec_id", "embedding",
      numCentroids = 8).save(s"$root/index")
    IvfPqIndex.ingestStream(s"$root/index", stageAndStream(root),
      "vec_id", "embedding", checkpoint = s"$root/ckpt").awaitTermination()
    assert(batchDirs(s"$root/index/codes") ===
      Set("batch=0", "batch=1", "batch=2", "batch=3"))
    val streamed = IvfPqIndex.load(spark, s"$root/index")
    assert(streamed.codes.count() === emb.count())
    // streamed codes == a from-scratch encode of the full corpus under
    // the same frozen quantizer pair, row for row
    val scratch = SimilaritySearch.encodeIvfPq(streamed.centroids,
        streamed.codebooks, emb, "vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    val got = streamed.codes
      .select(col("id").cast("long"), col("list_id").cast("long"), col("code"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(got === scratch)
  }
}
