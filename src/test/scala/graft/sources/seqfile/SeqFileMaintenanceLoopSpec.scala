package graft.sources.seqfile

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The full streaming-lake maintenance loop as ONE scenario — the shape a
  * production seqfile lake actually runs day over day:
  *
  *   1. upstream lands many small raw files;
  *   2. an admission-controlled streaming job (maxFilesPerTrigger) ingests
  *      them in bounded micro-batches into a manifest-governed lake, with
  *      per-block key Blooms on every file it writes;
  *   3. the nightly maintenance pass compacts the small files WITHOUT
  *      repeating the bloom option — the sidecar sniff must re-detect and
  *      preserve point-lookup pruning;
  *   4. readers observe exactly-once data at every step and key probes
  *      still prune after the rewrite.
  *
  * Each piece has its own spec (SeqFileStreamingSpec, SeqBloomSpec,
  * SeqFileCompactionSpec); this one proves they compose. README documents
  * the same loop as the operations runbook. */
class SeqFileMaintenanceLoopSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  import graft.core.seqfile._

  private def writeFile(dir: java.nio.file.Path, name: String, from: Int, n: Int): Unit = {
    val w = new SeqFileWriter(java.nio.file.Files.newOutputStream(dir.resolve(name)),
      WritableType.LongW, WritableType.TextW, syncSeed = from.toLong)
    (from until from + n).foreach(i => w.append(i.toLong, s"v$i"))
    w.close()
  }

  test("maintenance loop: admission-controlled ingest -> bloom sink -> bloom-preserving compaction") {
    val landing = java.nio.file.Files.createTempDirectory("seq-landing")
    val lake = java.nio.file.Files.createTempDirectory("seq-lake").toString
    val ckpt = java.nio.file.Files.createTempDirectory("seq-ckpt").toString
    // 6 small landed files, 200 rows each (unsorted key space across files
    // so classic min/max zone pruning alone would not help a point probe)
    val fileStarts = Seq(0, 1000, 200, 1200, 400, 1400)
    fileStarts.zipWithIndex.foreach { case (from, i) =>
      writeFile(landing, s"landed-$i.seq", from, 200)
    }
    val expectTotal = 6L * 200
    val expectSum = fileStarts.map(f => (f until f + 200).map(_.toLong).sum).sum

    // 2. admission-controlled ingest: at most 2 files per micro-batch,
    //    blooms on everything the sink writes
    val schema = spark.read.format("seqfile").load(landing.toString).schema
    val q = spark.readStream.format("seqfile").schema(schema)
      .option("maxFilesPerTrigger", "2")
      .load(landing.toString)
      .writeStream.format("seqfile")
      .option("checkpointLocation", ckpt)
      .option("path", lake)
      .option("bloomKeys", "true")
      .option("blockSize", (16 << 10).toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3, s"admission control (2 of 6 files/trigger) must " +
      s"pace ingest into >=3 micro-batches, saw $dataBatches")

    // exactly-once lake content
    val afterIngest = spark.read.format("seqfile").load(lake)
      .agg(count(lit(1)), sum(col("key"))).head()
    assert(afterIngest.getLong(0) === expectTotal)
    assert(afterIngest.getLong(1) === expectSum)

    // sink files carry key-bloom sidecars
    val lakeDir = new java.io.File(lake)
    def seqFiles() = lakeDir.listFiles().filter(f =>
      f.isFile && f.getName.endsWith(".seq") && !f.getName.startsWith("."))
    def sidecarHasBloom(f: java.io.File): Boolean = {
      val side = new java.io.File(lakeDir,
        new org.apache.hadoop.fs.Path(ZoneMap.sidecarPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath)).toString).getName)
      side.exists() && {
        val content = new String(
          java.nio.file.Files.readAllBytes(side.toPath), "UTF-8")
        ZoneMap.parse(content)._4.exists(_.kbloom.isDefined)
      }
    }
    val ingested = seqFiles()
    assert(ingested.length >= 3, s"expected one file per micro-batch, got ${ingested.length}")
    assert(ingested.forall(sidecarHasBloom), "every sink file must carry key blooms")

    // 3. nightly compaction — NOTE: no bloomKeys in writeOptions; the
    //    sidecar sniff must re-enable it
    val nOut = graft.api.SequenceFiles.compact(spark, lake,
      targetFileBytes = 512L * 1024 * 1024, sortByKey = false)
    assert(nOut < ingested.length, s"compaction should shrink ${ingested.length} -> $nOut")

    val compacted = seqFiles()
    assert(compacted.forall(_.getName.startsWith("compacted-")))
    assert(compacted.forall(sidecarHasBloom),
      "compaction must preserve blooms it detected on its inputs")

    // 4. exactly-once through the rewrite + key probes still correct
    val afterCompact = spark.read.format("seqfile").load(lake)
      .agg(count(lit(1)), sum(col("key"))).head()
    assert(afterCompact.getLong(0) === expectTotal)
    assert(afterCompact.getLong(1) === expectSum)
    val probed = spark.read.format("seqfile").load(lake)
      .filter(col("key").isin(7L, 1007L, 401L))
      .select(col("key"), col("value")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(probed === Map(7L -> "v7", 1007L -> "v1007", 401L -> "v401"))
  }
}
