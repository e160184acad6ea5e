package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement harness for the streaming near-dedup ingestion loop
  * ([[graft.streaming.StreamingNearDedup]]): ingest a corpus as
  * fixed-size micro-batches and report per-batch wall time as the
  * standing index grows. The design claim under test — per-batch cost is
  * proportional to the BATCH (its tokenize/minhash pass and its band
  * collisions), not to the standing corpus, because the corpus exists
  * only as a (band, sig)-keyed parquet index — turns into a printed
  * ladder: if per-batch time is flat while the index grows 10×, online
  * crawl dedup sustains at any corpus size.
  *
  * Usage: runMain graft.tools.StreamDedupScale <documentsParquet>
  *          <batchRows> [maxBatches] [compactEvery]
  * With compactEvery = E > 0, the standing index is compacted (all
  * partitions collapsed into one) after every E-th batch — the
  * small-file-bound configuration a long-lived crawl loop runs with; the
  * ladder then also certifies that per-batch cost stays flat WITH
  * compaction on and that compaction itself is cheap.
  * Prints one JSON line per batch:
  *   {"batch":K,"index_docs":N,"secs":S,"pairs":P[,"compact_secs":C]}
  */
object StreamDedupScale {
  def main(args: Array[String]): Unit = {
    val docsPath = args(0)
    val batchRows = args(1).toInt
    val maxBatches = if (args.length > 2) args(2).toInt else Int.MaxValue
    val compactEvery = if (args.length > 3) args(3).toInt else 0
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .appName("stream-dedup-scale").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(docsPath).select(col("doc_id"), col("text"))
    val n = docs.count()
    val nBatches = math.min(((n + batchRows - 1) / batchRows).toInt, maxBatches)
    val base = java.nio.file.Files.createTempDirectory("graft-stream-scale").toString

    (0L until nBatches.toLong).foreach { i =>
      // deterministic round-robin batching by id, like the gate
      val b = docs.filter(pmod(col("doc_id"), lit(nBatches.toLong)) === i)
      // the exact cadence StreamingNearDedup.start(compactEvery) runs:
      // every E-th batch first collapses index AND pair partitions with
      // batch <= i-1 (committed by delivery time) into one each
      val compactField =
        if (compactEvery > 0 && i > 0 && i % compactEvery == 0) {
          val c0 = System.nanoTime()
          graft.streaming.StreamingNearDedup.compactIndex(spark,
            s"$base/index", i - 1)
          graft.streaming.StreamingNearDedup.compactPairs(spark,
            s"$base/pairs", i - 1)
          f""","compact_secs":${(System.nanoTime() - c0) / 1e9}%.2f"""
        } else ""
      val t0 = System.nanoTime()
      val pairs = graft.streaming.StreamingNearDedup.processBatch(
        b, i, "doc_id", "text", n = 3, threshold = 0.8,
        indexDir = s"$base/index")
      pairs.write.mode("overwrite").parquet(s"$base/pairs/batch=$i")
      val secs = (System.nanoTime() - t0) / 1e9
      val nPairs = spark.read.parquet(s"$base/pairs/batch=$i").count()
      println(f"""{"batch":$i,"index_docs":${i * (n / nBatches)},"secs":$secs%.2f,"pairs":$nPairs$compactField}""")
    }
    spark.stop()
  }
}
