package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dedup

/** Streaming NEAR-duplicate dedup — the online crawl-ingestion loop: each
  * micro-batch of documents is checked for Jaccard-similar pairs against
  * the STANDING corpus (all previously ingested batches) and within
  * itself, then its own MinHash band index + shingle-hash sets are
  * appended to the standing index. The corpus text is never re-read:
  * batches 1..N-1 exist only as their 24-byte band rows and sorted
  * 64-bit shingle sets ([[Dedup.minHashBandIndex]] /
  * [[Dedup.shingleHashSets]]), exactly the incremental-index design the
  * batch operators document.
  *
  * Stream == batch, EXACTLY: a doc's minhash signature (and therefore its
  * band signatures — one shared construction, [[Dedup]]'s `bandSigs`) is a
  * pure function of its text, so a pair (x, y) collides in some band when
  * streamed iff it collides in a single full-corpus
  * [[Dedup.minHashLshPairs]] run, and both paths verify candidates with
  * the same exact sorted-set Jaccard. The union of per-batch pair outputs
  * over any partition of the corpus into micro-batches therefore equals
  * the batch-mode pair set — which is what lets a plain batch-mode SQL
  * oracle certify the streaming pipeline value-exact (gate
  * `q_dedup_stream`; StreamingNearDedupSpec asserts the same equality
  * through a real MemoryStream query).
  *
  * Exactly-once without a transaction log: every write is an OVERWRITE of
  * a batch-scoped partition directory (`.../batch=<id>`), and the standing
  * index is read with a `batch < id` partition filter — a replayed batch
  * (foreachBatch re-delivery after a crash) rewrites its own partition
  * and cannot see it as corpus, so re-runs are bit-identical.
  *
  * 100 TB design: per batch, the only work against the corpus is the
  * (band, sig) equi-join of the batch's `numBands` rows/doc against the
  * band index and an id equi-join pulling candidate shingle sets — both
  * proportional to the batch and its collision count, never to corpus
  * size; the index itself is append-only parquet partitioned by arrival
  * batch. */
object StreamingNearDedup {

  /** One micro-batch step, callable from foreachBatch or a batch loop:
    * (1) idempotently write this batch's band-index and shingle-set
    * partitions under `indexDir`, (2) emit all near-dup pairs (exact
    * Jaccard >= threshold) between this batch and strictly earlier
    * batches PLUS within this batch, normalized to id_a < id_b — the
    * orientation [[Dedup.minHashLshPairs]] uses, so unioned outputs
    * compare directly against the batch-mode oracle. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, n: Int, threshold: Double,
                   indexDir: String, rowsPerBand: Int = 3,
                   numBands: Int = 16): DataFrame = {
    val spark = batch.sparkSession
    val bandsDir = s"$indexDir/bands"
    val shinglesDir = s"$indexDir/shingles"
    Dedup.minHashBandIndex(batch, idCol, textCol, n, rowsPerBand, numBands)
      .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
    Dedup.shingleHashSets(batch, idCol, textCol, n)
      .write.mode("overwrite").parquet(s"$shinglesDir/batch=$batchId")
    // standing index = strictly earlier arrivals; the partition filter is
    // what makes crash-replay deterministic (see class doc)
    val corpusBands = spark.read.option("basePath", bandsDir)
      .parquet(bandsDir).filter(col("batch") < batchId).drop("batch")
    val corpusShingles = spark.read.option("basePath", shinglesDir)
      .parquet(shinglesDir).filter(col("batch") < batchId).drop("batch")
    val cross = Dedup.minHashLshPairsIncremental(batch, idCol, textCol,
        corpusBands, corpusShingles, n, threshold, rowsPerBand, numBands)
      .select(least(col("batch_id"), col("corpus_id")).as("id_a"),
        greatest(col("batch_id"), col("corpus_id")).as("id_b"),
        col("jaccard"))
    val within = Dedup.minHashLshPairs(batch, idCol, textCol, n, threshold,
      rowsPerBand, numBands)
    cross.unionByName(within)
  }

  /** The continuous form: drive [[processBatch]] from a Structured
    * Streaming query. Pair outputs land under `pairsDir/batch=<id>`
    * (read the root to get the growing pair log); the standing index
    * accumulates under `indexDir`. */
  def start(docs: DataFrame, idCol: String, textCol: String, n: Int,
            threshold: Double, indexDir: String, pairsDir: String,
            checkpointDir: String, rowsPerBand: Int = 3,
            numBands: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        processBatch(b.toDF(), id, idCol, textCol, n, threshold, indexDir,
            rowsPerBand, numBands)
          .write.mode("overwrite").parquet(s"$pairsDir/batch=$id")
        ()
      }
      .start()
}
