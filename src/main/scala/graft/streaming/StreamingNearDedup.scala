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
    // SINGLE tokenize+minhash pass over the batch text: the (id, mh, shh)
    // doc index is cached, feeds both partition writes, and every pair
    // join below reads the WRITTEN partitions — the text is never
    // shingled again (the previous shape re-tokenized the batch ~4x:
    // band write, shingle write, cross join, within join).
    val docIdx = Dedup.minHashDocIndex(batch, idCol, textCol, n,
      rowsPerBand, numBands).persist()
    try {
      Dedup.bandIndexFromDocIndex(docIdx, rowsPerBand, numBands)
        .write.mode("overwrite").parquet(s"$bandsDir/batch=$batchId")
      docIdx.select(col("id"), col("shh"))
        .write.mode("overwrite").parquet(s"$shinglesDir/batch=$batchId")
    } finally { docIdx.unpersist(); () }
    // batch side re-read from its own freshly written partition, so the
    // returned frame depends only on durable state (crash-replay safe to
    // re-execute) and costs no recompute; the combined table's `batch <=
    // batchId` partition filter (with strictly-earlier rows marked
    // `prior`) is what makes crash-replay deterministic (see class doc)
    val batchBands = spark.read.parquet(s"$bandsDir/batch=$batchId")
    val allBands = spark.read.option("basePath", bandsDir)
      .parquet(bandsDir).filter(col("batch") <= batchId)
      .select(col("id"), col("band"), col("sig"),
        (col("batch") < batchId).as("prior"))
    val allShingles = spark.read.option("basePath", shinglesDir)
      .parquet(shinglesDir).filter(col("batch") <= batchId).drop("batch")
    Dedup.minHashLshPairsBatchVsAll(batchBands, allBands, allShingles,
      threshold)
  }

  /** Compact the standing index: collapse every `batch=<id>` partition
    * with id <= upToBatch (in BOTH index halves) into a single
    * `batch=<upToBatch>` partition — the small-file bound for a
    * crawl-scale ingestion loop, where one directory per micro-batch
    * would eventually make partition LISTING the per-batch cost.
    *
    * Visibility contract preserved: a future batch J > upToBatch reads
    * `batch < J`, which includes the merged `batch=<upToBatch>` — the
    * same rows as before, in one partition. Callers must only compact
    * COMMITTED batches (pair outputs durable): a foreachBatch replay only
    * re-delivers the last uncommitted batch, which is > upToBatch.
    *
    * Crash-safe without a transaction log, by DUPLICATE-tolerance rather
    * than atomicity: pair derivation is a pure SET function of index
    * contents (candidates are distinct-collapsed and the verify output is
    * distinct — see Dedup.verifyIndexedCandidates), so a state where a
    * row exists in both an old partition and the merged one changes
    * nothing. The protocol only ever ADDS rows before it removes any:
    *  1. write the merged rows (distinct, so a re-run after a crash
    *     cannot bake duplicates in) to a dot-prefixed staging dir —
    *     invisible to partition discovery;
    *  2. move the staged files INTO `batch=<upToBatch>` one atomic
    *     rename at a time (visible rows now duplicated — harmless);
    *  3. delete the absorbed `batch<upToBatch` partitions, the
    *     pre-existing `batch=<upToBatch>` files, and the staging dir.
    * A crash in 1 leaves invisible garbage; in 2 or 3, duplicates that
    * the next compaction's distinct() absorbs. At no point is a row of
    * the visible index missing. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   indexDir: String, upToBatch: Long): Unit = {
    compactPartitioned(spark, s"$indexDir/bands", upToBatch)
    compactPartitioned(spark, s"$indexDir/shingles", upToBatch)
  }

  private def compactPartitioned(spark: org.apache.spark.sql.SparkSession,
                                 root: String, upToBatch: Long): Unit =
    graft.operators.PartitionedCompaction.compactPartitioned(spark, root,
      upToBatch)

  /** The continuous form: drive [[processBatch]] from a Structured
    * Streaming query. Pair outputs land under `pairsDir/batch=<id>`
    * (read the root to get the growing pair log — with distinct() if an
    * interrupted compaction may not have rerun yet, see [[compactPairs]]'
    * consistency note); the standing index accumulates under `indexDir`.
    *
    * `compactEvery` > 0 bounds the small-file growth of a long-running
    * loop: every `compactEvery`-th batch first collapses all index AND
    * pair partitions with `batch <= id - 1` into one partition each
    * ([[compactIndex]] / [[compactPairs]]) before processing. The bound
    * `id - 1` is what makes the cadence crash-safe under foreachBatch's
    * at-least-once replay: batch `id - 1` is committed by the time batch
    * `id` is delivered, and a re-delivered batch `id` re-runs the same
    * idempotent compaction and then OVERWRITES only its own `batch=<id>`
    * partitions — it can never clobber a partition the compactor merged
    * into. Pair outputs are a pure set function of the (order-insensitive)
    * index contents, so the unioned pair log is row-identical to the
    * cadence-off run (StreamingNearDedupSpec drives both through a real
    * MemoryStream query and asserts equality after >= 2 compactions). */
  def start(docs: DataFrame, idCol: String, textCol: String, n: Int,
            threshold: Double, indexDir: String, pairsDir: String,
            checkpointDir: String, rowsPerBand: Int = 3,
            numBands: Int = 16, compactEvery: Int = 0): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (b: Dataset[Row], id: Long) =>
        if (compactEvery > 0 && id > 0 && id % compactEvery == 0) {
          compactIndex(b.sparkSession, indexDir, id - 1)
          compactPairs(b.sparkSession, pairsDir, id - 1)
        }
        processBatch(b.toDF(), id, idCol, textCol, n, threshold, indexDir,
            rowsPerBand, numBands)
          .write.mode("overwrite").parquet(s"$pairsDir/batch=$id")
        ()
      }
      .start()

  /** Compact the pair log the same way as the index halves: pair rows are
    * globally distinct (ids are unique across batches and a pair is
    * emitted exactly once, by the later doc's batch), so the merged
    * partition's distinct() preserves the multiset and the same
    * duplicate-tolerant add-before-remove protocol applies.
    *
    * CONSISTENCY NOTE for pair-log readers: between a compaction that
    * failed/crashed mid-phase-2/3 and its rerun, the visible log can
    * transiently hold DUPLICATE pair rows (staged copies renamed in
    * before the absorbed partitions were removed). That is provably
    * harmless for the set-semantics index, but a consumer counting raw
    * rows in that window over-counts — read the log with distinct() (or
    * tolerate duplicates) if a compaction may have aborted; the next
    * successful compaction collapses them. Same caveat on [[start]]'s
    * `pairsDir`. */
  def compactPairs(spark: org.apache.spark.sql.SparkSession,
                   pairsDir: String, upToBatch: Long): Unit =
    compactPartitioned(spark, pairsDir, upToBatch)
}
