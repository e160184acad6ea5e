package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.LangIdNb

/** Continuous-ingestion curation — the STREAMING twin of the batch
  * curation pipeline (`CurationPipeline.curate`): the front-end that runs
  * as documents ARRIVE, per micro-batch:
  *
  *   1. ADMISSION — per-doc filters against a FROZEN model (trained once,
  *      before the stream starts — models don't drift mid-stream): here
  *      NB language identification ([[LangIdNb]]); any per-doc predicate
  *      composes the same way because stream == batch is trivial for
  *      row-local functions.
  *   2. NEAR-DEDUP — the admitted batch checks against the STANDING
  *      index of every previously admitted document
  *      ([[StreamingNearDedup.processBatch]] — the stateful stage; corpus
  *      text is never re-read, only its band/shingle indexes).
  *   3. FIRST-SEEN-WINS — a batch doc drops iff some near-dup partner
  *      precedes it: any partner from an earlier batch, or a smaller-id
  *      partner within the same batch. Every pair emitted at batch i
  *      involves at least one batch-i doc and partners arrive at batches
  *      <= i, so the decision is FINAL at batch time — no retraction, no
  *      watermark. A dropped doc still indexes: seen content suppresses
  *      future duplicates regardless of its own fate (crawl semantics).
  *   4. LINEAGE LAKE — survivors land under `curated/batch=<id>` with
  *      (id, n_tok); every write is an idempotent overwrite of a
  *      batch-scoped partition, so a foreachBatch replay of an
  *      uncommitted batch rewrites its own partitions bit-identically —
  *      [[StreamingNearDedup]]'s exactly-once-without-a-log contract,
  *      extended to the pair log and the curated lake.
  *
  * The earlier-vs-same-batch distinction is derived from the CURRENT
  * batch's id set alone (a pair partner not in the current batch is
  * necessarily earlier), so the rule is robust to standing-index
  * compaction, which collapses arrival-batch partitions.
  *
  * 100 TB design: admission is one broadcast-join scoring pass over the
  * batch; the dedup stage's corpus-side work is proportional to the
  * batch and its collisions, never corpus size (see
  * [[StreamingNearDedup]]); the victim derivation joins the batch's pair
  * output (collision-bounded) against the batch's own id set. Nothing
  * scans the standing corpus. */
object StreamingCuration {

  /** One micro-batch step, callable from foreachBatch or a batch loop.
    * Writes `pairs/batch=<id>` and `curated/batch=<id>` under `baseDir`
    * (plus the standing dedup index under `index/`), and returns the
    * batch's survivors (id, n_tok) read back from the durable partition
    * (crash-replay safe to re-execute). */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, model: LangIdNb.Model,
                   admitLang: String, baseDir: String, n: Int = 3,
                   threshold: Double = 0.8): DataFrame = {
    val spark = batch.sparkSession
    // The admitted batch is referenced four times below (index build, the
    // two victim-side id frames, the survivor anti-join) and its plan
    // embeds the NB scoring join — explode(trigrams) + weights join +
    // per-doc window. Cut it once (eager localCheckpoint, released before
    // returning — the returned frame reads only the durable partition):
    // uncut, each reference re-ran the full scoring pass, ~4 re-scores
    // per batch (measured: the repeated ~0.9 s jobs dominating the gate).
    def labeled[T](step: String)(body: => T): T = {
      spark.sparkContext.setJobDescription(s"stream b=$batchId: $step")
      try body finally spark.sparkContext.setJobDescription(null)
    }
    val admitted = labeled("admit (NB score + checkpoint)") {
      batch.join(
        LangIdNb.predict(model, batch, idCol, textCol)
          .filter(col("lang_nb") === admitLang).select(col(idCol)),
        Seq(idCol), "left_semi")
        .localCheckpoint(true)
    }
    try {
    val pairsDf = labeled("index + pairs") {
      val p = StreamingNearDedup.processBatch(admitted, batchId, idCol,
        textCol, n, threshold, s"$baseDir/index").persist()
      p.write.mode("overwrite").parquet(s"$baseDir/pairs/batch=$batchId")
      p
    }
    try {
    // first-seen-wins: partners outside this batch's admitted set are
    // strictly earlier arrivals; within the batch the smaller id wins.
    // The victim derivation reads the JUST-WRITTEN pair set from the
    // cache that the durable write filled (identical rows — the frame is
    // a pure function of the durable index partitions), saving the
    // per-batch listing + schema-inference round trip of a read-back.
    val curIds = admitted.select(col(idCol).cast("long").as("cid"))
    val fa = curIds.select(col("cid").as("id_a"), lit(true).as("a_cur"))
    val fb = curIds.select(col("cid").as("id_b"), lit(true).as("b_cur"))
    val victims = pairsDf
      .select(col("id_a"), col("id_b"))
      .join(fa, Seq("id_a"), "left")
      .join(fb, Seq("id_b"), "left")
      .select(when(col("a_cur").isNotNull && col("b_cur").isNotNull,
          greatest(col("id_a"), col("id_b")))
        .when(col("a_cur").isNotNull, col("id_a"))
        .otherwise(col("id_b")).as("victim"))
      .distinct()
    labeled("victims + curated write") {
    admitted
      .join(victims, admitted(idCol).cast("long") === col("victim"),
        "left_anti")
      .select(col(idCol),
        graft.functions.TextAnalysis.tokenCount(col(textCol))
          .cast("long").as("n_tok"))
      .write.mode("overwrite").parquet(s"$baseDir/curated/batch=$batchId")
    }
    } finally { pairsDf.unpersist(); () }
    } finally graft.operators.ConnectedComponents.release(admitted)
    spark.read.parquet(s"$baseDir/curated/batch=$batchId")
  }

  /** The curated lake: every surviving doc with its lineage — (idCol,
    * batch, n_tok), batch = the micro-batch that admitted it. */
  def curated(spark: SparkSession, baseDir: String,
              idCol: String): DataFrame =
    spark.read.option("basePath", s"$baseDir/curated")
      .parquet(s"$baseDir/curated")
      .select(col(idCol), col("batch").cast("long").as("batch"),
        col("n_tok"))
}
