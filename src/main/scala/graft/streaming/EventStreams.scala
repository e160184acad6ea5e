package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-stream operators. Every transform here is expressed on an unbounded
  * DataFrame, so the same code runs in batch (finite input) and in
  * Structured Streaming (readStream) — the batch forms are what the
  * q_events_* gate queries exercise; StreamingSpec runs them incrementally
  * through MemoryStream and asserts stream == batch.
  *
  * Scale: all stateful operators key by user/entity id → state partitions
  * across executors; watermarks bound state size (late data beyond the
  * watermark is dropped, state for closed windows/sessions is reclaimed).
  */
object EventStreams {

  /** Tumbling (or sliding, if slide != window) event-time window counts with
    * a watermark. Append-mode compatible: results emit once the watermark
    * passes window end. */
  def windowedAgg(events: DataFrame, windowLen: String, slide: String,
                  watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("ws"), col("w.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Declarative gap-based sessions via the built-in session_window —
    * Spark merges windows that are within `gap` of each other. */
  def sessionWindows(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: drop records whose content fingerprint was
    * already seen, with the watermark bounding the dedup state — the
    * streaming form of Dedup.exactDedup for continuous ingestion pipelines.
    * Expects a `ts` event-time column and a text column; state for
    * fingerprints older than the watermark is reclaimed. */
  def streamingDedup(df: DataFrame, textCol: String, watermark: String): DataFrame =
    df.withColumn("fp", graft.functions.TextAnalysis.fingerprint(col(textCol)))
      .withWatermark("ts", watermark)
      // WithinWatermark variant: fingerprint state older than the watermark
      // is actually reclaimed (plain dropDuplicates("fp") would keep every
      // fingerprint forever despite the watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming dedup against a STANDING corpus fingerprint index — the
    * continuous-ingestion form of Dedup.exactDedupIncremental: rows whose
    * content fingerprint already exists in the (static) index are dropped
    * via a stream-static left_anti join (re-planned per micro-batch, so a
    * refreshed index table is picked up without restarting the query), and
    * within-stream repeats are dropped by the same watermark-bounded
    * fingerprint state as streamingDedup. The index side carries only
    * 8-byte fingerprints — the corpus text is never read. */
  def streamingDedupIncremental(df: DataFrame, textCol: String,
                                corpusFingerprints: DataFrame, fpCol: String,
                                watermark: String): DataFrame =
    df.withColumn("fp", graft.functions.TextAnalysis.fingerprint(col(textCol)))
      .join(corpusFingerprints.select(col(fpCol).as("fp")).distinct(),
        Seq("fp"), "left_anti")
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Stream-stream interval join: attribute each purchase to the same
    * user's clicks within the trailing `maxGap` window. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark's symmetric hash join can reclaim buffered state once the
    * watermark passes (an unbounded-condition stream-stream join would
    * buffer forever). Works identically on batch DataFrames (the spec
    * asserts stream == batch). */
  def purchaseAttribution(clicks: DataFrame, purchases: DataFrame,
                          watermark: String, maxGap: String): DataFrame = {
    val c = clicks.withWatermark("ts", watermark)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"), col("value"))
    p.join(c, col("p_user") === col("c_user")
        && col("click_ts") <= col("purchase_ts")
        && col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $maxGap"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("purchase_ts"), col("click_ts"), col("value"))
  }

  // ---- custom state machine: flatMapGroupsWithState sessionization ----

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Long, sum: Double)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long, sum_value: Double)

  /** Custom stateful sessionization: per-user state machine with an
    * event-time timeout. A session closes when a gap > `gapMillis` appears
    * (emitted immediately) or when the watermark passes its end (timeout).
    * Demonstrates arbitrary stateful processing beyond what session_window
    * offers (e.g. could carry per-session aggregates of any shape). */
  def sessionizeStateful(events: Dataset[Event], gapMillis: Long,
                         watermark: String): Dataset[Session] = {
    import events.sparkSession.implicits._

    def fn(userId: Long, rows: Iterator[Event],
           state: GroupState[SessionState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      def close(s: SessionState): Unit =
        out += Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n, s.sum)
      if (state.hasTimedOut) {
        state.getOption.foreach(close)
        state.remove()
      } else {
        // within a micro-batch events are unordered; sort before folding
        val sorted = rows.toArray.sortBy(_.ts.getTime)
        var cur = state.getOption.orNull
        for (e <- sorted) {
          val t = e.ts.getTime
          if (cur == null) cur = SessionState(t, t, 1, e.value)
          else if (t - cur.end > gapMillis) { close(cur); cur = SessionState(t, t, 1, e.value) }
          else cur = SessionState(cur.start, math.max(cur.end, t), cur.n + 1, cur.sum + e.value)
        }
        if (cur != null) {
          state.update(cur)
          // clamp: a timeout at or before the current watermark is rejected
          // by Spark (can happen when only late events arrived for this key).
          // In batch execution there is no watermark and the getter throws —
          // fall back to no clamp (batch never fires timeouts anyway).
          val wm = try state.getCurrentWatermarkMs()
                   catch { case _: UnsupportedOperationException => Long.MinValue }
          state.setTimeoutTimestamp(math.max(cur.end + gapMillis, wm + 1))
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
