package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Funnel analysis — the ordered-sequence conversion operator every
  * product-analytics engine ships (Amplitude/Mixpanel "funnels"): for an
  * ordered list of step event-types, how far does each user get, taking
  * each step's FIRST occurrence strictly after the previous step's
  * matched time?
  *
  * Semantics: ts₁(u) = min ts of a step-1 event for u; tsₖ(u) = min ts of
  * a step-k event with ts > tsₖ₋₁(u) (and, with `maxSpan`, ts ≤ ts₁ +
  * span — the "converted within N days" variant). A user's
  * `steps_completed` is the largest k with tsₖ defined. Without `maxSpan`
  * this greedy earliest-match never misses a completion: any other
  * witness sequence satisfies tsₖ' ≥ tsₖ at every step by induction, so
  * if a witness exists the greedy chain exists. With `maxSpan` the funnel
  * is ANCHORED at the user's first step-1 event (the Amplitude-style
  * convention) — a later anchor that would fit the window is deliberately
  * not searched.
  *
  * 100 TB design: one pass per step — events filtered to that step's type
  * (predicate pushed to the scan), min-aggregated per user (map-side
  * partial agg), then a per-user join against the funnel-so-far: K small
  * shuffles of (user, K timestamps) rows, never the raw event stream; no
  * window over the full event history, no per-user event-list
  * materialization (the collect_list-and-scan shape OOMs on power users).
  */
object Funnel {

  /** Per-user funnel: (user, ts_1 … ts_K, steps_completed), one row per
    * user that completed at least step 1. */
  def userFunnel(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String],
                 maxSpan: Option[Column] = None): DataFrame = {
    require(steps.nonEmpty && steps.distinct.length == steps.length,
      "steps must be non-empty and distinct")
    val u = col(userCol)
    var funnel = events.where(col(typeCol) === steps.head)
      .groupBy(u.as("user"))
      .agg(min(col(tsCol)).as("ts_1"))
    for (k <- 2 to steps.length) {
      val prevTs = col(s"ts_${k - 1}")
      val within = maxSpan match {
        case Some(span) => col("__ts") <= col("ts_1") + span
        case None => lit(true)
      }
      val stepK = events.where(col(typeCol) === steps(k - 1))
        .select(u.as("user"), col(tsCol).as("__ts"))
        .join(funnel, "user")
        .where(col("__ts") > prevTs && within)
        .groupBy(col("user"))
        .agg(min(col("__ts")).as(s"ts_$k"))
      funnel = funnel.join(stepK, Seq("user"), "left")
    }
    // fold 1..K so the OUTERMOST case tests the deepest step first
    val completed = (1 to steps.length).foldLeft(lit(0)) { (acc, k) =>
      when(col(s"ts_$k").isNotNull, lit(k)).otherwise(acc) }
    funnel.withColumn("steps_completed", completed)
  }

  /** Conversion table: (step, step_name, users, conversion) — users
    * reaching step k, and the fraction relative to step 1. */
  def conversion(events: DataFrame, userCol: String, typeCol: String,
                 tsCol: String, steps: Seq[String],
                 maxSpan: Option[Column] = None): DataFrame = {
    val per = userFunnel(events, userCol, typeCol, tsCol, steps, maxSpan)
    val aggs = (1 to steps.length).map(k =>
      count(col(s"ts_$k")).as(s"n_$k"))
    val counts = per.agg(aggs.head, aggs.tail: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val stepNames = steps.zipWithIndex.map { case (n, i) => (i + 1, n) }
      .toDF("step", "step_name")
    // counts is ONE row — explode it to (step, users) and divide by n_1
    val long = counts
      .select(explode(array((1 to steps.length).map(k =>
          struct(lit(k).as("step"), col(s"n_$k").as("users"))): _*)).as("s"),
        col("n_1").as("__base"))
      .select(col("s.step").as("step"), col("s.users").as("users"),
        col("__base"))
    long.join(broadcast(stepNames), "step")
      .select(col("step"), col("step_name"), col("users"),
        round(col("users") / col("__base"), 6).as("conversion"))
      .orderBy(col("step"))
  }
}
