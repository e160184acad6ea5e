package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention analysis — the second classic product-analytics
  * operator next to [[Funnel]]: bucket every user into the cohort of
  * their FIRST event, then measure what fraction of each cohort is still
  * active k periods later.
  *
  * Semantics: cohort(u) = floor(first_ts(u) / period); a user counts as
  * retained at offset k iff they have ANY event with
  * floor(ts / period) = cohort(u) + k. Offset 0 is the cohort itself
  * (retention 1.0 by construction — kept as the sanity row).
  *
  * 100 TB design: two aggregations and one join, all keyed on user —
  * (1) first-event per user (map-side-combinable min), (2) distinct
  * (user, period) activity (map-side distinct), then activity ⋈ cohorts
  * on user and a (cohort, offset) count. The raw event stream shuffles
  * once (to per-user activity); everything after is |users|-sized. No
  * windows over event history, no per-user event lists.
  */
object Retention {

  /** (cohort, offset, active_users, cohort_size, retention) for offsets
    * 0..maxOffset. `periodCol` must be an integral period index column
    * expression evaluated against each event row (e.g.
    * `floor(unix_micros(ts) / weekMicros)`) — keeping the bucketing an
    * explicit Column keeps the operator calendar-agnostic. */
  def cohortRetention(events: DataFrame, userCol: String, period: Column,
                      maxOffset: Int): DataFrame = {
    require(maxOffset >= 0)
    val u = col(userCol)
    // one shuffle: distinct per-user activity periods
    val activity = events.select(u.as("user"), period.cast("long").as("p"))
      .distinct()
    // per-user cohort = min activity period (derived from activity — no
    // second pass over raw events)
    val cohorts = activity.groupBy(col("user"))
      .agg(min(col("p")).as("cohort"))
    val sizes = cohorts.groupBy(col("cohort"))
      .agg(count(lit(1)).as("cohort_size"))
    activity.join(cohorts, "user")
      .select(col("cohort"), (col("p") - col("cohort")).as("offset"))
      .where(col("offset") <= maxOffset)
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("active_users"))
      .join(sizes, "cohort")
      .select(col("cohort"), col("offset"), col("active_users"),
        col("cohort_size"),
        round(col("active_users") / col("cohort_size"), 6).as("retention"))
  }
}
