package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval overlap join without the O(|L|·|R|) theta-join blowup Spark
  * plans for range predicates (BroadcastNestedLoopJoin).
  *
  * Both sides explode into fixed-width time bins covering their interval;
  * the join is an equi-join on bin id plus the exact overlap predicate.
  * Each qualifying pair is emitted exactly once — in the bin containing
  * max(lStart, rStart), which every overlapping pair shares — so no
  * dedup pass is needed.
  *
  * Scale: work is proportional to Σ interval_length/binWidth + per-bin
  * pair density, not |L|·|R|. Choose binWidth near the typical interval
  * length; AQE handles hot bins.
  */
object RangeJoin {

  /** @param left  columns: lId, lStart, lEnd (epoch micros, inclusive)
    * @param right columns: rId, rStart, rEnd
    * @return (lId, rId) pairs whose intervals overlap. */
  def overlapJoin(left: DataFrame, right: DataFrame,
                  lId: String, lStart: String, lEnd: String,
                  rId: String, rStart: String, rEnd: String,
                  binWidthMicros: Long): DataFrame = {
    require(binWidthMicros > 0)
    def binned(df: DataFrame, id: String, s: String, e: String, pfx: String): DataFrame =
      df.select(col(id).as(s"${pfx}_id"), col(s).as(s"${pfx}_s"), col(e).as(s"${pfx}_e"))
        .withColumn("bin", explode(sequence(
          floor(col(s"${pfx}_s") / binWidthMicros),
          floor(col(s"${pfx}_e") / binWidthMicros))))
    val lb = binned(left, lId, lStart, lEnd, "l")
    val rb = binned(right, rId, rStart, rEnd, "r")
    lb.join(rb, Seq("bin"))
      .filter(col("l_s") <= col("r_e") && col("r_s") <= col("l_e"))
      // emit once: only in the bin where the later interval start falls
      .filter(col("bin") === floor(greatest(col("l_s"), col("r_s")) / binWidthMicros))
      .select(col("l_id"), col("r_id"))
  }
}
