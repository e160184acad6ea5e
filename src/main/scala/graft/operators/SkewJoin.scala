package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most skew at
  * runtime, but only splits oversized shuffle partitions; salting is the
  * explicit tool when a single key is so hot it must spread across many
  * tasks (the classic "empty text" / default-value hot key in corpus joins).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, salts) derived
  * from the whole row; right (smaller) rows are replicated `salts` times;
  * the join key becomes (key, salt). Inner-join semantics are identical to
  * `left.join(right, Seq(key))`; right-side size multiplies by `salts`.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int = 16): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"salts out of range: $salts")
    // Per-row salt (not content-derived): fully identical hot rows — the
    // typical default-value hot key — must still spread across buckets.
    // monotonically_increasing_id varies per row; any salt assignment yields
    // identical inner-join results because the right side covers all salts.
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
