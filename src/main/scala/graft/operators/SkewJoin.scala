package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys. AQE's skew-join handles most skew at
  * runtime, but only splits oversized shuffle partitions; salting is the
  * explicit tool when a single key is so hot it must spread across many
  * tasks (the classic "empty text" / default-value hot key in corpus joins).
  *
  * Left (large, skewed) rows get a salt in [0, salts); right (smaller) rows
  * are replicated `salts` times; the join key becomes (key, salt).
  * Inner-join semantics are identical to `left.join(right, Seq(key))`;
  * right-side size multiplies by `salts`.
  *
  * Salt choice: by default the salt derives from a hash of the whole left
  * row — deterministic under task retries (a nondeterministic salt such as
  * rand() or monotonically_increasing_id risks row duplication/loss when
  * only part of a shuffle stage is recomputed, the SPARK-23207 class of
  * bug). The trade-off: rows identical in EVERY column all land in one
  * bucket. If your skew is dominated by fully identical rows, pass an
  * explicit `saltBy` keyed on a stable unique row id column.
  */
object SkewJoin {

  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      salts: Int = 16,
                      saltBy: Option[Column] = None): DataFrame = {
    require(salts >= 1 && salts <= 4096, s"salts out of range: $salts")
    val saltSource = saltBy.getOrElse(xxhash64(left.columns.map(col): _*))
    val saltedLeft = left.withColumn("__salt",
      pmod(saltSource.cast("long"), lit(salts.toLong)).cast("int"))
    val replicatedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}
