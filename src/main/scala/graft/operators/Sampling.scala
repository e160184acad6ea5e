package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus curation. Both variants derive
  * membership from a content hash of a key column, never from RNG state —
  * the same rows are selected on any cluster size, partitioning, retry, or
  * engine (md5 is everywhere), unlike df.sample whose output depends on seed
  * AND partition layout.
  */
object Sampling {

  private def hashKey(keyCol: String): Column =
    md5(col(keyCol).cast("string"))

  /** Keep rows whose md5(key) falls in the first `fraction` of the hash
    * space (lexicographic compare on lowercase hex = numeric compare on the
    * first 8 nibbles). Approximate per-partition counts, exact expectation;
    * no shuffle, no window — the scale path for 100 TB strata. */
  def deterministicSample(df: DataFrame, keyCol: String,
                          fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    if (fraction >= 1.0) df
    else {
      val thr = f"${(fraction * (1L << 32)).toLong}%08x"
      df.filter(hashKey(keyCol) < lit(thr))
    }
  }

  /** Exactly ceil(fraction * n) rows per stratum: rank rows in each stratum
    * by content hash and keep the first ceil(f*n). Deterministic AND exact,
    * at the cost of a per-stratum sort (one window shuffle). Skew note: each
    * stratum sorts within its partitions via Spark's window exec — for very
    * large strata (100 TB, few strata) prefer deterministicSample, which
    * needs no ordering. */
  def stratifiedExact(df: DataFrame, strataCol: String, keyCol: String,
                      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction $fraction")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(hashKey(keyCol), col(keyCol))
    val cw = Window.partitionBy(col(strataCol))
    // Collision-free temp names: a fixed "__rk" would shadow (and then drop)
    // a same-named input column, silently corrupting the output schema.
    var rk = "__rk"
    var n = "__n"
    while (df.columns.contains(rk)) rk += "_"
    while (df.columns.contains(n)) n += "_"
    df.withColumn(rk, row_number().over(w))
      .withColumn(n, count(lit(1)).over(cw))
      .filter(col(rk) <= ceil(col(n) * fraction))
      .drop(rk, n)
  }
}
