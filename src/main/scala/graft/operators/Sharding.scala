package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic pseudo-random shuffle + shard assignment — the
  * reproducible "shuffle the corpus, split into N training shards" step.
  *
  * Order key: md5 of the id (engine-portable — DuckDB and Spark produce the
  * same lowercase hex, so the oracle replicates the exact permutation; the
  * same trick as Sampling.stratifiedExact). Shards are assigned round-robin
  * along that order, so shard sizes are balanced to within one row and
  * `shard_pos` is the row's position WITHIN its shard — exactly the
  * (shard_id, offset) a data loader needs for deterministic resumption.
  *
  * Scale design: the global row_number over an empty partition spec would
  * serialize the whole dataset through one task. Instead rows bucket by the
  * md5's first two hex chars: 256 uniform buckets, and because the bucket
  * is a PREFIX of the sort key, bucket-major order IS global order — so
  * global rank = (count of rows in lower buckets) + rank within bucket.
  * The only single-partition step is the 256-row offset cumsum.
  */
object Sharding {

  /** Adds `shuffle_pos` (0-based position in the deterministic
    * pseudo-random permutation), `shard` (in [0, nShards)) and `shard_pos`
    * (0-based position within the shard) to `df`. */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val id = col(idCol)
    val rows = df.withColumn("h_", md5(id.cast("string")))
      .withColumn("bkt_", substring(col("h_"), 1, 2))
    val offsets = rows.groupBy(col("bkt_")).count()
      .withColumn("off_", coalesce(sum(col("count")).over(
        Window.orderBy(col("bkt_"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("count")
    val local = Window.partitionBy(col("bkt_")).orderBy(col("h_"), id)
    rows.join(broadcast(offsets), Seq("bkt_"))
      .withColumn("shuffle_pos", col("off_") + row_number().over(local) - 1)
      .withColumn("shard", (col("shuffle_pos") % nShards).cast("int"))
      .withColumn("shard_pos", floor(col("shuffle_pos") / nShards))
      .drop("h_", "bkt_", "off_")
  }
}
