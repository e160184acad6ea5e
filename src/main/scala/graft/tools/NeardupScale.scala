package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the embedding near-dup PRODUCTION operating point
  * (cosineNeardupPairsBucketed at threshold 0.9 — the
  * q_dedup_embedding_lsh_prod shape, planted replicas included) at a
  * given scale, for SCALE.md's dedup linearity row: wall-clock + emitted
  * pair count + planted-pair recall. bitsPerBand follows the documented
  * production recipe bits ≈ ⌈log2 N⌉ so bucket occupancy stays O(1) and
  * candidate volume stays near-linear as the corpus grows — the exact
  * claim this rehearsal tests (at the planted cosine ~0.995 the per-pair
  * miss probability stays < 1e-20 for any bits ≤ 20 at 64 bands).
  *
  * Usage: runMain graft.tools.NeardupScale <embDir> [bits]
  */
object NeardupScale {
  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder()
      .appName("graft-neardup-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = spark.read.parquet(s"$embDir/embeddings.parquet")
      .select(col("vec_id").cast("long").as("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
    val n = e.count()
    val bits = args.lift(1).map(_.toInt).getOrElse(
      math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt)
    // the gate's planted near-dups: every 10th vector gains a replica at
    // cosine ~0.995 (mirrored from the q_dedup_embedding_lsh_prod gate)
    val replicas = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 100000000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.1)),
          slice(col("embedding"), 2, 63)).as("embedding"))
    val corpus = e.unionAll(replicas)
    val planted = n / 10 + (if (n % 10 > 0) 1L else 0L)
    val t0 = System.nanoTime()
    val pairs = graft.operators.Dedup.cosineNeardupPairsBucketed(
      corpus, "vec_id", "embedding",
      threshold = 0.9, bitsPerBand = bits, numBands = 64)
    val out = pairs.select(col("id_a"), col("id_b")).collect()
    val t1 = System.nanoTime()
    val plantedHit = out.count { r =>
      r.getLong(1) == r.getLong(0) + 100000000L && r.getLong(0) % 10 == 0
    }
    println(f"""{"metric":"neardup_scale","dir":"$embDir","n":$n,"bits":$bits,"bands":64,"threshold":0.9,"wall_sec":${(t1 - t0) / 1e9}%.1f,"pairs":${out.length},"planted":$planted,"planted_recall":${plantedHit.toDouble / planted}%.4f}""")
    spark.stop()
  }
}
