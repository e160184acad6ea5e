package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the LSH recall-for-storage trade SCALE.md's index-economics
  * table states: for a ladder of band counts at the gate's (bits, flips),
  * recall@10 vs brute force, the MEASURED distinct-candidate scan
  * fraction, and the written band-table parquet bytes/vector. The gate
  * point (224 bands) maximizes recall; the smaller points are the
  * storage-constrained alternatives a 100 TB deployment can choose with
  * open eyes. Usage: runMain graft.tools.LshOperatingPoints <sfDir> */
object LshOperatingPoints {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-lsh-points").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnConfig, SimilaritySearch}
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < AnnConfig.maxQueries)
    val nq = queries.count()
    val brute = SimilaritySearch.bruteForceTopK(emb, queries,
        "vec_id", "embedding", AnnConfig.k)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    val tmp = java.nio.file.Files.createTempDirectory("graft-lsh-pts").toString
    for (bands <- Seq(224, 112, 56)) {
      val got = SimilaritySearch.lshTopK(emb, queries, "vec_id", "embedding",
          AnnConfig.k, AnnConfig.lshBits, bands, AnnConfig.lshFlipBits)
        .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = brute.count(got.contains).toDouble / brute.size
      val cands = SimilaritySearch.lshCandidates(emb, queries,
        "vec_id", "embedding", AnnConfig.lshBits, bands, AnnConfig.lshFlipBits)
        .select("q_id", "c_id").count()
      val scan = cands.toDouble / (nq * (n - 1))
      val dir = s"$tmp/bands$bands"
      SimilaritySearch.lshBands(emb, "vec_id", "embedding",
        AnnConfig.lshBits, bands).write.mode("overwrite").parquet(dir)
      val bpv = dirBytes(new java.io.File(dir)).toDouble / n
      println(f"lsh-point bands=$bands%3d recall@10=$recall%.3f " +
        f"scan=$scan%.3f bands_parquet_B_per_vec=$bpv%.1f")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
