package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the SQ8 index at scale: build (min/max scan + byte encode +
  * save), persisted serve (load + ADC scan + exact re-rank), and
  * recall@10 vs brute force — the numbers SCALE.md's index-economics and
  * exponent tables state for the other families. Single clean runs, same
  * protocol as TombstoneServeScale. Usage:
  *   runMain graft.tools.SqScale <sfDir>
  */
object SqScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-sq-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnConfig, PqIndex, SimilaritySearch}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < AnnConfig.maxQueries)
    println(s"corpus n=$n sfDir=$sfDir")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val tmp = java.nio.file.Files.createTempDirectory("graft-sq-scale").toString
    val (_, tBuild) = timed {
      SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding",
        codebookSize = AnnConfig.sqLevels).save(s"$tmp/sq8")
    }
    println(f"sq8_build_save sec=$tBuild%.2f")

    val (servedRows, tServe) = timed {
      SimilaritySearch.searchPqIndex(
        PqIndex.load(spark, s"$tmp/sq8"), emb, queries, "vec_id", "embedding",
        k = AnnConfig.k, rerankFactor = AnnConfig.rerankFactor).count()
    }
    println(f"sq8_load_serve sec=$tServe%.2f rows=$servedRows")

    val truth = SimilaritySearch.bruteForceTopK(emb, queries,
      "vec_id", "embedding", AnnConfig.k).select("q_id", "n_id")
    val got = SimilaritySearch.searchPqIndex(
      PqIndex.load(spark, s"$tmp/sq8"), emb, queries, "vec_id", "embedding",
      k = AnnConfig.k, rerankFactor = AnnConfig.rerankFactor)
      .select("q_id", "n_id")
    val nTruth = truth.count()
    val hit = truth.join(got, Seq("q_id", "n_id"), "left_semi").count()
    println(f"sq8_recall_at_10 ${hit.toDouble / math.max(1L, nTruth)}%.4f (truth=$nTruth)")

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
