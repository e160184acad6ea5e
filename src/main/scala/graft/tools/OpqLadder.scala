package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the OPQ decision row for SCALE.md: recall@10 vs brute force
  * at the committed auto operating point (auto-C lists, nProbe = C/4 —
  * a 25% scan) for the residual IVF-PQ index with and without the OPQ
  * pre-rotation, on a given embeddings dir. The engine's synthetic
  * corpus is ISOTROPIC by construction (measured per-dim std
  * 0.118–0.135, |corr| ≤ 0.18), so the ladder's expected reading there
  * is parity — OPQ's lever is anisotropy; the spec's anisotropic-corpus
  * test (exp(-j/8) energy decay) is where the lift is demonstrated
  * (plain 0.48 → OPQ 0.65 flat-PQ@rf2). Both columns of that story are
  * measured, not assumed.
  *
  * Usage: runMain graft.tools.OpqLadder <embDir> [nQueries]
  */
object OpqLadder {
  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nq = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .appName("graft-opq-ladder").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.operators.SimilaritySearch
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val n = emb.count()
    val queries = emb.filter(col("vec_id") < nq)
    val truth = S.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").cache()
    val nTruth = truth.count()

    def recallOf(corpus: org.apache.spark.sql.DataFrame,
                 label: String): (Double, Double, Double) = {
      val t0 = System.nanoTime()
      val ix = S.buildIvfPqIndex(corpus, "vec_id", "embedding",
        byResidual = true)
      ix.codes.count()
      val t1 = System.nanoTime()
      val got = S.searchIvfPqIndex(ix, corpus,
          corpus.filter(col("vec_id") < nq), "vec_id", "embedding", 10)
        .select("q_id", "n_id")
      val hit = truth.join(got, Seq("q_id", "n_id"), "left_semi").count()
      val t2 = System.nanoTime()
      (hit.toDouble / nTruth, (t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }

    val (rRes, bRes, sRes) = recallOf(emb, "residual")
    val tr0 = System.nanoTime()
    val rot = S.opqRotationDf(emb, "vec_id", "embedding")
    val rotated = S.rotateVectors(emb, rot, "vec_id", "embedding")
    val tr1 = System.nanoTime()
    // rotation preserves cosines exactly in real arithmetic, so raw-space
    // brute-force truth certifies the rotated-space serve
    val (rOpq, bOpq, sOpq) = recallOf(rotated, "opq_residual")
    println(f"""{"metric":"opq_ladder","dir":"$embDir","n":$n,"auto_c":${S.autoNumCentroids(n)},"recall_residual":$rRes%.4f,"recall_opq_residual":$rOpq%.4f,"opq_train_sec":${(tr1 - tr0) / 1e9}%.1f,"build_sec_residual":$bRes%.1f,"build_sec_opq":$bOpq%.1f,"serve_sec_residual":$sRes%.1f,"serve_sec_opq":$sOpq%.1f}""")
    spark.stop()
  }
}
