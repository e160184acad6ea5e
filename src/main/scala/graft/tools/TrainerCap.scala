package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the documented C=16384 auto-cap of the IVF coarse trainer
  * (SimilaritySearch.buildIvfPqIndex's Lloyd-iteration k-means) at the
  * corpus size where auto-C actually reaches it: 8·√N = 16384 at
  * N ≈ 4.19M vectors. Feed it a GenScale-replicated embeddings dir
  * (e.g. 21× the sf10 replica = 4.2M vectors) and it records the three
  * costs the SCALE.md cap row states — coarse-fit wall-clock at k=16384
  * over the 262144-vector training sample, the fused assign+encode pass
  * over the full corpus, and the served recall@10 vs brute force at the
  * auto operating point (nProbe = C/4 = 4096, 25% scan).
  *
  * With mode `hier` the coarse codebook comes from the two-level
  * hierarchical trainer instead (level-1 k-means branches + per-branch
  * driver-local Lloyd over the bounded sample) — the production path the
  * cap row says to switch to; the build then consumes the frame via the
  * `centroids` parameter, so the measured pair (flat vs hier) differs
  * ONLY in training.
  *
  * Mode `hier0` is the two-level trainer WITHOUT the distributed
  * refinement pass (refineIters = 0) — the r15 shape, kept so the
  * refine lever's recall/cost delta stays measurable.
  *
  * Usage: runMain graft.tools.TrainerCap <embDir> [byResidual] [flat|hier|hier0]
  * byResidual defaults to FALSE when omitted (raw encoding — state
  * `true` explicitly to measure the residual deploy config); any token
  * other than true/false is rejected up front.
  */
object TrainerCap {
  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("/tmp/graft_sf210")
    val byResidual = args.lift(1) match {
      case None => false
      case Some("true") => true
      case Some("false") => false
      case Some(other) => throw new IllegalArgumentException(
        s"byResidual must be true or false, got '$other' " +
          "(usage: TrainerCap <embDir> [byResidual] [flat|hier|hier0])")
    }
    val mode = args.lift(2).getOrElse("flat")
    require(Set("flat", "hier", "hier0").contains(mode),
      s"mode must be flat|hier|hier0, got '$mode'")
    val hier = mode != "flat"
    val spark = SparkSession.builder()
      .appName("graft-trainer-cap").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.operators.SimilaritySearch
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
    val n = emb.count()
    val autoC = S.autoNumCentroids(n)
    println(s"trainer-cap corpus n=$n auto_C=$autoC by_residual=$byResidual")

    // coarse fit ALONE first (the public trainer-only path, same sample
    // bound and k) so the cap row can state the k-means share separately
    // from the full build
    val tf0 = System.nanoTime()
    val cents =
      if (hier) S.hierarchicalCentroidsDf(emb, "vec_id", "embedding",
        numCentroids = autoC,
        refineIters = if (mode == "hier0") 0 else 1)
      else S.ivfKMeansCentroidsDf(emb, "vec_id", "embedding",
        numCentroids = autoC)
    val nLists = cents.count()
    val tf1 = System.nanoTime()
    println(f"trainer-cap coarse_fit_sec=${(tf1 - tf0) / 1e9}%.1f lists=$nLists mode=$mode")

    val t0 = System.nanoTime()
    val idx = S.buildIvfPqIndex(emb, "vec_id", "embedding",
      byResidual = byResidual,
      centroids = if (hier) Some(cents) else None)
    // force both training artifacts AND the full encode
    val nCodes = idx.codes.count()
    val t1 = System.nanoTime()
    println(f"trainer-cap build_total_sec=${(t1 - t0) / 1e9}%.1f codes=$nCodes lists=${idx.centroids.count()}")

    val queries = emb.filter(col("vec_id") < 20)
    val t2 = System.nanoTime()
    val truth = S.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").cache()
    val nTruth = truth.count()
    val t3 = System.nanoTime()
    val got = S.searchIvfPqIndex(idx, emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id")
    val hit = truth.join(got, Seq("q_id", "n_id"), "left_semi").count()
    val t4 = System.nanoTime()
    println(f"""{"metric":"trainer_cap","n":$n,"auto_c":$autoC,"by_residual":$byResidual,"mode":"$mode","coarse_fit_sec":${(tf1 - tf0) / 1e9}%.1f,"build_sec":${(t1 - t0) / 1e9}%.1f,"brute_sec":${(t3 - t2) / 1e9}%.1f,"serve_sec":${(t4 - t3) / 1e9}%.1f,"recall_at_10":${hit.toDouble / nTruth}%.4f}""")
    spark.stop()
  }
}
