package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the LATENCY-BOUND serve points of the capped-C IVF-PQ index
  * the SCALE.md trainer-cap section documents: same 4.2M-vector corpus,
  * same C=16384 (auto-C at that N), two-level trainer + 1 refinement
  * pass + byResidual (the deploy config) — then serves the 20-query set
  * at explicit small nProbe values (FAISS-style 8–64 of the 16k lists)
  * and records wall/query + recall@10 per point. Replaces the cap row's
  * "sub-second ADC at small nProbe" linearity INFERENCE with measured
  * numbers (r16 ask 6).
  *
  * Usage: runMain graft.tools.ServeLatency <embDir> [probes,comma,separated]
  */
object ServeLatency {
  def main(args: Array[String]): Unit = {
    val embDir = args.headOption.getOrElse("/tmp/graft_sf210")
    val probes = args.lift(1).getOrElse("8,32,64").split(",").map(_.trim.toInt)
    val spark = SparkSession.builder()
      .appName("graft-serve-latency").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val S = graft.operators.SimilaritySearch
    val emb = spark.read.parquet(s"$embDir/embeddings.parquet")
      .cache()
    val n = emb.count()
    val autoC = S.autoNumCentroids(n)
    println(s"serve-latency corpus n=$n auto_C=$autoC")

    val tb0 = System.nanoTime()
    val cents = S.hierarchicalCentroidsDf(emb, "vec_id", "embedding",
      numCentroids = autoC, refineIters = 1)
    val idx0 = S.buildIvfPqIndex(emb, "vec_id", "embedding",
      byResidual = true, centroids = Some(cents))
    // persist the codes so per-probe serves measure the SERVE, not a
    // rebuild (a standing index is parquet on disk; cache is the
    // local-mode stand-in)
    val codes = idx0.codes.cache()
    val nCodes = codes.count()
    val idx = idx0.copy(codes = codes)
    val tb1 = System.nanoTime()
    println(f"serve-latency build_sec=${(tb1 - tb0) / 1e9}%.1f codes=$nCodes")

    val queries = emb.filter(col("vec_id") < 20)
    val tt0 = System.nanoTime()
    val truth = S.bruteForceTopK(emb, queries, "vec_id", "embedding", 10)
      .select("q_id", "n_id").cache()
    val nTruth = truth.count()
    val tt1 = System.nanoTime()
    println(f"serve-latency brute_sec=${(tt1 - tt0) / 1e9}%.1f truth_rows=$nTruth")

    val rows = probes.map { p =>
      val t0 = System.nanoTime()
      val got = S.searchIvfPqIndex(idx, emb, queries, "vec_id", "embedding",
          10, nProbe = p)
        .select("q_id", "n_id")
      val hit = truth.join(got, Seq("q_id", "n_id"), "left_semi").count()
      val t1 = System.nanoTime()
      val wall = (t1 - t0) / 1e9
      val recall = hit.toDouble / nTruth
      println(f"serve-latency nprobe=$p wall_sec=$wall%.2f " +
        f"wall_per_query=${wall / 20}%.3f recall_at_10=$recall%.4f")
      f"""{"nprobe":$p,"wall_sec":$wall%.2f,"wall_per_query_sec":${wall / 20}%.3f,"recall_at_10":$recall%.4f}"""
    }
    println(s"""{"metric":"serve_latency","n":$n,"auto_c":$autoC,"points":[${rows.mkString(",")}]}""")
    spark.stop()
  }
}
