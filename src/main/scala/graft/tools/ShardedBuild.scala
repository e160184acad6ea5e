package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{IvfPqIndex, SimilaritySearch}

/** Scale rehearsal for the r17 sharded-build path (emptyLike → per-shard
  * append → merge): measures the monolithic build against the
  * train-once/encode-per-shard/merge decomposition on the same corpus,
  * and asserts the merged root serves exactly what the standing root
  * with every shard appended serves (the spec's equality, re-checked at
  * scale).
  *
  * Usage: runMain graft.tools.ShardedBuild <embeddingsDir> <nShards>
  * — embeddingsDir is a parquet dir with (vec_id, embedding), e.g. a
  * GenScale embeddings replica. */
object ShardedBuild extends App {
  val Array(embDir, nShardsStr) = args.take(2)
  val nShards = nShardsStr.toInt
  require(nShards >= 2, s"nShards $nShards")

  val spark = SparkSession.builder()
    .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  spark.sparkContext.setLogLevel("WARN")

  val emb = spark.read.parquet(embDir)
  val n = emb.count()
  val base = java.nio.file.Files.createTempDirectory("sharded-build").toString
  println(s"corpus $n vectors; roots under $base")

  def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    r
  }

  // monolithic: one build over the full corpus (train + encode together)
  timed("monolithic build+save") {
    SimilaritySearch.buildIvfPqIndex(emb, "vec_id", "embedding",
      byResidual = true).save(s"$base/mono")
  }

  // sharded: shard 0's build is the trainer (its hash-sample trains the
  // frame, its slice encodes); every other shard gets an emptyLike root
  // and encodes ONLY its slice against the frozen frame; merge renumbers
  val shard = (i: Int) => emb.filter(pmod(col("vec_id"), lit(nShards)) === i)
  timed(s"shard-0 build+save (trains the frame)") {
    SimilaritySearch.buildIvfPqIndex(shard(0), "vec_id", "embedding",
      byResidual = true).save(s"$base/main")
  }
  (1 until nShards).foreach { i =>
    timed(s"shard-$i emptyLike+append (frozen-frame encode)") {
      IvfPqIndex.emptyLike(spark, s"$base/main", s"$base/s$i")
      IvfPqIndex.append(spark, s"$base/s$i", shard(i), "vec_id", "embedding",
        batchId = 0L)
    }
  }
  (1 until nShards).foreach { i =>
    timed(s"merge shard-$i into standing root") {
      IvfPqIndex.merge(spark, s"$base/main", s"$base/s$i")
    }
  }

  // equality at scale: merged == append-onto-standing (frames identical
  // by construction — the reference root clones the frame)
  timed("reference: appends onto a cloned root") {
    IvfPqIndex.emptyLike(spark, s"$base/main", s"$base/ref")
    (0 until nShards).foreach { i =>
      IvfPqIndex.append(spark, s"$base/ref", shard(i), "vec_id", "embedding",
        batchId = i.toLong)
    }
  }
  val queries = emb.filter(col("vec_id") < 20)
  def serve(root: String) =
    SimilaritySearch.searchIvfPqIndex(IvfPqIndex.load(spark, root), emb,
        queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
  val eq = timed("serve both + compare") { serve(s"$base/main") == serve(s"$base/ref") }
  println(s"merged-serve == reference-serve: $eq")
  require(eq, "merged root serves differently from append-onto-standing")
  spark.stop()
}
