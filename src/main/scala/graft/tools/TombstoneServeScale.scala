package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the TOMBSTONED serve path of the persisted ANN indexes at a
  * production-sized delete fraction (~30% of the corpus) — the r13
  * verdict's evidence gap: the delete gates run at sf0.01 with ~230
  * tombstones, which says nothing about what the load-time anti-join
  * does when the tombstone set is tens of thousands of ids.
  *
  * Per sf: build+save each index ONCE (untimed — build cost has its own
  * SCALE rows), tombstone ~30% of ids, then time the MASKED load+serve
  * end-to-end and print the anti-join's final (post-AQE) physical shape.
  * A second LSH serve runs with autoBroadcastJoinThreshold=-1 to witness
  * the beyond-threshold fallback the LshIndex.load scaladoc claims ("a
  * huge tombstone set is a plain equi-join") without having to
  * materialize billions of tombstones. Usage:
  *   runMain graft.tools.TombstoneServeScale <sfDir> [lsh|pq|both]
  */
object TombstoneServeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val which = args.lift(1).getOrElse("both")
    val spark = SparkSession.builder()
      .appName("graft-tombstone-serve-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{AnnConfig, LshIndex, PqIndex, SimilaritySearch}

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    // ~30% takedown: ids with hash residue 7..9, sparing the query set
    val doomedPred = pmod(col("vec_id"), lit(10)) >= 7 &&
      col("vec_id") >= AnnConfig.maxQueries
    val doomed = emb.filter(doomedPred).select(col("vec_id"))
    val nDoomed = doomed.count()
    val queries = emb.filter(col("vec_id") < AnnConfig.maxQueries)
    println(s"corpus n=$n tombstones=$nDoomed (${100.0 * nDoomed / n}%) sfDir=$sfDir")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def antiJoinLines(df: DataFrame): String =
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("LeftAnti")).map(_.trim.take(140)).mkString(" | ")

    val tmp = java.nio.file.Files.createTempDirectory("graft-tombstone").toString

    if (which != "pq") {
      SimilaritySearch.buildLshIndex(emb, "vec_id", "embedding",
        bitsPerBand = AnnConfig.lshBits, numBands = AnnConfig.lshBands)
        .save(s"$tmp/lsh")
      LshIndex.delete(s"$tmp/lsh", doomed, "vec_id", batchId = 1L)
      val (plan1, tLsh) = timed {
        val served = SimilaritySearch.searchLshIndex(
          LshIndex.load(spark, s"$tmp/lsh"), queries, "vec_id", "embedding",
          k = AnnConfig.k, bitsPerBand = AnnConfig.lshBits,
          numBands = AnnConfig.lshBands, flipBits = AnnConfig.lshFlipBits)
        val rows = served.count()
        (rows, served)
      }
      println(f"lsh_delete_serve sec=$tLsh%.2f rows=${plan1._1}")
      // the anti-join shape lives in the LOAD halves; surface it from a
      // small executed probe on the masked bands frame
      val maskedBands = LshIndex.load(spark, s"$tmp/lsh").bands
      maskedBands.count()
      println(s"lsh_antijoin(default): ${antiJoinLines(maskedBands)}")
      // beyond-threshold rehearsal: forbid broadcast, witness the fallback
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val (plan2, tLshNb) = timed {
        val served = SimilaritySearch.searchLshIndex(
          LshIndex.load(spark, s"$tmp/lsh"), queries, "vec_id", "embedding",
          k = AnnConfig.k, bitsPerBand = AnnConfig.lshBits,
          numBands = AnnConfig.lshBands, flipBits = AnnConfig.lshFlipBits)
        (served.count(), served)
      }
      println(f"lsh_delete_serve_nobroadcast sec=$tLshNb%.2f rows=${plan2._1}")
      val maskedNb = LshIndex.load(spark, s"$tmp/lsh").bands
      maskedNb.count()
      println(s"lsh_antijoin(nobroadcast): ${antiJoinLines(maskedNb)}")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }

    if (which != "lsh") {
      SimilaritySearch.buildPqIndex(emb, "vec_id", "embedding",
        numSubspaces = AnnConfig.numSubspaces,
        codebookSize = AnnConfig.codebookSize).save(s"$tmp/pq")
      PqIndex.delete(s"$tmp/pq", doomed, "vec_id", batchId = 1L)
      val (rowsPq, tPq) = timed {
        SimilaritySearch.searchPqIndex(
          PqIndex.load(spark, s"$tmp/pq"), emb, queries, "vec_id", "embedding",
          k = AnnConfig.k, rerankFactor = AnnConfig.rerankFactor).count()
      }
      println(f"pq_delete_serve sec=$tPq%.2f rows=$rowsPq")
      val maskedCodes = PqIndex.load(spark, s"$tmp/pq").codes
      maskedCodes.count()
      println(s"pq_antijoin(default): ${antiJoinLines(maskedCodes)}")
    }

    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
