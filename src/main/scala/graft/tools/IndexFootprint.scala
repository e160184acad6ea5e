package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ON-DISK bytes/vector of each persisted ANN serving shape
  * at its gate operating point (AnnConfig) — the storage bill SCALE.md's
  * index-economics table states next to the recall/scan numbers. Writes
  * real indexes to a temp dir and sums the parquet bytes; nothing is
  * estimated. Usage: runMain graft.tools.IndexFootprint <sfDir> [purge].
  *
  * Mode `purge` instead measures the IVF-PQ (residual — the production
  * family) PHYSICAL-PURGE byte delta: build on the full corpus,
  * tombstone ~30% of ids, then purge to a fresh root — reporting the
  * tombstoned root's bytes (codes + deletes), the purged root's bytes,
  * and the reclaim fraction, the SCALE.md footprint-delta row. */
object IndexFootprint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    if (args.lift(1).contains("purge")) { purgeDelta(sfDir); return }
    val spark = SparkSession.builder()
      .appName("graft-index-footprint").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import graft.operators.{AnnConfig, SimilaritySearch}

    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    def bytes(path: String): Long = dirBytes(new java.io.File(path))

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rawBytes = bytes(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-footprint").toString

    // LSH at the gate point (lshBits bits x lshBands bands)
    SimilaritySearch.buildLshIndex(emb, "vec_id", "embedding",
      bitsPerBand = AnnConfig.lshBits, numBands = AnnConfig.lshBands)
      .save(s"$tmp/lsh")
    // PQ (m subspaces, 256 codewords)
    SimilaritySearch.buildPqIndex(emb, "vec_id", "embedding").save(s"$tmp/pq")
    // IVF-PQ at auto-C
    SimilaritySearch.buildIvfPqIndex(emb, "vec_id", "embedding").save(s"$tmp/ivfpq")
    // SQ8 (dim one-element linear subspaces, 256 levels)
    SimilaritySearch.buildSqIndex(emb, "vec_id", "embedding").save(s"$tmp/sq8")
    // IVF-SQ8 at auto-C
    SimilaritySearch.buildIvfSqIndex(emb, "vec_id", "embedding").save(s"$tmp/ivfsq")

    def row(shape: String, parts: Seq[(String, Long)]): Unit = {
      val total = parts.map(_._2).sum
      val detail = parts.map { case (k, b) => s"$k=$b" }.mkString(" ")
      println(f"$shape%-28s total=$total%12d bytes  ${total.toDouble / n}%10.1f B/vec  ($detail)")
    }
    println(s"corpus: n=$n dim=$dim sfDir=$sfDir")
    row("raw embeddings parquet", Seq("embeddings" -> rawBytes))
    row(s"lsh(bits=${AnnConfig.lshBits},bands=${AnnConfig.lshBands})", Seq(
      "bands" -> bytes(s"$tmp/lsh/bands"),
      "vectors" -> bytes(s"$tmp/lsh/vectors")))
    row(s"pq(m=${AnnConfig.numSubspaces})", Seq(
      "codebooks" -> bytes(s"$tmp/pq/codebooks"),
      "codes" -> bytes(s"$tmp/pq/codes")))
    row(s"sq8(levels=${AnnConfig.sqLevels})", Seq(
      "codebooks" -> bytes(s"$tmp/sq8/codebooks"),
      "codes" -> bytes(s"$tmp/sq8/codes")))
    row("ivfpq(auto-C)", Seq(
      "centroids" -> bytes(s"$tmp/ivfpq/centroids"),
      "codebooks" -> bytes(s"$tmp/ivfpq/codebooks"),
      "codes" -> bytes(s"$tmp/ivfpq/codes")))
    row("ivfsq(auto-C, 256 levels)", Seq(
      "centroids" -> bytes(s"$tmp/ivfsq/centroids"),
      "codebooks" -> bytes(s"$tmp/ivfsq/codebooks"),
      "codes" -> bytes(s"$tmp/ivfsq/codes")))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }

  private def purgeDelta(sfDir: String): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-purge-footprint").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.SimilaritySearch
    def dirBytes(p: java.io.File): Long =
      if (p.isFile) p.length()
      else Option(p.listFiles()).map(_.map(dirBytes).sum).getOrElse(0L)
    def bytes(path: String): Long = dirBytes(new java.io.File(path))
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val tmp = java.nio.file.Files.createTempDirectory("graft-purge-fp").toString
    SimilaritySearch.buildIvfPqIndex(emb, "vec_id", "embedding",
      byResidual = true).save(s"$tmp/orig")
    // ~30% tombstoned (vec_id % 10 < 3) — the documented cadence point
    graft.operators.IvfPqIndex.delete(s"$tmp/orig",
      emb.filter(pmod(col("vec_id"), lit(10)) < 3), "vec_id")
    val beforeCodes = bytes(s"$tmp/orig/codes")
    val beforeDeletes = bytes(s"$tmp/orig/deletes")
    val before = bytes(s"$tmp/orig")
    graft.operators.IvfPqIndex.purge(spark, s"$tmp/orig", s"$tmp/purged")
    val after = bytes(s"$tmp/purged")
    val afterCodes = bytes(s"$tmp/purged/codes")
    println(f"""{"metric":"ivfpq_purge_footprint","n":$n,"tombstone_frac":0.3,"before_bytes":$before,"before_codes":$beforeCodes,"before_deletes":$beforeDeletes,"after_bytes":$after,"after_codes":$afterCodes,"reclaim_frac":${1.0 - after.toDouble / before}%.3f}""")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    spark.stop()
  }
}
