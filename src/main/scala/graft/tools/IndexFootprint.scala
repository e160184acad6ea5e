package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the ON-DISK bytes/vector of each persisted ANN serving shape
  * at its gate operating point (AnnConfig) — the storage bill SCALE.md's
  * index-economics table states next to the recall/scan numbers. Writes
  * real indexes to a temp dir and sums the parquet bytes; nothing is
  * estimated. Usage: runMain graft.tools.IndexFootprint <sfDir>. */
object IndexFootprint {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
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
}
