package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE trainer scale point: train `merges` merges over `<sfDir>/documents`
  * with the word-level and/or byte-level trainer, print wall seconds,
  * merges actually materialized (the trainer stops early on pair
  * exhaustion — an honest corpus-vocabulary fact, not a failure), and the
  * driver pair-table high-water gauge (`Bpe.lastPairHighWater`) vs its
  * maxDriverPairs bound. SCALE.md's merges-vs-time table rows come from
  * here. Usage: runMain graft.tools.BpeScale <sfDir> <merges> [word|bytes|both]
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val merges = args(1).toInt
    val mode = args.lift(2).getOrElse("both")
    val spark = SparkSession.builder()
      .appName("graft-bpe-scale").master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def run(label: String)(train: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val got = train.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"bpe-scale $label: merges_requested=$merges merges_done=$got " +
        f"wall=$sec%.1f s pair_high_water=${graft.operators.Bpe.lastPairHighWater} " +
        f"(bound ${1 << 22})")
    }
    if (mode == "word" || mode == "both")
      run("word")(graft.operators.Bpe.train(docs, "text", merges))
    if (mode == "bytes" || mode == "both")
      run("bytes")(graft.operators.Bpe.trainBytes(docs, "text", merges))
    spark.stop()
  }
}
