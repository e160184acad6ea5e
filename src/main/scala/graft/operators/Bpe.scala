package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.TextAnalysis

/** Byte-pair-encoding vocabulary induction over a corpus — the tokenizer-
  * training half of a data pipeline (Sennrich et al. 2016). Classic
  * formulation: words end with a `</w>` marker, each round merges the
  * globally most frequent adjacent symbol pair (ties broken
  * lexicographically), weighted by word frequency.
  *
  * Scale: the CORPUS is touched exactly once — one pass builds the
  * distinct-word frequency table (a groupBy over tokens, the usual 8-byte-
  * hashable shuffle), and every merge round then runs over that cached
  * word table, which is orders of magnitude smaller than the corpus
  * (distinct words vs total tokens). Per round: one flatMap+groupBy over
  * the word table and a 1-row TakeOrdered for the argmax — the same
  * one-action-per-round shape as ConnectedComponents, with the same
  * cache/localCheckpoint hygiene (lineage is cut every few rounds so T
  * merges never build a T-deep plan).
  */
object Bpe {

  /** Learn `numMerges` BPE merges. Output: (rank, left, right, pair_count)
    * with rank 1 = first merge learned. Stops early (fewer rows) when no
    * pair occurs at least `minCount` times. Deterministic: argmax ties
    * break on (left, right) in UTF-8 BYTE order — Spark's binary string
    * ordering, which differs from Java's UTF-16 compareTo for
    * supplementary-plane characters vs [U+E000, U+FFFF]; any external
    * reference implementation must compare UTF-8 bytes to reproduce the
    * merge list (BpeSpec's does). */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L): DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536, s"numMerges $numMerges")
    val spark = df.sparkSession
    import spark.implicits._

    // one corpus pass: distinct words with frequencies, then symbolize
    val wordCounts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
    var words: Dataset[(Array[String], Long)] = wordCounts
      .map { case (w, c) => (Bpe.symbolize(w), c) }
      .cache()
    words.count() // materialize before the loop

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // most frequent adjacent pair, weighted by word frequency
      val best = words
        .flatMap { case (syms, c) =>
          var i = 0
          val out = new Array[((String, String), Long)](math.max(0, syms.length - 1))
          while (i < syms.length - 1) { out(i) = ((syms(i), syms(i + 1)), c); i += 1 }
          out
        }
        .groupByKey(_._1)
        .mapValues(_._2).reduceGroups(_ + _)
        .map { case ((l, r), c) => (l, r, c) }
        .orderBy(col("_3").desc, col("_1"), col("_2"))
        .limit(1).collect()
      if (best.isEmpty || best.head._3 < minCount) done = true
      else {
        val (l, r, c) = best.head
        merges += ((rank, l, r, c))
        // apply the merge to every word (row-local rewrite)
        val prev = words
        words = prev.map { case (syms, cnt) =>
          if (syms.length < 2) (syms, cnt)
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, cnt)
          }
        }.cache()
        // cut lineage periodically so T merges never build a T-deep plan;
        // release the pre-checkpoint cache (the checkpoint materialized
        // from it) or one stale copy per cut would pin executor memory
        if (rank % 8 == 0) {
          val pre = words
          words = words.localCheckpoint(true)
          pre.unpersist()
        }
        words.count()
        prev.unpersist()
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Initial symbols of a word: one per Unicode CODE POINT (not UTF-16
    * char — splitting a surrogate pair would make two lone-surrogate
    * symbols that UTF-8 cannot even encode), plus the `</w>` end marker. */
  private[operators] def symbolize(word: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < word.length) {
      val n = Character.charCount(word.codePointAt(i))
      out += word.substring(i, i + n)
      i += n
    }
    out += "</w>"
    out.toArray
  }

  /** Segment one word with a learned merge list (driver-side helper, used
    * by the spec and for ad-hoc inspection; merges ranked ascending). */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms: Seq[String] = symbolize(word).toSeq
    merges.foreach { case (l, r) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
          out += l + r; i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.toSeq
    }
    syms
  }
}
