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
  * hashable shuffle), which is orders of magnitude smaller than the corpus
  * (distinct words vs total tokens). Pair counts are then maintained
  * INCREMENTALLY: the full adjacent-pair aggregation runs exactly once; a
  * merge of (l,r) only changes pairs inside words that actually contain
  * (l,r), so each round aggregates SIGNED NET DELTAS from those affected
  * words — the round's single Spark job collects O(distinct delta pairs)
  * rows (bounded by the symbols adjacent to the merged pair, NOT by the
  * affected-word count), and the pair table + a lazy-deletion max-heap on
  * the driver answer the argmax in O(log P). This is the standard
  * architecture for corpus-scale BPE trainers (word table distributed,
  * pair statistics resident): driver memory is O(distinct adjacent pairs),
  * orders of magnitude below both the corpus and the word table, and is
  * guarded by `maxDriverPairs` — a corpus whose pair vocabulary exceeds it
  * falls back to a fully-distributed per-round argmax (TakeOrdered over a
  * cached pair table folded with the same deltas). Word-table lineage is
  * cut every few rounds (localCheckpoint) so T merges never build a T-deep
  * plan, with the same cache-release hygiene as ConnectedComponents.
  */
object Bpe {

  /** Learn `numMerges` BPE merges. Output: (rank, left, right, pair_count)
    * with rank 1 = first merge learned. Stops early (fewer rows) when no
    * pair occurs at least `minCount` times. Deterministic: argmax ties
    * break on (left, right) in UTF-8 BYTE order — Spark's binary string
    * ordering, which differs from Java's UTF-16 compareTo for
    * supplementary-plane characters vs [U+E000, U+FFFF]; any external
    * reference implementation must compare UTF-8 bytes to reproduce the
    * merge list ([[referenceTrain]] does).
    *
    * `maxDriverPairs` bounds the driver-resident pair table (distinct
    * adjacent symbol pairs, NOT words or occurrences); above it the
    * trainer falls back to the fully-distributed argmax loop. */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            minCount: Long = 2L, maxDriverPairs: Int = 1 << 22): DataFrame =
    trainWith(df, textCol, numMerges, minCount, maxDriverPairs, symbolize)

  /** BYTE-LEVEL BPE (the GPT-2-family formulation, Radford et al. 2019):
    * initial symbols are the UTF-8 BYTES of each space-prefixed word
    * rather than its code points, and there is no end-of-word marker —
    * the boundary is the leading space byte 0x20 carried at the word
    * START, exactly the Ġ-prefix convention modern byte-level tokenizers
    * ship. Consequences the word-internal tier can't offer: the base
    * alphabet is <= 256 symbols, EVERY string is encodable (byte
    * fallback — no <unk>), and multi-byte characters can merge partially.
    * Symbols are rendered as two-hex-digit strings ("20", "c3", ...), so
    * merged symbols concatenate unambiguously, all symbols are printable
    * ASCII (UTF-8 tie-break == plain string order), and the SQL oracle
    * derives the identical alphabet with hex(encode(' ' || w)). Same
    * distributed architecture and determinism contract as [[train]]. */
  def trainBytes(df: DataFrame, textCol: String, numMerges: Int,
                 minCount: Long = 2L, maxDriverPairs: Int = 1 << 22): DataFrame =
    trainWith(df, textCol, numMerges, minCount, maxDriverPairs, symbolizeBytes)

  private def trainWith(df: DataFrame, textCol: String, numMerges: Int,
                        minCount: Long, maxDriverPairs: Int,
                        symbolizer: String => Array[String]): DataFrame = {
    require(numMerges >= 1 && numMerges <= 65536, s"numMerges $numMerges")
    require(maxDriverPairs >= 0 && maxDriverPairs <= (1 << 28),
      s"maxDriverPairs $maxDriverPairs")
    val spark = df.sparkSession
    import spark.implicits._

    // one corpus pass: distinct words with frequencies, then symbolize;
    // eager localCheckpoint cuts the corpus out of every later lineage
    val wordCounts = df
      .select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .as[(String, Long)]
    var words: Dataset[(Array[String], Long)] = wordCounts
      .map { case (w, c) => (symbolizer(w), c) }
      .localCheckpoint(true)

    // the ONE full adjacent-pair aggregation. limit(max+1) detects a pair
    // vocabulary too large for the driver without a separate count job.
    val initPairs = pairCountsOf(words).limit(maxDriverPairs + 1).collect()

    val merges: Seq[(Int, String, String, Long)] =
      if (initPairs.length > maxDriverPairs)
        trainDistributed(words, numMerges, minCount)
      else {
        // Third tier (r17): when the WORD table fits on the driver too
        // (it is vocab-sized — distinct words, not the corpus), run the
        // whole merge loop in memory: the per-round net-delta recurrence
        // is exact integer arithmetic with a deterministic UTF-8
        // tie-break, so the merge list is IDENTICAL to the distributed
        // loop's — but a T-merge training stops paying T rounds of
        // (Catalyst re-plan + job dispatch) for a per-round job whose
        // actual work is microseconds (measured: 256 rounds = ~40 ms
        // plan + ~15 ms job each, ~85% of q_bpe_merges_256's wall).
        // gate with the cheap cache-backed count FIRST: collecting
        // maxDriverWords+1 full symbol arrays just to reject the tier was
        // a transient multi-hundred-MB driver-heap spike paid even when
        // the table was too big (r17 ADVICE)
        if (words.count() <= maxDriverWords) {
          val wordsLocal = words.collect()
          words.unpersist()
          trainDriverLocal(wordsLocal, initPairs, numMerges, minCount)
        } else
          trainDriverCounts(words, initPairs, numMerges, minCount)
      }
    merges.toDF("rank", "left", "right", "pair_count")
  }

  /** Word-table cap for the fully driver-local tier: ≤ 2^21 distinct
    * words (the symbol arrays of 2M typical words are the same memory
    * class as the ≤ 2^22-entry pair table already held). Above it the
    * driver-counts tier keeps the word table distributed. */
  private val maxDriverWords: Int = 1 << 21

  /** Fully in-memory merge loop — the SAME recurrence as
    * [[trainDriverCounts]] (driver pair table + lazy-deletion max-heap;
    * per-round net deltas from only the words containing the merged
    * pair; UTF-8 tie-break), with the word table a driver array instead
    * of a Dataset. Values are identical by construction: every count is
    * an exact integer sum over the same per-word delta maps, and the
    * argmax ordering is the same comparator. */
  private def trainDriverLocal(wordsArr: Array[(Array[String], Long)],
                               initPairs: Array[org.apache.spark.sql.Row],
                               numMerges: Int, minCount: Long): Seq[(Int, String, String, Long)] = {
    val words = wordsArr.clone()
    var highWater = 0L
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    initPairs.foreach(row =>
      pc.update((row.getString(0), row.getString(1)), row.getLong(2)))
    val heap = new java.util.PriorityQueue[(String, String, Long)](
      math.max(16, pc.size), heapOrdering)
    pc.foreach { case ((l, r), c) => heap.add((l, r, c)) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      var top: (String, String, Long) = null
      while (top == null && !heap.isEmpty) {
        val h = heap.poll()
        if (pc.get((h._1, h._2)).contains(h._3)) top = h
      }
      if (top == null || top._3 < minCount) done = true
      else {
        val (l, r, c) = top
        merges += ((rank, l, r, c))
        // net deltas over affected words — the in-memory twin of
        // [[mergeDeltas]]: per-word (merged − old) adjacent-pair counts,
        // summed across words, zero-net entries dropped
        val deltas = scala.collection.mutable.HashMap.empty[(String, String), Long]
        var wi = 0
        while (wi < words.length) {
          val (syms, cnt) = words(wi)
          if (containsPair(syms, l, r)) {
            val merged = applyMerge(syms, l, r)
            var i = 0
            while (i < merged.length - 1) {
              val k = (merged(i), merged(i + 1))
              deltas.update(k, deltas.getOrElse(k, 0L) + cnt); i += 1
            }
            i = 0
            while (i < syms.length - 1) {
              val k = (syms(i), syms(i + 1))
              deltas.update(k, deltas.getOrElse(k, 0L) - cnt); i += 1
            }
            words(wi) = (merged, cnt) // afterMerge, in place
          }
          wi += 1
        }
        deltas.foreach { case (k, d) =>
          if (d != 0L) {
            val next = pc.getOrElse(k, 0L) + d
            if (next <= 0L) pc.remove(k)
            else { pc.update(k, next); heap.add((k._1, k._2, next)) }
          }
        }
        highWater = math.max(highWater, pc.size.toLong)
        if (heap.size > math.max(1 << 16, 4 * pc.size)) {
          heap.clear()
          pc.foreach { case ((a, b), n) => heap.add((a, b, n)) }
        }
        rank += 1
      }
    }
    lastPairHighWater = math.max(highWater, initPairs.length.toLong)
    merges.toSeq
  }

  /** Adjacent-pair counts of a symbolized word table (map-side partial agg
    * then one exchange of distinct pairs). */
  private def pairCountsOf(words: Dataset[(Array[String], Long)]): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.flatMap { case (syms, c) =>
        var i = 0
        val out = new Array[(String, String, Long)](math.max(0, syms.length - 1))
        while (i < syms.length - 1) { out(i) = (syms(i), syms(i + 1), c); i += 1 }
        out
      }
      .toDF("l", "r", "c")
      .groupBy("l", "r").agg(sum("c").as("c"))
  }

  /** Signed net pair-count deltas caused by merging (l,r), from ONLY the
    * words that contain the pair, pre-summed per word so the shuffle (and
    * any collect) carries O(distinct touched pairs) rows. */
  private def mergeDeltas(words: Dataset[(Array[String], Long)],
                          l: String, r: String): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    words.flatMap { case (syms, cnt) =>
        if (!containsPair(syms, l, r)) Iterator.empty
        else {
          val merged = applyMerge(syms, l, r)
          val m = scala.collection.mutable.HashMap.empty[(String, String), Long]
          var i = 0
          while (i < merged.length - 1) {
            val k = (merged(i), merged(i + 1))
            m.update(k, m.getOrElse(k, 0L) + cnt); i += 1
          }
          i = 0
          while (i < syms.length - 1) {
            val k = (syms(i), syms(i + 1))
            m.update(k, m.getOrElse(k, 0L) - cnt); i += 1
          }
          m.iterator.filter(_._2 != 0L)
            .map { case ((a, b), d) => (a, b, d) }
        }
      }
      .toDF("l", "r", "c")
      .groupBy("l", "r").agg(sum("c").as("c"))
      .filter(col("c") =!= 0L)
  }

  /** Row-local rewrite applying one merge; narrow map, no shuffle, lazy —
    * between lineage cuts the word table is a short chain of these. */
  private def afterMerge(words: Dataset[(Array[String], Long)],
                         l: String, r: String): Dataset[(Array[String], Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.map { case (syms, cnt) =>
      if (!containsPair(syms, l, r)) (syms, cnt)
      else (applyMerge(syms, l, r), cnt)
    }
  }

  /** Main path: distributed word table + driver-resident pair counts with
    * a lazy-deletion max-heap. Per round exactly ONE Spark job (the net-
    * delta collect); the argmax is O(log P) on the driver. */
  private def trainDriverCounts(words0: Dataset[(Array[String], Long)],
                                initPairs: Array[org.apache.spark.sql.Row],
                                numMerges: Int, minCount: Long): Seq[(Int, String, String, Long)] = {
    var words = words0
    var ckpt = words0 // current checkpoint generation (for unpersist)
    var highWater = 0L
    val pc = scala.collection.mutable.HashMap.empty[(String, String), Long]
    initPairs.foreach(row =>
      pc.update((row.getString(0), row.getString(1)), row.getLong(2)))
    // max-heap with lazy deletion: entries are (l, r, countAtPush); an
    // entry is fresh iff its count still matches the pair table. Highest
    // count first; ties in UTF-8 byte order on (l, r) — matches Spark's
    // binary string ordering used by the distributed fallback.
    val heap = new java.util.PriorityQueue[(String, String, Long)](
      math.max(16, pc.size), heapOrdering)
    pc.foreach { case ((l, r), c) => heap.add((l, r, c)) }

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // pop to the first fresh entry (stale ones are superseded pushes)
      var top: (String, String, Long) = null
      while (top == null && !heap.isEmpty) {
        val h = heap.poll()
        if (pc.get((h._1, h._2)).contains(h._3)) top = h
      }
      if (top == null || top._3 < minCount) done = true
      else {
        val (l, r, c) = top
        merges += ((rank, l, r, c))
        // the round's single job: collect net deltas over affected words
        val deltas = mergeDeltas(words, l, r).collect()
        deltas.foreach { row =>
          val k = (row.getString(0), row.getString(1))
          val next = pc.getOrElse(k, 0L) + row.getLong(2)
          if (next <= 0L) pc.remove(k)
          else { pc.update(k, next); heap.add((k._1, k._2, next)) }
        }
        highWater = math.max(highWater, pc.size.toLong)
        words = afterMerge(words, l, r)
        // cut lineage periodically so T merges never build a T-deep plan;
        // release the superseded checkpoint only AFTER the new one
        // materialized from it (localCheckpoint is non-recoverable)
        if (rank % 8 == 0) {
          val pre = ckpt
          words = words.localCheckpoint(true)
          ckpt = words
          pre.unpersist()
        }
        // bound heap growth from superseded pushes
        if (heap.size > math.max(1 << 16, 4 * pc.size)) {
          heap.clear()
          pc.foreach { case ((a, b), n) => heap.add((a, b, n)) }
        }
        rank += 1
      }
    }
    ckpt.unpersist()
    lastPairHighWater = math.max(highWater, initPairs.length.toLong)
    merges.toSeq
  }

  /** Diagnostic only: driver pair-table high-water mark of the most
    * recent trainDriverCounts run in this JVM — the headroom gauge for
    * the maxDriverPairs bound that SCALE.md's large-vocabulary claim
    * (32k merges) is judged against. Written after training completes;
    * racy under concurrent trainings by design (a gauge, not state). */
  @volatile var lastPairHighWater: Long = 0L

  private val heapOrdering: java.util.Comparator[(String, String, Long)] =
    new java.util.Comparator[(String, String, Long)] {
      def compare(x: (String, String, Long), y: (String, String, Long)): Int = {
        if (x._3 != y._3) java.lang.Long.compare(y._3, x._3) // count desc
        else {
          val cl = compareUtf8(x._1, y._1)
          if (cl != 0) cl else compareUtf8(x._2, y._2)
        }
      }
    }

  private def compareUtf8(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    while (i < x.length && i < y.length) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** Fallback for pair vocabularies above `maxDriverPairs`: the pair table
    * stays a cached DataFrame, each round folds the same net deltas into it
    * and takes the argmax with a TakeOrdered(1) — one action per round,
    * shuffling |pairs| + |deltas| rows instead of every pair occurrence. */
  private def trainDistributed(words0: Dataset[(Array[String], Long)],
                               numMerges: Int, minCount: Long): Seq[(Int, String, String, Long)] = {
    var words = words0
    var pairs: DataFrame = pairCountsOf(words0).cache()
    // cache-generation bookkeeping: after round k's argmax materializes
    // pairs_k (whose lineage scans words_{k-1}), pairs_{k-1} and the
    // pre-previous word generation are provably no longer needed
    var prevWords: Dataset[(Array[String], Long)] = null
    var dropWords: Dataset[(Array[String], Long)] = null
    var dropPairs: DataFrame = null

    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      // the round's single job: argmax over the cached+delta'd pair table
      // (binary string order on l, r = UTF-8 byte-order tie-break)
      val best = pairs
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (dropPairs != null) { dropPairs.unpersist(); dropPairs = null }
      if (dropWords != null) { dropWords.unpersist(); dropWords = null }
      if (best.isEmpty || best.head.getLong(2) < minCount) done = true
      else {
        val (l, r, c) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((rank, l, r, c))
        val cur = words
        val newPairs = pairs.union(mergeDeltas(cur, l, r))
          .groupBy("l", "r").agg(sum("c").as("c"))
          .filter(col("c") > 0L)
          .cache()
        val newWords = afterMerge(cur, l, r).cache()
        dropPairs = pairs; dropWords = prevWords
        prevWords = cur
        pairs = newPairs; words = newWords
        // cut lineage periodically so T merges never build a T-deep plan;
        // release the pre-checkpoint caches (the checkpoints materialized
        // from them) or one stale copy per cut would pin executor memory
        if (rank % 8 == 0) {
          val wPre = words; val pPre = pairs
          words = words.localCheckpoint(true)
          pairs = pairs.localCheckpoint(true)
          wPre.unpersist(); pPre.unpersist()
          if (prevWords != null) { prevWords.unpersist(); prevWords = null }
          if (dropWords != null) { dropWords.unpersist(); dropWords = null }
          if (dropPairs != null) { dropPairs.unpersist(); dropPairs = null }
        }
        rank += 1
      }
    }
    if (words ne words0) words.unpersist()
    pairs.unpersist()
    if (prevWords != null) prevWords.unpersist()
    if (dropWords != null) dropWords.unpersist()
    if (dropPairs != null) dropPairs.unpersist()
    words0.unpersist() // no-op if already released by generation handoff
    merges.toSeq
  }

  private def containsPair(syms: Array[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  private def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
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

  /** Byte-level initial symbols ([[trainBytes]]): one symbol per UTF-8
    * byte of the SPACE-PREFIXED word, each rendered as its two-hex-digit
    * value — "20" is the word-boundary byte, always the first symbol. */
  private[graft] def symbolizeBytes(word: String): Array[String] = {
    val bytes = (" " + word).getBytes("UTF-8")
    val out = new Array[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = f"${bytes(i) & 0xff}%02x"
      i += 1
    }
    out
  }

  /** Tokenize a corpus with a learned merge list — the APPLY side of
    * [[train]]: (idCol, tokens ARRAY<STRING>, n_tokens). Token definition
    * matches training (lowercased whitespace words, one symbol per code
    * point, `</w>` end-of-word marker kept on the final subword).
    *
    * Segmentation is the standard rank-based encoder (repeatedly merge the
    * present pair with the lowest learned rank — same result as replaying
    * the merge list in order, which [[BpeSpec]] pins by fuzz against
    * [[segmentWord]]), with a per-partition word→segmentation memo: real
    * corpora repeat words heavily, so the amortized cost per token is a
    * hash probe, not a merge loop.
    *
    * Scale: the merge list is bounded by construction (numMerges <= 65536
    * rows) and ships in the task closure like a broadcast dim; everything
    * else is row-local mapPartitions — the text never shuffles. This is
    * one of the few justified mapPartitions in the codebase: the iterative
    * merge loop has no Column-expression form. */
  def encode(df: DataFrame, idCol: String, textCol: String,
             merges: DataFrame): DataFrame =
    encodeWith(df, idCol, textCol, merges, symbolize)

  /** Tokenize with a BYTE-LEVEL merge list from [[trainBytes]]: same
    * rank-based encoder and memoization, hex-byte initial symbols. Every
    * word is always encodable (256-symbol base alphabet — the byte
    * fallback that makes <unk> impossible), including words whose
    * characters never appeared in training. */
  def encodeBytes(df: DataFrame, idCol: String, textCol: String,
                  merges: DataFrame): DataFrame =
    encodeWith(df, idCol, textCol, merges, symbolizeBytes)

  private def encodeWith(df: DataFrame, idCol: String, textCol: String,
                         merges: DataFrame,
                         symbolizer: String => Array[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val mergeList = merges.select(col("rank"), col("left"), col("right"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
      .sortBy(_._1).map(t => (t._2, t._3))
    require(mergeList.length <= 65536, s"merge list ${mergeList.length}")
    val ranks: Map[(String, String), Int] =
      mergeList.zipWithIndex.map { case (p, i) => p -> i }.toMap
    val src = df.select(col(idCol).as("__id"), col(textCol).as("__text"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__id", src.schema("__id").dataType,
        src.schema("__id").nullable),
      org.apache.spark.sql.types.StructField("tokens",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, containsNull = false))))
    val rowRdd = src.rdd.mapPartitions { rows =>
      val memo = new java.util.HashMap[String, Array[String]](1 << 12)
      rows.map { r =>
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        // same tokenizer as training: lowercase, whitespace runs
        text.toLowerCase.split("\\s+").foreach { w =>
          if (w.nonEmpty) {
            var seg = memo.get(w)
            if (seg == null) {
              seg = encodeWord(w, ranks, symbolizer)
              if (memo.size < (1 << 20)) memo.put(w, seg)
            }
            out ++= seg
          }
        }
        org.apache.spark.sql.Row(r.get(0), out.toSeq)
      }
    }
    spark.createDataFrame(rowRdd, outSchema)
      .select(col("__id").as(idCol), col("tokens"),
        size(col("tokens")).as("n_tokens"))
  }

  /** Inverse of [[encode]] as a Column: re-joins a subword-token array
    * into the normalized text (lowercased words, single spaces). Pure
    * Column arithmetic — `concat` then the `</w>` markers become word
    * boundaries. Caveat: the marker is in-band; a pathological word
    * containing the literal substring "</w>" would corrupt (tokenizer
    * words can contain '<' and '/'), which is the standard limitation of
    * marker-based BPE — noted here rather than hidden. */
  def decodeTokens(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(concat_ws("", tokens), "</w>", " "))

  /** Inverse of [[encodeBytes]]: hex-concatenate the subwords, unhex back
    * to the UTF-8 byte stream, reinterpret as a string; every word carries
    * its leading boundary byte 0x20, so the only correction is trimming
    * the first space. Unlike the `</w>` marker this cannot collide with
    * content — the alphabet IS the raw bytes, which is the point of
    * byte-level BPE. */
  def decodeBytesTokens(tokens: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(unhex(concat_ws("", tokens)).cast("string"))

  /** Rank-based single-word encoder: repeatedly merge (one left-to-right
    * pass) the adjacent pair with the lowest learned rank until none of
    * the present pairs is learned. */
  private[operators] def encodeWord(word: String,
                                    ranks: Map[(String, String), Int]): Array[String] =
    encodeWord(word, ranks, symbolize)

  private[operators] def encodeWord(word: String,
                                    ranks: Map[(String, String), Int],
                                    symbolizer: String => Array[String]): Array[String] = {
    var syms = symbolizer(word)
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bi = -1
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) { best = r; bi = i }
        i += 1
      }
      if (bi < 0) done = true
      else syms = applyMerge(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Segment one word with a learned merge list (driver-side helper, used
    * by the spec and for ad-hoc inspection; merges ranked ascending). */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] =
    segmentWord(word, merges, symbolize)

  def segmentWord(word: String, merges: Seq[(String, String)],
                  symbolizer: String => Array[String]): Seq[String] = {
    var syms: Seq[String] = symbolizer(word).toSeq
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

  /** Single-threaded reference BPE (classic Sennrich formulation) over a
    * word-frequency map — the ground truth [[train]] must reproduce
    * EXACTLY, including the UTF-8 byte-order tie-break. Driver-side only:
    * used by BpeSpec's equality pin and by Verify's evidence probe (which
    * re-derives the sf0.01 merge list independently and compares). */
  def referenceTrain(wordCounts: Map[String, Long], numMerges: Int,
                     minCount: Long = 2L,
                     symbolizer: String => Array[String] = symbolize)
      : Seq[(Int, String, String, Long)] = {
    var words: Seq[(Vector[String], Long)] =
      wordCounts.toSeq.map { case (w, c) => (symbolizer(w).toVector, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        pairCounts((syms(i), syms(i + 1))) =
          pairCounts.getOrElse((syms(i), syms(i + 1)), 0L) + c
      if (pairCounts.isEmpty) done = true
      else {
        // tie-break in UTF-8 BYTE order to match Spark's binary string
        // ordering (Java compareTo diverges on non-BMP vs [U+E000,U+FFFF])
        def u8 = (s: String) => s.getBytes("UTF-8")
        def byteLt(a: Array[Byte], b: Array[Byte]): Boolean = {
          var i = 0
          while (i < a.length && i < b.length) {
            val c = (a(i) & 0xff) - (b(i) & 0xff)
            if (c != 0) return c < 0
            i += 1
          }
          a.length < b.length
        }
        val ((l, r), c) = pairCounts.toSeq.sortWith { case (((a1, b1), n1), ((a2, b2), n2)) =>
          if (n1 != n2) n1 > n2
          else if (a1 != a2) byteLt(u8(a1), u8(a2))
          else byteLt(u8(b1), u8(b2))
        }.head
        if (c < minCount) done = true
        else {
          merges += ((rank, l, r, c))
          words = words.map { case (syms, cnt) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[String]
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
                out += l + r; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toVector, cnt)
          }
          rank += 1
        }
      }
    }
    merges.toSeq
  }
}
