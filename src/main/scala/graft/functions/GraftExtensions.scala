package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions registrar: exposes the custom Catalyst expressions
  * to SQL. Activate with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * (or `withExtensions`); then:
  *
  * {{{
  * SELECT graft_fingerprint64(text), graft_simhash64(graft_tokens(text)),
  *        graft_word_shingles(text, 3), graft_minhash_sig(sh, 48),
  *        graft_array_dot(a, b), graft_lsh_sigs(v, 6, 8)
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, arity: Seq[Int], builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions", name),
        (args: Seq[Expression]) => {
          if (!arity.contains(args.length))
            throw new IllegalArgumentException(
              s"$name expects ${arity.mkString("/")} arguments, got ${args.length}")
          builder(args)
        }))

    register("graft_fingerprint64", Seq(1), args => Fingerprint64(args.head))
    register("graft_simhash64", Seq(1), args => SimHash64(args.head))
    register("graft_tokens", Seq(1), args => Tokens(args.head))
    register("graft_word_shingles", Seq(2),
      args => WordShingles(args.head, intLit(args(1), "n")))
    register("graft_minhash_sig", Seq(2),
      args => MinHashSig(args.head, intLit(args(1), "h")))
    register("graft_array_dot", Seq(2), args => ArrayDot(args.head, args(1)))
    register("graft_lsh_sigs", Seq(3), args =>
      HyperplaneSigs(args.head, intLit(args(1), "bitsPerBand"), intLit(args(2), "numBands")))
    // UDTF: LATERAL VIEW graft_shingles(text, 3) → (pos, shingle) rows
    register("graft_shingles", Seq(2), args =>
      ShingleGenerator(args.head, intLit(args(1), "n")))
    // Unicode normalization pre-pass (NFC + control/zero-width strip +
    // whitespace collapse)
    register("graft_normalize_text", Seq(1), args => NormalizeText(args.head))
    // Gopher repetition fractions → [top_ngram_char_frac, dup_ngram_char_frac]
    register("graft_repetition_fracs", Seq(2), args =>
      RepetitionFracs(args.head, intLit(args(1), "n")))
    // Winnowing fingerprint hash array (distinct window minima)
    register("graft_winnow_fps", Seq(3), args =>
      WinnowFingerprints(args.head, intLit(args(1), "k"), intLit(args(2), "w")))
    // Unicode-script counts: [latin, cyrillic, han, arabic, devanagari,
    // greek, hangul, kana, digit, space, total]
    register("graft_script_counts", Seq(1), args => ScriptCounts(args.head))
    // UDTF: LATERAL VIEW graft_repetition_rows(text, 2, 10) → one
    // (n, top_frac, dup_frac) row per n — single tokenization pass
    register("graft_repetition_rows", Seq(3), args =>
      RepetitionProfileGen(args.head, intLit(args(1), "minN"), intLit(args(2), "maxN")))

    // Aho-Corasick substring blocklist (patterns as one '|'-separated
    // string literal): matched-pattern array / early-exit boolean /
    // overlapping-occurrence count — one text pass regardless of |patterns|
    def patternsLit(e: Expression, what: String): Seq[String] = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(
          s: org.apache.spark.unsafe.types.UTF8String, _) =>
        s.toString.split('|').toSeq
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal of '|'-separated patterns, got $other")
    }
    register("graft_substr_matches", Seq(2), args =>
      MultiPatternMatches(args.head, patternsLit(args(1), "patterns")))
    register("graft_substr_any_match", Seq(2), args =>
      AnyPatternMatch(args.head, patternsLit(args(1), "patterns")))
    register("graft_substr_occurrences", Seq(2), args =>
      PatternOccurrenceCount(args.head, patternsLit(args(1), "patterns")))
    // Jaro-Winkler similarity (record-linkage string metric)
    register("graft_jaro_winkler", Seq(2), args =>
      JaroWinklerSim(args.head, args(1)))
    // American Soundex (phonetic blocking key for the fuzzy-join family)
    register("graft_soundex", Seq(1), args => Soundex4(args.head))

    // SQL-invocable TABLE functions over the operator suite (dedup, LSH
    // pairs, components, chunking, BM25, ANN over a persisted PQ index) —
    // see GraftTableFunctions for the catalog and examples
    GraftTableFunctions.registerAll(ext)
  }
}
