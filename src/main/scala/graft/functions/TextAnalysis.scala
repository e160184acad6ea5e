package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines, built
  * from codegen'd Spark built-ins (split/regexp/HOFs) plus the custom
  * expressions in this package. Every function is deterministic and (except
  * the hash-based ones) reproducible in ANSI SQL for the DuckDB oracle.
  *
  * All operate row-local → embarrassingly parallel, no shuffle: at 100 TB
  * these run at scan speed.
  */
object TextAnalysis {

  /** Whitespace tokens, lowercased, empties removed (single-pass kernel;
    * same semantics as filter(split(lower(trim(text)), "\\s+"), len > 0)). */
  def tokens(text: Column): Column = expressions.tokens(text)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation: alternating letter runs / digit runs /
    * single other chars (the common pre-tokenization regex shape). */
  def subwordTokens(text: Column): Column =
    filter(split(lower(text), "(?<=[a-z])(?=[^a-z])|(?<=[0-9])(?=[^0-9])|(?<=[^a-z0-9])(?=.)"),
      t => length(trim(t)) > 0)

  /** Word n-gram shingles (distinct), the unit for Jaccard dedup.
    * Single-pass codegen kernel — the composed-builtin form re-tokenizes per
    * element_at lambda (no CSE inside lambdas) and was ~50× slower. */
  def wordShingles(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 8)
    expressions.word_shingles(text, n)
  }

  /** Character n-gram shingles (distinct, codepoint windows) over
    * lowercased whitespace-normalized text — a codegen kernel for the
    * same reason as [[wordShingles]]: the HOF form it replaces evaluated
    * the regexp normalization inside the transform lambda once per
    * character position. */
  def charShingles(text: Column, n: Int): Column = {
    require(n >= 1 && n <= 8)
    expressions.char_shingles(text, n)
  }

  // --- language identification (stopword + CJK heuristic) ---------------

  /** Small, high-frequency stopword lists per language. Kept deliberately
    * tiny so the oracle SQL can inline the same literals. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "with", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"),
    "es" -> Seq("el", "los", "las", "es", "una", "en", "que", "por", "con", "para"))

  private def stopwordHits(toks: Column, lang: String): Column =
    size(filter(toks, t => array_contains(
      array(stopwords(lang).map(lit): _*), t)))

  /** CJK codepoint count (BMP unified ideographs). */
  def cjkCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[\\u4e00-\\u9fff]", ""))

  /** Heuristic language ID → 'zh' | 'en' | 'de' | 'fr' | 'es' | 'und'.
    * zh: >30% CJK chars; otherwise argmax stopword hits with a fixed
    * preference order (en, de, fr, es); all-zero → 'und'. Deterministic and
    * replicated verbatim in the DuckDB oracle. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = stopwordHits(toks, "en")
    val de = stopwordHits(toks, "de")
    val fr = stopwordHits(toks, "fr")
    val es = stopwordHits(toks, "es")
    val top = greatest(en, de, fr, es)
    when(cjkCount(text) * 10 > length(text) * 3, "zh")
      .when(top === 0, "und")
      .when(en === top, "en")
      .when(de === top, "de")
      .when(fr === top, "fr")
      .otherwise("es")
  }

  // --- quality scoring ---------------------------------------------------

  private def charClassCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  /** Heuristic document quality in [0,1]: penalizes very short docs, low
    * alphabetic ratio, punctuation floods, and missing stopwords — the
    * standard cheap pre-filters for web-scale corpus cleaning. */
  def qualityScore(text: Column): Column = {
    val n = greatest(length(text), lit(1))
    val toks = tokens(text)
    val nTok = size(toks)
    val alphaRatio = charClassCount(text, "[^a-zA-Z]") * -1.0 / n + 1.0
    val punctRatio = charClassCount(text, "[^.,!?;:]") * -1.0 / n + 1.0
    val stopRatio = stopwordHits(toks, "en") * 1.0 / greatest(nTok, lit(1))
    val lenScore = least(nTok / 20.0, lit(1.0))
    val score = lenScore * 0.4 + alphaRatio * 0.3 +
      least(stopRatio * 5.0, lit(1.0)) * 0.2 + (lit(1.0) - least(punctRatio * 5.0, lit(1.0))) * 0.1
    round(greatest(least(score, lit(1.0)), lit(0.0)), 4)
  }

  // --- PII detection / scrubbing -----------------------------------------

  /** Conservative PII patterns, restricted to syntax with identical
    * semantics in Java regex (Spark) and RE2 (DuckDB): plain classes,
    * greedy quantifiers, no lookaround/backrefs — so the oracle can run the
    * very same pattern. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[A-Za-z0-9./_%?=&#~@:-]+"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(emailPattern), lit(0)))

  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(urlPattern), lit(0)))

  /** Redact URLs then emails (URLs first: a URL can embed an @userinfo
    * part; scrubbing emails first would leave a mangled half-URL). Row
    * -local → scan speed at any scale. */
  def scrubPii(text: Column): Column =
    regexp_replace(regexp_replace(text, urlPattern, "<URL>"),
      emailPattern, "<EMAIL>")

  // --- within-document repetition (Gopher-style quality signals) ---------

  /** Multiplicity of the most frequent token — computed ROW-LOCALLY with a
    * sort + single-pass max-run-length fold over the token array, not via
    * explode/groupBy: no shuffle, scan speed at 100 TB, same result as the
    * oracle's unnest→group→max. */
  def topTokenCount(text: Column): Column = {
    val sorted = sort_array(tokens(text))
    val folded = aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st("prev"), st("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st("best"), run).as("best"))
      })
    folded("best")
  }

  /** Fraction of bigram slots occupied by a repeated bigram, in [0,1]:
    * 1 - distinct_bigrams / (n_tokens - 1); 0 for docs under two tokens.
    * Distinct count comes from the WordShingles kernel (single pass), total
    * from the token count — both row-local. */
  def dupBigramFrac(text: Column): Column = {
    val total = tokenCount(text) - 1
    when(total > 0,
      lit(1.0) - size(wordShingles(text, 2)) / total.cast("double"))
      .otherwise(lit(0.0))
  }

  /** Fraction of normalized-text characters covered by the single most
    * frequent word n-gram (Gopher "top n-gram character fraction"; ties →
    * smallest gram in binary order). Row-local codegen kernel — see
    * HashKernels.repetitionFracs for the exact contract. */
  def topNgramCharFrac(text: Column, n: Int): Column =
    element_at(expressions.repetition_fracs(text, n), 1)

  /** Character-mass fraction of word n-grams occurring at least twice
    * (Gopher "duplicate n-gram character fraction"; overlap double-counts,
    * clamped to 1). Row-local codegen kernel. */
  def dupNgramCharFrac(text: Column, n: Int): Column =
    element_at(expressions.repetition_fracs(text, n), 2)

  /** Unicode normalization pre-pass: NFC + C0/DEL/zero-width strip +
    * whitespace collapse (see HashKernels.normalizeText). Run this before
    * fingerprinting/dedup when ingesting text of mixed provenance —
    * composed vs decomposed accents and invisible characters otherwise
    * make semantically identical documents hash differently. */
  def normalizeText(text: Column): Column = expressions.normalize_text(text)

  /** 64-bit content fingerprint (whitespace/case-normalized rolling hash),
    * via the codegen'd Fingerprint64 expression. */
  def fingerprint(text: Column): Column = expressions.fingerprint64(text)

  /** SimHash signature of the document's tokens. */
  def simhash(text: Column): Column = expressions.simhash64(tokens(text))

  /** HTML → visible text extraction (the crawl-ingestion step before any
    * text operator runs): drop script/style blocks and comments, turn
    * block-closing tags into newlines, strip remaining tags, decode the
    * six ubiquitous entities (&amp; last, per the standard order), and
    * collapse whitespace. A deliberate regex pipeline of plain Column
    * functions — whole-stage-codegen'd, row-local, zero shuffle — and
    * every regex avoids backreferences/lookarounds so an RE2-based SQL
    * engine (the DuckDB oracle) replicates it byte for byte. Not a full
    * HTML5 parser: malformed nesting degrades to extra whitespace, never
    * to dropped visible text. */
  def htmlExtract(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val breaks = regexp_replace(noComment,
      "(?i)<(br|/p|/div|/li|/tr|/h[1-6])[^>]*>", "\n")
    val noTags = regexp_replace(breaks, "<[^>]+>", " ")
    val decoded = replace(replace(replace(replace(replace(replace(
      noTags,
      lit("&lt;"), lit("<")), lit("&gt;"), lit(">")),
      lit("&quot;"), lit("\"")), lit("&#39;"), lit("'")),
      lit("&nbsp;"), lit(" ")), lit("&amp;"), lit("&"))
    val spaces = regexp_replace(decoded, "[ \\t\\r]+", " ")
    val tightNl = regexp_replace(spaces, " ?\\n ?", "\n")
    // trim() strips only spaces; newlines at the edges need the char list
    trim(regexp_replace(tightNl, "\\n+", "\n"), " \n")
  }
}
