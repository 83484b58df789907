package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * token counting, quality scoring, language ID, document fingerprinting.
  * Everything here is either pure `org.apache.spark.sql.functions` Column
  * algebra (codegen'd, pushdown-friendly) or a narrow typed map — no
  * shuffles; these run at scan speed over 100 TB.
  */
object TextAnalysis {

  /** Whitespace token count — size(split) on the codegen path. */
  def tokenCountWs(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword token count: runs of letters, runs of digits, and each
    * punctuation byte count as one token (a cheap stand-in for a byte-pair
    * vocabulary's pre-tokenizer, good enough for budget estimation).
    */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val stopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "is", "it",
    "for", "with", "as", "at", "by", "be", "this", "that", "are", "was"
  )

  /** PII-redaction patterns, applied in THIS order (emails first: an email
    * can embed digit runs; IPs before bare digit runs). All three use only
    * explicit ASCII classes and `\b` — constructs whose semantics are
    * identical in Java regex (Spark) and RE2 (DuckDB oracle); never use
    * `\s`/`\w`/`\d` here (the engines disagree on their ASCII/Unicode
    * extents — CLAUDE.md oracle invariant).
    */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b" -> "<IP>",
    "\\b[0-9]{13,19}\\b" -> "<NUM>" // card/account-length digit runs
  )

  /** C4-style PII scrub: replace emails, IPv4 addresses and long digit
    * runs with typed placeholders. Pure chained `regexp_replace` Column
    * algebra — codegen'd, no UDF, runs at scan speed; the same patterns
    * replay verbatim in the DuckDB oracle.
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (acc, (pat, repl)) =>
      regexp_replace(acc, pat, repl)
    }

  /** Gopher-style WITHIN-document repetition signals (the repetition
    * family of quality filters — docs whose content is mostly repeated
    * lines are low-quality scrapes):
    *
    *   dup_line_frac      = (lines − distinct lines) / lines
    *   dup_line_char_frac = (line chars − chars in distinct lines) / line chars
    *
    * One explode + two aggregations keyed by (doc, line) then doc — the
    * heavy shuffle key is (doc_id, line) so duplicate detection is exact,
    * and the per-doc rollup is a pure count/sum. IEEE double divisions on
    * exact integer operands: DuckDB-oracle-comparable bit-for-bit.
    *
    * @return (idCol, n_lines, dup_line_frac, dup_line_char_frac)
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val idc = col(idCol).cast("long")
    // null/non-integral ids would merge into one bogus null-keyed group at
    // the per-doc rollup — fail loudly (the Corpus.split convention); and
    // Spread: a one-file corpus would serialize the split+explode+partial
    // aggregation on a single task (CLAUDE.md sharp edge)
    val safeId = when(idc.isNotNull, idc)
      .otherwise(raise_error(lit(
        s"repetitionSignals: null or non-integral $idCol")).cast("long"))
    val lines = graft.operators.Spread(
        docs.select(safeId.as("doc_id"), col(textCol).cast("string").as("t")))
      .select(col("doc_id"), explode(split(col("t"), "\n")).as("line"))
    lines
      .groupBy("doc_id", "line").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id")
      .agg(
        sum("cnt").as("n_lines"),
        count(lit(1)).as("n_distinct"),
        sum(length(col("line")) * col("cnt")).as("n_chars"),
        sum(length(col("line"))).as("n_distinct_chars"))
      .select(
        col("doc_id").as(idCol),
        col("n_lines"),
        ((col("n_lines") - col("n_distinct")).cast("double") /
          col("n_lines").cast("double")).as("dup_line_frac"),
        when(col("n_chars") === 0, lit(0.0))
          .otherwise((col("n_chars") - col("n_distinct_chars")).cast("double") /
            col("n_chars").cast("double")).as("dup_line_char_frac"))
  }

  /** Trim exactly the regex-\s class `[ \t\n\x0b\f\r]` from both ends —
    * NOT String.trim (which strips every char <= 0x20, unreplayable in
    * SQL) and NOT DuckDB's bare trim() (spaces only). The oracle mirrors
    * this with DuckDB's two-arg trim(text, <same 6 chars>).
    */
  private[graft] def wsClassTrim(s: String): String = {
    def isWs(c: Char) = c == ' ' || c == '\t' || c == '\n' || c == '\u000b' ||
      c == '\f' || c == '\r'
    var a = 0
    var b = s.length
    while (a < b && isWs(s.charAt(a))) a += 1
    while (b > a && isWs(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  /** Guarded id cast shared by the repetition-family operators. */
  private def safeLongId(idCol: String, opName: String) = {
    val idc = col(idCol).cast("long")
    when(idc.isNotNull, idc)
      .otherwise(raise_error(lit(
        s"$opName: null or non-integral $idCol")).cast("long"))
  }

  /** ALL-position word n-gram rows (doc_id, n, gram) for every n in `ns`,
    * one pass — the shared kernel behind [[topNgramCharFractions]] and
    * [[dupNgramCharFractions]]. No per-doc dedupe (counts are the signal,
    * unlike Dedup.gramRows' distinct sets); a typed kernel, not
    * higher-order Column lambdas (those run interpreted — CLAUDE.md sharp
    * edge). Tokenization = [[wsClassTrim]] + the `\s+` split.
    */
  private def allPositionGramRows(docs: DataFrame, ns: Seq[Int],
                                  idCol: String, textCol: String,
                                  opName: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(safeLongId(idCol, opName).as("doc_id"),
      col(textCol).cast("string").as("t"))
    graft.operators.Spread(base)
      .as[(Long, String)]
      .flatMap { case (id, text) =>
        val t = wsClassTrim(if (text == null) "" else text)
        if (t.isEmpty) Iterator.empty
        else {
          val toks = graft.operators.Dedup.WsPattern.split(t)
          ns.iterator.filter(toks.length >= _).flatMap { n =>
            (0 to toks.length - n).iterator.map { i =>
              val sb = new java.lang.StringBuilder
              var j = 0
              while (j < n) { if (j > 0) sb.append(' '); sb.append(toks(i + j)); j += 1 }
              (id, n, sb.toString)
            }
          }
        }
      }
      .toDF("doc_id", "n", "gram")
  }

  /** Per-doc char base + n-pivot of a (doc_id, n, covered) frame into
    * `<prefix>_<n>gram_char_frac` columns, re-introducing gram-less docs
    * at 0.0 — the shared tail of the two n-gram fraction operators.
    */
  private def pivotCharFractions(docs: DataFrame, covered: DataFrame,
                                 ns: Seq[Int], colName: Int => String,
                                 idCol: String, textCol: String,
                                 opName: String): DataFrame = {
    val lens = docs.select(safeLongId(idCol, opName).as("doc_id"),
      length(col(textCol)).cast("long").as("total_chars"))
    val fracs = covered.join(lens, "doc_id")
      .groupBy("doc_id")
      .pivot("n", ns)
      .agg(first(col("covered").cast("double") / col("total_chars").cast("double")))
    lens.join(fracs, Seq("doc_id"), "left")
      .select(col("doc_id").as(idCol) +:
        ns.map(n => coalesce(col(n.toString), lit(0.0)).as(colName(n))): _*)
  }

  /** The other half of Gopher's repetition family: for n in {2,3,4}, the
    * fraction of the document's characters covered by its single most
    * frequent word n-gram — boilerplate scrapes ("buy now buy now buy
    * now...") score high even when no whole LINE repeats, which is exactly
    * the case [[repetitionSignals]] misses.
    *
    * Pinned semantics (exact, DuckDB-oracle-replayable):
    *   - tokens = whitespace-class split of class-trimmed text, where BOTH
    *     trim and split use the explicit 6-char class `[ \t\n\x0b\f\r]` on
    *     both engines (Java's String.trim strips all chars <= 0x20 and
    *     DuckDB's trim() strips only spaces — either one alone silently
    *     diverges on leading/trailing control whitespace); occurrences
    *     counted at EVERY sliding position (overlapping), gram string =
    *     tokens joined by one space
    *   - top gram per (doc, n) = max count, ties broken by lexicographically
    *     smallest gram (deterministic on both engines: binary collation)
    *   - fraction = count × length(gram) / length(text); docs with < n
    *     tokens score 0.0. Overlapping occurrences of a self-overlapping
    *     gram ("aa bb aa" in "aa bb aa bb aa") can push the value past 1.0
    *     — harmless for the Gopher usage (threshold ~0.18-0.2), and kept
    *     raw so the statistic stays an exact integer-arithmetic ratio
    *
    * Scale shape: one narrow typed kernel emits (doc, n, gram) rows for all
    * three n in a single pass; a map-side-combinable count groupBy, an
    * argmin-by-struct rollup to one row per (doc, n), a join against the
    * per-doc char lengths, and a 3-column pivot. The (doc, n, gram) shuffle
    * key is as skew-free as the corpus itself (grams are doc-scoped — no
    * corpus-wide hot key is possible by construction).
    *
    * @return (idCol, top_2gram_char_frac, top_3gram_char_frac,
    *         top_4gram_char_frac)
    */
  def topNgramCharFractions(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val ns = Seq(2, 3, 4)
    val grams = allPositionGramRows(docs, ns, idCol, textCol, "topNgramCharFractions")
    val counts = grams.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
    // argmin over (-cnt, gram): highest count, lexicographically-smallest
    // gram on ties — one deterministic row per (doc, n), no window sort
    val top = counts
      .groupBy("doc_id", "n")
      .agg(min(struct((-col("cnt")).as("neg_cnt"), col("gram").as("gram"))).as("top"))
      .select(col("doc_id"), col("n"),
        ((-col("top.neg_cnt")) * length(col("top.gram"))).as("covered"))
    pivotCharFractions(docs, top, ns, n => s"top_${n}gram_char_frac", idCol, textCol, "topNgramCharFractions")
  }

  /** The duplicate-n-gram arm of Gopher's repetition family: for n in
    * {5..10}, the fraction of the document's characters covered by ALL
    * n-grams that occur more than once within it —
    * `sum over grams with cnt >= 2 of cnt × length(gram) / length(text)`.
    * Where [[topNgramCharFractions]] flags one dominant phrase, this flags
    * diffuse self-repetition (templated sections, loops of paragraphs)
    * that no single gram dominates.
    *
    * Same pinned tokenization/arithmetic contract as
    * [[topNgramCharFractions]] (class trim, overlapping positions, exact
    * integer products, one IEEE division; overlap can push past 1.0), same
    * scale shape: one narrow kernel pass for all six n, map-side-combinable
    * count groupBy, a per-(doc,n) sum, a pivot.
    *
    * @return (idCol, dup_5gram_char_frac .. dup_10gram_char_frac)
    */
  def dupNgramCharFractions(docs: DataFrame, idCol: String = "doc_id",
                            textCol: String = "text"): DataFrame = {
    val ns = Seq(5, 6, 7, 8, 9, 10)
    val grams = allPositionGramRows(docs, ns, idCol, textCol, "dupNgramCharFractions")
    val dupCovered = grams.groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2)
      .groupBy("doc_id", "n")
      .agg(sum(col("cnt") * length(col("gram"))).as("covered"))
    pivotCharFractions(docs, dupCovered, ns, n => s"dup_${n}gram_char_frac", idCol, textCol, "dupNgramCharFractions")
  }

  /** BOTH n-gram repetition families in ONE DOC-LOCAL kernel pass — the
    * top-2/3/4 fractions of [[topNgramCharFractions]] and the dup-5..10
    * fractions of [[dupNgramCharFractions]], column-identical to running
    * the two operators separately (property-tested, incl. constructed
    * max-count-tie docs where only the lexicographic tie-break decides).
    *
    * Scale shape: both statistics are DOCUMENT-scoped — no count ever
    * crosses documents — so the whole computation runs inside the per-doc
    * map on the token array the tokenizer already holds: a reused
    * open-addressed 64-bit-gram-hash tally per n, the argmax/tie-break and
    * duplicated-mass folds, and the final divisions ([[graft.core.GramTally]]).
    * ZERO exchange — the previous shape shuffled ~9 gram rows per token;
    * this one moves nothing and needs no pivot or length join. Gram
    * identity is hashed (same accepted 64-bit collision trade as
    * substring-dup) with the pinned lexicographically-smallest-gram
    * tie-break resolved locally in UTF-8 byte order, re-extracting strings
    * only for tied-at-max classes. Per-task memory stays O(tokens of one
    * doc) — the tokenizer's own bound. This is what CleanPipeline's Gopher
    * gates call; the separate operators keep the independent exchange-based
    * implementation as the API and DuckDB-oracle surface, so the parity
    * property test compares two genuinely different implementations.
    */
  def ngramRepetitionFractions(docs: DataFrame, idCol: String = "doc_id",
                               textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val base = docs.select(
      safeLongId(idCol, "ngramRepetitionFractions").as("doc_id"),
      col(textCol).cast("string").as("t"))
    graft.operators.Spread(base)
      .as[(Long, String)]
      .map { case (id, text) =>
        val raw = if (text == null) "" else text
        val t = wsClassTrim(raw)
        val masses =
          if (t.isEmpty) new Array[Long](9)
          else graft.core.GramTally.coveredMasses(graft.operators.Dedup.WsPattern.split(t))
        // same base as pivotCharFractions: CODEPOINT length of the RAW
        // (untrimmed) text; gram-less docs (or empty text) score 0.0
        val totalChars = raw.codePointCount(0, raw.length)
        def frac(i: Int): Double =
          if (masses(i) == 0L || totalChars == 0) 0.0
          else masses(i).toDouble / totalChars.toDouble
        (id, frac(0), frac(1), frac(2), frac(3), frac(4), frac(5), frac(6), frac(7), frac(8))
      }
      .toDF(idCol, "top_2gram_char_frac", "top_3gram_char_frac", "top_4gram_char_frac",
        "dup_5gram_char_frac", "dup_6gram_char_frac", "dup_7gram_char_frac",
        "dup_8gram_char_frac", "dup_9gram_char_frac", "dup_10gram_char_frac")
  }

  /** Gopher's remaining document-shape quality filters (beyond
    * [[withQualityColumns]]'s length/punct/stopword ratios and the two
    * repetition-fraction operators):
    *
    *   bullet_line_frac   = lines starting `[ \t]*[-*] ` / lines
    *   ellipsis_line_frac = lines ending `...` (plus trailing ws) / lines
    *   symbol_word_ratio  = ('#' chars + '...' occurrences) / words
    *   alpha_word_frac    = words containing an ASCII letter / words
    *
    * (Gopher's cuts: bullet > 0.9, ellipsis > 0.3, symbol > 0.1,
    * alpha < 0.8 — thresholds are the caller's policy.)
    *
    * Exact + DuckDB-replayable: two narrow explode+count aggregations
    * (lines; non-empty ws-class words) joined per doc, integer counts,
    * IEEE divisions. Per-line/per-word predicates are evaluated on the
    * exploded element — never a multiline flag over the whole text. The
    * ellipsis check is a SUFFIX test after rtrim of `[ \t\r]`, NOT a `$`
    * anchor: Java's non-MULTILINE `$` still matches before a trailing
    * line terminator (a CRLF corpus's "foo...\r" line) while RE2's `$`
    * does not — an anchor here silently breaks oracle parity. The bullet
    * `^` anchor has no such corner (both engines: start of text only).
    * Null text is treated as "" (one empty line, zero words) so every
    * input doc gets an output row. No higher-order lambdas.
    *
    * @return (idCol, n_lines, n_words, bullet_line_frac,
    *         ellipsis_line_frac, symbol_word_ratio, alpha_word_frac)
    */
  def gopherQualitySignals(docs: DataFrame, idCol: String = "doc_id",
                           textCol: String = "text"): DataFrame = {
    val base = graft.operators.Spread(
      docs.select(safeLongId(idCol, "gopherQualitySignals").as("doc_id"),
        coalesce(col(textCol).cast("string"), lit("")).as("t")))
    val lineAgg = base
      .select(col("doc_id"), explode(split(col("t"), "\n")).as("line"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        sum(when(col("line").rlike("^[ \t]*[-*] "), 1L).otherwise(0L)).as("n_bullet"),
        sum(when(rtrim(col("line"), " \t\r").endsWith("..."), 1L).otherwise(0L)).as("n_ellipsis_lines"))
    val wordAgg = base
      .select(col("doc_id"),
        explode(split(col("t"), "[ \t\n\u000b\f\r]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_words"),
        sum(when(col("word").rlike("[A-Za-z]"), 1L).otherwise(0L)).as("n_alpha_words"),
        sum(length(col("word")) - length(replace(col("word"), lit("#"), lit("")))).as("n_hash"),
        sum((length(col("word")) - length(replace(col("word"), lit("..."), lit("")))) / 3).as("n_dotruns"))
    lineAgg.join(wordAgg, Seq("doc_id"), "left")
      .select(
        col("doc_id").as(idCol),
        col("n_lines"),
        coalesce(col("n_words"), lit(0L)).as("n_words"),
        (col("n_bullet").cast("double") / col("n_lines").cast("double")).as("bullet_line_frac"),
        (col("n_ellipsis_lines").cast("double") / col("n_lines").cast("double")).as("ellipsis_line_frac"),
        when(coalesce(col("n_words"), lit(0L)) === 0, lit(0.0))
          .otherwise((coalesce(col("n_hash"), lit(0L)) + coalesce(col("n_dotruns"), lit(0L))).cast("double") /
            col("n_words").cast("double")).as("symbol_word_ratio"),
        when(coalesce(col("n_words"), lit(0L)) === 0, lit(0.0))
          .otherwise(coalesce(col("n_alpha_words"), lit(0L)).cast("double") /
            col("n_words").cast("double")).as("alpha_word_frac"))
  }

  /** Quality-scoring columns (length / punctuation / stopword signals).
    * All per-row double arithmetic — deterministic and oracle-comparable.
    * Stopword counting and token-length summing run through the custom
    * codegen'd [[CountInVocab]]/[[SumCharLengths]] expressions — the
    * higher-order `filter`/`aggregate` Column lambdas they replace evaluate
    * INTERPRETED per element (CLAUDE.md sharp edge), which does NOT run at
    * scan speed over 100 TB.
    */
  def withQualityColumns(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(trim(t), "\\s+")
    val nToks = when(length(trim(t)) === 0, lit(0)).otherwise(size(toks))
    val nStop = TextExprs.vocabCount(toks, stopwords, lowercase = true)
    val nPunct = length(t) - length(regexp_replace(t, "[^A-Za-z0-9\\s]", ""))
    docs
      .withColumn("n_tokens", nToks.cast("long"))
      .withColumn("n_punct", nPunct.cast("long"))
      .withColumn(
        "punct_ratio",
        when(length(t) === 0, lit(0.0)).otherwise(nPunct.cast("double") / length(t))
      )
      .withColumn(
        "stopword_ratio",
        when(nToks === 0, lit(0.0)).otherwise(nStop.cast("double") / nToks)
      )
      .withColumn(
        "mean_token_len",
        when(nToks === 0, lit(0.0))
          .otherwise(TextExprs.sumCharLengths(toks).cast("double") / nToks)
      )
  }

  /** Language-ID heuristic: score each candidate language by its
    * function-word hit rate over the token set and pick the argmax
    * (deterministic tie-break by language code). Marker counting is the
    * codegen'd [[CountInVocab]] expression (one pass per language over the
    * split array — no interpreted lambda); a real system would swap in a
    * fastText-style model here.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "los", "del", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "den", "ein"),
    "fr" -> Seq("le", "la", "les", "des", "et", "est", "une", "dans", "que", "pour"),
    "zh" -> Seq("de", "shi", "le", "zai", "wo", "you", "he", "ta", "men", "zhe")
  )

  def withLangId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = split(lower(trim(col(textCol))), "\\s+")
    val nToks = when(length(trim(col(textCol))) === 0, lit(1)).otherwise(size(toks))
    val scored = langMarkers.map { case (lang, markers) =>
      struct(
        (TextExprs.vocabCount(toks, markers).cast("double") / nToks).as("score"),
        lit(lang).as("lang")
      )
    }
    // greatest over (score, lang) structs: max score, ties broken by the
    // LARGEST lang code (struct ordering compares score first, then lang).
    // greatest() is codegen'd; array_sort would drag an interpreted
    // comparator lambda into the plan.
    val best = greatest(scored: _*)
    docs.withColumn("lang_pred", best.getField("lang"))
      .withColumn("lang_score", best.getField("score"))
  }

  /** 64-bit document fingerprint: polynomial rolling hash (Rabin–Karp style,
    * base 1000003, wrapping u64) over the normalized token stream. Two docs
    * with identical token streams get identical fingerprints regardless of
    * original whitespace/punctuation — a cheap exact-dup key that is robust
    * to formatting. Narrow typed map; no shuffle.
    */
  def fingerprint64(tokens: Iterator[String]): Long = {
    var h = 1469598103934665603L // FNV offset basis as init
    while (tokens.hasNext) {
      val t = tokens.next()
      var i = 0
      while (i < t.length) {
        h = h * 1000003L + (t.charAt(i) & 0xff)
        i += 1
      }
      h = h * 1000003L + ' '
    }
    h
  }

  def fingerprints(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, t) =>
        (id, fingerprint64(graft.core.Tokenizer.tokenize(if (t == null) "" else t).iterator))
      })
      .toDF(idCol, "fingerprint")
  }
}
