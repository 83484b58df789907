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
