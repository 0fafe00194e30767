package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions._

/** Text analysis for training-data curation: language ID, quality scoring,
  * token counting, and document fingerprinting — all built from codegen'd
  * Catalyst expressions (graft.functions), so the whole feature set is
  * computed in the scan stage of a 100 TB read with zero shuffles. */
object TextAnalysis {

  /** Append the standard text-feature columns to `df`. All ratio/score/
    * language features derive from ONE native text-statistics pass
    * (graft.plans.TextStats) — the struct column is computed once per row
    * and every feature is arithmetic over its fields. Formulas match the
    * declarative versions in graft.functions exactly (DuckDB-oracle-
    * checked). */
  def withTextFeatures(df: DataFrame, textCol: String): DataFrame = {
    val d = df.withColumn("__ts", textStats(col(textCol)))
    val nTok = col("__ts.n_tokens")
    val swRaw = when(nTok === 0, 0.0)
      .otherwise(col("__ts.n_stopwords").cast("double") / nTok)
    val punctRaw = when(col("__ts.n_nonws") === 0, 0.0)
      .otherwise(col("__ts.n_punct").cast("double") / col("__ts.n_nonws"))
    val meanLen = when(nTok === 0, 0.0)
      .otherwise(col("__ts.sum_token_len").cast("double") / nTok)
    val lenScore = least(col("__ts.text_len").cast("double") / 200.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRaw * 4.0, lit(1.0))
    val swScore = least(swRaw * 4.0, lit(1.0))
    val scored = Seq("de", "en", "es", "fr", "it").map(l => l -> col(s"__ts.m_$l"))
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    val lang = scored.foldRight(lit("und")) { case ((l, s), els) =>
      when(s > 0 && s === best, lit(l)).otherwise(els)
    }
    d.withColumn("n_tokens", nTok)
      .withColumn("n_tokens_bpe",
        floor(col("__ts.n_alnum_runs").cast("double") * 1.3 +
          col("__ts.n_punct").cast("double")).cast("long"))
      .withColumn("stopword_ratio", round(swRaw, 6))
      .withColumn("punct_ratio", round(punctRaw, 6))
      .withColumn("mean_token_len", round(meanLen, 6))
      .withColumn("quality", round((lenScore + punctScore + swScore) / 3.0, 6))
      .withColumn("lang_pred", lang)
      .withColumn("fingerprint", fingerprint64(col(textCol)))
      .drop("__ts")
  }

  /** Intra-document repetition features (the Gopher/MassiveText-style
    * repetition quality filters: a document whose n-grams repeat heavily
    * is boilerplate/spam, not prose). For each doc: the fraction of
    * duplicate word 2-grams and 3-grams among all its n-grams. Pure
    * array arithmetic over one tokenization — computed in the scan
    * stage, zero shuffles, same formula as the DuckDB oracle (t86). */
  def withRepetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    // One native pass (graft.plans.RepetitionStats) computes total +
    // distinct 2-/3-gram counts; ratios stay declarative arithmetic over
    // the struct. The kernel replaced a concat_ws/array_distinct chain
    // that cost 447 s over the 10M-doc pipeline corpus; the declarative
    // form is kept below and spec-pinned equal (RetrievalShardSpec).
    val rs = col("__rs")
    def ratio(total: Column, distinct: Column) =
      when(total === 0, lit(0.0))
        .otherwise((total - distinct).cast("double") / total)
    df.withColumn("__rs", repetitionStats(col(textCol)))
      .withColumn("n_bigrams", col("__rs.n_bigrams"))
      .withColumn("dup_bigram_ratio",
        round(ratio(rs.getField("n_bigrams"), rs.getField("n_distinct_bigrams")), 6))
      .withColumn("dup_trigram_ratio",
        round(ratio(rs.getField("n_trigrams"), rs.getField("n_distinct_trigrams")), 6))
      .drop("__rs")
  }

  /** The pre-kernel declarative formulation — retained as the semantic
    * reference the native kernel is spec-pinned against. */
  private[graft] def withRepetitionFeaturesDeclarative(
      df: DataFrame, textCol: String): DataFrame = {
    // Materialize the token array in its own projection: referencing the
    // raw split(...) expression inside the transform() lambdas would
    // re-run the regex split PER N-GRAM ELEMENT (O(tokens) splits per
    // document — measured 270s vs 3s on the 100k-doc corpus). Catalyst's
    // CollapseProject keeps the alias because a non-cheap producer
    // referenced more than once is not inlined.
    val toks = col("__toks")
    // sequence(1, k) DESCENDS when k < 1, so guard short docs explicitly
    def ngrams(n: Int) =
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + lit(j))): _*)))
        .otherwise(array().cast("array<string>"))
    def dupRatio(g: org.apache.spark.sql.Column) =
      when(size(g) === 0, lit(0.0))
        .otherwise((size(g) - size(array_distinct(g))).cast("double") / size(g))
    df.withColumn("__toks", split(lower(trim(col(textCol))), "\\s+"))
      .withColumn("__bg", ngrams(2)).withColumn("__tg", ngrams(3))
      .withColumn("n_bigrams", size(col("__bg")).cast("long"))
      .withColumn("dup_bigram_ratio", round(dupRatio(col("__bg")), 6))
      .withColumn("dup_trigram_ratio", round(dupRatio(col("__tg")), 6))
      .drop("__toks", "__bg", "__tg")
  }

  /** Repetition filter at the (pragmatic) Gopher-flavored thresholds:
    * drop documents whose duplicate-2-gram fraction exceeds 0.2 or
    * duplicate-3-gram fraction exceeds 0.18. */
  def repetitionFilter(df: DataFrame, textCol: String): DataFrame =
    withRepetitionFeatures(df, textCol)
      .filter(col("dup_bigram_ratio") <= 0.2 && col("dup_trigram_ratio") <= 0.18)

  /** Quality filter: the keep/drop decision a curation pipeline applies
    * after scoring (kept as a separate step so the score itself stays
    * inspectable). */
  def qualityFilter(df: DataFrame, textCol: String, minQuality: Double): DataFrame =
    withTextFeatures(df, textCol).filter(col("quality") >= minQuality)

  /** PII patterns for training-corpus scrubbing, ordered most- to
    * least-specific so earlier redactions can't be re-matched by later
    * patterns (the replacement tokens contain no digits or '@'). Kept to
    * the regex subset Java and RE2 share (no lookaround), so the same
    * pattern text runs on any engine in the pipeline. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b", "<IP>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}[-. ]\\d{3}[-. ]\\d{4}\\b", "<PHONE>"))

  /** Per-document PII hit counts (`n_email`, `n_ipv4`, …) — the audit
    * side of redaction; all four `regexp_count`s are codegen'd
    * expressions in the scan stage, no shuffle. */
  def withPiiCounts(df: DataFrame, textCol: String): DataFrame =
    PiiPatterns.foldLeft(df) { case (d, (name, pat, _)) =>
      d.withColumn(s"n_$name", regexp_count(col(textCol), lit(pat)).cast("long"))
    }

  /** Redact PII in place: chained `regexp_replace`s (email → ipv4 → ssn →
    * phone; ssn before phone so `123-45-6789` never half-matches the
    * looser phone shape). One projection, scan-stage, zero shuffles —
    * at 100 TB this is I/O-bound, exactly as a scrub pass should be. */
  def redactPii(df: DataFrame, textCol: String,
      outCol: String = "text_redacted"): DataFrame =
    df.withColumn(outCol,
      PiiPatterns.foldLeft(col(textCol)) { case (c, (_, pat, tok)) =>
        regexp_replace(c, pat, tok)
      })

  /** Fixed-size character chunks with overlap (the RAG / context-window
    * splitter): chunk i covers [1 + i*(size-overlap), +size). The last
    * chunk may be short; every character is covered; consecutive chunks
    * share exactly `overlap` characters. Pure scan-stage explode — the
    * per-document start list is array arithmetic, no shuffle; output rows
    * ≈ len/(size-overlap) per document. Emits (input columns) + chunk_id
    * (0-based) + chunk. */
  def chunkWithOverlap(df: DataFrame, textCol: String,
      size: Int, overlap: Int): DataFrame = {
    require(size > overlap && overlap >= 0,
      s"need size > overlap >= 0, got size=$size overlap=$overlap")
    val stride = size - overlap
    val n = ceil(greatest(length(col(textCol)) - overlap, lit(1))
      .cast("double") / stride).cast("int")
    df.withColumn("chunk_id", explode(sequence(lit(0), n - 1)))
      .withColumn("chunk",
        substring(col(textCol), lit(1) + col("chunk_id") * stride, lit(size)))
  }

  /** Unicode NFC normalization + whitespace collapse — the "fix the
    * crawl's encoding mess" pass (compose combining sequences so
    * `e`+U+0301 and precomposed `é` dedup/tokenize identically).
    * java.text.Normalizer via UDF: Spark has no NFC builtin (the
    * documented UDF exception — no built-in exists); still a scan-stage
    * projection, zero shuffles, I/O-bound at scale. */
  def normalizeUnicode(df: DataFrame, textCol: String,
      outCol: String = "text_nfc"): DataFrame = {
    val nfc = udf { (s: String) =>
      if (s == null) null
      else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    }
    df.withColumn(outCol,
      trim(regexp_replace(nfc(col(textCol)), "\\s+", " ")))
  }

  /** HTML/markup stripping — the crawl-to-text pass every web-scale
    * corpus starts with (reference pipelines do this in user ParDo code;
    * here it is a first-class scan-stage operator, zero shuffles).
    *
    * Order matters and is pinned:
    *   1. drop `<script>`/`<style>` blocks WITH their content (their text
    *      is code, not prose) and HTML comments;
    *   2. every remaining tag becomes a single space (so `a</p><p>b`
    *      keeps a word boundary);
    *   3. decode the common entities — `&amp;` strictly LAST, so the
    *      classic double-escape `&amp;lt;` yields the literal `&lt;` and
    *      never a phantom `<`;
    *   4. collapse whitespace and trim.
    * All chained `regexp_replace`/`replace` projections: codegen'd,
    * I/O-bound at 100 TB like the PII scrub. */
  def stripMarkup(df: DataFrame, textCol: String,
      outCol: String = "text_plain"): DataFrame = {
    val noBlocks = regexp_replace(col(textCol),
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, "<[^>]+>", " ")
    val entities = Seq("&nbsp;" -> " ", "&quot;" -> "\"", "&#39;" -> "'",
      "&lt;" -> "<", "&gt;" -> ">", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (c, (e, v)) =>
      regexp_replace(c, java.util.regex.Pattern.quote(e), v)
    }
    df.withColumn(outCol, trim(regexp_replace(decoded, "\\s+", " ")))
  }
}
