package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, language ID (stopword n-gram heuristic), quality scoring,
  * and document fingerprinting. All pure Column expressions
  * (whole-stage-codegen'd, no UDFs), so they run at scan speed and
  * column-prune to just the text column.
  */
object TextAnalysis {

  /** Whitespace tokens (empty-string trimmed). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: word-boundary pieces + digits + punctuation
    * treated as separate tokens (regex approximation of a byte-pair
    * tokenizer's pre-tokenization). Implemented as space-pad-each-punct +
    * whitespace split rather than lookaround splitting — identical counts,
    * and the pattern stays inside RE2's subset so the DuckDB oracle can
    * express the same computation.
    */
  def subwordCount(text: Column): Column =
    size(tokens(regexp_replace(text, "(\\p{Punct})", " $1 ")))

  /** Tiny per-language stopword lists for the n-gram/stopword language-ID
    * heuristic (public common-word lists).
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for", "with", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "de", "des", "est", "dans", "pour", "que"),
    "es" -> Seq("el", "la", "los", "las", "de", "que", "es", "en", "por", "con"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "个"))

  /** Stopword-hit count for one language over a lowercased token array. */
  private def hits(toks: Column, lang: String): Column =
    size(array_intersect(toks, array(Stopwords(lang).map(lit): _*))) +
      // zh has no whitespace tokens: count CHARACTER occurrences instead.
      // Σ_w count(w) == len(s) − len(translate(s, all_w, "")) — one
      // single-pass translate instead of one regexp_replace pass per
      // stopword character (10× less text scanning per row)
      (if (lang == "zh")
         (length(concat_ws(" ", toks)) -
           length(translate(concat_ws(" ", toks), Stopwords(lang).mkString, "")))
           .cast("int")
       else lit(0))

  /** Language-ID heuristic: argmax of per-language stopword hits.
    * Returns null when no language scores > 0.
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = Stopwords.keys.toSeq.sorted.map(l =>
      struct(hits(toks, l).as("score"), lit(l).as("lang")))
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang"))
  }

  /** Unrounded quality score in [0,1]: blend of length, punctuation ratio,
    * stopword ratio, and mean word length — the standard cheap
    * pretraining-quality signals. Every term is deterministic IEEE double
    * arithmetic in a fixed order, so an oracle computing the same formula
    * reproduces it bit-for-bit.
    */
  def qualityScoreRaw(text: Column): Column = {
    val n = length(text).cast("double")
    val toks = tokens(lower(text))
    val nTok = size(toks).cast("double")
    val punct = (n - length(regexp_replace(text, "\\p{Punct}", ""))).cast("double")
    val punctRatio = when(n > 0, punct / n).otherwise(0.0)
    val allStop = array(Stopwords.values.flatten.toSeq.distinct.map(lit): _*)
    val stopRatio = when(nTok > 0,
      size(array_intersect(toks, allStop)).cast("double") / nTok).otherwise(0.0)
    val meanWordLen = when(nTok > 0, n / nTok).otherwise(0.0)
    val lenScore = least(n / 500.0, lit(1.0))
    val punctScore = lit(1.0) - least(punctRatio * 5.0, lit(1.0))
    val stopScore = least(stopRatio * 4.0, lit(1.0))
    val wordScore = when(meanWordLen.between(3.0, 12.0), 1.0).otherwise(0.4)
    lenScore * 0.3 + punctScore * 0.3 + stopScore * 0.2 + wordScore * 0.2
  }

  /** Quality score rounded for presentation. */
  def qualityScore(text: Column): Column = round(qualityScoreRaw(text), 4)

  /** 64-bit document fingerprint over normalized text (case/whitespace
    * folded) — the rolling-hash fingerprint, using the codegen'd xxhash64.
    */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Gopher-style repetition signals per document: duplicate-word fraction
    * (1 − distinct/total) and top-token share (count of the most frequent
    * token / total) — the standard cheap filters for boilerplate and
    * degenerate/repetitive text in pretraining pipelines (Rae et al.,
    * "Scaling Language Models: ... Gopher", 2021, §A1.1 repetition
    * filters — public method).
    *
    * Shape: one explode + two hash aggregates — (doc, token) counts with
    * map-side combine, then a per-doc rollup; the shuffle carries
    * (id, token, count) rows, linear in corpus token volume, no per-doc
    * quadratic HOF and no window. Ratios are floor(x·1e6) on
    * double-widened longs in a fixed operand order, so a SQL oracle
    * reproduces them bit-for-bit. Empty/whitespace-only docs have no
    * tokens and drop out (both engines agree).
    */
  def repetitionProfile(df: DataFrame, idCol: String,
                        textCol: String = "text"): DataFrame = {
    val perTok = df
      .select(col(idCol), explode(tokens(lower(col(textCol)))).as("__t"))
      .groupBy(col(idCol), col("__t")).agg(count(lit(1)).as("__c"))
    perTok.groupBy(col(idCol))
      .agg(sum("__c").as("n_tokens"), count(lit(1)).as("n_distinct"),
        max("__c").as("__mx"))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        floor((col("n_tokens") - col("n_distinct")) * lit(1e6) / col("n_tokens"))
          .as("dup_ratio_1e6"),
        floor(col("__mx") * lit(1e6) / col("n_tokens")).as("top_share_1e6"))
  }

  /** Full document profile in one pass. */
  def profile(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_tokens", tokenCount(t))
      .withColumn("n_subwords", subwordCount(t))
      .withColumn("lang_pred", langId(t))
      .withColumn("quality", qualityScore(t))
      .withColumn("fingerprint", fingerprint(t))
  }
}
