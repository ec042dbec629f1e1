package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Text-quality / language analysis for training-data pipelines.
  * Everything is per-row array-function work — no shuffle, fully
  * codegen'd, embarrassingly parallel at any scale.
  */
object TextAnalysis {

  val DefaultStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Per-document stats: token counts, distinct ratio, stopword ratio,
    * average token length, quality flag. All ratios are integer/integer →
    * bit-deterministic doubles.
    */
  def stats(docs: DataFrame, idCol: String, textCol: String,
            stopwords: Seq[String] = DefaultStopwords): DataFrame = {
    val toks = tokens(col(textCol))
    docs.select(
      col(idCol).as("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_distinct"),
      stopwordRatio(toks, stopwords).as("stop_ratio"),
      (aggregate(toks, lit(0L), (acc, t) => acc + length(t))
        .cast("double") / size(toks)).as("avg_tok_len"),
      (size(toks) >= 5 && size(toks) <= 100000 &&
        stopwordRatio(toks, stopwords) < 0.5).as("quality"))
  }

  /** Deterministic positional fingerprint per document (rolling-hash
    * analog, exact integer arithmetic).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      fingerprint(tokens(col(textCol))).as("fp"))

  /** Character n-gram profile based language ID heuristic. Scores each
    * language by stopword-lexicon hits and common-bigram hits; returns the
    * argmax (ties broken alphabetically). Profiles are tiny hardcoded
    * lexicons — at scale this broadcasts as literals inside codegen.
    */
  private val LangLexicons: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une", "est"),
    "es" -> Seq("el", "la", "los", "las", "es", "una", "que", "por"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val scored = LangLexicons.toSeq.sortBy(_._1).map { case (lang, lex) =>
      val lexArr = array(lex.map(lit): _*)
      struct(size(filter(toks, t => array_contains(lexArr, t))).as("score"),
        lit(lang).as("lang"))
    }
    // max_by over the score structs; alphabetical tie-break via reverse
    // lang sort inside greatest (greatest picks later lang on equal score,
    // so order langs descending to make ties resolve to the alphabetically
    // first).
    val best = scored.reduce((x, y) =>
      when(y.getField("score") > x.getField("score"), y).otherwise(x))
    when(best.getField("score") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  def withLangId(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("lang_guess", langId(col(textCol)))

  /** Token-count estimator: whitespace tokens plus a BPE-ish subword
    * estimate (ceil(chars/4) lower-bounded by word count) — the standard
    * cheap proxy for LLM token budgeting.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(tokens(col(textCol))).as("n_words"),
      greatest(size(tokens(col(textCol))).cast("long"),
        ceil(length(col(textCol)).cast("double") / 4.0)).as("est_bpe_tokens"))
}
