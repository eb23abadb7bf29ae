package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash.words

/** The Gopher / MassiveWeb quality-rule bundle (Rae et al. 2021,
  * appendix A — the canonical public rule set later reused by
  * RedPajama/Dolma): per-document word count, mean word length,
  * symbol-to-word ratio, alphabetic-word fraction, and stopword
  * presence, each with the paper's thresholds, plus the conjunctive
  * pass flag. The engine already ships the statistical quality
  * signals (text_quality, repetition_stats, char_entropy,
  * lm_bigram_score); this adds the named RULE formulation those
  * pipelines gate on.
  *
  * Scale design (100 TB): pure per-row expression work over the text
  * column — no explode row-blowup (all folds are higher-order array
  * functions inside the projection), no shuffle, runs at scan speed
  * and composes with any downstream filter pushdown. Every ratio is
  * an exact integer pair divided once in DOUBLE, so the rule
  * verdicts are bit-deterministic across engines (Registry policy).
  *
  * On this synthetic word-soup corpus the ≥2-stopwords rule fails
  * uniformly (the tech vocabulary carries at most one of the paper's
  * stopwords per document, so single hits are common but the
  * threshold never fires) — a property of the data the oracle
  * verifies, not a softened threshold.
  */
object GopherRules {

  /** Gopher's stopword list (the paper's eight). */
  val Stopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** `(doc_id, n_words, mean_word_len, symbol_ratio, alpha_frac,
    * stop_hits, r_*, passes)` — one row per document, rules as 0/1.
    */
  def apply(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ws = words(lower(trim(col(textCol))))
    val base = df.select(col(idCol).as("doc_id"), ws.as("__ws"))
    val nWords = size(col("__ws")).cast("long")
    val sumWl = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + length(w).cast("long"))
    val symbolWords = size(filter(col("__ws"),
      w => w.contains("#") || w.contains("..."))).cast("long")
    val alphaWords = size(filter(col("__ws"),
      w => w.rlike("[a-z]"))).cast("long")
    val stopHits = size(array_intersect(
      array_distinct(col("__ws")),
      typedlit(Stopwords))).cast("long")

    val stats = base.select(col("doc_id"),
      nWords.as("n_words"),
      (sumWl.cast("double") / nWords.cast("double")).as("mean_word_len"),
      (symbolWords.cast("double") / nWords.cast("double")).as("symbol_ratio"),
      (alphaWords.cast("double") / nWords.cast("double")).as("alpha_frac"),
      stopHits.as("stop_hits"))

    val rules = Seq(
      "r_word_count" ->
        (col("n_words") >= 50 && col("n_words") <= 100000),
      "r_mean_word_len" ->
        (col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0),
      "r_symbol_ratio" -> (col("symbol_ratio") < 0.1),
      "r_alpha_frac" -> (col("alpha_frac") > 0.8),
      "r_stopwords" -> (col("stop_hits") >= 2))
    val withRules = rules.foldLeft(stats) { case (d, (name, cond)) =>
      d.withColumn(name, when(cond, 1).otherwise(0).cast("int"))
    }
    withRules.withColumn("passes",
      rules.map(r => col(r._1)).reduce(_ * _).cast("int"))
  }
}
