package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash.words

/** Byte-pair-encoding tokenizer TRAINING and encoding (Sennrich,
  * Haddow, Birch 2016 — "Neural Machine Translation of Rare Words
  * with Subword Units"), the vocabulary-construction step every LLM
  * data pipeline runs before token counting and sequence packing.
  * (The reference has no tokenizer stage; this extends the engine's
  * training-data surface.)
  *
  * Representation: each distinct word is a space-delimited symbol
  * string (`"low"` → `" l o w"`). Applying a merge (a, b) is a LEFT
  * FOLD over the symbols: append each symbol, but when the
  * accumulator ends with token `a` (delimiter-checked) and the next
  * symbol is `b`, concatenate instead — greedy left-to-right
  * NON-OVERLAPPING merging, which is exactly the BPE rule including
  * adjacent repeats (`"aaaa"` under (a,a) → `aa aa`, not `aa a a` —
  * a plain string replace gets this wrong because the shared
  * delimiter of back-to-back matches is consumed by the first). The
  * freshly merged token can never false-trigger as a left partner in
  * the same pass: it equals `a+b`, and a delimiter-checked suffix
  * match of ` a` inside `a+b` would need a space inside a token.
  * The oracle restates the identical fold via `list_reduce`.
  *
  * Scale (100 TB): training never touches the corpus after the first
  * word count — iterations run on the DISTINCT-WORD table (Zipf:
  * orders of magnitude smaller than the corpus, the standard BPE
  * trick of weighting by word frequency). Each merge is one
  * pair-count aggregation (map-side partial) + a 1-row argmax to the
  * driver + a map-side fold; the word table is localCheckpointed per
  * iteration so lineage stays O(1) (the CC-loop pattern). Encoding
  * joins the corpus against the trained word→token-count dictionary —
  * per-word work happens once per DISTINCT word, not per occurrence.
  */
object Bpe {

  /** Trained state: the merge list (rank, a, b, weighted count at
    * selection) and the word table (word, cnt, s) with `s` the
    * fully-merged symbol string.
    */
  final case class BpeModel(merges: Seq[(Int, String, String, Long)],
                            wordTable: DataFrame)

  /** `" l o w"` spaced-symbol form of a word. Code-POINT split (the
    * lookbehind — see TextStats.charEntropy): a bare "" split halves
    * astral chars into surrogate pairs and diverges from the oracle's
    * code-point `string_split`.
    */
  def spaced(w: Column): Column =
    concat(lit(" "),
      array_join(filter(split(w, "(?s)(?<=.)"), c => length(c) > 0), " "))

  /** Symbols of a spaced string (drops the delimiter empties). */
  private def symsOf(s: Column): Column =
    filter(split(s, " "), x => length(x) > 0)

  /** One BPE merge pass (a, b) as a left fold — see object doc. */
  private def applyMerge(s: Column, a: String, b: String): Column =
    aggregate(symsOf(s), lit(""), (acc, t) =>
      when(endswith(acc, lit(s" $a")) && t === b, concat(acc, lit(b)))
        .otherwise(concat(acc, lit(" "), t)))

  /** Distinct words of the corpus with occurrence counts. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(lower(trim(col(textCol))))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of the spaced form as structs (a, b);
    * empty for words with fewer than two symbols.
    */
  private def pairCol(s: Column): Column = {
    val syms = symsOf(s)
    when(size(syms) < 2, array().cast("array<struct<a:string,b:string>>"))
      .otherwise(zip_with(
        slice(syms, lit(1), size(syms) - 1),
        slice(syms, lit(2), size(syms) - 1),
        (a, b) => struct(a.as("a"), b.as("b"))))
  }

  /** Train `numMerges` BPE merges; see [[BpeModel]]. Ties break on
    * (count DESC, a ASC, b ASC) — total order, deterministic. Stops
    * early if no pair remains.
    */
  def train(df: DataFrame, textCol: String, numMerges: Int): BpeModel = {
    var cur = wordCounts(df, textCol)
      .withColumn("s", spaced(col("word")))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var i = 0
    var exhausted = false
    while (i < numMerges && !exhausted) {
      val top = cur
        .select(col("cnt"), explode(pairCol(col("s"))).as("p"))
        .groupBy(col("p.a"), col("p.b"))
        .agg(sum(col("cnt")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i + 1, a, b, n))
        cur = cur.withColumn("s", applyMerge(col("s"), a, b)).localCheckpoint()
        i += 1
      }
    }
    BpeModel(merges.result(), cur)
  }

  /** (word, toks) dictionary from the trained word table. */
  def wordTokenCounts(model: BpeModel): DataFrame =
    model.wordTable.select(col("word"), size(symsOf(col("s"))).as("toks"))

  /** Per-document BPE token counts under the trained model:
    * (doc_id, n_words, bpe_tokens, tokens_per_word). The corpus
    * explodes to (doc, word) pairs and joins the word→count
    * dictionary — tokenization cost is paid once per DISTINCT word
    * at training time, and the join carries one small int per word
    * occurrence. Counts cover in-vocabulary words (for the training
    * corpus itself, that is every word).
    */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
                   model: BpeModel): DataFrame =
    df.select(col(idCol).as("doc_id"),
        explode(words(lower(trim(col(textCol))))).as("word"))
      .join(wordTokenCounts(model), "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum(col("toks")).cast("int").as("bpe_tokens"))
      .withColumn("tokens_per_word",
        col("bpe_tokens").cast("double") / col("n_words"))
}
