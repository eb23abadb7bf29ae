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
  * string with sentinel spaces (`"low"` → `" l o w "`), so applying a
  * merge (a,b) is a LITERAL string replace `" a b "` → `" ab "` —
  * left-to-right, non-overlapping, which is exactly the BPE merge
  * rule and exactly what `replace()` does in both Spark and DuckDB
  * (the oracle unrolls the full training loop, kmeans_cells-style).
  *
  * Scale (100 TB): training never touches the corpus after the first
  * word count — iterations run on the DISTINCT-WORD table (Zipf:
  * orders of magnitude smaller than the corpus, the standard BPE
  * trick of weighting by word frequency). Each merge is one
  * pair-count aggregation (map-side partial) + a 1-row argmax to the
  * driver + a map-side replace; the word table is localCheckpointed
  * per iteration so lineage stays O(1) (the CC-loop pattern).
  * Encoding is a pure per-row expression — scan-speed, no shuffle.
  */
object Bpe {

  /** `" l o w "` spaced-symbol form of a word. */
  def spaced(w: Column): Column =
    concat(lit(" "),
      array_join(filter(split(w, ""), c => length(c) > 0), " "),
      lit(" "))

  /** Literal (non-regex) replace of merge (a, b): `" a b "` → `" ab "`. */
  private def applyMerge(s: Column, a: String, b: String): Column =
    call_function("replace", s, lit(s" $a $b "), lit(s" $a$b "))

  /** Distinct words of the corpus with occurrence counts. */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(words(lower(trim(col(textCol))))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol pairs of the spaced form as structs (a, b). */
  private def pairCol(s: Column): Column = {
    val syms = filter(split(s, " "), x => length(x) > 0)
    zip_with(
      slice(syms, lit(1), size(syms) - 1),
      slice(syms, lit(2), size(syms) - 1),
      (a, b) => struct(a.as("a"), b.as("b")))
  }

  /** Train `numMerges` BPE merges. Returns (rank, a, b, count) in
    * merge order — count is the weighted pair frequency at selection
    * time. Ties break on (count DESC, a ASC, b ASC) — total order,
    * deterministic. Stops early if no pair remains.
    */
  def train(df: DataFrame, textCol: String,
            numMerges: Int): Seq[(Int, String, String, Long)] = {
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
    merges.result()
  }

  /** Symbol count of one spaced word after folding all merges. */
  private def tokensOfWord(w: Column, merges: Seq[(Int, String, String, Long)]): Column = {
    val folded = merges.foldLeft(spaced(w)) { case (s, (_, a, b, _)) =>
      applyMerge(s, a, b)
    }
    size(filter(split(folded, " "), x => length(x) > 0))
  }

  /** Per-document BPE token counts under a trained merge list — a
    * pure map-side expression (the merge fold compiles into a chain
    * of `replace` calls, no UDF, no shuffle): (doc_id, n_words,
    * bpe_tokens, tokens_per_word).
    */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
                   merges: Seq[(Int, String, String, Long)]): DataFrame = {
    val ws = words(lower(trim(col(textCol))))
    df.select(col(idCol).as("doc_id"),
        size(ws).as("n_words"),
        aggregate(transform(ws, w => tokensOfWord(w, merges)),
          lit(0), (acc, x) => acc + x).as("bpe_tokens"))
      .withColumn("tokens_per_word",
        col("bpe_tokens").cast("double") / col("n_words"))
  }
}
