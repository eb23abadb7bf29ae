package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash.words

/** WordPiece-style ENCODING (Wu et al. 2016 / Devlin et al. 2018 —
  * greedy longest-match-first subword tokenization) over a
  * BPE-trained piece vocabulary: the standard "BPE vocab + WordPiece
  * matcher" combination production tokenizers run. Pieces are
  * position-tagged (word-initial vs continuation — BERT's `##`
  * convention, kept as a boolean instead of a string prefix); a word
  * that greedy matching cannot cover becomes one `[UNK]` token, and
  * words longer than `maxWordLen` code units are `[UNK]` outright
  * (BERT's `max_chars_per_word` rule).
  *
  * Scale shape: identical to [[Bpe.encodeCounts]] — the greedy loop
  * runs once per DISTINCT word (Zipf-bounded), as ONE per-row fold
  * expression with the vocabulary inlined as two map literals (the
  * [[Dsir]] broadcast-as-literal discipline): zero joins, zero
  * shuffles, zero driver round-trips in the match itself. The corpus
  * pass is the same explode + dictionary join as BPE encode. The
  * fold is char-indexed (state advances when the index reaches the
  * next unconsumed position), so its step count is bounded by
  * `maxWordLen`, not by token count; the word length is bound to an
  * attribute BEFORE the lambda (the HOF inlining trap — an inlined
  * `length(word)` would re-walk the string per step).
  */
object Wordpiece {

  /** Position-tagged piece vocabulary of a trained BPE word table:
    * every symbol of every fully-merged word, tagged continuation
    * iff it is not word-initial.
    */
  def vocab(model: Bpe.BpeModel): DataFrame =
    model.wordTable
      .select(posexplode(filter(split(col("s"), " "), x => length(x) > 0))
        .as(Seq("j", "piece")))
      .select(col("piece"), (col("j") > 0).as("cont"))
      .distinct()

  private def literalSet(pieces: Seq[String]): Column =
    if (pieces.isEmpty)
      map_from_arrays(array().cast("array<string>"), array().cast("array<int>"))
    else map(pieces.flatMap(p => Seq(lit(p), lit(1))): _*)

  /** (word, toks, unk) for every distinct corpus word under greedy
    * longest-match against `vs` (piece, isContinuation) — exposed
    * separately for specs.
    */
  def wordTokenCounts(df: DataFrame, textCol: String,
                      vs: Seq[(String, Boolean)],
                      maxWordLen: Int): DataFrame = {
    require(vs.nonEmpty, "empty wordpiece vocabulary")
    val maxPiece = vs.map(_._1.length).max
    // bind each vocab map to ONE attribute: referencing the map
    // literal directly inside the fold would clone its 2·|V|-node
    // CreateMap into every probe (24 steps × maxPiece lengths),
    // exploding the expression tree Catalyst has to analyze; a
    // projected column constant-folds once and probes read the
    // attribute.
    val initM = col("__im")
    val contM = col("__cm")
    val w = col("word")
    val wordsDf = Bpe.wordCounts(df, textCol)
      .select(col("word")).withColumn("wlen", length(w))
      .withColumn("__im", literalSet(vs.collect { case (p, false) => p }))
      .withColumn("__cm", literalSet(vs.collect { case (p, true) => p }))
    val steps = sequence(lit(1), greatest(least(col("wlen"), lit(maxWordLen)), lit(1)))
    val init = struct(lit(1).as("pos"), lit(0).as("toks"),
      (col("wlen") > maxWordLen || col("wlen") === 0).as("unk"))
    val folded = aggregate(steps, init, (st, i) => {
      val active = !st("unk") && (st("pos") === i)
      // longest matching piece at position i (probes of l beyond the
      // word end degenerate to the remaining suffix; the advance uses
      // the ACTUAL matched length, so over-long probes are harmless)
      val m = (1 to maxPiece).foldLeft(lit(0)) { case (els, l) =>
        val sl = w.substr(i, lit(l))
        val hit = when(i === 1, map_contains_key(initM, sl))
          .otherwise(map_contains_key(contM, sl))
        when(hit, length(sl)).otherwise(els)
      }
      when(!active, st).otherwise(
        when(m > 0, struct((st("pos") + m).as("pos"),
          (st("toks") + 1).as("toks"), lit(false).as("unk")))
          .otherwise(struct(st("pos").as("pos"), st("toks").as("toks"),
            lit(true).as("unk"))))
    })
    wordsDf.withColumn("st", folded)
      .drop("__im", "__cm")
      .select(col("word"),
        when(col("st.unk"), lit(1)).otherwise(col("st.toks")).as("toks"),
        col("st.unk").as("unk"))
  }

  /** Per-document WordPiece token counts under the BPE-derived
    * vocabulary: (doc_id, n_words, wp_tokens, unk_words). An UNK
    * word contributes exactly one token.
    */
  def encodeCounts(df: DataFrame, idCol: String, textCol: String,
                   model: Bpe.BpeModel, maxWordLen: Int = 24): DataFrame = {
    val vs = vocab(model).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toSeq.sorted
    val perWord = wordTokenCounts(df, textCol, vs, maxWordLen)
    df.select(col(idCol).as("doc_id"),
        explode(words(lower(trim(col(textCol))))).as("word"))
      .join(perWord, "word")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("int").as("n_words"),
        sum(col("toks")).cast("long").as("wp_tokens"),
        sum(when(col("unk"), 1L).otherwise(0L)).as("unk_words"))
  }
}
