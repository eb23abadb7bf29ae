package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextHash._

/** Fixed-window document chunking with stride overlap — the
  * pretraining/RAG preprocessing step that turns long documents into
  * model-sized token windows (public practice: context-window packing
  * and retrieval chunking; the reference has no document stage, this
  * extends the engine's training-data surface).
  *
  * Scale design (100 TB): pure per-row expression work — the chunk
  * structs are built with `transform(sequence(...))` and exploded
  * map-side, so chunking runs at scan speed with no shuffle and
  * output partitioning inherits the input's. A document with W words
  * emits ceil(max(W−size,0)/stride)+1 chunks; every chunk except
  * possibly the last has exactly `chunkSize` tokens and consecutive
  * chunks overlap by `chunkSize − stride` tokens.
  */
object Chunking {

  /** Explode each document into (chunk_idx, chunk_text, n_tokens)
    * rows. `chunkSize` = tokens per chunk, `stride` = distance
    * between chunk starts (stride < chunkSize ⇒ overlapping windows).
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
             chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize > 0 && stride > 0 && stride <= chunkSize,
      s"need 0 < stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    val w = words(col(textCol))
    val nW = size(w)
    // ceil((nW - chunkSize) / stride) + 1 chunks, min 1 (short docs);
    // the double division is exact at any real document length
    val nChunks = when(nW <= chunkSize, lit(1))
      .otherwise(ceil((nW - chunkSize).cast("double") / stride).cast("int") + 1)
    val chunkStructs = transform(
      sequence(lit(0), nChunks - 1),
      i => struct(
        i.cast("int").as("chunk_idx"),
        array_join(slice(w, i * stride + 1, lit(chunkSize)), " ").as("chunk_text"),
        size(slice(w, i * stride + 1, lit(chunkSize))).as("n_tokens")))
    df.select(col(idCol).as("doc_id"), explode(chunkStructs).as("c"))
      .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk_text"),
        col("c.n_tokens"))
  }

  /** Contiguous sequence packing: concatenate the corpus in doc-id
    * order and cut it into fixed `seqLen`-token training sequences
    * (the standard pretraining "concat then split" packing — no
    * padding waste, documents may cross sequence boundaries). Each
    * document is assigned the sequence it starts in, its offset
    * within that sequence, and how many sequences it spans.
    *
    * Scale design (100 TB): the global ordered cumulative sum would
    * be a single-task window — instead it rides
    * [[graft.ops.PrefixSum.withRunningSum]]'s two-phase distributed
    * form (range partitioning + O(partitions) driver metadata), the
    * same machinery as `dollar_bars_scalable`. Token counts are exact
    * integers, so the decimal prefix sum and every derived division
    * are engine-exact.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = df.select(col(idCol).as("doc_id"),
        size(words(col(textCol))).as("n_tok"))
      .withColumn("__tok", col("n_tok").cast(org.apache.spark.sql.types.DecimalType(20, 0)))
      .withColumn("__g", lit(0))
    val cum = graft.ops.PrefixSum.withRunningSum(base, "__g", Seq("doc_id"),
      "__tok", "__cum")
    cum.select(col("doc_id"), col("n_tok"),
        col("__cum").cast("long").as("cum_tokens"))
      .withColumn("seq_id", expr(s"(cum_tokens - n_tok) div $seqLen"))
      .withColumn("seq_off", pmod(col("cum_tokens") - col("n_tok"), lit(seqLen)).cast("long"))
      .withColumn("n_seqs", expr(s"((cum_tokens - 1) div $seqLen) - seq_id + 1"))
  }
}
