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
    // token array bound through a one-element lambda: inlining the
    // split into the chunk lambda would re-split the document once
    // per chunk (the gramHashes O(len²) lesson)
    val chunkStructs = element_at(transform(array(words(col(textCol))), w => {
      val nW = size(w)
      // ceil((nW - chunkSize) / stride) + 1 chunks, min 1 (short docs);
      // the double division is exact at any real document length
      val nChunks = when(nW <= chunkSize, lit(1))
        .otherwise(ceil((nW - chunkSize).cast("double") / stride).cast("int") + 1)
      transform(
        sequence(lit(0), nChunks - 1),
        i => struct(
          i.cast("int").as("chunk_idx"),
          array_join(slice(w, i * stride + 1, lit(chunkSize)), " ").as("chunk_text"),
          size(slice(w, i * stride + 1, lit(chunkSize))).as("n_tokens")))
    }), 1)
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
                    seqLen: Int): DataFrame =
    packByCounts(df.select(col(idCol),
      size(words(col(textCol))).as("__pack_tok")), idCol, "__pack_tok", seqLen)

  /** [[packSequences]] generalized to CALLER-SUPPLIED token counts —
    * the form a real pipeline needs once a trained tokenizer (BPE /
    * WordPiece) replaces the whitespace regex: pack by the counts the
    * training run will actually see. Same distributed PrefixSum
    * machinery, same output contract; `packSequences` is the
    * regex-count special case.
    */
  def packByCounts(df: DataFrame, idCol: String, countCol: String,
                   seqLen: Int): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val base = df.select(col(idCol).as("doc_id"),
        col(countCol).cast("int").as("n_tok"))
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

  /** Whole-document sequence packing by partition-local best-fit-
    * decreasing — the padding-minimizing complement of
    * [[packSequences]] (which splits documents across sequence
    * boundaries; this keeps every document INTACT inside one
    * sequence, the form instruction-tuning and contrastive pipelines
    * need, paying padding instead of splits). Documents longer than
    * `seqLen` are dropped (chunk them first); BFD carries the classic
    * 11/9·OPT + 1 decreasing-heuristic bound.
    *
    * Output: (doc_id, n_tok, bin_id) — bin_id globally unique
    * (partition id in the high bits).
    *
    * Scale (100 TB): docs hash-repartition into `partitions` balanced
    * groups and BFD runs INSIDE each partition: sort by token count
    * desc, place each doc in the FULLEST bin that still fits via a
    * free-space TreeMap — O(log bins) per document (a linear
    * first-fit scan is O(bins) per doc and goes quadratic in
    * partition size). Bins never cross partitions, so the pack is
    * embarrassingly parallel; the cost vs a global pack is at most
    * one underfilled tail bin per partition — O(partitions·seqLen)
    * wasted tokens total, vanishing at corpus scale. Deterministic:
    * hash repartitioning is content-keyed, in-partition order is
    * (n_tok desc, doc_id), and free-space ties break FIFO within the
    * free level.
    */
  def packBestFit(df: DataFrame, idCol: String, textCol: String,
                  seqLen: Int, partitions: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    // the long cast must be exact: a string/float id would yield nulls
    // (or truncation), which getLong below silently unboxes to 0,
    // collapsing every such doc onto doc_id 0 — reject at plan time,
    // and raise on null ids at run time rather than merge them
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long")
        .contains(idType.typeName),
      s"packBestFit: $idCol must be an integral type, got $idType")
    val spark = df.sparkSession
    import spark.implicits._
    val checkedId = when(col(idCol).isNull,
      raise_error(lit(s"packBestFit: null id in $idCol"))
    ).otherwise(col(idCol).cast("long"))
    val base = df.select(checkedId.as("doc_id"),
        size(words(col(textCol))).as("n_tok"))
      .filter(col("n_tok") > 0 && col("n_tok") <= seqLen)
    val parted =
      if (partitions > 0) base.repartition(partitions, col("doc_id"))
      else base.repartition(col("doc_id"))
    parted.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      val docs = it.map(r => (r.getLong(0), r.getInt(1))).toArray
        .sortBy { case (id, n) => (-n, id) }
      // free space → bin indices with that much room (FIFO per level);
      // best fit = smallest adequate free level = ceilingKey(n).
      // Keys must be BOXED Integers: with primitive Int keys Scala
      // unboxes ceilingKey's null ("no such level") to 0 and the null
      // check can never fire.
      val byFree =
        new java.util.TreeMap[Integer, scala.collection.mutable.Queue[Int]]()
      val binFree = scala.collection.mutable.ArrayBuffer.empty[Int]
      def enqueue(free: Int, bin: Int): Unit =
        byFree.computeIfAbsent(Int.box(free),
          _ => scala.collection.mutable.Queue.empty) += bin
      docs.iterator.map { case (id, n) =>
        val level = byFree.ceilingKey(Int.box(n))
        val b =
          if (level == null) { binFree += seqLen; binFree.length - 1 }
          else {
            val q = byFree.get(level)
            val bin = q.dequeue()
            if (q.isEmpty) byFree.remove(level)
            bin
          }
        binFree(b) -= n
        if (binFree(b) > 0) enqueue(binFree(b), b)
        (id, n, (pid << 32) | b.toLong)
      }
    }.toDF("doc_id", "n_tok", "bin_id")
  }
}
