package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cross-document span-level deduplication with document rewrite —
  * the CCNet/RefinedWeb paragraph-dedup step: boilerplate spans that
  * repeat across the corpus (headers, navigation, license blurbs) are
  * removed from every occurrence but the first, and each document is
  * reassembled from its surviving spans. The testdata documents are
  * single-line, so "paragraphs" are fixed non-overlapping word
  * windows riding [[Chunking.chunks]] (stride = size).
  *
  * Scale design (100 TB): chunking is map-side explode (scan-speed);
  * the first-occurrence decision is ONE hash shuffle on the span
  * digest (row_number over md5 groups — groups are duplicate sets,
  * almost always tiny, and a degenerate mega-span group costs the
  * window sort of that single partition's group, not a cross-node
  * blowup); reassembly is one shuffle back on doc_id. Payload after
  * chunking is (doc, idx, span) — no full-document rows ever shuffle
  * twice. First-occurrence order is (doc_id, chunk_idx) — engine-
  * portable string ordering, no numeric-id assumption.
  */
object ParagraphDedup {

  /** Rewrite each document with corpus-duplicated spans removed
    * (first occurrence in (doc_id, chunk_idx) order survives; a
    * document repeating its own span also loses the repeats).
    * Emits `(doc_id, n_chunks, kept_chunks, new_len, new_hash)` —
    * the rewritten text is carried as md5 + length so the output
    * stays compact while remaining fully value-checked.
    */
  def rewrite(df: DataFrame, idCol: String, textCol: String,
              spanWords: Int = 20): DataFrame = {
    require(spanWords > 0, s"spanWords must be positive, got $spanWords")
    val lowered = df.withColumn(textCol, lower(trim(col(textCol))))
    val spans = Chunking.chunks(lowered, idCol, textCol,
      chunkSize = spanWords, stride = spanWords)

    val firstSeen = Window
      .partitionBy(md5(col("chunk_text")))
      .orderBy(col("doc_id"), col("chunk_idx"))

    spans
      .withColumn("__keep", row_number().over(firstSeen) === 1)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_chunks"),
        count(when(col("__keep"), 1)).as("kept_chunks"),
        // collect_list drops the nulls from non-kept spans; struct
        // sort restores document order before reassembly
        array_join(
          transform(
            array_sort(collect_list(
              when(col("__keep"), struct(col("chunk_idx"), col("chunk_text"))))),
            s => s.getField("chunk_text")),
          " ").as("__new_text"))
      .select(
        col("doc_id"), col("n_chunks"), col("kept_chunks"),
        length(col("__new_text")).cast("long").as("new_len"),
        md5(col("__new_text")).as("new_hash"))
  }
}
