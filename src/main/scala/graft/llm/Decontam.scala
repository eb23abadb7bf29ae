package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Train/eval decontamination: flag training documents that share any
  * word n-gram with a held-out evaluation set — the published
  * benchmark-overlap filter (GPT-3 appendix C / PaLM style n-gram
  * collision; the reference pipeline has no curation stage, this
  * extends the engine's training-data surface).
  *
  * Scale design (100 TB): the held-out set is benchmark-sized (MBs,
  * not TBs), so its distinct gram-hash table is broadcast and the
  * training side never shuffles full text — each train document
  * explodes to (doc_id, gram_hash) pairs map-side, hits the broadcast
  * hash join, and only the surviving hits are aggregated (shuffle
  * keyed by doc_id, bounded by hit count, not corpus size). Gram
  * hashes are md5-derived 32-bit ([[TextHash.h32]]) so the DuckDB
  * oracle reproduces them bit-for-bit. For an eval set too large to
  * broadcast, swap the broadcast join for a bloom-filter pushdown on
  * gram_hash (`might_contain`, see RuntimeFilterSpec) followed by the
  * same exact join — contract unchanged.
  */
object Decontam {

  /** Distinct hashed word n-grams of `text`. Documents shorter than
    * `n` words yield an empty set (the `when` guard matters: Spark's
    * `sequence(1, 0)` would DESCEND, not return empty).
    */
  def gramHashes(text: Column, n: Int): Column = {
    val w = words(text)
    val cnt = size(w) - (n - 1)
    when(cnt <= 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), cnt),
        i => h32(array_join(slice(w, i, lit(n)), " ")))))
  }

  /** Per-train-document contamination report against `heldout`:
    * (doc_id, n_grams, n_overlap, contaminated). `n_overlap` counts
    * DISTINCT shared grams (gram sets are deduped per document).
    */
  def report(train: DataFrame, heldout: DataFrame, idCol: String,
             textCol: String, n: Int): DataFrame = {
    val trainG = train.select(col(idCol).as("doc_id"),
      gramHashes(col(textCol), n).as("grams"))
    val banned = heldout
      .select(explode(gramHashes(col(textCol), n)).as("g")).distinct()
    val overlap = trainG.select(col("doc_id"), explode(col("grams")).as("g"))
      .join(broadcast(banned), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_overlap"))
    trainG.join(overlap, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") > 0)
  }
}
