package graft.ingest

/** Offset-by-timestamp batch windowing — the reference's bounded-read
  * contract (SURVEY.md §2.11): an hourly scheduler maps
  * `[execution_ts − window, execution_ts)` to per-partition Kafka
  * offsets (`consumer.offsets_for_times`,
  * `airflow/dags/dags_spark_submit_bash_operator_batch_kafka_to_gcs.py:21-56`)
  * and passes them to the bounded source as
  * `startingOffsets`/`endingOffsets` JSON.
  *
  * The kafka-clients consumer is not available offline, so the lookup
  * is pluggable: [[OffsetIndex]] abstracts "earliest offset whose
  * record timestamp ≥ t" per partition (exactly `offsetsForTimes`
  * semantics); [[offsetsJson]] builds the source option strings. The
  * reference compared offsets as *strings* in one job (a real bug,
  * `save_raw_data_from_kafka_to_gcs.py:79-81`) — [[validateRange]] is
  * the numeric fix.
  */
object OffsetLookup {

  /** Per-partition (timestamp-sorted) offset index. `offsetForTime`
    * returns the earliest offset whose timestamp ≥ t, or None when no
    * such record exists (KafkaConsumer#offsetsForTimes contract).
    */
  trait OffsetIndex {
    def partitions(topic: String): Seq[Int]
    def offsetForTime(topic: String, partition: Int, tsMillis: Long): Option[Long]
    def endOffset(topic: String, partition: Int): Long
  }

  /** In-memory index over (offset, timestamp) runs — tests and local
    * replay; a production impl wraps a real consumer with identical
    * semantics.
    */
  final class SeqIndex(data: Map[(String, Int), Seq[(Long, Long)]]) extends OffsetIndex {
    def partitions(topic: String): Seq[Int] =
      data.keys.collect { case (t, p) if t == topic => p }.toSeq.sorted
    def offsetForTime(topic: String, partition: Int, tsMillis: Long): Option[Long] =
      data.getOrElse((topic, partition), Seq.empty)
        .collectFirst { case (off, ts) if ts >= tsMillis => off }
    def endOffset(topic: String, partition: Int): Long =
      data.getOrElse((topic, partition), Seq.empty)
        .lastOption.map(_._1 + 1).getOrElse(0L)
  }

  /** `{"topic":{"0":off,…}}` — the exact JSON shape the reference
    * builds for `startingOffsets`/`endingOffsets`
    * (`kafka_to_gcs_by_spark_batch.py:81-87`).
    */
  def offsetsJson(topic: String, offsets: Map[Int, Long]): String =
    offsets.toSeq.sortBy(_._1)
      .map { case (p, o) => s""""$p": $o""" }
      .mkString(s"""{"$topic": {""", ", ", "}}")

  /** Offset window for `[startTs, endTs)`: start = first offset at/after
    * startTs (falling back to end-of-log when absent), end = first
    * offset at/after endTs (end-of-log when absent).
    */
  def window(idx: OffsetIndex, topic: String, startTsMillis: Long,
             endTsMillis: Long): (String, String) = {
    val parts = idx.partitions(topic)
    val starts = parts.map { p =>
      p -> idx.offsetForTime(topic, p, startTsMillis).getOrElse(idx.endOffset(topic, p))
    }.toMap
    val ends = parts.map { p =>
      p -> idx.offsetForTime(topic, p, endTsMillis).getOrElse(idx.endOffset(topic, p))
    }.toMap
    parts.foreach(p => validateRange(starts(p), ends(p)))
    (offsetsJson(topic, starts), offsetsJson(topic, ends))
  }

  /** Numeric range check (the reference's string-compare bug fixed). */
  def validateRange(start: Long, end: Long): Unit =
    require(start <= end, s"invalid offset range: start=$start > end=$end")
}
