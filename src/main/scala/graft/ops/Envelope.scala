package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The reference's Kafka message envelope (SURVEY.md P1/P2/P3/P10):
  * every record travels as a single UTF-8 JSON `value` column; the
  * engine parses with an explicit schema (never inference,
  * `kafka_to_kafka_by_spark_for_druid.py:78-88`) and re-wraps whole
  * rows with `to_json(struct(*))` (`:134-137`).
  *
  * All four steps are codegen'd Catalyst expressions (Cast,
  * JsonToStructs, GetStructField, StructsToJson) — no UDFs, fully
  * pipelined inside WholeStageCodegen; at 100 TB the envelope adds no
  * shuffle and prunes to `value` only at the scan.
  */
object Envelope {

  /** Kafka wire bytes → string `value` (reference `CAST(value AS STRING)`). */
  def bytesToString(df: DataFrame): DataFrame =
    df.withColumn("value", col("value").cast("string"))

  /** `value` JSON → typed struct column `data`, then flattened. */
  def parse(df: DataFrame, schema: StructType): DataFrame =
    df.select(from_json(col("value"), schema).as("data")).select(col("data.*"))

  /** Parse with malformed-record quarantine: good rows flatten as in
    * [[parse]] with `_corrupt` NULL; rows whose JSON fails to parse
    * (or fails a field's type) keep NULL for the broken fields and
    * carry the raw wire text in `_corrupt` for a dead-letter sink.
    * A stream that hard-fails on one bad producer message is not a
    * pipeline — this is PERMISSIVE mode's `columnNameOfCorruptRecord`
    * contract made explicit (a plain `from_json` returns an all-NULL
    * struct for garbage, indistinguishable from a legitimately
    * all-null record — QuarantineSpec pins the difference).
    */
  def parseWithQuarantine(df: DataFrame, schema: StructType): DataFrame = {
    val withCorrupt = schema.add("_corrupt", org.apache.spark.sql.types.StringType)
    df.select(from_json(col("value"), withCorrupt,
        Map("columnNameOfCorruptRecord" -> "_corrupt")).as("__data"))
      .select(col("__data.*"))
  }

  /** Whole row → single JSON `value` column. */
  def wrap(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  /** Wrap selected columns only. */
  def wrap(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(to_json(struct(cols.map(col): _*)).as("value"))
}
