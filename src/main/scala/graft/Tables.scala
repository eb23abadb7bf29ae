package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided Parquet testdata (TESTDATA.md).
  *
  * Reads the table root directly so Catalyst gets native Parquet
  * filter pushdown + column pruning (the reference reads schema-full
  * JSON and prunes manually — `processing_raw_data_from_gcs.py:79-85`;
  * Parquet makes both automatic).
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` stores `ts` as Parquet TIMESTAMP(NANOS) which
    * vanilla Spark rejects; read it as nano-longs and convert to a
    * microsecond TimestampType column (the testdata has no
    * sub-microsecond components, so this is lossless — TESTDATA.md).
    */
  private[graft] def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/events.parquet")
    // `div` = exact integer division — a double round-trip would lose
    // precision above 2^53 ns (~epoch 1970+104 days).
    df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
  }

  def region(s: SparkSession, d: String): DataFrame     = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = table(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame     = eventsRaw(s, d)
  def documents(s: SparkSession, d: String): DataFrame  = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
