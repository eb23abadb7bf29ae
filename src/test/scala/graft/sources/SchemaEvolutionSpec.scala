package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema evolution over a partitioned parquet layout: later file
  * generations add columns; `mergeSchema` reads the union schema with
  * nulls for pre-evolution files — the append-only table contract a
  * long-lived ingest pipeline depends on (the reference's sink is
  * exactly such an accreting layout).
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("mergeSchema unions generations; old files read null for new columns") {
    val dir = Files.createTempDirectory("schema_evo").toFile.getAbsolutePath
    // generation 1: (id, price)
    Seq((1L, 10.0), (2L, 20.0)).toDF("id", "price")
      .write.mode("append").parquet(dir)
    // generation 2 adds a column: (id, price, venue)
    Seq((3L, 30.0, "upbit")).toDF("id", "price", "venue")
      .write.mode("append").parquet(dir)

    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "price", "venue"))
    val rows = merged.collect().map(r =>
      r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("venue")))).toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty) // old files: null venue
    assert(rows(3L).contains("upbit"))

    // without mergeSchema the footer-sampled schema may miss the new
    // column — the union query still works by explicit projection
    val projected = spark.read.option("mergeSchema", "true").parquet(dir)
      .select(col("id"), coalesce(col("venue"), lit("unknown")).as("venue"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(projected(1L) == "unknown" && projected(3L) == "upbit")
  }

  test("type-stable evolution: widening by explicit cast at read, not silent merge") {
    val dir = Files.createTempDirectory("schema_widen").toFile.getAbsolutePath
    Seq((1L, 100)).toDF("id", "qty").write.parquet(s"$dir/g1")
    Seq((2L, 5000000000L)).toDF("id", "qty").write.parquet(s"$dir/g2")
    // int->long conflict across generations: the supported contract is
    // an explicit per-path cast to the widest type, then union
    val g1 = spark.read.parquet(s"$dir/g1").select(col("id"), col("qty").cast("long"))
    val g2 = spark.read.parquet(s"$dir/g2").select(col("id"), col("qty").cast("long"))
    val all = g1.unionByName(g2).collect().map(_.getLong(1)).sorted
    assert(all.toSeq == Seq(100L, 5000000000L))
  }
}
