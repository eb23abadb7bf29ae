package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Partitioned layout: a partition-column filter must prune at the
  * directory level — the scan lists/opens ONLY the matching
  * partition, visible in both the plan's PartitionFilters and the
  * scan's numFiles metric.
  */
class LayoutSpec extends SparkSpec {

  test("partition-column filter prunes directories (numFiles drops)") {
    val dir = Files.createTempDirectory("graft_layout").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    Layout.writePartitioned(docs, dir, Seq("lang"), Seq("n_chars"))

    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collect { case s: FileSourceScanExec => s }.head
    }

    val all = spark.read.parquet(dir)
    val full = scanOf(all.select("doc_id"))
    val pruned = scanOf(all.filter(col("lang") === "en").select("doc_id"))
    val fullFiles = full.metrics("numFiles").value
    val prunedFiles = pruned.metrics("numFiles").value
    assert(pruned.toString.contains("PartitionFilters: [isnotnull(lang"),
      pruned.toString)
    assert(prunedFiles < fullFiles,
      s"expected pruning: $prunedFiles vs $fullFiles files")
    // value correctness: pruned read == filtered unpartitioned read
    val a = all.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = docs.filter(col("lang") === "en").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b && a.nonEmpty)
  }

  test("within-partition sort clusters row groups (files are sorted by the sort key)") {
    val dir = Files.createTempDirectory("graft_layout2").toString
    val docs = Tables.documents(spark, sf("sf0.001"))
    Layout.writePartitioned(docs, dir, Seq("lang"), Seq("n_chars"))
    import spark.implicits._
    // per input file, the n_chars sequence must be non-decreasing
    val violations = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("n_chars"))
      .groupBy("f")
      .agg(collect_list("n_chars").as("xs"))
      .as[(String, Seq[Long])]
      .collect()
      .count { case (_, xs) => xs.zip(xs.tail).exists { case (a, b) => a > b } }
    assert(violations === 0)
  }
}
