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

  test("zValue: known Morton answers and bijectivity on the grid") {
    import spark.implicits._
    val grid = (for (x <- 0 until 8; y <- 0 until 8) yield (x, y)).toDF("x", "y")
    val z = grid.withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 3))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    // classic Morton: x interleaves into odd bits, y into even
    assert(z((0, 0)) === 0L)
    assert(z((0, 1)) === 1L)
    assert(z((1, 0)) === 2L)
    assert(z((1, 1)) === 3L)
    assert(z((2, 3)) === 13L)
    assert(z((7, 7)) === 63L)
    // bijective on the 8x8 grid
    assert(z.values.toSet === (0L until 64L).toSet)
  }

  test("z-order clustering touches fewer partitions than single-column sort on a 2-d box") {
    import spark.implicits._
    // 32x32 grid; box = the [0,8) x [0,8) corner (1/16 of the space)
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    def touched(clusterKey: org.apache.spark.sql.Column): Long = {
      grid.withColumn("k", clusterKey)
        .repartitionByRange(16, col("k"))
        // capture the partition id BEFORE filtering — the
        // non-deterministic projection stops Catalyst pushing the box
        // predicate below the repartition (which would re-range only
        // the matching rows and defeat the measurement)
        .withColumn("pid", spark_partition_id())
        .filter(col("x") < 8 && col("y") < 8)
        .select("pid").distinct().count()
    }
    val zTouched = touched(Layout.zValue(Seq(col("x"), col("y")), 5))
    val xTouched = touched(col("x") * 32 + col("y")) // lexicographic (x, y)
    info(s"partitions touched: zorder=$zTouched lexicographic=$xTouched")
    // the box is one contiguous z-range but spreads across the x-range
    assert(zTouched < xTouched)
    assert(zTouched <= 2)
  }

  test("writeZOrdered: files cover disjoint z-ranges and rows are z-sorted within files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_zorder").toString
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x, y)).toDF("x", "y")
    Layout.writeZOrdered(grid, dir, Seq(col("x"), col("y")), bits = 5, numFiles = 8)
    val back = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("x"), col("y"))
      .withColumn("z", Layout.zValue(Seq(col("x"), col("y")), 5))
    val ranges = back.groupBy("f")
      .agg(min("z").as("lo"), max("z").as("hi"), collect_list("z").as("zs"))
      .collect()
    // within-file z order is non-decreasing
    ranges.foreach { r =>
      val zs = r.getSeq[Long](3)
      assert(zs.zip(zs.tail).forall { case (a, b) => a <= b }, s"unsorted file ${r.getString(0)}")
    }
    // file z-ranges do not overlap (range partitioning by z)
    val sorted = ranges.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, hi), (lo2, _)) => assert(hi <= lo2) }
    assert(back.count() === 1024)
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
