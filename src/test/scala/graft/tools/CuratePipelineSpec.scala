package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CuratePipelineSpec extends SparkSpec {

  test("CuratePipeline.run walks quality -> exact -> neardup -> budget with monotone survival and a budget-true output") {
    val dir = Files.createTempDirectory("graft_curate").toString
    val docs = graft.Tables.documents(spark, sf())
    val budget = 20000L
    val series = CuratePipeline.run(spark, docs, "doc_id", "text", dir, budget)
    series.foreach(s => info(s.json))
    assert(series.map(_.stage) ===
      Seq("input", "quality", "exact", "neardup", "budget"))
    val byStage = series.map(s => s.stage -> s).toMap
    // survival is monotone non-increasing and every stage keeps something
    val counts = series.map(_.docs)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"survival must be monotone: $counts")
    assert(counts.last > 0, "budget slice must be non-empty")
    assert(byStage("input").docs === docs.count())
    // the written slice respects the budget and is quality-topped:
    // its min quality >= the quality of any excluded survivor
    val curated = spark.read.parquet(s"$dir/curated")
    assert(curated.count() === byStage("budget").docs)
    assert(byStage("budget").tokens.get <= budget)
    val maxCum = curated.agg(max("cum_tokens")).collect()(0).getLong(0)
    assert(maxCum <= budget)
    // deterministic: a second run yields the identical kept id set
    val dir2 = Files.createTempDirectory("graft_curate2").toString
    CuratePipeline.run(spark, docs, "doc_id", "text", dir2, budget)
    val a = curated.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$dir2/curated")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }
}
