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
    // deterministic: a second run yields the identical kept id set —
    // and drops its OWN three caches (the nbServeAuto lifetime
    // discipline). Known library internals that legitimately outlive
    // the call: PrefixSum's plan-referenced sorted cache and Dedup's
    // persisted band index — so the bound is 2; the pipeline's own
    // scored/exact/surv persists would push it to 5
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val dir2 = Files.createTempDirectory("graft_curate2").toString
    CuratePipeline.run(spark, docs, "doc_id", "text", dir2, budget)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    // the pipeline's own scored/exact/surv persists would read +5;
    // bound 4 leaves slack for a concurrently-running suite's blocks
    // (the shared-session race) on top of the two internals
    assert(leaked.size <= 4,
      s"pipeline must drop its own caches (library internals excepted): $leaked")
    val a = curated.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$dir2/curated")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
  }
}
