package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.llm.Similarity

class AnnLifecycleSpec extends SparkSpec {

  test("AnnLifecycle.run drives build -> probe -> delta -> churn-tripped re-train on the sf0.001 fixture") {
    // the operable form of AnnIndexSpec's closed-loop proof (r10
    // verdict #3): same fixture, same drift construction, but through
    // the tool entry a user invokes on their own parquet
    val dir = Files.createTempDirectory("graft_lifecycle").toString
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    // hard drift: 3x the corpus mass negated and shifted (components
    // are ~0.05 in this corpus, so +-0.1 relocates the mass)
    val delta = Seq[(Long, org.apache.spark.sql.Column => org.apache.spark.sql.Column)](
        (1000000L, x => -x), (2000000L, x => x + lit(0.1)),
        (3000000L, x => x - lit(0.1)))
      .map { case (off, f) =>
        emb.select((col("vec_id") + off).as("vec_id"),
          transform(Similarity.toDoubleVec(col("embedding")), f).as("embedding"))
      }.reduce(_ union _)

    val series = AnnLifecycle.run(spark, emb, "vec_id", "embedding",
      dir, cells = 8, delta = Some(delta))
    series.foreach(s => info(s.json))

    val byStage = series.map(s => s.stage -> s).toMap
    assert(series.map(_.stage) ===
      Seq("build", "probe", "delta", "retrain"),
      "drifted deltas must walk the full loop including the re-train")
    val baseline = byStage("build").churn.get
    val tripped = byStage("delta").churn.get
    val after = byStage("retrain").churn.get
    assert(byStage("build").vectors === emb.count())
    assert(byStage("delta").vectors === 4 * emb.count())
    assert(tripped > 2 * baseline, f"drift must trip the monitor: $tripped%.4f vs baseline $baseline%.4f")
    assert(after < tripped / 2, "re-training must collapse the churn")
    assert(after < 2 * baseline, "post-re-train churn must read ~baseline again")
    // the persisted artifacts a user would keep
    for (p <- Seq("vectors", "centroids", "quantizer", "deltas",
      "retrained/vectors", "retrained/centroids", "retrained/quantizer"))
      assert(new java.io.File(s"$dir/$p").exists(), s"missing $dir/$p")
    // probe stage produced rows (the serve path works off the persisted pair)
    assert(byStage("probe").note.contains("rows"))
  }

  test("AnnLifecycle.run is idempotent against an existing indexDir: no stale deltas union in") {
    // r11 ADVICE: deltas used to write with mode("append"), so a second
    // run against the same indexDir unioned the first run's deltas into
    // the churn measurement — inflated counts, spuriously tripped
    // re-train. Two identical runs must now report identical series.
    val dir = Files.createTempDirectory("graft_lifecycle_rerun").toString
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val delta = emb.select((col("vec_id") + 1000000L).as("vec_id"),
      col("embedding"))
    def go() = AnnLifecycle.run(spark, emb, "vec_id", "embedding",
      dir, cells = 8, delta = Some(delta))
    val first = go()
    val second = go()
    assert(second.map(s => (s.stage, s.vectors)) ===
      first.map(s => (s.stage, s.vectors)),
      "re-running against the same indexDir must not change vector counts")
    val deltaStage = second.find(_.stage == "delta").get
    assert(deltaStage.vectors === 2 * emb.count(),
      "delta stage must count exactly corpus + this run's delta")
  }

  test("AnnLifecycle.run without a delta stops after probe and keeps the index") {
    val dir = Files.createTempDirectory("graft_lifecycle_nodelta").toString
    val emb = graft.Tables.embeddings(spark, sf())
      .select(col("vec_id"), col("embedding"))
    val series = AnnLifecycle.run(spark, emb, "vec_id", "embedding",
      dir, cells = 8, delta = None)
    assert(series.map(_.stage) === Seq("build", "probe"))
    assert(!new java.io.File(s"$dir/retrained").exists())
  }
}
