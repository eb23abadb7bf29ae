package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainShardsSpec extends SparkSpec {

  test("TrainShards.run drives curate -> tokenize -> pack -> shards end-to-end on the sf0.001 fixture") {
    val dir = Files.createTempDirectory("graft_shards").toString
    val docs = graft.Tables.documents(spark, sf())
    val (budget, seqLen, merges, perShard) = (20000L, 256, 8, 4)
    val series = TrainShards.run(spark, docs, "doc_id", "text", dir,
      budget, seqLen, merges, perShard)
    series.foreach(s => info(s.json))
    assert(series.map(_.stage) === Seq("input", "quality", "exact",
      "neardup", "budget", "tokenize", "pack", "shards"))
    val byStage = series.map(s => s.stage -> s).toMap

    // tokenize covers exactly the curated docs; pack preserves them
    val curated = spark.read.parquet(s"$dir/curated")
    assert(byStage("tokenize").docs === curated.count())
    assert(byStage("pack").docs === curated.count())
    val wpTotal = byStage("tokenize").tokens.get
    assert(wpTotal > 0L)
    assert(byStage("pack").tokens.get === wpTotal,
      "tokens-in of packing must equal the tokenizer total")

    // the shard store: every curated doc present exactly once, the
    // pack assignment intact, shard = seq_id div perShard
    val shards = spark.read.parquet(s"$dir/shards")
    assert(shards.count() === curated.count())
    assert(shards.select("doc_id").distinct().count() === curated.count())
    assert(shards.filter(
      col("shard") =!= expr(s"seq_id div $perShard")).count() === 0L)
    // concat-then-split invariants: cum_tokens totals the corpus, the
    // last sequence id matches ceil(total/seqLen) - 1
    val maxCum = shards.agg(max("cum_tokens")).collect()(0).getLong(0)
    assert(maxCum === wpTotal)
    val lastSeq = shards.agg(max(expr("seq_id + n_seqs - 1")))
      .collect()(0).getLong(0)
    assert(lastSeq === (wpTotal + seqLen - 1) / seqLen - 1)
    // partition pruning surface: one directory per shard on disk
    val shardDirs = new java.io.File(s"$dir/shards").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length === byStage("shards").note.split(" ")(0).toInt)

    // deterministic: a second run reproduces the identical assignment
    val dir2 = Files.createTempDirectory("graft_shards2").toString
    TrainShards.run(spark, docs, "doc_id", "text", dir2,
      budget, seqLen, merges, perShard)
    val a = shards.select("doc_id", "seq_id", "seq_off", "n_seqs", "shard")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = spark.read.parquet(s"$dir2/shards")
      .select("doc_id", "seq_id", "seq_off", "n_seqs", "shard")
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a === b)
  }

  test("packByCounts with regex counts reproduces packSequences bit-for-bit") {
    val docs = graft.Tables.documents(spark, sf())
      .select(col("doc_id"), col("text")).limit(200)
    val viaText = graft.llm.Chunking.packSequences(docs, "doc_id", "text", 128)
      .orderBy("doc_id").collect().toSeq
    val counts = docs.select(col("doc_id"),
      size(graft.llm.TextHash.words(col("text"))).as("n"))
    val viaCounts = graft.llm.Chunking.packByCounts(counts, "doc_id", "n", 128)
      .orderBy("doc_id").collect().toSeq
    assert(viaText === viaCounts)
  }
}
