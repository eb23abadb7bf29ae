package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.llm.{Bpe, Chunking, Wordpiece}

/** The full north-star path as ONE runnable (r11 verdict #5): raw
  * documents parquet → curated slice → trained tokenizer → packed
  * fixed-length training sequences → sharded parquet a training job
  * reads. Every stage is an already-oracled library call
  * (`curation_pipeline`, `bpe_vocab`, `wordpiece_encode`,
  * `pack_sequences`); this main only sequences them over user data —
  * the composition [[CuratePipeline]] stopped short of.
  *
  * Stages (JSON line each, `stage` / `docs` / `tokens` / `note`):
  *  1–5. [[CuratePipeline.run]]'s input → quality → exact → neardup →
  *       budget loop; the curated slice lands at `outDir/curated`.
  *  6. `tokenize` — BPE merges trained ON THE CURATED SLICE
  *     ([[Bpe.train]], batched exact argmax), WordPiece vocabulary
  *     derived from them, per-document counts via the native greedy
  *     kernel ([[Wordpiece.encodeCounts]]); `tokens` = corpus
  *     wp-token total (the tokens-IN of packing).
  *  7. `pack` — [[Chunking.packByCounts]] over the WP counts (the
  *     tokenizer the training run will see, not the whitespace
  *     regex): distributed PrefixSum, docs assigned to fixed
  *     `seqLen`-token sequences; note carries sequences-OUT.
  *  8. `shards` — curated text joined back onto the pack assignment
  *     and written to `outDir/shards` partitioned by
  *     `shard = seq_id div seqsPerShard` (a doc spanning a shard
  *     boundary lands in the shard its FIRST sequence belongs to —
  *     the reader that materializes token streams resolves spans, the
  *     standard concat-then-split contract). Parquet partition
  *     pruning makes "read shard k" one directory scan.
  *
  * Scale shape: one corpus pass per stage, driver state bounded by
  * the BPE merge table + WordPiece vocabulary (both
  * `merges`-bounded), packing is the two-phase PrefixSum (no global
  * window), the shard write is a hash-free partitionBy on a derived
  * integer. Nothing all-pairs, nothing collected that grows with the
  * corpus.
  *
  * Usage:
  *   tools/run.sh graft.tools.TrainShards \
  *     <docs.parquet> <idCol> <textCol> <outDir> \
  *     [tokenBudget=1000000] [seqLen=1024] [merges=32] [seqsPerShard=1024]
  * Smoke-tested in CI on the sf0.001 documents fixture
  * (TrainShardsSpec).
  */
object TrainShards {

  import CuratePipeline.Stage

  def run(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
          outDir: String, tokenBudget: Long, seqLen: Int, merges: Int,
          seqsPerShard: Int): Seq[Stage] = {
    require(seqsPerShard > 0, s"seqsPerShard must be positive, got $seqsPerShard")
    val out = Seq.newBuilder[Stage]
    out ++= CuratePipeline.run(spark, docs, idCol, textCol, outDir, tokenBudget)
    val curated = spark.read.parquet(s"$outDir/curated")

    // 6. tokenizer trained on the CURATED corpus (training the vocab on
    // pre-curation text would spend merges on the junk the gate drops)
    val model = Bpe.train(curated, "text", numMerges = merges,
      batch = math.max(1, merges / 4))
    val counts = Wordpiece.encodeCounts(curated, "doc_id", "text", model)
      .persist() // feeds the pack AND the stage totals
    val wpTotal = counts.agg(coalesce(sum("wp_tokens"), lit(0L)))
      .collect()(0).getLong(0)
    out += Stage("tokenize", counts.count(), Some(wpTotal),
      s"BPE $merges merges on the curated slice; WordPiece counts via the native kernel")

    // 7. pack by the TRAINED tokenizer's counts
    val packed = Chunking.packByCounts(counts, "doc_id", "wp_tokens", seqLen)
    val nSeqs =
      if (wpTotal == 0L) 0L else (wpTotal + seqLen - 1) / seqLen
    out += Stage("pack", packed.count(), Some(wpTotal),
      s"packByCounts seqLen=$seqLen -> $nSeqs sequences (concat-then-split, PrefixSum)")

    // 8. sharded write: text + assignment, partitioned by shard
    val shardCol = expr(s"seq_id div $seqsPerShard").cast("long").as("shard")
    val sharded = curated.select(col("doc_id"), col("text"), col("quality_score"))
      .join(packed, "doc_id")
      .withColumn("shard", shardCol)
    sharded.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/shards")
    counts.unpersist()
    val shards = spark.read.parquet(s"$outDir/shards")
    val nShards = shards.select("shard").distinct().count()
    out += Stage("shards", shards.count(), Some(wpTotal),
      s"$nShards shard dirs ($seqsPerShard seqs/shard) -> $outDir/shards")
    out.result()
  }

  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println("usage: TrainShards <docs.parquet> <idCol> <textCol>" +
        " <outDir> [tokenBudget=1000000] [seqLen=1024] [merges=32] [seqsPerShard=1024]")
      sys.exit(2)
    }
    val Array(path, idCol, textCol, outDir) = args.take(4)
    val budget = args.lift(4).map(_.toLong).getOrElse(1000000L)
    val seqLen = args.lift(5).map(_.toInt).getOrElse(1024)
    val merges = args.lift(6).map(_.toInt).getOrElse(32)
    val perShard = args.lift(7).map(_.toInt).getOrElse(1024)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run(spark, spark.read.parquet(path), idCol, textCol, outDir,
      budget, seqLen, merges, perShard)
      .foreach(s => println(s.json))
    spark.stop()
  }
}
