package graft.llm

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ChunkingSpec extends SparkSpec {

  test("known answer: 40 words, size 32, stride 24 -> two overlapping chunks") {
    import spark.implicits._
    val text = (1 to 40).map(i => s"w$i").mkString(" ")
    val out = Chunking.chunks(Seq((7L, text)).toDF("doc_id", "text"),
        "doc_id", "text", chunkSize = 32, stride = 24)
      .orderBy("chunk_idx").collect()
    assert(out.length === 2)
    assert(out(0).getAs[Int]("n_tokens") === 32)
    assert(out(0).getAs[String]("chunk_text").startsWith("w1 ") )
    // second chunk starts at token 25 (stride 24) and holds the last 16
    assert(out(1).getAs[Int]("n_tokens") === 16)
    assert(out(1).getAs[String]("chunk_text") ===
      (25 to 40).map(i => s"w$i").mkString(" "))
  }

  test("short docs yield exactly one whole-document chunk") {
    import spark.implicits._
    val out = Chunking.chunks(Seq((1L, "only five little words here"))
        .toDF("doc_id", "text"), "doc_id", "text", 32, 24).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Int]("n_tokens") === 5)
    assert(out.head.getAs[String]("chunk_text") === "only five little words here")
  }

  test("every token is covered and consecutive chunks overlap by size-stride") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val out = Chunking.chunks(docs, "doc_id", "text", 32, 24).cache()
    // coverage: total distinct (doc, token position) = word count
    val nWords = docs.select(sum(size(split(trim(col("text")), "\\s+"))))
      .head().getLong(0)
    val covered = out
      .select(col("doc_id"), col("chunk_idx"),
        posexplode(split(col("chunk_text"), " ")))
      .select(col("doc_id"), (col("chunk_idx") * 24 + col("pos")).as("tokpos"))
      .distinct().count()
    assert(covered === nWords)
    // chunk sizing: all non-final chunks are exactly 32 tokens
    val maxIdx = out.groupBy("doc_id").agg(max("chunk_idx").as("mx"))
    val nonFinal = out.join(maxIdx, "doc_id").filter(col("chunk_idx") < col("mx"))
    assert(nonFinal.filter(col("n_tokens") =!= 32).count() === 0)
    out.unpersist()
  }

  test("sequence packing: equals the single-task window form, covers every token") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf("sf0.001"))
    val packed = Chunking.packSequences(docs, "doc_id", "text", seqLen = 512)
      .orderBy("doc_id").collect()
    // window-form reference (fine at spec scale; the operator itself
    // must not use it — see the PrefixSum scale story)
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.select(col("doc_id"),
        size(split(trim(col("text")), "\\s+")).as("n_tok"))
      .withColumn("cum_tokens", sum("n_tok").over(w))
      .orderBy("doc_id").collect()
    assert(packed.length === ref.length)
    packed.zip(ref).foreach { case (p, r) =>
      assert(p.getAs[Long]("cum_tokens") === r.getAs[Long]("cum_tokens"))
      val start = p.getAs[Long]("cum_tokens") - p.getAs[Int]("n_tok")
      assert(p.getAs[Long]("seq_id") === start / 512)
      assert(p.getAs[Long]("seq_off") === start % 512)
    }
    // consecutive docs abut exactly: next start == previous cum
    packed.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("cum_tokens") - b.getAs[Int]("n_tok")
          === a.getAs[Long]("cum_tokens"))
      case _ =>
    }
    // spans: a doc crossing k boundaries spans k+1 sequences
    packed.foreach { p =>
      val start = p.getAs[Long]("cum_tokens") - p.getAs[Int]("n_tok")
      val endSeq = (p.getAs[Long]("cum_tokens") - 1) / 512
      assert(p.getAs[Long]("n_seqs") === endSeq - start / 512 + 1)
    }
  }

  test("packBestFit: capacity respected, every doc packed once, beats the sequential cut") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val seqLen = 512
    val packed = Chunking.packBestFit(docs, "doc_id", "text", seqLen, partitions = 4)
      .cache()
    try {
      // every eligible doc appears exactly once
      val eligible = docs.select(col("doc_id"),
          size(graft.llm.TextHash.words(col("text"))).as("n"))
        .filter(col("n") > 0 && col("n") <= seqLen)
      assert(packed.count() === eligible.count())
      assert(packed.select("doc_id").distinct().count() === packed.count())
      // no bin exceeds capacity
      val over = packed.groupBy("bin_id").agg(sum("n_tok").as("fill"))
        .filter(col("fill") > seqLen)
      assert(over.count() === 0L)
      // FFD uses no more bins than the naive arrival-order sequential
      // cut (ceil of running sum — what packSequences' splits imply)
      val totalTok = packed.agg(sum("n_tok")).head().getLong(0)
      val ffdBins = packed.select("bin_id").distinct().count()
      val naive = eligible.orderBy("doc_id").collect().map(_.getInt(1))
        .foldLeft((0L, 0)) { case ((bins, free), n) =>
          if (n <= free) (bins, free - n) else (bins + 1, seqLen - n)
        }._1
      assert(ffdBins <= naive, s"FFD $ffdBins bins vs naive $naive")
      // lower bound sanity: can't beat ceil(total/seqLen)
      assert(ffdBins >= (totalTok + seqLen - 1) / seqLen)
      // deterministic under re-run
      val again = Chunking.packBestFit(docs, "doc_id", "text", seqLen, partitions = 4)
        .collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq
      assert(again === packed.collect().map(r => (r.getLong(0), r.getLong(2))).sorted.toSeq)
    } finally packed.unpersist()
  }

  test("invalid size/stride rejected") {
    import spark.implicits._
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "doc_id", "text", chunkSize = 8, stride = 9)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunks(df, "doc_id", "text", chunkSize = 0, stride = 1)
    }
  }
}
