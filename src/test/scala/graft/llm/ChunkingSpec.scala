package graft.llm

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
