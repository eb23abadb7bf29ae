package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ParagraphDedupSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private val boiler = (1 to 20).map(i => s"boiler$i").mkString(" ")
  private def uniq(tag: String) = (1 to 20).map(i => s"$tag$i").mkString(" ")

  test("duplicated span survives only at its first (doc_id, idx) occurrence") {
    import spark.implicits._
    val df = Seq(
      ("1", s"$boiler ${uniq("one")}"), // first occurrence of boiler
      ("2", s"$boiler ${uniq("two")}")  // loses the boiler span
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.rewrite(df, "doc_id", "text", spanWords = 20)
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap

    assert(out("1").getAs[Long]("n_chunks") === 2L)
    assert(out("1").getAs[Long]("kept_chunks") === 2L)
    assert(out("1").getAs[String]("new_hash") === md5Hex(s"$boiler ${uniq("one")}"))

    assert(out("2").getAs[Long]("kept_chunks") === 1L)
    assert(out("2").getAs[String]("new_hash") === md5Hex(uniq("two")))
    assert(out("2").getAs[Long]("new_len") === uniq("two").length.toLong)
  }

  test("a document repeating its own span loses the repeat; full dups go empty") {
    import spark.implicits._
    val df = Seq(
      ("1", s"$boiler $boiler"), // self-repeat: keeps first copy only
      ("2", boiler)              // every span already seen in doc 1
    ).toDF("doc_id", "text")
    val out = ParagraphDedup.rewrite(df, "doc_id", "text", spanWords = 20)
      .collect().map(r => r.getAs[String]("doc_id") -> r).toMap

    assert(out("1").getAs[Long]("n_chunks") === 2L)
    assert(out("1").getAs[Long]("kept_chunks") === 1L)
    assert(out("1").getAs[String]("new_hash") === md5Hex(boiler))

    assert(out("2").getAs[Long]("kept_chunks") === 0L)
    assert(out("2").getAs[Long]("new_len") === 0L)
    assert(out("2").getAs[String]("new_hash") === md5Hex(""))
  }

  test("rewrite is case/whitespace-normalizing and corpus rows are preserved") {
    val docs = Tables.documents(spark, sf())
    val out = ParagraphDedup.rewrite(docs, "doc_id", "text", spanWords = 20)
    assert(out.count() === docs.count()) // one output row per doc, even fully-deduped
    assert(out.where(col("kept_chunks") > col("n_chunks")).count() === 0)
    assert(out.where(col("new_len") < 0).count() === 0)
  }
}
