package graft.llm

import graft.SparkSpec

class TextEntropySpec extends SparkSpec {

  test("charEntropy: hand-computed known answers") {
    import spark.implicits._
    val df = Seq(
      (1L, "aabb"), // N=4, counts {a:2, b:2} → H = ln4 − ln2 = ln2
      (2L, "aaaa"), // single symbol → H = 0
      (3L, "abcd")  // uniform over 4 → H = ln4
    ).toDF("doc_id", "text")
    val out = TextStats.charEntropy(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val ln2micro = math.floor(math.log(2) * 1e6 + 0.5).toLong // 693147
    val ln4micro = math.floor(math.log(4) * 1e6 + 0.5).toLong // 1386294
    assert(out(1L) === ((4L, 2L, 2 * 2 * ln2micro, (ln4micro - 2.0 * 2 * ln2micro / 4) / 1e6)))
    assert(out(2L) === ((4L, 1L, 4 * ln4micro, (ln4micro - 4.0 * ln4micro / 4) / 1e6)))
    assert(out(2L)._4 === 0.0)
    assert(out(3L) === ((4L, 4L, 0L, ln4micro / 1e6)))
    // ordering sanity: uniform > mixed > constant
    assert(out(3L)._4 > out(1L)._4 && out(1L)._4 > out(2L)._4)
  }

  test("astral (non-BMP) characters count as ONE code point, not surrogate halves") {
    import spark.implicits._
    val clef = new String(Character.toChars(0x1D11E)) // 𝄞, outside the BMP
    val df = Seq((1L, s"ab${clef}c")).toDF("doc_id", "text")
    val r = TextStats.charEntropy(df, "doc_id", "text").collect().head
    // a bare split("") would yield 5 code units (two surrogate halves)
    // and diverge from DuckDB's 4 code points
    assert(r.getAs[Long]("n_counted") === 4L)
    assert(r.getAs[Long]("distinct_chars") === 4L)
  }

  test("charEntropy is bounded by ln(distinct_chars) and ≥ 0") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf())
    val bad = TextStats.charEntropy(docs, "doc_id", "text")
      .filter(col("entropy") < -1e-9 ||
        col("entropy") > log(col("distinct_chars").cast("double")) + lit(1e-9))
    assert(bad.count() === 0L)
  }
}
