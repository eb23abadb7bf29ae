package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class QuarantineSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("code", StringType),
    StructField("price", DoubleType)))

  test("good rows flatten, malformed rows carry the wire text in _corrupt") {
    import spark.implicits._
    val wire = Seq(
      """{"code":"KRW-BTC","price":42.5}""",
      """{"code":"KRW-ETH","price":"not-a-number"}""",
      """not json at all""",
      """{"code":null,"price":null}"""
    ).toDF("value")
    val out = Envelope.parseWithQuarantine(wire, schema)
      .collect()
      .map(r => (Option(r.getString(0)), Option(r.get(1)), Option(r.getString(2))))
    assert(out(0) === (Some("KRW-BTC"), Some(42.5), None))
    assert(out(2)._3 === Some("not json at all"), s"row2=${out(2)}")
    // all-null-field but well-formed JSON is NOT corrupt
    assert(out(3) === (None, None, None))
    // type mismatch: parseable fields survive, bad field nulls, wire kept
    assert(out(1) === (Some("KRW-ETH"), None,
      Some("""{"code":"KRW-ETH","price":"not-a-number"}""")))
  }
}
