package graft.ops

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class DollarBarsSpec extends SparkSpec {

  private def df = {
    val schema = StructType(Seq(
      StructField("k", StringType),
      StructField("t", LongType),
      StructField("price", DoubleType),
      StructField("notional", DecimalType(20, 4))
    ))
    val rows = Seq(
      // key a: notional cumsum 40, 90, 140, 190 → bar size 100 → bars 0,0,1,1
      Row("a", 1L, 10.0, BigDecimal(40).setScale(4).bigDecimal),
      Row("a", 2L, 12.0, BigDecimal(50).setScale(4).bigDecimal),
      Row("a", 3L, 8.0, BigDecimal(50).setScale(4).bigDecimal),
      Row("a", 4L, 11.0, BigDecimal(50).setScale(4).bigDecimal),
      // key b: single row, exact boundary 100 → floor(100/100)=1
      Row("b", 1L, 5.0, BigDecimal(100).setScale(4).bigDecimal)
    )
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 3), schema)
  }

  test("bar bucketing follows exact running notional") {
    val out = DollarBars
      .bars(df, "k", "t", "price", "notional", 100.0)
      .orderBy("k", "bar_num")
      .collect()
    assert(out.length === 3)
    val a0 = out(0)
    assert(a0.getAs[String]("k") === "a" && a0.getAs[Int]("bar_num") === 0)
    assert(a0.getAs[Double]("open") === 10.0)   // min_by t
    assert(a0.getAs[Double]("close") === 12.0)  // max_by t
    assert(a0.getAs[Double]("high") === 12.0)
    assert(a0.getAs[Double]("low") === 10.0)
    assert(a0.getAs[Double]("volume") === 90.0)
    assert(a0.getAs[Long]("n_trades") === 2L)
    val a1 = out(1)
    assert(a1.getAs[Int]("bar_num") === 1)
    assert(a1.getAs[Double]("open") === 8.0 && a1.getAs[Double]("close") === 11.0)
    val b = out(2)
    assert(b.getAs[String]("k") === "b" && b.getAs[Int]("bar_num") === 1)
  }

  test("bar assignment is independent of input partitioning") {
    val p1 = DollarBars.bars(df.repartition(1), "k", "t", "price", "notional", 100.0)
    val p8 = DollarBars.bars(df.repartition(8), "k", "t", "price", "notional", 100.0)
    assert(p1.orderBy("k", "bar_num").collect().toSeq ===
      p8.orderBy("k", "bar_num").collect().toSeq)
  }
}
