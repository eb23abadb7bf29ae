package graft.props

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.ops.{Envelope, PrefixSum}
import graft.schema.UpbitSchemas

/** Property tests (SURVEY.md §5): envelope round-trip and prefix-sum
  * partitioning-invariance over ScalaCheck-generated inputs
  * (seed-pinned so failures reproduce).
  */
class PropertySpec extends SparkSpec {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val tradeGen: Gen[List[(String, Long, Double, Double, String, Long)]] =
    Gen.listOfN(25, for {
      code <- Gen.oneOf("KRW-BTC", "KRW-ETH", "KRW-SOL")
      ts <- Gen.choose(1704067200000L, 1704153600000L)
      price <- Gen.choose(1L, 100000000L).map(_ / 100.0)
      vol <- Gen.choose(1L, 10000000L).map(_ / 1000000.0)
      side <- Gen.oneOf("ASK", "BID")
      seq <- Gen.choose(0L, Long.MaxValue / 2)
    } yield (code, ts, price, vol, side, seq))

  test("envelope wrap→parse is lossless for arbitrary trades (5 seeds)") {
    import spark.implicits._
    (1L to 5L).foreach { seed =>
      val rows = sample(tradeGen, seed)
      val df = rows.toDF("code", "timestamp", "trade_price", "trade_volume",
        "ask_bid", "sequential_id")
      val back = Envelope.parse(Envelope.wrap(df),
        org.apache.spark.sql.types.StructType(
          UpbitSchemas.trade.filter(f => df.columns.contains(f.name))))
      assert(back.orderBy("sequential_id", "timestamp", "code").collect().toSeq ===
        df.orderBy("sequential_id", "timestamp", "code").collect().toSeq,
        s"seed=$seed")
    }
  }

  private val seriesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(1, 60)
    rows <- Gen.listOfN(n, for {
      k <- Gen.choose(0L, 3L)
      cents <- Gen.choose(-10000000L, 10000000L)
    } yield (k, cents))
  } yield rows

  test("two-phase prefix sum == window cumsum for arbitrary series (5 seeds)") {
    import spark.implicits._
    (10L to 14L).foreach { seed =>
      val rows = sample(seriesGen, seed).zipWithIndex
        .map { case ((k, c), i) => (k, i.toLong, c) }
      val df = rows.toDF("k", "ord", "cents")
        .withColumn("d", col("cents").cast(DecimalType(20, 4)))
        .repartition(5)
      val w = Window.partitionBy("k").orderBy("ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val expect = df.withColumn("c", sum(col("d")).over(w).cast("double"))
        .select("ord", "c").orderBy("ord").collect().map(_.getDouble(1)).toSeq
      val got = PrefixSum.withRunningSum(df, "k", Seq("ord"), "d", "c")
        .select("ord", "c").orderBy("ord").collect().map(_.getDouble(1)).toSeq
      assert(got === expect, s"seed=$seed")
    }
  }
}
