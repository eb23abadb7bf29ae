package graft.ops

import scala.util.Random

import graft.SparkSpec

class TheilSenSpec extends SparkSpec {
  import spark.implicits._

  test("noise-free line: slope recovered exactly in pico-units") {
    val rows = (0 until 40).map(i => (1L, i.toLong * 10, 3.0 * (i * 10), i.toLong))
    val out = TheilSen.slope(rows.toDF("key", "x", "y", "id"),
      "key", "x", "y", "id", k = 64, salt = "t").collect()
    assert(out.length == 1)
    assert(out(0).getLong(3) == 3000000000000L) // 3.0 * 1e12 exactly
  }

  test("robustness: 20% wild outliers leave the median slope untouched (OLS would not survive)") {
    val r = new Random(7)
    val rows = (0 until 50).map { i =>
      val y = if (i % 5 == 4) 1e6 + r.nextInt(1000) else 2.0 * (i * 7)
      (1L, i.toLong * 7, y, i.toLong)
    }
    val out = TheilSen.slope(rows.toDF("key", "x", "y", "id"),
      "key", "x", "y", "id", k = 64, salt = "t").collect()
    // clean-pair fraction 0.8^2 = 0.64 > 1/2 -> the median IS a clean
    // pair's slope, which is exactly 2.0
    assert(out(0).getLong(3) == 2000000000000L)
    // contrast: the MEAN pairwise slope is wrecked by the outliers
    val slopes = for (i <- 0 until 50; j <- (i + 1) until 50)
      yield (rows(j)._3 - rows(i)._3) / (rows(j)._2 - rows(i)._2).toDouble
    assert(math.abs(slopes.sum / slopes.size - 2.0) > 100.0)
  }

  test("sampling bound: long series pairs capped at k(k-1)/2; equal-x pairs excluded") {
    val r = new Random(3)
    val long = (0 until 1000).map(i => (1L, i.toLong, r.nextDouble() * 100, i.toLong))
    val out = TheilSen.slope(long.toDF("key", "x", "y", "id"),
      "key", "x", "y", "id", k = 64, salt = "t").collect()
    assert(out(0).getLong(1) == 64L)               // n_sample
    assert(out(0).getLong(2) <= 64L * 63 / 2)      // n_pairs
    // all-equal x -> no pairs -> key absent entirely
    val flat = (0 until 10).map(i => (2L, 5L, i.toDouble, i.toLong))
    val out2 = TheilSen.slope(flat.toDF("key", "x", "y", "id"),
      "key", "x", "y", "id", k = 64, salt = "t")
    assert(out2.count() == 0)
  }
}
