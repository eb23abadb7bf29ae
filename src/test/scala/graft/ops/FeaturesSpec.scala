package graft.ops

import graft.SparkSpec

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("scale: min-max in [0,1], z-score population moments, per group") {
    val df = Seq(
      ("a", 1L, 0.0), ("a", 2L, 5.0), ("a", 3L, 10.0),
      ("b", 4L, 4.0), ("b", 5L, 8.0)
    ).toDF("k", "id", "v")
    val out = Features.scale(df, "k", "v").collect()
      .map(r => r.getLong(1) -> ((r.getAs[Double]("minmax"), r.getAs[Double]("zscore")))).toMap
    assert(out(1L)._1 == 0.0 && out(3L)._1 == 1.0 && out(2L)._1 == 0.5)
    // group a: mean 5, population sd = sqrt(50/3)
    val sdA = math.sqrt((125.0 - 15.0 * 15.0 / 3.0) / 3.0)
    assert(out(2L)._2 == 0.0)
    assert(math.abs(out(3L)._2 - 5.0 / sdA) < 1e-12)
    // group b: mean 6, sd 2 -> z = ±1
    assert(out(4L)._2 == -1.0 && out(5L)._2 == 1.0)
  }

  test("scale: constant group yields null minmax and zscore (no /0)") {
    val df = Seq(("c", 1L, 3.0), ("c", 2L, 3.0)).toDF("k", "id", "v")
    val out = Features.scale(df, "k", "v").collect()
    assert(out.forall(r => r.isNullAt(r.fieldIndex("minmax")) &&
      r.isNullAt(r.fieldIndex("zscore"))))
  }
}
