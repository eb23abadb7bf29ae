package graft.ops

import java.sql.Timestamp

import scala.util.Random

import graft.SparkSpec

/** Kyle lambda / Amihud / bipower variation: exact known-answer cases
  * plus seeded brute-force equality on random series. Prices are
  * multiples of 1/16 (exact in both double and scale-4 decimal), so
  * the reference can replay the decimal-exact moment sums in
  * BigDecimal and the final double assembly with the identical IEEE
  * op shape — equality is exact, not approximate.
  */
class MicrostructureSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // tick rule: up +1, down -1, unchanged carries, leading ties +1
  private def tickSigns(ps: Seq[Double]): Seq[Int] =
    ps.zip(ps.head +: ps.dropRight(1)).tail
      .scanLeft(1) { case (prev, (p, pl)) =>
        if (p > pl) 1 else if (p < pl) -1 else prev
      }.tail

  test("kyleLambda recovers an exact linear impact: lambda=0.5, r2=1") {
    // sv = qty on an all-up-tick path; dp = 0.5 * sv exactly
    val qs = Seq(1, 2, 3, 4)
    val ps = qs.scanLeft(100.0)((p, q) => p + 0.5 * q)
    val rows = ps.zipWithIndex.map { case (p, i) =>
      ("k", ts(i + 1), i.toLong, p, if (i == 0) 9 else qs(i - 1))
    }
    val df = rows.toDF("k", "t", "id", "p", "q")
    val r = Indicators.kyleLambda(df, "k", Seq("t", "id"), "p", "q").head()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Double]("kyle_lambda") == 0.5)
    assert(r.getAs[Double]("intercept") == 0.0)
    assert(r.getAs[Double]("r2") == 1.0)
  }

  test("kyleLambda: zero signed-volume variance reports NULL lambda") {
    // constant price => all ties carry the leading +1; constant qty
    // => sv constant => var(sv) = 0
    val df = (1 to 5).map(i => ("k", ts(i), i.toLong, 100.0, 7))
      .toDF("k", "t", "id", "p", "q")
    val r = Indicators.kyleLambda(df, "k", Seq("t", "id"), "p", "q").head()
    assert(r.isNullAt(r.fieldIndex("kyle_lambda")))
    assert(r.isNullAt(r.fieldIndex("r2")))
  }

  test("kyleLambda equals a brute-force regression on random series") {
    val rnd = new Random(421)
    val keys = Seq("a", "b", "c")
    val rows = keys.flatMap { k =>
      (1 to 120).map { i =>
        val p = (1600 + rnd.nextInt(160) - 80) / 16.0
        (k, ts(i), i.toLong, p, 1 + rnd.nextInt(9))
      }
    }
    val got = Indicators
      .kyleLambda(rows.toDF("k", "t", "id", "p", "q"), "k", Seq("t", "id"), "p", "q")
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("kyle_lambda"), r.getAs[Double]("intercept"),
          r.getAs[Double]("r2"))).toMap

    for (k <- keys) {
      val series = rows.filter(_._1 == k).sortBy(_._3)
      val ps = series.map(_._4)
      val signs = tickSigns(ps)
      val ds = ps.zip(ps.tail).map { case (a, b) =>
        BigDecimal(b).setScale(4) - BigDecimal(a).setScale(4)
      }
      val svs = series.tail.map(_._5).zip(signs).map { case (q, s) => s.toLong * q }
      val n = ds.size.toDouble
      val sd = ds.sum.toDouble
      val sd2 = ds.map(d => d * d).sum.toDouble
      val ssv = svs.sum.toDouble
      val ssv2 = svs.map(v => v * v).sum.toDouble
      val sdsv = ds.zip(svs).map { case (d, v) => d * BigDecimal(v) }.sum.toDouble
      val cov = n * sdsv - sd * ssv
      val varSv = n * ssv2 - ssv * ssv
      val varD = n * sd2 - sd * sd
      assert(got(k) == (cov / varSv, (sd - (cov / varSv) * ssv) / n,
        cov * cov / (varSv * varD)), s"key $k")
    }
  }

  test("amihud: single known move") {
    // |dp| = 1 over prev price 100, qty 2 -> 1/(100*2) = 0.005/trade
    val df = Seq(
      ("k", ts(1), 1L, 100.0, 5),
      ("k", ts(2), 2L, 101.0, 2)
    ).toDF("k", "t", "id", "p", "q")
    val r = Indicators.amihud(df, "k", "t", "p", "q", tieCols = Seq("id")).head()
    assert(r.getAs[Long]("n_obs") == 1L)
    assert(r.getAs[Long]("sum_pico") == 5000000000L)
    assert(r.getAs[Double]("amihud") == 0.005)
  }

  test("amihud equals the brute pico-quantized mean; bad rows dropped") {
    val rnd = new Random(99)
    val rows = (1 to 200).map { i =>
      val p = (800 + rnd.nextInt(800)) / 16.0
      ("k", ts(i), i.toLong, p, rnd.nextInt(6)) // qty 0 rows must drop
    }
    val out = Indicators
      .amihud(rows.toDF("k", "t", "id", "p", "q"), "k", "t", "p", "q",
        tieCols = Seq("id"))
      .collect()
    assert(out.length == 1) // all ts on one 1970-01-01 day
    val ps = rows.map(_._4)
    val terms = ps.zip(ps.tail).zip(rows.tail.map(_._5)).collect {
      case ((pl, p), q) if pl > 0 && q > 0 && p != pl =>
        math.floor(math.abs((BigDecimal(p).setScale(4) -
          BigDecimal(pl).setScale(4)).toDouble) / (pl * q.toDouble) * 1e12).toLong
      case ((pl, p), q) if pl > 0 && q > 0 => 0L
    }
    assert(out.head.getAs[Long]("n_obs") == terms.size.toLong)
    assert(out.head.getAs[Long]("sum_pico") == terms.sum)
    assert(out.head.getAs[Double]("amihud") ==
      terms.sum.toDouble / terms.size.toDouble / 1e12)
  }

  test("bipower: constant series has zero variance; jump inflates RV over BPV") {
    val const = (1 to 10).map(i => ("k", ts(i), i.toLong, 50.0))
      .toDF("k", "t", "id", "p")
    val rc = Indicators.bipowerVariation(const, "k", Seq("t", "id"), "p").head()
    assert(rc.getAs[Double]("realized_var") == 0.0)
    assert(rc.getAs[Double]("bipower_var") == 0.0)
    assert(rc.isNullAt(rc.fieldIndex("jump_share")))

    // smooth +-0.0625 alternation, one 10-unit jump in the middle:
    // the jump enters RV as d^2=100 but BPV only via |d||d_adjacent|
    val ps = (1 to 40).map(i => 100.0 + (if (i % 2 == 0) 0.0625 else 0.0)) ++
      Seq(110.0) ++ (1 to 40).map(i => 110.0 + (if (i % 2 == 0) 0.0625 else 0.0))
    val jump = ps.zipWithIndex.map { case (p, i) => ("k", ts(i + 1), i.toLong, p) }
      .toDF("k", "t", "id", "p")
    val rj = Indicators.bipowerVariation(jump, "k", Seq("t", "id"), "p").head()
    assert(rj.getAs[Double]("jump_var") > 0.0)
    assert(rj.getAs[Double]("jump_share") > 0.9) // jump dominates variance
  }

  test("bipower equals brute decimal moments on random series") {
    val rnd = new Random(7)
    val rows = (1 to 150).map { i =>
      ("k", ts(i), i.toLong, (1600 + rnd.nextInt(320) - 160) / 16.0)
    }
    val r = Indicators
      .bipowerVariation(rows.toDF("k", "t", "id", "p"), "k", Seq("t", "id"), "p")
      .head()
    val ps = rows.map(_._4)
    val ds = ps.zip(ps.tail).map { case (a, b) =>
      BigDecimal(b).setScale(4) - BigDecimal(a).setScale(4)
    }
    val pairs = ds.zip(ds.tail) // (d_{t-1}, d_t) both defined
    val rv = pairs.map { case (_, d) => d * d }.sum.toDouble
    val bpv = 1.5707963267948966 * pairs.map { case (dl, d) => d.abs * dl.abs }.sum.toDouble
    assert(r.getAs[Long]("n") == pairs.size.toLong)
    assert(r.getAs[Double]("realized_var") == rv)
    assert(r.getAs[Double]("bipower_var") == bpv)
    assert(r.getAs[Double]("jump_var") == math.max(rv - bpv, 0.0))
  }
}
