package graft.queries

import graft.SparkSpec

class SpearmanSpec extends SparkSpec {

  test("spearman_rank matches an independent rank-correlation computation") {
    val got = Registry.byName("spearman_rank").fn(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent reference: collect raw (value, ts, id) and rank in Scala
    val raw = graft.Tables.events(spark, sf("sf0.001"))
      .selectExpr("event_type", "value", "unix_micros(ts) as tus", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    raw.foreach { case (g, rows) =>
      val byV = rows.sortBy(r => (r._2, r._4)).zipWithIndex
        .map { case (r, i) => r._4 -> (i + 1).toLong }.toMap
      val byT = rows.sortBy(r => (r._3, r._4)).zipWithIndex
        .map { case (r, i) => r._4 -> (i + 1).toLong }.toMap
      val n = rows.length.toLong
      val (s1, s2, s11, s22, s12) = rows.foldLeft((0L, 0L, 0L, 0L, 0L)) {
        case ((a, b, c, d, e), r) =>
          val r1 = byV(r._4); val r2 = byT(r._4)
          (a + r1, b + r2, c + r1 * r1, d + r2 * r2, e + r1 * r2)
      }
      val rho = (n.toDouble * s12 - s1.toDouble * s2) /
        (math.sqrt(n.toDouble * s11 - s1.toDouble * s1) *
          math.sqrt(n.toDouble * s22 - s2.toDouble * s2))
      val (gotN, gotRho) = got(g)
      assert(gotN === n)
      assert(math.abs(gotRho - rho) < 1e-12, s"$g: $gotRho vs $rho")
      assert(gotRho >= -1.0 && gotRho <= 1.0)
    }
    assert(got.nonEmpty)
  }
}
