package graft.queries

import graft.SparkSpec

class AssocRulesSpec extends SparkSpec {

  test("assoc_rules: probability identities hold exactly") {
    val rows = Registry.byName("assoc_rules").fn(spark, sf("sf0.001"))
      .collect().map { r =>
        (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4),
            r.getDouble(5), r.getDouble(6), r.getDouble(7))
      }.toMap
    assert(rows.nonEmpty)
    rows.foreach { case ((a, b), (cab, ca, cb, sup, conf, lift)) =>
      // symmetry: joint count and support are direction-free
      val (cba, _, _, supBA, _, liftBA) = rows((b, a))
      assert(cba === cab, s"joint count must be symmetric for ($a,$b)")
      assert(supBA === sup && liftBA === lift)
      // identities on the exact counts
      assert(conf === cab.toDouble / ca)
      assert(cab <= math.min(ca, cb), "joint bounded by marginals")
      assert(sup > 0 && conf > 0 && conf <= 1.0 && lift > 0)
    }
    // confidence is direction-dependent exactly when the marginals
    // differ (conf(a→b)/conf(b→a) = cb... = ca/cb on equal joints);
    // assert the equivalence instead of assuming the data's shape
    rows.foreach { case ((a, b), (_, ca, cb, _, conf, _)) =>
      val confBA = rows((b, a))._5
      if (ca == cb) assert(math.abs(conf - confBA) < 1e-15)
      else assert(math.abs(conf - confBA) > 0, s"($a,$b): unequal marginals must skew confidence")
    }
  }
}
