package graft.ops

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {
  import spark.implicits._

  private val lnContrib = (deg: Long) => (1e6 / math.log(deg.toDouble) + 0.5).toLong

  test("square graph: exact Adamic-Adar for the two diagonals, adjacents excluded") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val out = LinkPrediction.adamicAdar(edges, "src", "dst")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // diagonals (1,3) and (2,4): two common neighbors, each deg 2
    val aa = 2 * lnContrib(2)
    assert(out == Set((1L, 3L, 2L, aa), (2L, 4L, 2L, aa)))
  }

  test("adjacent pairs never appear even with many common neighbors") {
    // K4: every pair adjacent -> no predictions at all
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    assert(LinkPrediction.adamicAdar(edges, "src", "dst", minCommon = 1).count() == 0)
  }

  test("hub cap drops hot hubs: star center above maxHubDeg contributes nothing") {
    // star: center 0 with 5 leaves -> every leaf pair shares only hub 0 (deg 5)
    val edges = (1L to 5L).map(i => (0L, i)).toDF("src", "dst")
    assert(LinkPrediction.adamicAdar(edges, "src", "dst",
      minCommon = 1, maxHubDeg = 4).count() == 0)
    val uncapped = LinkPrediction.adamicAdar(edges, "src", "dst",
      minCommon = 1, maxHubDeg = 64)
    assert(uncapped.count() == 10) // C(5,2) leaf pairs
    // weight is 1/ln(5) each, exactly quantized
    assert(uncapped.collect().forall(_.getLong(3) == lnContrib(5)))
  }

  test("higher-degree common neighbors weigh less (the Adamic-Adar ordering)") {
    // pair (1,2) via rare hub 10 (deg 2); pair (3,4) via busy hub 20 (deg 4)
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 20L), (6L, 20L))
      .toDF("src", "dst")
    val out = LinkPrediction.adamicAdar(edges, "src", "dst", minCommon = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap
    assert(out((1L, 2L)) == lnContrib(2))
    assert(out((3L, 4L)) == lnContrib(4))
    assert(out((1L, 2L)) > out((3L, 4L)))
  }
}
