package graft.ops

import graft.SparkSpec

class TrianglesSpec extends SparkSpec {

  private def counts(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.perVertex(edges.toDF("src", "dst"), "src", "dst")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  /** Reference: enumerate canonical vertex triples directly. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.collect { case (a, b) if a != b =>
      (math.min(a, b), math.max(a, b)) }.toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      i <- vs.indices; j <- (i + 1) until vs.size; k <- (j + 1) until vs.size
      x = vs(i); y = vs(j); z = vs(k)
      if e((x, y)) && e((x, z)) && e((y, z))
    } yield Seq(x, y, z)
    tris.flatten.groupBy(identity).map { case (v, o) => v -> o.size.toLong }
  }

  test("K4 + separate triangle + triangle-free path: exact participation counts") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val edges = k4 ++ Seq((7L, 8L), (8L, 9L), (9L, 7L), (5L, 6L))
    val out = counts(edges)
    // each K4 vertex sits in C(3,2)=3 triangles; 7/8/9 in one; 5/6 in none
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L,
      7L -> 1L, 8L -> 1L, 9L -> 1L))
  }

  test("direction, multiplicity and self-loops collapse before counting") {
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (2L, 2L))
    assert(counts(edges) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("degree-ordered count equals brute-force triple enumeration (hub graph)") {
    // hub vertex 0 connected to all; ring among 1..8 — skewed degrees
    val hub = (1L to 8L).map(v => (0L, v))
    val ring = (1L to 8L).map(v => (v, if (v == 8L) 1L else v + 1))
    val edges = hub ++ ring
    assert(counts(edges) === brute(edges))
  }
}
