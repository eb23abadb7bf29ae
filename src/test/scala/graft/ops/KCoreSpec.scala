package graft.ops

import graft.{SparkSpec, Tables}
import graft.queries.Registry
import org.apache.spark.sql.functions._

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  test("hand graph: pendant peeled, cycle survives as the 2-core with exact degrees") {
    // triangle 1-2-3 plus pendant 4 hanging off 1
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val out = KCore.nodes(edges, "src", "dst", k = 2, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((1L, 2L), (2L, 2L), (3L, 2L)))
  }

  test("cascade: peeling one node can drag down another (path graph fully dissolves)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    // every endpoint eventually drops below 2: 1 and 4 peel first,
    // then 2 and 3 — a 2-round cascade
    assert(KCore.nodes(edges, "src", "dst", k = 2, rounds = 1).count() == 2)
    assert(KCore.nodes(edges, "src", "dst", k = 2, rounds = 2).count() == 0)
  }

  test("kcore_nodes query rounds reach the fixpoint on the testdata graph") {
    val o = Tables.orders(spark, sf("sf0.01"))
      .select(col("o_orderkey"), (col("o_custkey") * 2).as("src"))
    val l = Tables.lineitem(spark, sf("sf0.01"))
      .select(col("l_orderkey"), (col("l_suppkey") * 2 + 1).as("dst"))
    val edges = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .select("src", "dst")
    val r3 = KCore.nodes(edges, "src", "dst", k = 30, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r4 = KCore.nodes(edges, "src", "dst", k = 30, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r3 == r4, "query's 3 rounds have not converged — raise rounds")
    assert(r3.nonEmpty && r3.forall(_._2 >= 30))
    // and the registered query agrees with the direct call
    val q = Registry.byName("kcore_nodes").fn(spark, sf("sf0.01"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(q == r3)
  }
}
