package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree-ordered edge orientation
  * (the node-iterator++ / "compact-forward" scheme, Latapy 2008;
  * same orientation trick as Suri & Vassilvitskii's MapReduce
  * triangle count). Each undirected edge is oriented from its
  * lower-(degree, id) endpoint to the higher one; every triangle then
  * has exactly one vertex with two out-edges, so each triangle is
  * generated exactly once and the wedge space is Σ_v outdeg(v)² with
  * outdeg bounded by O(√|E|) — hub vertices never fan out.
  *
  * Scale design (100 TB): two vocabulary-of-edges shuffles (canonical
  * dedup + degree agg), one self-join on the wedge pivot, one
  * semi-join against the oriented edge set. No driver state, no
  * iteration, payloads are (vertex, vertex) pairs throughout.
  */
object Triangles {

  /** Per-vertex triangle participation counts over the undirected
    * simple graph induced by (`srcCol`, `dstCol`) edge rows
    * (direction and multiplicity collapse; self-loops drop). Emits
    * `(vertex, triangles)` for vertices in at least one triangle.
    */
  def perVertex(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // persist: the canonical edge set feeds the degree union (2 scans)
    // and the orientation join, and the ORIENTED set feeds the wedge
    // self-join (2 sides) plus the closing-edge semi-join — without
    // materialization the upstream edge producer (e.g. a windowed k-NN
    // graph) would recompute up to 6×. O(|E|) rows, ids+degree only.
    val canon = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
      .persist()

    val deg = canon.select(col("a").as("v"))
      .unionAll(canon.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))

    // total order (degree, id): orient each edge low → high
    def lt(d1: Column, v1: Column, d2: Column, v2: Column): Column =
      d1 < d2 || (d1 === d2 && v1 < v2)

    val oriented = canon
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(lt(col("da"), col("a"), col("db"), col("b")), col("a"))
          .otherwise(col("b")).as("u"),
        when(lt(col("da"), col("a"), col("db"), col("b")), col("b"))
          .otherwise(col("a")).as("w"),
        when(lt(col("da"), col("a"), col("db"), col("b")), col("db"))
          .otherwise(col("da")).as("dw"))
      // eager materialization + lineage truncation: the oriented set is
      // read 3× below (wedge self-join both sides + closing-edge join);
      // once it exists the canonical set is no longer needed
      .localCheckpoint()

    canon.unpersist()

    // wedges at the pivot u: pick the (degree, id)-ordered pair so the
    // closing edge is itself an oriented edge (v → w)
    val wedges = oriented.as("e1").join(oriented.as("e2"), col("e1.u") === col("e2.u"))
      .where(lt(col("e1.dw"), col("e1.w"), col("e2.dw"), col("e2.w")))
      .select(col("e1.u").as("x"), col("e1.w").as("y"), col("e2.w").as("z"))

    val tri = wedges.join(
      oriented.select(col("u").as("y"), col("w").as("z")), Seq("y", "z"))

    tri.select(explode(array(col("x"), col("y"), col("z"))).as("vertex"))
      .groupBy("vertex").agg(count(lit(1)).as("triangles"))
  }
}
