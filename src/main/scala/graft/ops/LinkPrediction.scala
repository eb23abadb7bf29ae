package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Adamic–Adar link prediction (Adamic & Adar 2003): score every
  * NON-adjacent node pair by Σ_{w ∈ N(u)∩N(v)} 1/ln(deg(w)) — common
  * neighbors weighted down by their promiscuity. The canonical
  * missing-edge ranking over a similarity graph: on an embedding kNN
  * graph it surfaces "should-be-neighbors" for hard-negative mining
  * and near-dup cluster completion.
  *
  * Determinism: every common neighbor has deg ≥ 2 by construction
  * (it touches both u and v), so ln(deg) ≥ ln 2 > 0; each hub
  * contribution 1e6/ln(deg) is floored to integer micro-units
  * immediately (the LangModel quantize-before-reorder policy) and
  * summed exactly.
  *
  * Scale design (100 TB): pairs are generated ONLY through shared
  * hubs — one self-equi-join of the (hub, neighbor) table with cost
  * Σ_w deg(w)², never all-pairs. Hubs with deg > `maxHubDeg` are
  * dropped pre-join (mirroring the gram df cap): a hot hub
  * contributes the least per pair (1/ln) yet deg² join rows, the
  * exact skew the cap kills. Adjacent pairs leave via one broadcast-
  * able anti-join on the (smaller) edge list.
  */
object LinkPrediction {

  /** `(id_a, id_b, n_common, aa_micro)` for non-adjacent pairs with
    * ≥ `minCommon` shared neighbors, id_a < id_b.
    */
  def adamicAdar(edges: DataFrame, srcCol: String, dstCol: String,
                 minCommon: Int = 2, maxHubDeg: Int = 64): DataFrame = {
    val und = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long"), col(srcCol).cast("long")))
      .distinct()
      .persist()
    val deg = und.groupBy("a").agg(count(lit(1)).as("deg"))
    // (hub w, neighbor u) with the hub's degree attached once
    val byHub = und.select(col("a").as("u"), col("b").as("w"))
      .join(deg.select(col("a").as("w"), col("deg")), Seq("w"))
      .filter(col("deg") <= maxHubDeg)
    val pairs = byHub.as("x").join(byHub.as("y"),
        col("x.w") === col("y.w") && col("x.u") < col("y.u"))
      .select(col("x.u").as("id_a"), col("y.u").as("id_b"),
        (lit(1e6) / log(col("x.deg")) + lit(0.5)).cast("long").as("contrib"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_common"), sum("contrib").as("aa_micro"))
      .filter(col("n_common") >= minCommon)
    // drop already-adjacent pairs (und holds both directions, so one
    // directed probe suffices for the a<b-normalized pair)
    pairs.join(und, pairs("id_a") === und("a") && pairs("id_b") === und("b"),
        "left_anti")
      .select("id_a", "id_b", "n_common", "aa_micro")
  }
}
