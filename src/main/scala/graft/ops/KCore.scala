package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by synchronous peeling: repeatedly delete
  * every node whose degree in the SURVIVING subgraph is < k; the
  * fixpoint is the k-core (Seidman 1983) — the standard graph
  * summary between connected components (k=1) and cliques, used to
  * find the dense backbone of an interaction graph.
  *
  * Determinism: each peel round is a pure function of the surviving
  * edge set (degree count + two semi-joins), so the result after R
  * rounds is engine- and partitioning-independent — the oracle
  * unrolls the identical R rounds (the [[Communities]] pattern). Run
  * with `rounds` ≥ the peel depth and the output IS the k-core;
  * KCoreSpec asserts fixpoint stability on the testdata graph, and
  * either way the R-round peel is a well-defined deterministic
  * object.
  *
  * Scale design (100 TB): each round is one degree aggregation plus
  * two equi-semi-joins on the edge list — O(|E|) per round, shuffled
  * by node id, no windows, no driver state. Peel depth on real
  * graphs is small (the degeneracy ordering collapses quickly);
  * lineage grows linearly in R so long runs should localCheckpoint
  * every few rounds (the [[PageRank]] recipe — not needed at R=3).
  */
object KCore {

  /** Nodes surviving `rounds` peels at threshold `k`, with their
    * degree in the final surviving subgraph: `(id, deg)`.
    */
  def nodes(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    // Loop knobs (the PageRank.ranks recipe): AQE off for the
    // fixed-shape peel rounds, optional per-round localCheckpoint
    // (lineage truncation — each round's plan otherwise embeds the
    // previous round's twice: once under the degree aggregate, once
    // as the join's left side). BOTH measured and BOTH lose here
    // (graft.tools.LoopExp interleaved, sf0.1, local[32], median of
    // 5): base 4.29 s; aqeoff 4.43 s; aqeoff+ckpt 6.50 s — at R=3 the
    // doubled-subplan lineage is still cheap to re-plan, ReuseExchange
    // already materializes each round's shuffle once, and the eager
    // checkpoint materialization is a pure extra job per round. AQE's
    // partition coalescing on the edge-sized exchanges outweighs its
    // re-planning latency (same verdict as Communities, opposite of
    // PageRank's node-sized state). Defaults = the measured winner
    // (plain loop); knobs kept so the verdict is re-measurable.
    val aqeOff = sys.props.getOrElse("graft.exp.kcore.aqeoff", "false").toBoolean
    val ckpt = sys.props.getOrElse("graft.exp.kcore.ckpt", "false").toBoolean
    val session = edges.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = session.conf.get(aqeKey)
    if (aqeOff) session.conf.set(aqeKey, "false")
    try {
    val und = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long"), col(srcCol).cast("long")))
      .distinct()
    var cur = und
    for (_ <- 1 to rounds) {
      val keep = cur.groupBy("a").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k).select("a")
      val next = cur.join(keep.withColumnRenamed("a", "ka"), col("a") === col("ka"))
        .join(keep.withColumnRenamed("a", "kb"), col("b") === col("kb"))
        .select("a", "b")
      cur = if (ckpt) next.localCheckpoint(eager = false) else next
    }
    cur.groupBy("a").agg(count(lit(1)).as("deg"))
      .select(col("a").as("id"), col("deg"))
    } finally session.conf.set(aqeKey, prevAqe)
  }
}
