package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Machine re-measurement of every measured-and-decided experiment
  * knob (r12 VERDICT #9): each A/B verdict recorded in code comments
  * is ALSO encoded here as data, so a future change that silently
  * flips a verdict (the way the r12 kernel work flipped
  * training_shards' curated-persist balance) is caught by running this
  * tool, not by someone remembering a comment.
  *
  * For each entry the tool runs the interleaved-arm discipline of
  * [[LoopExp]] (default arm vs the recorded REJECTED arm, alternating
  * per sweep within one JVM, median of n, noop sink) and flags a FLIP
  * when the rejected arm beats the default by more than the noise
  * margin (15% on the entry's query-total median — same materiality
  * bar the original verdicts used). Entries marked `scaleException`
  * are expected to lose locally (the default was chosen for its
  * 100 TB shape, not its sf0.1 seconds) and are report-only.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 tools/run.sh graft.tools.KnobLedger \
  *     <sfDir> <nSweeps> [entryName,entryName,...]
  * Exit 1 iff any non-exception entry flipped.
  */
object KnobLedger {

  final case class Entry(
      name: String,
      queries: Seq[String],
      arm: Map[String, String],
      note: String,
      scaleException: Boolean = false)

  /** The ledger: default is the recorded winner; `arm` is the recorded
    * LOSER (or the scale-shape trade marked as an exception).
    */
  val entries: Seq[Entry] = Seq(
    Entry("lm-persist", Seq("lm_bigram_score", "ccnet_buckets"),
      Map("graft.exp.lm.persist" -> "true"),
      "bigram stream wider than source; recompute wins (r12)"),
    Entry("bm25-persist", Seq("bm25_topk"),
      Map("graft.exp.bm25.persist" -> "true"),
      "tf table persist loses; cache write serializes widest intermediate (r12)"),
    Entry("bm25-legacy", Seq("bm25_topk", "bm25_pruned"),
      Map("graft.exp.bm25.legacy" -> "true"),
      "per-stat explodes + tf-dl join; map-side stats win (r13)"),
    Entry("winnow-persist", Seq("winnow_pairs"),
      Map("graft.exp.winnow.persist" -> "true"),
      "AQE ReuseExchange fires on the self-join; recompute wins (r12)"),
    Entry("overlap-persist", Seq("dup_ngram_pairs"),
      Map("graft.exp.overlap.persist" -> "true"),
      "same mechanism as winnow-persist (r12)"),
    Entry("shards-persistcurated", Seq("training_shards"),
      Map("graft.exp.shards.persistcurated" -> "true"),
      "flipped to recompute after the md5 kernels cheapened the slice (r12)"),
    Entry("pq-fused", Seq("pq_topk", "ann_ivfpq_topk"),
      Map("graft.exp.pq.fused" -> "true"),
      "fused-subspace encode loses to sequential (r12)"),
    Entry("theilsen-nopersist", Seq("theilsen_slope"),
      Map("graft.exp.theilsen.persistsample" -> "false"),
      "broadcast side defeats ReuseExchange; persist wins (r12)"),
    Entry("decontam-nopersist", Seq("decontam_overlap", "decontam_bloom"),
      Map("graft.exp.decontam.persist" -> "false"),
      "train gram table feeds explode + final join; persist wins 2x (r12)"),
    Entry("texthash-portable", Seq("doc_fingerprint", "ngram_jaccard"),
      Map("graft.exp.texthash.native" -> "false"),
      "fused md5 kernels ~4x on the hashing family (r12)"),
    Entry("bpe-nobatch", Seq("bpe_vocab"),
      Map("graft.exp.bpe.batch" -> "1"),
      "batched merge selection divides per-round fixed cost (r12)"),
    Entry("pagerank-aqeoff", Seq("supplier_pagerank"),
      Map("graft.exp.pagerank.aqeoff" -> "true"),
      "AQE-on flipped in at local[32] (r12)"),
    Entry("pagerank-c0bcast", Seq("supplier_pagerank"),
      Map("graft.exp.pagerank.c0bcast" -> "true"),
      "driver-literal scalars beat per-iter broadcast rebuild (r13)"),
    Entry("kcore-lazy", Seq("kcore_nodes"),
      Map("graft.exp.kcore.eager" -> "false"),
      "eager per-round checkpoints stop round re-execution (r13)"),
    Entry("kcore-aqeoff", Seq("kcore_nodes"),
      Map("graft.exp.kcore.aqeoff" -> "true"),
      "AQE coalescing load-bearing on edge-sized exchanges (r12)"),
    Entry("lpa-eager", Seq("label_communities"),
      Map("graft.exp.lpa.eager" -> "true", "graft.exp.lpa.eagerlabels" -> "true"),
      "LPA und exchange reuse-shared; eager adds jobs (r13)"),
    Entry("lpa-aqeoff", Seq("label_communities"),
      Map("graft.exp.lpa.aqeoff" -> "true"),
      "AQE coalescing wins on the 2|E| label stream (r12)"),
    Entry("cc-antijoin-probe", Seq("dedup_clusters"),
      Map("graft.exp.cc.obsprobe" -> "false"),
      "observe() convergence flags ride the checkpoint actions (r13)"),
    Entry("cc-fusedprobe", Seq("dedup_clusters"),
      Map("graft.exp.cc.obsprobe" -> "false", "graft.exp.cc.fusedprobe" -> "true"),
      "union-fused probe loses the per-side broadcast plan (r5)"),
    Entry("cc-aqeoff", Seq("dedup_clusters"),
      Map("graft.exp.cc.aqeoff" -> "true"),
      "AQE coalescing of pair-graph exchanges load-bearing (r12)"),
    Entry("corr-decimal", Seq("corr_features"),
      Map("graft.exp.corr.decimal" -> "true"),
      "long-unscaled moments with range guard beat int128 decimal (r13)"),
    Entry("scan-spread", Seq("lm_bigram_score", "pq_topk", "doc_fingerprint"),
      Map("graft.exp.scan.spread" -> "true"),
      "rejected: subtree futures already parallelize; 32-task partial aggs GC-thrash (r13)"),
    Entry("pareto-window", Seq("pareto_front"),
      Map("graft.exp.pareto.window" -> "true"),
      "single-task window FASTER at sf0.1; two-phase kept for 100TB shape (r13)",
      scaleException = true)
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val nSweeps = args(1).toInt
    val subset = args.lift(2)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val todo = entries.filter(e => subset.forall(_.contains(e.name)))
    require(todo.nonEmpty, "no ledger entries match the filter")

    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def withProps[T](props: Map[String, String])(body: => T): T = {
      val saved = props.keys.map(k => k -> sys.props.get(k)).toMap
      props.foreach { case (k, v) => sys.props(k) = v }
      try body
      finally saved.foreach {
        case (k, Some(v)) => sys.props(k) = v
        case (k, None) => sys.props.remove(k)
      }
    }

    def runOne(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      System.gc()
      dt
    }

    def med(xs: Vector[Double]) = { val s = xs.sorted; s(s.size / 2) }

    val warmDir = sfDir.replaceAll("sf[0-9.]+/?$", "sf0.001")
    var flips = 0
    for (e <- todo) {
      for (q <- e.queries) { runOne(q, warmDir); withProps(e.arm)(runOne(q, warmDir)) }
      val defT = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
      val armT = collection.mutable.Map.empty[String, Vector[Double]].withDefaultValue(Vector.empty)
      for (_ <- 1 to nSweeps; q <- e.queries) {
        defT(q) = defT(q) :+ runOne(q, sfDir)
        withProps(e.arm) { armT(q) = armT(q) :+ runOne(q, sfDir) }
      }
      val d = e.queries.map(q => med(defT(q))).sum
      val a = e.queries.map(q => med(armT(q))).sum
      val flip = a < d * 0.85
      val tag =
        if (!flip) "ok"
        else if (e.scaleException) "arm-wins (scale exception, report-only)"
        else { flips += 1; "FLIP" }
      println(f"${e.name}%-22s default ${d}%7.3f s  arm ${a}%7.3f s  $tag  // ${e.note}")
    }
    spark.stop()
    if (flips > 0) { println(s"$flips verdict flip(s) — re-measure and update defaults"); sys.exit(1) }
  }
}
