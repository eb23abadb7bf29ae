package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class QualityClassifierSpec extends SparkSpec {

  private def lnMicro(p: Double): Long =
    math.floor(math.log(p) * 1e6 + 0.5).toLong

  /** Independent driver-side NB reference: word counts per class,
    * Laplace llr in micro-nats, doc score = prior + Σ occurrences.
    */
  private def refScores(train: Seq[(Long, String, Boolean)],
                        test: Seq[(Long, String)]): Map[Long, (Long, Long, Long)] = {
    def toks(t: String): Seq[String] = t.trim.toLowerCase.split("\\s+").toSeq
    val tok = train.flatMap { case (_, t, pos) => toks(t).map(_ -> pos) }
    val cnt = tok.groupBy(_._1).map { case (w, xs) =>
      w -> (xs.count(_._2).toLong, xs.count(!_._2).toLong) }
    val totPos = cnt.values.map(_._1).sum
    val totNeg = cnt.values.map(_._2).sum
    val vv = cnt.size.toLong
    def llr(cp: Long, cn: Long): Long =
      lnMicro((cp + 1).toDouble / (totPos + vv)) -
        lnMicro((cn + 1).toDouble / (totNeg + vv))
    // NOTE the engine quantizes the DIFFERENCE of the two ln terms in
    // one floor, not each term separately: mirror that
    def llr1(cp: Long, cn: Long): Long =
      math.floor((math.log((cp + 1).toDouble / (totPos + vv)) -
        math.log((cn + 1).toDouble / (totNeg + vv))) * 1e6 + 0.5).toLong
    val _ = llr _ // silence unused for the two-fold variant
    val oov = llr1(0L, 0L)
    val nPos = train.count(_._3).toLong
    val nNeg = train.size - nPos
    val prior = math.floor(math.log(nPos.toDouble / nNeg.toDouble) * 1e6 + 0.5).toLong
    test.map { case (id, t) =>
      val ws = toks(t)
      val nOov = ws.count(w => !cnt.contains(w)).toLong
      val s = prior + ws.map(w =>
        cnt.get(w).map { case (cp, cn) => llr1(cp, cn) }.getOrElse(oov)).sum
      id -> (ws.size.toLong, nOov, s)
    }.toMap
  }

  private val train = Seq(
    (1L, "good clean prose with sentences", true),
    (2L, "another well formed paragraph of prose", true),
    (3L, "click here buy now cheap cheap", false),
    (4L, "spam list spam list keywords keywords keywords", false),
    (5L, "prose and sentences again", true))
  private val test = Seq(
    (10L, "clean prose sentences"),          // all positive-leaning
    (11L, "cheap spam keywords click"),      // all negative-leaning
    (12L, "prose unseen_word cheap"))        // mixed + OOV

  test("nbScore matches an independent driver-side NB recompute exactly") {
    import spark.implicits._
    val tr = train.toDF("doc_id", "text", "pos")
    val te = test.toDF("doc_id", "text")
    val model = QualityClassifier.nbModel(tr, "text", col("pos"))
    val prior = QualityClassifier.nbPrior(tr, col("pos"))
    val got = QualityClassifier.nbScore(te, "doc_id", "text", model, prior)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4))).toMap
    val want = refScores(train.map(t => (t._1, t._2, t._3)), test)
    assert(got.keySet === want.keySet)
    want.foreach { case (id, (n, nOov, s)) =>
      val (gn, goov, gs, gp) = got(id)
      assert(gn === n, s"n_tokens doc $id")
      assert(goov === nOov, s"oov_tokens doc $id")
      assert(gs === s, s"score_micro doc $id")
      assert(gp === (if (s > 0) 1 else 0), s"pred_pos doc $id")
    }
    // sanity on separation: the positive-leaning doc scores above the
    // negative-leaning one
    assert(got(10L)._3 > got(11L)._3)
  }

  test("model counts conserve the training token stream") {
    import spark.implicits._
    val tr = train.toDF("doc_id", "text", "pos")
    val m = QualityClassifier.nbModel(tr, "text", col("pos"))
      .agg(sum("c_pos"), sum("c_neg")).collect().head
    val wantPos = train.filter(_._3).map(_._2.trim.split("\\s+").length).sum
    val wantNeg = train.filterNot(_._3).map(_._2.trim.split("\\s+").length).sum
    assert(m.getLong(0) === wantPos)
    assert(m.getLong(1) === wantNeg)
  }

  test("hashedFeature bounds the model and scores every doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val feat = QualityClassifier.hashedFeature(64)
    val model = QualityClassifier.nbModel(trn, "text", col("lang") === "en", feat)
    assert(model.count() <= 64)
    val fRange = model.agg(min("f"), max("f")).collect().head
    assert(fRange.getLong(0) >= 0L && fRange.getLong(1) < 64L)
    val scored = QualityClassifier.nbScore(tst, "doc_id", "text", model,
      QualityClassifier.nbPrior(trn, col("lang") === "en"), feat)
    assert(scored.count() === tst.count())
    // hashing into 64 buckets on a ~30-word vocab has no OOV at score
    // time only if every test word's bucket was seen in train; allow
    // either, but the totals must still conserve
    val chk = scored.agg(sum("n_tokens")).collect().head.getLong(0)
    val want = tst.select(size(split(trim(lower(col("text"))), "\\s+")).as("n"))
      .agg(sum("n")).collect().head.getLong(0)
    assert(chk === want)
  }

  test("nbScoreMap (map-literal serving) is bit-equal to nbScore, word + hashed") {
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    for (feat <- Seq(QualityClassifier.wordFeature,
                     QualityClassifier.hashedFeature(64))) {
      val model = QualityClassifier.nbModel(trn, "text", pos, feat)
      val prior = QualityClassifier.nbPrior(trn, pos)
      val (m, oov, pm) = QualityClassifier.serve(model, prior)
      val a = QualityClassifier.nbScore(tst, "doc_id", "text", model, prior, feat)
        .orderBy("doc_id").collect().toSeq
      val b = QualityClassifier.nbScoreMap(tst, "doc_id", "text", m, oov, pm, feat)
        .orderBy("doc_id").collect().toSeq
      assert(a === b)
      assert(a.nonEmpty)
    }
  }

  test("nbScoreAuto dispatches by model size and stays bit-equal on both sides") {
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val pos = col("lang") === "en"
    // word model: ~31 features << 1024 ⇒ literal path
    val mSmall = QualityClassifier.nbModel(trn, "text", pos)
    val prior = QualityClassifier.nbPrior(trn, pos)
    assert(mSmall.count() <= QualityClassifier.LiteralModelMaxFeatures)
    val autoSmall = QualityClassifier.nbScoreAuto(tst, "doc_id", "text", mSmall, prior)
    assert(!autoSmall.queryExecution.executedPlan.toString().contains("Exchange"))
    // the two serving paths are bit-equal (pinned by the nbScoreMap
    // test above), so dispatch only has to pick one; the join side of
    // the perf law itself is NbServeExp's measurement, not a unit test
    val joinSmall = QualityClassifier.nbScore(tst, "doc_id", "text", mSmall, prior)
    assert(autoSmall.orderBy("doc_id").collect().toSeq ===
      joinSmall.orderBy("doc_id").collect().toSeq)
  }

  test("nbServeAuto picks the measured winner per route and every route is bit-equal, incl. degenerates") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val degenerate = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
      .union(Seq((900040L, null.asInstanceOf[String]), (900041L, ""),
        (900042L, "   \t  ")).toDF("doc_id", "text"))

    // route 1: hashed model + buckets ⇒ dense array literal, zero Exchange
    val featH = QualityClassifier.hashedFeature(4096)
    val mH = QualityClassifier.nbModel(trn, "text", pos, featH)
    val prior = QualityClassifier.nbPrior(trn, pos)
    val dense = QualityClassifier.nbServeAuto(degenerate, "doc_id", "text",
      mH, prior, featH, buckets = Some(4096))
    val (hm, hoov, hpm) = QualityClassifier.serve(mH.localCheckpoint(), prior)
    val refH = QualityClassifier.nbScoreMap(
      degenerate, "doc_id", "text", hm, hoov, hpm, featH)
    assert(dense.orderBy("doc_id").collect().toSeq ===
      refH.orderBy("doc_id").collect().toSeq)
    assert(!dense.queryExecution.executedPlan.toString().contains("Exchange"),
      "hashed route must serve dense: zero Exchange")

    // route 2: small word model ⇒ map literal, zero Exchange
    val mW = QualityClassifier.nbModel(trn, "text", pos)
    assert(mW.count() <= QualityClassifier.LiteralModelMaxFeatures)
    val litR = QualityClassifier.nbServeAuto(degenerate, "doc_id", "text", mW, prior)
    val refW = QualityClassifier.nbScore(degenerate, "doc_id", "text", mW, prior)
    val litRows = litR.orderBy("doc_id").collect().toSeq
    assert(litRows === refW.orderBy("doc_id").collect().toSeq)
    assert(!litR.queryExecution.executedPlan.toString().contains("Exchange"),
      "small word route must serve as map literal: zero Exchange")
    // shared degenerate contract on the auto surface itself
    assert(!litRows.exists(_.getLong(0) == 900040L), "null text dropped")
    Seq(900041L, 900042L).foreach { id =>
      val r = litRows.find(_.getLong(0) == id).get
      assert(r.getLong(1) >= 1L && r.getLong(2) === r.getLong(1), s"doc $id all-OOV")
    }

    // route 3: word model past the literal ceiling, batch ⇒ broadcast join
    val joinR = QualityClassifier.nbServeAuto(degenerate, "doc_id", "text",
      mW, prior, maxLiteralFeatures = 1)
    assert(joinR.orderBy("doc_id").collect().toSeq === litRows)
    val joinPlan = joinR.queryExecution.executedPlan.toString()
    assert(joinPlan.contains("BroadcastHashJoin") ||
      joinPlan.contains("BroadcastNestedLoopJoin"),
      s"large word route must broadcast-join the model:\n$joinPlan")

    // route 4: word model past the ceiling, STREAMING ⇒ one-row
    // broadcast-map form (nbScore's groupBy(doc) would be stateful)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    mem.addData(degenerate.collect().toSeq.map(r =>
      (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))))
    val streamed = QualityClassifier.nbServeAuto(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      mW, prior, maxLiteralFeatures = 1)
    assert(streamed.isStreaming, "stream route must stay a streaming plan")
    val q = streamed.writeStream.format("memory")
      .queryName("nb_auto_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("nb_auto_stream").orderBy("doc_id").collect().toSeq
    assert(got === litRows, "stream route bit-equal to the batch routes")
  }

  test("nbServeAuto refuses an unmeasured dense width: past-ceiling hashed models route to the join forms") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    // a hashed width past the measured dense bound; the model TABLE is
    // still vocabulary-bounded (~dozens of occupied rows here), so the
    // join forms serve it without ever tabulating B entries
    val b = graft.llm.Dsir.DenseModelMaxBuckets * 2
    val feat = QualityClassifier.hashedFeature(b)
    val model = QualityClassifier.nbModel(trn, "text", pos, feat)
    val prior = QualityClassifier.nbPrior(trn, pos)
    val batch = QualityClassifier.nbServeAuto(tst, "doc_id", "text",
      model, prior, feat, buckets = Some(b))
    val plan = batch.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"past-ceiling hashed batch route must broadcast-join the model:\n$plan")
    // bit-equal to the map-literal reference at the same width
    val (m, oov, pm) = QualityClassifier.serve(model.localCheckpoint(), prior)
    val ref = QualityClassifier.nbScoreMap(tst, "doc_id", "text", m, oov, pm, feat)
    assert(batch.orderBy("doc_id").collect().toSeq ===
      ref.orderBy("doc_id").collect().toSeq)
    // streaming input past the ceiling: the one-row broadcast-map form
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    mem.addData(tst.collect().toSeq.map(r => (r.getLong(0), r.getString(1))))
    val streamed = QualityClassifier.nbServeAuto(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      model, prior, feat, buckets = Some(b))
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory")
      .queryName("nb_auto_ceiling_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("nb_auto_ceiling_stream").orderBy("doc_id").collect().toSeq
      === ref.orderBy("doc_id").collect().toSeq)
  }

  test("nbServeAuto Some(b) routes derive hashedFeature(b) themselves: default feature is bit-equal to dense") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val b = 4096 // a fully-measured dense width
    val model = QualityClassifier.nbModel(trn, "text", pos,
      QualityClassifier.hashedFeature(b))
    val prior = QualityClassifier.nbPrior(trn, pos)
    // the dense reference at the same width — `feature` left at its
    // DEFAULT wordFeature on purpose: Some(b) is the contract
    val denseRows = QualityClassifier.nbServeAuto(tst, "doc_id", "text",
        model, prior, buckets = Some(b))
      .orderBy("doc_id").collect().toSeq
    // sanity: scores are NOT all-OOV (some tokens hit the model) —
    // the r11 footgun scored every token OOV on the join routes
    assert(denseRows.exists(r => r.getLong(2) < r.getLong(1)),
      "fixture must have in-vocabulary tokens for the footgun to matter")
    // force the past-ceiling JOIN route at the same measured width via
    // the test override, still with the DEFAULT feature param
    val joined = QualityClassifier.nbServeAuto(tst, "doc_id", "text",
      model, prior, buckets = Some(b), denseMaxBuckets = b - 1)
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"override must force the join route:\n$plan")
    assert(joined.orderBy("doc_id").collect().toSeq === denseRows,
      "past-ceiling join route with the default feature must derive hashedFeature(b)")
    // and the past-ceiling STREAM route (one-row broadcast map)
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)]
    mem.addData(tst.collect().toSeq.map(r => (r.getLong(0), r.getString(1))))
    val streamed = QualityClassifier.nbServeAuto(
      mem.toDF().toDF("doc_id", "text"), "doc_id", "text",
      model, prior, buckets = Some(b), denseMaxBuckets = b - 1)
    assert(streamed.isStreaming)
    val q = streamed.writeStream.format("memory")
      .queryName("nb_auto_derive_stream").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("nb_auto_derive_stream").orderBy("doc_id")
      .collect().toSeq === denseRows,
      "past-ceiling stream route with the default feature must derive hashedFeature(b)")
  }

  test("nbServeAuto leaves a caller's own cached model cached, drops its own checkpoint on literal routes") {
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val tst = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
    val pos = col("lang") === "en"
    val prior = QualityClassifier.nbPrior(trn, pos)
    // caller-persisted model: the auto must NOT unpersist it
    val mine = QualityClassifier.nbModel(trn, "text", pos).persist()
    mine.count()
    QualityClassifier.nbServeAuto(tst, "doc_id", "text", mine, prior).count()
    assert(mine.storageLevel.useMemory, "caller's cache must survive")
    mine.unpersist()
    // un-cached model through the literal route: the dispatcher's own
    // persist must be released. The CacheManager is keyed by analyzed
    // plan, so the caller's handle reads the internal cache's state —
    // a deterministic probe (a global getPersistentRDDs diff races
    // concurrently-running suites on the shared session)
    val m2 = QualityClassifier.nbModel(trn, "text", pos)
    assert(m2.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    val auto = QualityClassifier.nbServeAuto(tst, "doc_id", "text", m2, prior)
    auto.count()
    assert(m2.storageLevel === org.apache.spark.storage.StorageLevel.NONE,
      "literal route must drop the cache it created on the model plan")
  }

  test("nbFilter keeps exactly the nbScoreMap rows above the threshold") {
    val docs = Tables.documents(spark, sf())
      .select(col("doc_id"), col("text"), col("lang"))
    val trn = Tables.documents(spark, sf())
      .filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val (m, oov, pm) = QualityClassifier.serve(
      QualityClassifier.nbModel(trn, "text", pos),
      QualityClassifier.nbPrior(trn, pos))
    val thr = -1600000L
    val kept = QualityClassifier.nbFilter(docs, "text", m, oov, pm, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = QualityClassifier.nbScoreMap(docs, "doc_id", "text", m, oov, pm)
      .filter(col("score_micro") > thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === want)
    assert(kept.nonEmpty && kept.size < docs.count())
    // and it preserves the input schema (all columns flow through)
    assert(QualityClassifier.nbFilter(docs, "text", m, oov, pm, thr)
      .columns.toSeq === docs.columns.toSeq)
  }

  test("nbScoreMap is a pure projection: zero exchanges in the plan") {
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("lang") === "en"
    val (m, oov, pm) = QualityClassifier.serve(
      QualityClassifier.nbModel(trn, "text", pos),
      QualityClassifier.nbPrior(trn, pos))
    val plan = QualityClassifier.nbScoreMap(
        docs.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text",
        m, oov, pm)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"serving scorer must not shuffle:\n$plan")
  }

  test("nbScoreBroadcast (one-row broadcast join serving) is bit-equal to nbScore and nbScoreMap, incl. degenerates") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val degenerate = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
      .union(Seq((900020L, null.asInstanceOf[String]), (900021L, ""))
        .toDF("doc_id", "text"))
    // word features AND the past-the-literal-ceiling hashed form this
    // path exists for (B=4096 >> LiteralModelMaxFeatures)
    for (feat <- Seq(QualityClassifier.wordFeature,
                     QualityClassifier.hashedFeature(4096))) {
      val model = QualityClassifier.nbModel(trn, "text", pos, feat)
      val prior = QualityClassifier.nbPrior(trn, pos)
      val row = QualityClassifier.serveRow(model, prior).localCheckpoint()
      val bcast = QualityClassifier.nbScoreBroadcast(
        degenerate, "doc_id", "text", row, feat)
      val join = QualityClassifier.nbScore(
        degenerate, "doc_id", "text", model, prior, feat)
      assert(bcast.columns.toSeq === join.columns.toSeq)
      // nbScore's explode drops ALL-null-token docs too; compare on the
      // shared contract (null dropped) via the map-literal reference
      val (m, oov, pm) = QualityClassifier.serve(model, prior)
      val lit0 = QualityClassifier.nbScoreMap(
        degenerate, "doc_id", "text", m, oov, pm, feat)
      val b = bcast.orderBy("doc_id").collect().toSeq
      assert(b === lit0.orderBy("doc_id").collect().toSeq)
      assert(b === join.orderBy("doc_id").collect().toSeq)
      assert(b.nonEmpty && !b.exists(_.getLong(0) == 900020L))
      assert(b.exists(_.getLong(0) == 900021L))
      // stateless join shape: broadcast, and no Exchange on the doc side
      val plan = bcast.queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
        s"serving row must broadcast:\n$plan")
      // the one Exchange is the 1-row BroadcastExchange of the serving
      // row; any shuffle (hash/single-partition Exchange) is a bug
      assert(!plan.linesIterator.exists(l =>
        l.contains("Exchange") && !l.contains("BroadcastExchange")),
        s"doc side must not shuffle:\n$plan")
    }
  }

  test("nbScoreDense (O(1) array-literal serving) is bit-equal on hashed models, incl. degenerates, zero exchange") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf())
    val trn = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val pos = col("source").isin("src0", "src1", "src2", "src3")
    val degenerate = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("text"))
      .union(Seq((900030L, null.asInstanceOf[String]), (900031L, ""))
        .toDF("doc_id", "text"))
    for (b <- Seq(64, 4096)) {
      val feat = QualityClassifier.hashedFeature(b)
      val model = QualityClassifier.nbModel(trn, "text", pos, feat)
      val prior = QualityClassifier.nbPrior(trn, pos)
      val (m, oov, pm) = QualityClassifier.serve(model, prior)
      val (llr, occ, dpm) = QualityClassifier.serveDense(model, prior, b)
      assert(llr.size === b && occ.size === b && dpm === pm)
      // every unoccupied bucket carries the OOV mass
      assert(llr.zip(occ).forall { case (v, o) => o || v == oov })
      val dense = QualityClassifier.nbScoreDense(
        degenerate, "doc_id", "text", llr, occ, pm, b)
      val ref = QualityClassifier.nbScoreMap(
        degenerate, "doc_id", "text", m, oov, pm, feat)
      val d = dense.orderBy("doc_id").collect().toSeq
      assert(d === ref.orderBy("doc_id").collect().toSeq)
      assert(d.nonEmpty && !d.exists(_.getLong(0) == 900030L))
      assert(d.exists(_.getLong(0) == 900031L))
      val plan = dense.queryExecution.executedPlan.toString()
      assert(!plan.contains("Exchange"), s"dense scorer must not shuffle:\n$plan")
      // the dense GATE keeps exactly the dense scorer's above-threshold
      // rows, preserves all input columns, and drops null text
      val thr = -1600000L
      val kept = QualityClassifier.nbFilterDense(
        degenerate, "text", llr, pm, thr, b)
      assert(kept.columns.toSeq === degenerate.columns.toSeq)
      val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
      val want = QualityClassifier.nbScoreDense(
          degenerate, "doc_id", "text", llr, occ, pm, b)
        .filter(col("score_micro") > thr)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(keptIds === want)
      assert(!keptIds.contains(900030L))
    }
  }

  test("degenerate docs: every serving path drops null text, scores empty text as one OOV token") {
    import spark.implicits._
    val tr = train.toDF("doc_id", "text", "pos")
    val model = QualityClassifier.nbModel(tr, "text", col("pos"))
    val prior = QualityClassifier.nbPrior(tr, col("pos"))
    val (m, oov, pm) = QualityClassifier.serve(model, prior)
    val degenerate = (test ++ Seq(
      (20L, null.asInstanceOf[String]), // null text: not a document
      (21L, ""),                        // empty: one "" token, OOV
      (22L, "   \t  ")))                // whitespace-only: same
      .toDF("doc_id", "text")
    val a = QualityClassifier.nbScore(degenerate, "doc_id", "text", model, prior)
      .orderBy("doc_id").collect().toSeq
    val b = QualityClassifier.nbScoreMap(degenerate, "doc_id", "text", m, oov, pm)
      .orderBy("doc_id").collect().toSeq
    assert(a === b) // bit-equal INCLUDING the degenerate rows
    val ids = a.map(_.getLong(0))
    assert(!ids.contains(20L), "null-text doc must be dropped by every path")
    assert(ids.contains(21L) && ids.contains(22L))
    // every token of a blank doc is the empty string ⇒ all OOV (trim
    // strips spaces, not tabs, so doc 22 splits to TWO empty tokens —
    // the invariant is n_tokens = oov_tokens, score = prior + n·oov)
    Seq(21L, 22L).foreach { id =>
      val r = a.find(_.getLong(0) == id).get
      assert(r.getLong(1) >= 1L && r.getLong(2) === r.getLong(1), s"doc $id all-OOV")
      assert(r.getLong(3) === pm + r.getLong(1) * oov, s"doc $id score = prior + n·oov")
    }
    // the filter gate agrees with score-then-filter on the same corpus
    val thr = a.filter(r => Seq(21L, 22L).contains(r.getLong(0)))
      .map(_.getLong(3)).min - 1 // blank docs clear it, so they must FLOW
    val kept = QualityClassifier.nbFilter(degenerate, "text", m, oov, pm, thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val want = QualityClassifier.nbScoreMap(degenerate, "doc_id", "text", m, oov, pm)
      .filter(col("score_micro") > thr)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === want)
    assert(!kept.contains(20L) && kept.contains(21L) && kept.contains(22L))
    // auto-dispatch output row set is independent of which path it picks
    val auto = QualityClassifier.nbScoreAuto(degenerate, "doc_id", "text", model, prior)
      .orderBy("doc_id").collect().toSeq
    assert(auto === a)
  }

  test("single-class training data: NULL prior, serve fails fast, nbScore propagates NULL") {
    import spark.implicits._
    val tr = train.toDF("doc_id", "text", "pos")
    val allPos = QualityClassifier.nbPrior(tr, lit(true))
    assert(allPos.collect().head.isNullAt(2), "prior_micro must be NULL, not ±Inf garbage")
    val e = intercept[IllegalArgumentException] {
      QualityClassifier.serve(
        QualityClassifier.nbModel(tr, "text", lit(true)), allPos)
    }
    assert(e.getMessage.contains("single-class"))
    // the lazy join path cannot throw at build time; it must surface
    // NULL scores (visible) rather than Long.MaxValue (garbage)
    val te = test.toDF("doc_id", "text")
    val scored = QualityClassifier.nbScore(te, "doc_id", "text",
      QualityClassifier.nbModel(tr, "text", lit(true)), allPos).collect()
    assert(scored.nonEmpty)
    assert(scored.forall(_.isNullAt(3)), "score_micro must be NULL under a NULL prior")
  }

  test("paretoSample keeps high scores a.s., low scores at the heavy tail, deterministically") {
    import spark.implicits._
    // p ≈ 1 ⇒ keep needs deviate > ~0 ⇒ every doc survives;
    // p ≈ 0 ⇒ keep needs deviate > 1 ⇔ u > 1 − 2^−α ≈ 99.8% quantile
    val hi = (1L to 200L).map(i => (i, 50000000L)).toDF("doc_id", "score_micro")
    val lo = (1L to 200L).map(i => (i, -50000000L)).toDF("doc_id", "score_micro")
    val keptHi = QualityClassifier.paretoSample(hi, "doc_id", "score_micro").count()
    val keptLo = QualityClassifier.paretoSample(lo, "doc_id", "score_micro").count()
    assert(keptHi === 200L)
    assert(keptLo <= 5L) // expected ~0.4 of 200 at the 2^-9 tail
    // deterministic: same input ⇒ identical surviving set
    val a = QualityClassifier.paretoSample(lo, "doc_id", "score_micro")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = QualityClassifier.paretoSample(lo, "doc_id", "score_micro")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    // quantized keep-probability stays in [0, 1e6]
    val rng = QualityClassifier.paretoSample(hi, "doc_id", "score_micro")
      .agg(min("keep_p_micro"), max("keep_p_micro")).collect().head
    assert(rng.getLong(0) >= 0L && rng.getLong(1) <= 1000000L)
  }

  test("scoring plan broadcast-joins the model (no corpus-side exchange on f)") {
    import spark.implicits._
    val tr = train.toDF("doc_id", "text", "pos")
    val te = test.toDF("doc_id", "text")
    val plan = QualityClassifier.nbScore(te, "doc_id", "text",
      QualityClassifier.nbModel(tr, "text", col("pos")),
      QualityClassifier.nbPrior(tr, col("pos")))
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"model join must broadcast:\n$plan")
  }
}
