package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Supervised model-based quality filtering — the fasttext-classifier
  * stage of the GPT-3 / CCNet-style curation pipeline (Brown et al.
  * 2020 §A: a linear classifier trained curated-vs-CommonCrawl gates
  * web documents; Joulin et al. 2016 for the bag-of-words + hashing
  * model family; Wenzek et al. 2019 pairs the same idea with the LM
  * perplexity buckets already in `LangModel`/ccnet_buckets).
  *
  * The classifier here is multinomial Naive Bayes rather than
  * logistic regression: NB training is CLOSED-FORM over token counts
  * — two `groupBy` aggregations, no iterative driver loop — so it is
  * embarrassingly distributed, one-pass at 100 TB, and exactly
  * reproducible in the DuckDB oracle (a gradient-descent LR would be
  * neither closed-form nor order-independent). For short web-text
  * quality gating NB and LR are interchangeable in practice; what
  * production cares about (a per-document log-linear score over token
  * features at scan speed) is identical.
  *
  * Determinism policy (Registry doc): token counts are exact
  * integers; each feature's smoothed log-likelihood-ratio is
  * quantized to integer micro-nats (`floor(ln(·)·1e6 + 0.5)`) BEFORE
  * any reordering aggregate, so document scores are exact integer
  * sums — bit-identical across partitionings and engines.
  *
  * Scale shape:
  *  - train: one map-side explode + one `groupBy(feature)` with
  *    partial aggregation — the shuffle carries (feature, c_pos,
  *    c_neg) partials, the result is vocabulary-bounded (and with
  *    [[hashedFeature]] HARD-bounded at `buckets` rows — the fasttext
  *    hashing trick — regardless of corpus vocabulary).
  *  - score: map-side explode, broadcast-join the model (legal by the
  *    bucket bound), map-side coalesce to the OOV constant, one
  *    `groupBy(doc)` of integer partials. One shuffle end-to-end,
  *    scan-dominated — the same profile as [[Dsir.scoreWith]].
  */
object QualityClassifier {

  import TextHash.words

  private def toks(textCol: Column): Column = words(lower(trim(textCol)))

  /** Degenerate-document contract (uniform across [[nbScore]],
    * [[nbScoreMap]], [[nbFilter]], and therefore [[nbScoreAuto]]):
    * a NULL `text` is not a document — every serving path DROPS the
    * row (r9 ADVICE: `nbScore`'s explode silently dropped it while
    * `nbScoreMap` emitted NULL stats and `nbScoreAuto` made the
    * output row set depend on model size). An EMPTY or
    * whitespace-only text tokenizes to one or more EMPTY tokens
    * (Spark and DuckDB both split `''` to `['']`; `trim` strips
    * spaces but not tabs, so a tab-bearing blank splits to several),
    * every one of which scores OOV on every path — the pinned
    * invariant is `n_tokens >= 1` and `n_tokens = oov_tokens`
    * (QualityClassifierSpec degenerate fixtures).
    */
  private def dropNullText(docs: DataFrame, textCol: String): DataFrame =
    docs.filter(col(textCol).isNotNull)

  /** Identity features: the token itself (interpretable model). */
  val wordFeature: Column => Column = identity

  /** Hashing-trick features (Joulin et al. 2016): md5-derived 32-bit
    * hash mod `buckets`, so the model is ≤ buckets rows no matter how
    * large the corpus vocabulary grows — the property that keeps the
    * score-side broadcast join legal at 100 TB. md5 (not Spark
    * `hash()`) so the DuckDB oracle reproduces buckets bit-for-bit.
    */
  def hashedFeature(buckets: Int): Column => Column =
    w => {
      // Scalar h32 through the native kernel when the plan is being
      // built under a session carrying GraftExtensions (the feature
      // closure has no DataFrame to consult — the active session at
      // construction time is the session that will resolve the call).
      // One md5 → hex → conv chain per exploded token otherwise.
      // Bit-equality in TextHashExpressionsSpec.
      val native = org.apache.spark.sql.SparkSession.getActiveSession
        .exists(TextHash.nativeHash(_, "h32_native"))
      if (native)
        pmod(call_function("h32_native", concat(lit("nbq:"), w)), lit(buckets.toLong))
      else pmod(TextHash.h32(concat(lit("nbq:"), w)), lit(buckets.toLong))
    }

  /** Train the NB model: one row per feature,
    * `(f, c_pos, c_neg, llr_micro)` where
    * `llr = ln((c_pos+1)/(tot_pos+V)) − ln((c_neg+1)/(tot_neg+V))`
    * (Laplace smoothing; V = number of distinct features in train),
    * quantized to micro-nats. `posLabel` is a boolean Column over the
    * training frame's columns (e.g. `col("source").isin("src0",…)`).
    *
    * The per-feature llr needs the GLOBAL scalars (tot_pos, tot_neg,
    * V); they are one 3-column aggregate of the count table,
    * broadcast back — vocabulary-sized input, 1-row output.
    */
  def nbModel(train: DataFrame, textCol: String, posLabel: Column,
              feature: Column => Column = wordFeature): DataFrame = {
    val counts = train
      .select(posLabel.as("__pos"), explode(toks(col(textCol))).as("__w"))
      .select(col("__pos"), feature(col("__w")).as("f"))
      .groupBy("f")
      .agg(sum(when(col("__pos"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(col("__pos"), 0L).otherwise(1L)).as("c_neg"))
    val stats = counts.agg(
      sum("c_pos").as("tot_pos"), sum("c_neg").as("tot_neg"),
      count(lit(1)).as("vv"))
    counts.crossJoin(broadcast(stats))
      .select(col("f"), col("c_pos"), col("c_neg"),
        llrMicro(col("c_pos"), col("c_neg"),
          col("tot_pos"), col("tot_neg"), col("vv")).as("llr_micro"))
  }

  /** Class prior as one broadcastable row `(n_pos, n_neg,
    * prior_micro)` — `floor(ln(n_pos/n_neg)·1e6 + 0.5)` over TRAIN
    * document counts.
    *
    * Single-class guard (r9 ADVICE): `n_neg = 0` would give
    * `ln(n_pos/0.0) = ln(Inf)`, whose non-ANSI long cast floors to
    * `Long.MaxValue` and silently corrupts every downstream
    * `score_micro` (`n_pos = 0` likewise via −Inf). A one-class
    * training frame instead yields a NULL `prior_micro`, which
    * [[serve]] rejects fast with the class counts in the message and
    * [[nbScore]] propagates as NULL scores — visible, never garbage.
    */
  def nbPrior(train: DataFrame, posLabel: Column): DataFrame =
    train.agg(
        sum(when(posLabel, 1L).otherwise(0L)).as("n_pos"),
        sum(when(posLabel, 0L).otherwise(1L)).as("n_neg"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          floor(log(col("n_pos").cast("double") / col("n_neg").cast("double"))
            * lit(1e6) + lit(0.5)).cast("long")).as("prior_micro"))

  /** Integer micro-nat smoothed LLR — quantize-before-sum (Registry
    * numeric policy): both engines compute `ln` on the IDENTICAL
    * doubles (exact-integer ratios are correctly-rounded IEEE
    * divisions), so the quantized value matches bit-for-bit.
    */
  private def llrMicro(cPos: Column, cNeg: Column,
                       totPos: Column, totNeg: Column, vv: Column): Column =
    floor((log((cPos + 1).cast("double") / (totPos + vv).cast("double")) -
      log((cNeg + 1).cast("double") / (totNeg + vv).cast("double")))
      * lit(1e6) + lit(0.5)).cast("long")

  /** Score documents under a trained model:
    * `(doc_id, n_tokens, oov_tokens, score_micro, pred_pos)` with
    * `score = prior + Σ_occurrences llr(f)`; features absent from the
    * model contribute the OOV llr (Laplace mass `1/(tot_c + V)`).
    * `pred_pos = 1 ⇔ score_micro > 0` — the MAP decision; production
    * keeps `score_micro` and thresholds it (or Pareto-samples it,
    * Brown et al. §A) downstream.
    *
    * Plan: explode → broadcast-join model → map-side OOV coalesce →
    * single `groupBy(doc)` of integer partials. The OOV constant and
    * the prior are 1-row broadcasts derived from the model itself, so
    * a persisted model table is the only serving state.
    */
  /** Collapse a trained model + prior into the three serving scalars
    * of [[nbScoreMap]]: `(featureMap, oovMicro, priorMicro)`. Map keys
    * are the feature's STRING form (map literals are string-keyed so
    * word and hashed features share one serving path). Driver reads
    * are model-sized — bounded by the [[hashedFeature]] bucket count,
    * the same O(model) ceiling as [[Dsir.LiteralModelMaxBuckets]].
    */
  def serve(model: DataFrame, prior: DataFrame): (Map[String, Long], Long, Long) = {
    val m = model.select(col("f").cast("string"), col("llr_micro"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val oov = model.agg(
        sum("c_pos").as("tot_pos"), sum("c_neg").as("tot_neg"),
        count(lit(1)).as("vv"))
      .select(llrMicro(lit(0L), lit(0L),
        col("tot_pos"), col("tot_neg"), col("vv")).as("oov_micro"))
      .collect().head.getLong(0)
    val pr = prior.select(col("prior_micro"), col("n_pos"), col("n_neg"))
      .collect().head
    require(!pr.isNullAt(0),
      s"nbPrior is NULL — single-class training data (n_pos=${pr.getLong(1)}, " +
        s"n_neg=${pr.getLong(2)}); NB needs both classes represented")
    (m, oov, pr.getLong(0))
  }

  /** Serving-side scorer: the model re-enters as a MAP LITERAL folded
    * per row with `aggregate` — ZERO shuffle over the scored corpus
    * and stream-legal (each arrival scores itself map-side; corpus
    * knowledge lives in the literal, never in stream state — the
    * [[Dsir.scoreWith]] / StreamDedup index-not-state discipline).
    * Integer arithmetic ⇒ bit-equal to [[nbScore]]
    * (QualityClassifierSpec pins it). Same janino literal ceiling as
    * [[Dsir.LiteralModelMaxBuckets]]: past a few thousand features,
    * serve with [[nbScore]]'s broadcast join instead.
    */
  /** Measured serving crossover (NbServeExp, 200k Zipf docs / Heaps
    * vocab 4473, interleaved arms, median of 5): the map-literal
    * scorer wins below ~1k occupied features (0.56–0.91× the join's
    * time) and LOSES 1.8×/2.7×/3.5× at 1.8k/2.7k/3.9k features, while
    * the broadcast-join arm is feature-count-invariant (~0.65 s flat)
    * — the same janino CreateMap cliff as
    * [[Dsir.LiteralModelMaxBuckets]], now with NB's own numbers. 1024
    * keeps the literal strictly inside its winning regime.
    */
  val LiteralModelMaxFeatures = 1024

  /** Serving dispatch by the measured law: a model at or under
    * [[LiteralModelMaxFeatures]] occupied features serves as the
    * zero-shuffle map literal, a larger one as the broadcast join.
    * The two paths are bit-equal (QualityClassifierSpec), so the
    * switch is invisible to results. The size probe is one count of
    * the vocabulary-bounded model table. This dispatch is for
    * WORD-feature models (unbounded key space); a [[hashedFeature]]
    * model should skip it and serve through [[serveDense]] /
    * [[nbScoreDense]], the measured winner at every bucket count.
    *
    * The model is `persist`ed first (r9 ADVICE, reworked per the r10
    * one): the size probe, [[serve]]'s map + OOV collects, and the
    * serving plan itself would otherwise each replay the full train
    * explode+groupBy — up to 3× — against the un-materialized model
    * DAG. A lazy cache of the vocabulary-bounded table amortizes all
    * of them (r9 used `localCheckpoint`, which turned plan
    * CONSTRUCTION into eager Spark jobs, truncated lineage — no
    * recovery on executor loss — and leaked untracked blocks across
    * calls; `persist` has none of those and the first collect still
    * materializes once). CACHE LIFETIME: the literal route drops its
    * own cache before returning (the model lives in the returned
    * plan's map literal); the join route's returned plan READS the
    * cached table, so it stays cached while the result lives — pass
    * an already-persisted `model` to manage the lifetime yourself
    * (detected; never re-persisted or dropped by this call).
    */
  def nbScoreAuto(docs: DataFrame, idCol: String, textCol: String,
                  model: DataFrame, prior: DataFrame,
                  feature: Column => Column = wordFeature): DataFrame =
    nbServeAuto(docs, idCol, textCol, model, prior, feature)

  /** ONE serving entry point that picks the measured winner (r10
    * verdict #1 — the serving law is complete but callers had to know
    * it): routes by model family and size to the fastest bit-equal
    * serving form, so `nbServeAuto(docs, …, model, prior, feat,
    * buckets)` is all a pipeline needs to write.
    *
    *  - `buckets = Some(b)` with `b ≤` [[Dsir.DenseModelMaxBuckets]]
    *    (a [[hashedFeature]]`(b)` model inside the measured dense
    *    width): the dense O(1) array-literal path ([[serveDense]] +
    *    [[nbScoreDense]]) — the NbServeExp 4-arm winner at EVERY
    *    measured width (flat 0.21–0.29 s from B=256 to 16384, and
    *    flat to B=1M in the r11 ceiling sweep under the [[DenseLit]]
    *    encoding), stateless, zero-shuffle, stream-legal. Past the
    *    measured width the dispatcher refuses to allocate an
    *    unmeasured 8·b-byte literal and serves through the join forms
    *    below (the model TABLE is vocabulary-bounded regardless of b).
    *  - word model with ≤ [[LiteralModelMaxFeatures]] occupied
    *    features: the zero-shuffle map literal ([[serve]] +
    *    [[nbScoreMap]]) — the measured winner below the janino
    *    CreateMap cliff.
    *  - larger word model, batch input: the broadcast-join scorer
    *    [[nbScore]] (feature-count-invariant ~0.6 s flat).
    *  - larger word model, STREAMING input: [[nbScore]]'s
    *    groupBy(doc) re-aggregation would be stateful on a stream, so
    *    the route is the one-row broadcast-map form ([[serveRow]] +
    *    [[nbScoreBroadcast]]) — the only stream-legal form past the
    *    literal ceiling for an unbounded key space (measured slower
    *    than dense, which is why hashed features + `buckets` is the
    *    production recommendation at scale).
    *
    * All four routes are bit-equal under the shared degenerate-doc
    * contract (null text dropped, blank text all-OOV) —
    * QualityClassifierSpec pins every route against the same
    * reference. Materialization discipline (see [[nbScoreAuto]]'s
    * doc): an un-cached `model` is lazily `persist`ed for the probe +
    * collects and the cache is dropped before returning on the
    * literal/dense routes (the returned plan carries the model as
    * literals); on the join routes the cached table IS the serving
    * relation and stays cached while the result lives — the
    * CacheManager is plan-keyed, so `model.unpersist()` on the
    * caller's original DataFrame releases that entry once the result
    * is no longer needed. A caller-persisted `model` is detected and
    * left alone.
    *
    * Feature contract: `buckets = Some(b)` DECLARES the model was
    * trained with [[hashedFeature]]`(b)` — every `Some(b)` route
    * (dense literal AND the past-ceiling join forms) derives that
    * feature internally and ignores the `feature` param, so a caller
    * who forgets to pass `feature = hashedFeature(b)` cannot get
    * silent all-OOV scores. `feature` applies only to word models
    * (`buckets = None`). `maxLiteralFeatures` / `denseMaxBuckets`
    * exist for tests and tuning; production callers leave the
    * measured defaults.
    */
  def nbServeAuto(docs: DataFrame, idCol: String, textCol: String,
                  model: DataFrame, prior: DataFrame,
                  feature: Column => Column = wordFeature,
                  buckets: Option[Int] = None,
                  maxLiteralFeatures: Int = LiteralModelMaxFeatures,
                  denseMaxBuckets: Int = Dsir.DenseModelMaxBuckets): DataFrame = {
    val preMaterialized =
      model.storageLevel.useMemory || model.storageLevel.useDisk
    val m0 = if (preMaterialized) model else model.persist()
    def dropOurCache(): Unit = if (!preMaterialized) { m0.unpersist(); () }
    buckets match {
      // hashed model inside the MEASURED dense width (DenseCeilingExp,
      // flat to 1M): the dense array-literal winner
      case Some(b) if b <= denseMaxBuckets =>
        val (llr, occ, pm) = serveDense(m0, prior, b)
        dropOurCache()
        nbScoreDense(docs, idCol, textCol, llr, occ, pm, b)
      // hashed model PAST the measured width (e.g. a 16M-bucket
      // fasttext-scale gate): don't allocate an unmeasured 8·B-byte
      // literal — the model table is still ≤corpus-vocabulary rows, so
      // the join forms serve it (stream: the one-row broadcast map;
      // batch: the broadcast join) exactly as for large word models.
      // `buckets = Some(b)` is a CONTRACT that the model was trained
      // with [[hashedFeature]]`(b)`, so these routes derive that
      // feature themselves — exactly as the dense route does — rather
      // than trusting the `feature` param (a caller leaving the
      // default `wordFeature` would otherwise score every token OOV,
      // silently)
      case Some(b) if docs.isStreaming =>
        nbScoreBroadcast(docs, idCol, textCol, serveRow(m0, prior),
          hashedFeature(b))
      case Some(b) =>
        nbScore(docs, idCol, textCol, m0, prior, hashedFeature(b))
      case None if m0.count() <= maxLiteralFeatures =>
        val (m, oov, pm) = serve(m0, prior)
        dropOurCache()
        nbScoreMap(docs, idCol, textCol, m, oov, pm, feature)
      case None if docs.isStreaming =>
        nbScoreBroadcast(docs, idCol, textCol, serveRow(m0, prior), feature)
      case None =>
        nbScore(docs, idCol, textCol, m0, prior, feature)
    }
  }

  /** The trained model + prior collapsed into ONE broadcastable
    * serving row `(__m: map<string,long>, __oov_micro, __prior_micro)`
    * — the join-based serving form of [[nbScoreBroadcast]]. Unlike
    * [[serve]]'s driver-side literal, the map never enters generated
    * code: it arrives as broadcast DATA, so the compile-time literal
    * ceiling does not apply. MEASURED honest negative (NbServeExp r10,
    * 40k Zipf docs, interleaved arms): the runtime cost is WORSE than
    * the literal at every B — the broadcast join copies the whole map
    * into each joined row and `element_at(map, k)` is a linear key
    * scan, so the arm reads 1.2/2.9/6.5/8.3 s at 256/1k/4k/16k
    * buckets (1.4×→14× the shuffle join's flat ~0.6 s in the 4-arm
    * run — the NOTES_r10 table). Use this form only for WORD-feature models a stream must
    * serve past the literal ceiling; a [[hashedFeature]] model should
    * serve through [[serveDense]]'s O(1) array literals instead —
    * measured flat at ~0.21 s across every B, the fastest arm
    * outright. A NULL prior
    * (single-class train, [[nbPrior]]) propagates to NULL scores, the
    * same visible failure as [[nbScore]].
    */
  def serveRow(model: DataFrame, prior: DataFrame): DataFrame =
    model.agg(
        map_from_entries(collect_list(
          struct(col("f").cast("string"), col("llr_micro")))).as("__m"),
        sum("c_pos").as("tot_pos"), sum("c_neg").as("tot_neg"),
        count(lit(1)).as("vv"))
      .select(col("__m"), llrMicro(lit(0L), lit(0L),
        col("tot_pos"), col("tot_neg"), col("vv")).as("__oov_micro"))
      .crossJoin(broadcast(prior.select(col("prior_micro").as("__prior_micro"))))

  /** [[nbScoreMap]] semantics with the model entering as the ONE-row
    * broadcast of [[serveRow]] instead of a codegen literal — the
    * STREAM-legal join-based serving path past the literal ceiling.
    * [[nbScore]]'s explode → join → groupBy(doc) re-aggregation is a
    * STATEFUL streaming aggregation (every doc's partial sums live in
    * the state store until the watermark closes), so it is the wrong
    * serving shape for a stream even though its per-batch arithmetic
    * is identical; here each arrival scores itself in one stream-static
    * broadcast join + per-row integer fold — stateless, zero shuffle,
    * exactly-once under the file sink, bit-equal to both other paths
    * (QualityClassifierSpec). Same degenerate-doc contract: null text
    * dropped, blank text scores all-OOV. See [[serveRow]] for the
    * measured per-row map-copy cost — prefer [[nbScoreDense]] whenever
    * the features are hashed.
    */
  def nbScoreBroadcast(docs: DataFrame, idCol: String, textCol: String,
                       servingRow: DataFrame,
                       feature: Column => Column = wordFeature): DataFrame = {
    val f: Column => Column = w => feature(w).cast("string")
    val tokMicro: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + coalesce(element_at(col("__m"), f(w)), col("__oov_micro")))
    val oovCount: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + when(element_at(col("__m"), f(w)).isNull, 1L).otherwise(0L))
    dropNullText(docs, textCol)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ws"))
      .crossJoin(broadcast(servingRow))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_tokens"),
        oovCount.as("oov_tokens"),
        (col("__prior_micro") + tokMicro).as("score_micro"))
      .withColumn("pred_pos",
        when(col("score_micro") > 0, 1).otherwise(0))
  }

  /** Dense O(1) serving of a [[hashedFeature]] model: the B-bounded
    * model unpacked into two length-`buckets` ARRAY literals (llr per
    * bucket with the OOV mass pre-filled, plus occupancy for the OOV
    * count). `element_at(array, i)` is an O(1) index, and a literal
    * array is ONE expression node — so per-token cost is flat in B,
    * unlike every alternative. MEASURED (NbServeExp r10 4-arm run,
    * 40k Zipf docs scored, 160k trained, interleaved arms, median of
    * 5): dense holds 0.21–0.29 s at EVERY B from 256 to 16384
    * (dense/join 0.33–0.34 flat) while the map literal climbs
    * 0.44→1.83 s (linear key scan per lookup), the shuffle join sits
    * at its flat ~0.6 s (stream-illegal: stateful re-aggregation),
    * and the one-row broadcast map climbs 1.2→8.3 s (map copied into
    * every joined row — 14× the join at B=16k). The r11 ceiling sweep
    * (DenseCeilingExp) extends the law to production widths:
    * 0.18/0.16/0.20/0.24 s at B = 16k/64k/256k/1M — flat to 1M under
    * the [[DenseLit]] UnsafeArrayData encoding (the boxed typedlit
    * encoding grew to 2.34 s at 1M from per-action object-graph
    * serialization; [[Dsir.DenseModelMaxBuckets]] records the
    * measured bound). Driver memory is `buckets` longs (8 MB at 1M)
    * — the same B-bounded ceiling as the model table itself. This is
    * THE serving form for hashed models at any measured B, batch or
    * stream: stateless, zero shuffle, O(1) lookups, and faster than
    * every other arm at every measured width.
    */
  def serveDense(model: DataFrame, prior: DataFrame,
                 buckets: Int): (IndexedSeq[Long], IndexedSeq[Boolean], Long) = {
    val (m, oov, pm) = serve(model, prior)
    (IndexedSeq.tabulate(buckets)(i => m.getOrElse(i.toString, oov)),
      IndexedSeq.tabulate(buckets)(i => m.contains(i.toString)), pm)
  }

  /** [[nbScoreMap]] semantics for a [[hashedFeature]]`(buckets)` model
    * served from [[serveDense]] arrays — bit-equal to every other
    * serving path (QualityClassifierSpec), same degenerate-doc
    * contract, flat in B.
    */
  def nbScoreDense(docs: DataFrame, idCol: String, textCol: String,
                   llr: IndexedSeq[Long], occ: IndexedSeq[Boolean],
                   priorMicro: Long, buckets: Int): DataFrame = {
    // UnsafeArrayData literals, not typedlit: the boxed encoding
    // re-serializes an object graph per action and grows with B
    // (2.3 s at B=1M); the flat byte region is a memcpy — the r11
    // ceiling finding ([[DenseLit]]). Values bit-identical.
    val llrLit = DenseLit.longs(llr.toArray)
    val occLit = DenseLit.booleans(occ.toArray)
    val idx: Column => Column = w =>
      (hashedFeature(buckets)(w) + lit(1L)).cast("int")
    val tokMicro: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + element_at(llrLit, idx(w)))
    val oovCount: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + when(element_at(occLit, idx(w)), 0L).otherwise(1L))
    dropNullText(docs, textCol)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_tokens"),
        oovCount.as("oov_tokens"),
        (lit(priorMicro) + tokMicro).as("score_micro"))
      .withColumn("pred_pos",
        when(col("score_micro") > 0, 1).otherwise(0))
  }

  /** The gate as a FILTER: keeps the input row — ALL its columns —
    * when the NB score clears `minScoreMicro`. This is the composable
    * production form ([[nbScoreMap]] replaces the row with its score;
    * a pipeline stage wants the document to flow on to dedup /
    * tokenize / sink). Pure map-side predicate over the same map
    * literal: zero shuffle, stream-legal, and the kept set is exactly
    * `nbScoreMap(...).filter(score_micro > minScoreMicro)`
    * (spec-pinned).
    */
  def nbFilter(docs: DataFrame, textCol: String,
               model: Map[String, Long], oovMicro: Long, priorMicro: Long,
               minScoreMicro: Long,
               feature: Column => Column = wordFeature): DataFrame = {
    val m = typedlit(model)
    val f: Column => Column = w => feature(w).cast("string")
    val tokMicro: Column = aggregate(toks(col(textCol)), lit(0L),
      (acc, w) => acc + coalesce(element_at(m, f(w)), lit(oovMicro)))
    // null-text rows are dropped explicitly (the uniform degenerate-doc
    // contract), not left to NULL-predicate semantics
    dropNullText(docs, textCol)
      .filter(lit(priorMicro) + tokMicro > lit(minScoreMicro))
  }

  /** [[nbFilter]] over [[serveDense]] arrays — the gate form for a
    * [[hashedFeature]]`(buckets)` model: same row-preserving contract
    * (kept set ≡ `nbScoreDense(...).filter(score_micro > min)`,
    * spec-pinned; null-text rows dropped), with the per-token lookup
    * on the O(1) dense array instead of the linear map literal. The
    * production 100 TB gate for hashed models, batch or stream.
    */
  def nbFilterDense(docs: DataFrame, textCol: String,
                    llr: IndexedSeq[Long], priorMicro: Long,
                    minScoreMicro: Long, buckets: Int): DataFrame = {
    val llrLit = DenseLit.longs(llr.toArray) // flat-in-B encoding ([[DenseLit]])
    val idx: Column => Column = w =>
      (hashedFeature(buckets)(w) + lit(1L)).cast("int")
    val tokMicro: Column = aggregate(toks(col(textCol)), lit(0L),
      (acc, w) => acc + element_at(llrLit, idx(w)))
    dropNullText(docs, textCol)
      .filter(lit(priorMicro) + tokMicro > lit(minScoreMicro))
  }

  def nbScoreMap(docs: DataFrame, idCol: String, textCol: String,
                 model: Map[String, Long], oovMicro: Long, priorMicro: Long,
                 feature: Column => Column = wordFeature): DataFrame = {
    val m = typedlit(model)
    val f: Column => Column = w => feature(w).cast("string")
    val tokMicro: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + coalesce(element_at(m, f(w)), lit(oovMicro)))
    val oovCount: Column = aggregate(col("__ws"), lit(0L),
      (acc, w) => acc + when(element_at(m, f(w)).isNull, 1L).otherwise(0L))
    dropNullText(docs, textCol)
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("__ws"))
      .select(col("doc_id"),
        size(col("__ws")).cast("long").as("n_tokens"),
        oovCount.as("oov_tokens"),
        (lit(priorMicro) + tokMicro).as("score_micro"))
      .withColumn("pred_pos",
        when(col("score_micro") > 0, 1).otherwise(0))
  }

  /** GPT-3's quality-gated Pareto sampling (Brown et al. 2020 §A:
    * "documents were kept if np.random.pareto(α) > 1 − score", α = 9)
    * over [[nbScore]] output — high-scoring documents survive almost
    * surely, low-scoring ones with heavy-tailed luck, so the filtered
    * corpus keeps some hard negatives instead of a hard cutoff.
    *
    * Deterministic and map-side: the Pareto deviate is the inverse-CDF
    * transform `(1−u)^(−1/α) − 1` of an md5 uniform (the
    * [[Sampling.weightedSample]] discipline — retry-stable, no RNG
    * state), and the NB score enters as the sigmoid probability
    * `p = 1/(1+exp(−score))` in nats. Zero shuffle beyond what the
    * scoring itself did.
    */
  def paretoSample(scored: DataFrame, idCol: String, scoreMicroCol: String,
                   alpha: Double = 9.0, salt: String = "nbp"): DataFrame = {
    val u = TextHash.h32(concat(lit(salt + ":"), col(idCol).cast("string")))
      .cast("double") / lit(4294967296.0)
    val p = lit(1.0) /
      (lit(1.0) + exp(-(col(scoreMicroCol).cast("double") / lit(1e6))))
    scored
      .withColumn("__p", p)
      .filter(pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0) >
        lit(1.0) - col("__p"))
      // exp/pow are libm calls — not bit-contracted cross-engine, so the
      // EMITTED column is micro-quantized (LangModel `ln` policy); the
      // full-precision doubles stay inside the filter, where an ulp flip
      // needs the two sides within ~1e-15 of each other (measure-zero)
      .withColumn("keep_p_micro",
        floor(col("__p") * lit(1e6) + lit(0.5)).cast("long"))
      .drop("__p")
  }

  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: DataFrame, prior: DataFrame,
              feature: Column => Column = wordFeature): DataFrame = {
    val oov = model.agg(
        sum("c_pos").as("tot_pos"), sum("c_neg").as("tot_neg"),
        count(lit(1)).as("vv"))
      .select(llrMicro(lit(0L), lit(0L),
        col("tot_pos"), col("tot_neg"), col("vv")).as("oov_micro"))
    dropNullText(docs, textCol)
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("__w"))
      .select(col("doc_id"), feature(col("__w")).as("f"))
      .join(broadcast(model.select(col("f"), col("llr_micro"))), Seq("f"), "left")
      .crossJoin(broadcast(oov))
      .select(col("doc_id"),
        coalesce(col("llr_micro"), col("oov_micro")).as("llr"),
        when(col("llr_micro").isNull, 1L).otherwise(0L).as("is_oov"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("is_oov").as("oov_tokens"),
        sum("llr").as("__tok_micro"))
      .crossJoin(broadcast(prior.select(col("prior_micro"))))
      .select(col("doc_id"), col("n_tokens"), col("oov_tokens"),
        (col("prior_micro") + col("__tok_micro")).as("score_micro"),
        when(col("prior_micro") + col("__tok_micro") > 0, 1)
          .otherwise(0).as("pred_pos"))
  }
}
