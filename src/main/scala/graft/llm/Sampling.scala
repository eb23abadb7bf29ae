package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash.h32

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * A 100 TB corpus cannot use `rand()`-based splits: the assignment
  * must be (a) reproducible across runs and engines, (b) stable under
  * re-partitioning and retries, (c) a pure per-row function so it
  * runs map-side at scan speed with no shuffle and no driver state.
  * Hashing the document id through md5 gives all three — the same
  * `h/2³²` uniform deviate the LSH hyperplanes use (Similarity
  * .md5Planes), exactly restatable in any engine with md5.
  *
  * (The reference pipeline has no sampling stage; this extends the
  * engine for the training-data curation surface the brief asks for.)
  */
object Sampling {

  /** Uniform deviate in [0, 1): first 8 md5 hex digits of
    * `salt:key` over 2³². Division by a power of two is exact in
    * IEEE, so the deviate (and every comparison against short decimal
    * literals) is bit-identical across engines.
    */
  def u01(key: Column, salt: String): Column =
    h32(concat_ws(":", lit(salt), key.cast("string"))) / 4294967296.0

  /** Per-row weighted Bernoulli sample: keep a row iff its uniform
    * deviate < its OWN inclusion probability (clamped to [0, 1]) —
    * quality-weighted subsampling (keep good documents with
    * probability ∝ quality, CCNet-style) as a pure map-side filter:
    * deterministic (md5 deviate), reproducible under retries, no
    * shuffle, and adding rows never reconsiders existing ones.
    */
  def weightedSample(df: DataFrame, idCol: String, probCol: Column,
                     salt: String = "wsample"): DataFrame =
    df.filter(u01(col(idCol), salt) <
      greatest(lit(0.0), least(probCol, lit(1.0))))

  /** Assign each row a split label from cumulative weight ranges over
    * the deviate: weights (train 0.8, val 0.1, test 0.1) map to
    * [0, .8) → train, [.8, .9) → val, [.9, 1) → test. Pure map-side
    * expression — no shuffle, no state; adding rows never reassigns
    * existing ones.
    */
  def withSplit(df: DataFrame, idCol: String,
                weights: Seq[(String, Double)],
                salt: String = "split"): DataFrame = {
    require(weights.nonEmpty && math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val u = u01(col(idCol), salt)
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val label = weights.init.zip(cum.init)
      .foldRight(lit(weights.last._1)) { case (((name, _), hi), els) =>
        when(u < hi, name).otherwise(els)
      }
    df.withColumn("split_u", u).withColumn("split", label)
  }

  /** Square-root temperature rebalancing across strata (the
    * multilingual-corpus mixing rule: sample language l at a rate
    * ∝ n_l^(α-1) with α = 0.5, so over-represented languages are
    * downsampled toward balance and the smallest stratum keeps
    * everything). Rates derive from a per-stratum count aggregate —
    * a |strata|-row broadcast — and the keep decision is the same
    * md5-deviate threshold as [[stratifiedSample]]: map-side,
    * reproducible, restatable in SQL. `sqrt` and the integer→double
    * division are correctly-rounded IEEE ops, so rates are
    * bit-identical across engines (unlike `pow(n, alpha)` for general
    * α, whose libm last-ulp varies — the reason α is fixed at 0.5).
    */
  def temperatureSample(df: DataFrame, idCol: String, strataCol: String,
                        salt: String = "langbal"): DataFrame = {
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
    val floorN = counts.agg(min(col("__n")).as("__n_min"))
    val rates = counts.join(broadcast(floorN))
      .select(col(strataCol),
        sqrt(col("__n_min").cast("double") / col("__n")).as("sample_rate"))
    df.join(broadcast(rates), strataCol)
      .filter(u01(col(idCol), salt) < col("sample_rate"))
  }

  /** Per-stratum deterministic Bernoulli sample: keep a row iff its
    * deviate falls below the stratum's fraction. Exactly-once
    * per-row decision — unlike `df.sample` / `sampleBy`, re-running
    * (or re-reading after a task retry) selects the identical rows,
    * which is what makes a sampled training set auditable.
    */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       fractions: Map[String, Double], default: Double,
                       salt: String = "sample"): DataFrame = {
    val u = u01(col(idCol), salt)
    val frac = fractions.foldRight(lit(default)) { case ((k, f), els) =>
      when(col(strataCol) === k, f).otherwise(els)
    }
    df.filter(u < frac)
  }

  /** Exactly-N weighted sampling WITHOUT replacement per stratum
    * (Efraimidis–Spirakis A-ES): each row draws priority
    * `ln(u)/w` (u the md5 deviate, w its weight — the log form of
    * `u^(1/w)`), and the top N priorities per stratum win. Unlike the
    * Bernoulli samplers ([[weightedSample]]/[[stratifiedSample]])
    * the output size is EXACT, the property quota-driven mixing
    * needs.
    *
    * Determinism: the priority is quantized to integer micro-units
    * immediately (`ln` is not bit-reproducible cross-engine —
    * LangModel policy) and ties break on the id, so the selected SET
    * is identical in any engine. Selection is a per-stratum top-N —
    * WindowGroupLimit plans prune to N rows per group before the
    * final sort, the token_topk shape.
    */
  def weightedTopN(df: DataFrame, idCol: String, strataCol: String,
                   weightCol: Column, n: Int,
                   salt: String = "wtopn"): DataFrame = {
    require(n > 0, "n must be positive")
    // deviate shifted into (0, 1] — u = 0 would make ln(u) = -Inf,
    // which DuckDB cannot cast to BIGINT; the +2⁻³² add is exact.
    val u = u01(col(idCol), salt) + lit(1.0 / 4294967296.0)
    // Weights must be > 0: ln(u)/w flips sign for w < 0 and produces
    // ±Inf/NULL for w = 0 / NULL, which Spark's non-ANSI long cast
    // silently folds to Long.MIN/MAX — enforce, don't document.
    val checkedW = when(weightCol.isNull || weightCol <= 0,
      raise_error(concat(lit("weightedTopN: weight must be > 0, got "),
        coalesce(weightCol.cast("string"), lit("NULL"))))
    ).otherwise(weightCol)
    val prio = floor(log(u) / checkedW * lit(1e6) + lit(0.5)).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(strataCol)
      .orderBy(col("prio_micro").desc, col(idCol))
    df.withColumn("prio_micro", prio)
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  /** Deterministic global training shuffle: every row gets a unique
    * contiguous position 0..n−1 in a pseudo-random but reproducible
    * order (md5-keyed), plus its data-parallel shard
    * `pos mod nShards` — the epoch-shuffle + sharding step of a
    * training-data writer, auditable and stable across reruns.
    *
    * Scale (100 TB): the naive form — `row_number() OVER (ORDER BY
    * key)` — is a single global window: one task sorts the world.
    * Here the sort is range-partitioned on (key, id) so every
    * partition sorts in parallel, and global positions come from the
    * PrefixSum offsets pattern: one count per partition to the driver
    * (O(partitions) metadata), exclusive-prefix offsets broadcast
    * back, then a partition-local index add. Positions equal the
    * global sort rank regardless of where the range boundaries fall
    * (proved against the window form in SamplingSpec).
    */
  def globalShuffle(df: DataFrame, idCol: String, nShards: Int,
                    salt: String = "shuffle"): DataFrame = {
    val keyed = df.withColumn("skey",
      TextHash.h60(concat_ws(":", lit(salt), col(idCol).cast("string"))))
    rankWithOffsets(keyed, Seq(col("skey"), col(idCol)), nShards)
  }

  /** Quality-annealed curriculum order: a reproducible training
    * order where documents are banded by a quality signal and bands
    * are consumed low→high — the "finish on the best data" annealing
    * schedule — with an md5 shuffle INSIDE each band (a curriculum
    * that is sorted within bands would feed the model near-duplicate
    * difficulty runs). `bandCol` must be a map-side deterministic
    * expression (fixed thresholds, NOT ntile — a global ntile is a
    * one-task window and a scale-killer; fixed thresholds cost
    * nothing and keep band membership stable as the corpus grows).
    * Output adds `band`, `skey`, `pos` (contiguous 0..n−1 in
    * (band, skey, id) order), `shard`.
    *
    * Scale: same machinery as [[globalShuffle]] — range-partitioned
    * parallel sort + the PrefixSum offset pattern; adding the band
    * as the leading sort key is free.
    */
  def curriculumOrder(df: DataFrame, idCol: String, bandCol: Column,
                      nShards: Int, salt: String = "curriculum"): DataFrame = {
    val keyed = df.withColumn("band", bandCol).withColumn("skey",
      TextHash.h60(concat_ws(":", lit(salt), col(idCol).cast("string"))))
    rankWithOffsets(keyed, Seq(col("band"), col("skey"), col(idCol)), nShards)
  }

  /** Shared distributed-rank machinery: global positions equal to
    * `row_number() OVER (ORDER BY sortCols) - 1` without a one-task
    * global window — range partitioning on the sort key makes
    * partition order equal global key order, a per-partition count
    * collects O(partitions) metadata, and exclusive-prefix offsets
    * broadcast back for a partition-local index add.
    */
  private def rankWithOffsets(keyed: DataFrame, sortCols: Seq[Column],
                              nShards: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    import org.apache.spark.sql.types.LongType
    require(nShards > 0, "nShards must be positive")
    // count pass + index pass must see identical partitions. The cache
    // lives as long as the caller holds the result (ContextCleaner
    // reclaims it afterwards); a per-epoch production writer should
    // instead write the shuffled output and drop the frame — the
    // selfOverlapPairs materialize-vs-cache note applies here too.
    val sorted = keyed
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val counts = sorted.groupBy(col("__pid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // exclusive prefix over partition order (range partitioning ⇒
    // partition order == global key order)
    val maxPid = if (counts.isEmpty) -1 else counts.keys.max
    val offsets = new Array[Long](maxPid + 2)
    (0 to maxPid).foreach(p => offsets(p + 1) = offsets(p) + counts.getOrElse(p, 0L))
    val bc = keyed.sparkSession.sparkContext.broadcast(offsets)
    val pidIdx = sorted.schema.fieldIndex("__pid")
    val outSchema = sorted.schema.add("pos", LongType).add("shard", LongType)
    val result = sorted.mapPartitions { it =>
      var local = 0L
      it.map { row =>
        val pos = bc.value(row.getInt(pidIdx)) + local
        local += 1
        Row.fromSeq(row.toSeq :+ pos :+ pos % nShards)
      }
    }(Encoders.row(outSchema))
    result.drop("__pid")
  }
}
