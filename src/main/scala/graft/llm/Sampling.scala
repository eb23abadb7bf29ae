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
}
