package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Domain-mixture budgeting for training-corpus assembly: given a
  * target weight per domain (the LLaMA-style mixture spec) and the
  * tokens actually AVAILABLE per domain, allocate a total token
  * budget as `t_k = min(a_k, λ·w_k)` with λ the water-filling level
  * solving `Σ t_k = B` — scarce domains are exhausted and their
  * deficit redistributes to the rest in proportion to weight, which
  * is exactly what naive `B·w_k` quotas get wrong when a domain
  * cannot fill its share.
  *
  * Closed form, no driver loop: sort domains by `a_k/w_k` ascending;
  * with exclusive prefix sums `cumA/cumW`, the level after capping
  * the first k−1 domains is `λ_k = (B − cumA_k)/(W − cumW_k)`, and
  * the true level is `λ* = max_k λ_k` (capping a scarce domain only
  * raises the level, so the running maximum lands on the correct
  * prefix; for k past the cap point `λ_k ≤ λ*` because every
  * uncapped domain holds `a_j ≥ λ*·w_j`). `min(a_k, λ*·w_k)` then
  * allocates every row in one expression — no iterative search, no
  * conditional prefix selection.
  *
  * Scale (100 TB): one shuffle to K = |domains| rows, then K-row
  * window math — the same metadata-scale pattern as kmeans
  * centroids. The global windows here run over the K-row aggregate,
  * never the corpus.
  *
  * Determinism/oracle: availability sums are exact longs; weights
  * must be EXACT dyadic doubles (2⁻ⁱ — the query uses
  * `1.0 / (1 << (i % 6))`) so every weight sum is exact and
  * order-free; λ divisions and the `floor(λ*·w)` token cut are
  * same-operand IEEE ops restated verbatim in DuckDB.
  */
object Mixture {

  /** Per-domain allocation of `floor(budgetFrac · Σ tokens)` against
    * target weights: `(domain, avail_tokens, weight, alloc_tokens,
    * exhausted, fill_rate)`. `weightOf` maps the domain value to its
    * target weight (> 0, exact-dyadic for oracle parity).
    */
  def waterFill(df: DataFrame, domainCol: String, tokenCol: Column,
                weightOf: Column => Column, budgetFrac: Double): DataFrame = {
    val avail = df.groupBy(col(domainCol).as("domain"))
      .agg(sum(tokenCol).cast("long").as("avail_tokens"))
      .withColumn("weight", weightOf(col("domain")))
    // totals: exact longs; the dyadic-weight sum is exact in any
    // association, so the agg order cannot perturb it
    val tot = avail.agg(sum("avail_tokens").as("__tot_a"),
      sum("weight").as("__tot_w"))
    val joined = avail.crossJoin(broadcast(tot))
      .withColumn("__budget",
        floor(col("__tot_a").cast("double") * lit(budgetFrac)).cast("long"))
    // K-row global window (metadata scale): exclusive prefixes in
    // (avail/weight, domain) order
    val byRatio = Window
      .orderBy(col("avail_tokens").cast("double") / col("weight"), col("domain"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lam = (col("__budget") - coalesce(sum("avail_tokens").over(byRatio), lit(0L)))
      .cast("double") /
      (col("__tot_w") - coalesce(sum("weight").over(byRatio), lit(0.0)))
    val whole = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val withLam = joined.withColumn("__lam", lam)
      .withColumn("__lam_star", max(col("__lam")).over(whole))
    val alloc = least(col("avail_tokens"),
      floor(col("__lam_star") * col("weight")).cast("long"))
    withLam.select(col("domain"), col("avail_tokens"), col("weight"),
      alloc.as("alloc_tokens"),
      (alloc === col("avail_tokens")).as("exhausted"),
      (alloc.cast("double") / col("avail_tokens")).as("fill_rate"))
  }

  /** Data-CONSTRAINED mixture planning (the "Scaling Data-Constrained
    * Language Models" regime): the budget EXCEEDS what some domains
    * hold, so domains repeat — up to `maxEpochs` passes, past which
    * repetition stops helping and the remainder redistributes. This
    * is [[waterFill]] over inflated caps `maxEpochs·a_k` (repetition
    * multiplies availability, nothing else changes), with
    * `budgetFrac` still expressed against the RAW total — the inner
    * call divides it by `maxEpochs` to undo the cap inflation, so
    * pick `budgetFrac/maxEpochs` exact-dyadic for oracle parity
    * (the query uses 2.0/4). Output: `(domain, avail_tokens,
    * weight, alloc_tokens, epochs, exhausted)` — `epochs` =
    * allocated passes over the domain (≤ maxEpochs), `exhausted` =
    * the repetition ceiling bound, not the data.
    */
  def epochPlan(df: DataFrame, domainCol: String, tokenCol: Column,
                weightOf: Column => Column, budgetFrac: Double,
                maxEpochs: Int): DataFrame = {
    require(maxEpochs >= 1, s"maxEpochs must be >= 1, got $maxEpochs")
    val wf = waterFill(df, domainCol, tokenCol * lit(maxEpochs.toLong),
      weightOf, budgetFrac / maxEpochs)
    val rawAvail = expr(s"avail_tokens div ${maxEpochs}L")
    wf.select(col("domain"), rawAvail.as("avail_tokens"), col("weight"),
      col("alloc_tokens"),
      (col("alloc_tokens").cast("double") / rawAvail.cast("double")).as("epochs"),
      col("exhausted"))
  }

  /** The allocation applied: each document survives a deterministic
    * Bernoulli draw at its domain's `fill_rate` (md5 deviate <
    * rate), so expected kept tokens per domain equal the water-fill
    * allocation — a pure map-side filter under a K-row broadcast,
    * retry-stable and restatable in SQL, the 100 TB shape (the
    * per-domain EXACT cut would need a per-domain prefix-sum pass;
    * the Bernoulli form needs none and its error is O(√tokens)).
    */
  def applyBernoulli(df: DataFrame, idCol: String, domainCol: String,
                     alloc: DataFrame, salt: String = "mix"): DataFrame =
    df.join(broadcast(alloc.select(col("domain").as(domainCol), col("fill_rate"))),
        domainCol)
      .filter(Sampling.u01(col(idCol), salt) < col("fill_rate"))
}
