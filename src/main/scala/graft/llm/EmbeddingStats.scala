package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One-pass second-moment (Gram) matrix over an embedding column —
  * the statistic behind PCA, whitening, and covariance-based outlier
  * screens on an embedded corpus (public practice: batch PCA/ZCA
  * preprocessing; the 64×64 result is what a driver-side eigensolver
  * consumes, exactly as k-means consumes k centroid rows).
  *
  * Scale design (100 TB): each row expands map-side to its
  * dim·(dim+1)/2 upper-triangle products and partial aggregation
  * collapses every partition to ≤ 2 080 cells BEFORE the shuffle (the
  * expand is the combiner's input, never cross-node traffic) — total
  * shuffle volume is O(cells × partitions), independent of corpus
  * size. Determinism: products are cast to fixed-scale DECIMAL before
  * summation (Registry policy — decimal addition is exact and
  * associative, so partitioning order cannot matter; no binary double
  * sits exactly on a 10⁻¹² midpoint, so the cast itself rounds
  * identically in any engine that rounds to nearest).
  */
object EmbeddingStats {

  /** Upper-triangle Gram entries `(i, j, s)`, i ≤ j, with
    * `s = Σ_rows v[i]·v[j]` (exact decimal summation, emitted as
    * DOUBLE). `dim` must match the embedding length.
    */
  def gram(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val v = Similarity.toDoubleVec(col(vecCol))
    // headroom: |v[i]·v[j]| ≤ 1 for unit-ish embeddings; scale 12 keeps
    // the summed unscaled value far under DECIMAL(30)'s 10^30 cap
    val cell = DecimalType(30, 12)
    val pairs = flatten(transform(sequence(lit(0), lit(dim - 1)), i =>
      transform(sequence(i, lit(dim - 1)), j =>
        struct(
          i.cast("int").as("i"),
          j.cast("int").as("j"),
          (element_at(v, (i + 1).cast("int")) * element_at(v, (j + 1).cast("int")))
            .cast(cell).as("p")))))
    df.select(explode(pairs).as("c"))
      .groupBy(col("c.i").as("i"), col("c.j").as("j"))
      .agg(sum(col("c.p")).cast("double").as("s"), count(lit(1)).as("n"))
  }
}
