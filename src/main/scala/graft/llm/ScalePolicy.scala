package graft.llm

import org.apache.spark.sql.{Column, DataFrame}

/** Measured scale laws from `SCALE_DECADES_r6.json` packaged as
  * parameter policies, so a library user gets the knob growth the
  * two-decade experiments showed is REQUIRED rather than re-deriving
  * it per corpus:
  *
  *  - LSH sign-bucket occupancy is corpus/2^bits per group; holding it
  *    constant (the flat-time arm across sf1→sf3→sf10: 2.03 → 2.90 →
  *    3.56 s at 500 queries) needs `bits ≈ log₂(corpus / occupancy)`.
  *    Every FIXED-bits arm grew linearly per query with corpus
  *    (16×6: 2.37 → 2.90 → 5.54 s), which is quadratic total work in
  *    the queries-∝-corpus regime the driver queries run in.
  *  - Hamming-1 multi-probe alone cannot hold RECALL at constant
  *    occupancy once bits grow (collision mass p^bits decays
  *    exponentially: measured 0.760 at 16×10+p10/20k but 0.530 at
  *    16×13+p13/200k on the deliberately hard synthetic geometry);
  *    OR-amplification must grow with the bit delta — 32×13+p13
  *    restored 0.751 at 200k. Measured rate: ~2× groups per +3 bits.
  *  - Block-bounded pair operators ([[Similarity.knnGraph]] etc.)
  *    need `refineBlock` bits growing the same way: the FIXED b3
  *    recipe was itself quadratic one decade later (1.62 → 4.15 →
  *    44.5 s) while `3 + log₂(n/20k)` stayed flat (1.62 / 1.34 /
  *    2.62 s) at 91 % of in-block-optimal mean edge cosine.
  *
  * The driver queries keep their pinned parameters (their DuckDB
  * oracles restate the exact planes); these policies are the
  * production entry point where corpus size is a runtime quantity.
  */
object ScalePolicy {

  /** Bits per LSH group holding expected bucket occupancy at
    * `targetOccupancy` rows: round(log₂(corpus / targetOccupancy)),
    * clamped to [4, 20]. Anchors (occupancy 20): 20k→10, 60k→12,
    * 200k→13 — the measured flat-time arms.
    */
  def lshBitsFor(corpus: Long, targetOccupancy: Int = 20): Int = {
    require(corpus > 0, s"corpus must be positive, got $corpus")
    require(targetOccupancy > 0, s"targetOccupancy must be positive, got $targetOccupancy")
    val raw = math.round(math.log(corpus.toDouble / targetOccupancy) / math.log(2)).toInt
    math.max(4, math.min(20, raw))
  }

  /** OR-amplification matching the measured recall-restoration rate:
    * double the groups for every 3 bits beyond the 16×10 anchor
    * (never below `baseGroups`). Anchors: bits 10→16 groups,
    * bits 13→32 (the 200k arm that restored recall 0.751 at constant
    * occupancy).
    */
  def lshGroupsFor(bits: Int, baseBits: Int = 10, baseGroups: Int = 16): Int = {
    require(bits >= 1, s"bits must be >= 1, got $bits")
    val doublings = math.max(0, math.ceil((bits - baseBits) / 3.0).toInt)
    baseGroups << doublings
  }

  /** [[Similarity.lshTopK]] with planes, probes, and amplification
    * derived from the corpus size by the measured policies. Probes =
    * bits (all Hamming-1 buckets — query-side only, index unchanged).
    */
  def lshTopKAuto(df: DataFrame, idCol: String, vecCol: String,
                  queryPred: Column, k: Int, corpus: Long, dim: Int = 64,
                  targetOccupancy: Int = 20): DataFrame = {
    val bits = lshBitsFor(corpus, targetOccupancy)
    val groups = lshGroupsFor(bits)
    Similarity.lshTopK(df, idCol, vecCol, queryPred, k,
      Similarity.md5Planes(dim, groups, bits), probes = bits)
  }

  /** Refinement bits holding expected rows-per-block at or BELOW
    * `targetRows`: ceil(log₂(corpus / blocks / targetRows)), floored
    * at 0 (no refinement for corpora the base blocking already
    * bounds). Ceil, not round — pair work is quadratic in occupancy,
    * so erring on the finer side is the cheap direction. Anchors
    * (10 blocks, target 250): 20k→3, 60k→5, 200k→7 — the flat-time
    * decade arms.
    */
  def blockBitsFor(corpus: Long, blocks: Int, targetRows: Int = 250): Int = {
    require(corpus > 0 && blocks > 0 && targetRows > 0,
      s"corpus/blocks/targetRows must be positive, got $corpus/$blocks/$targetRows")
    val perBlock = corpus.toDouble / blocks
    if (perBlock <= targetRows) 0
    else math.min(20, math.ceil(math.log(perBlock / targetRows) / math.log(2)).toInt)
  }

  /** Block key for [[Similarity.knnGraph]]-family operators with the
    * refinement bits derived from corpus size: the base block column
    * unchanged when occupancy is already bounded, else refined by
    * [[Similarity.refineBlock]] with [[blockBitsFor]] bits.
    */
  def refinedBlockAuto(df: DataFrame, blockCol: Column, vecCol: Column,
                       corpus: Long, blocks: Int,
                       targetRows: Int = 250): Column = {
    val bits = blockBitsFor(corpus, blocks, targetRows)
    if (bits == 0) blockCol.cast("string")
    else Similarity.refineBlock(df, blockCol, vecCol, bits)
  }

  /** SemDeDup cluster count holding expected cell occupancy at
    * `targetRows`: ceil(corpus / targetRows), min 2 — the same
    * quadratic-pair-space law as [[blockBitsFor]] applied to k-means
    * cells (pair work is Σ cell² ≈ n²/k with fixed k; the sf1 screen
    * measured pinned k=8 at 4.3× for 10× data while the k=32 arm cut
    * it ~2×, BENCH_SF1_r6; SemDeDup itself runs k=50k on LAION-440M,
    * i.e. occupancy ~9k). Ceil errs toward more cells — the cheap
    * direction for quadratic work.
    */
  def semanticCellsFor(corpus: Long, targetRows: Int = 640): Int = {
    require(corpus > 0 && targetRows > 0,
      s"corpus/targetRows must be positive, got $corpus/$targetRows")
    math.max(2, math.ceil(corpus.toDouble / targetRows).toInt)
  }

  /** [[SemDedup.semanticDedup]] with the cluster count derived from
    * the corpus size.
    */
  def semanticDedupAuto(df: DataFrame, idCol: String, vecCol: String,
                        corpus: Long, tau: Double, iters: Int = 1,
                        targetRows: Int = 640): DataFrame =
    SemDedup.semanticDedup(df, idCol, vecCol,
      semanticCellsFor(corpus, targetRows), iters, tau)

  /** Planes for the LABEL-family bucketed arms
    * ([[Similarity.hardNegativesBucketed]] /
    * [[Similarity.knnClassifyBucketed]]) derived from corpus size:
    * occupancy-constant bits + OR-amplified groups, the lshTopKAuto
    * pairing (the Auto entry points additionally probe Hamming-1
    * buckets query-side, probes = bits — recall restoration at
    * (1+bits)x query cost, index unchanged). The driver queries pin 16×6 (their oracles restate the
    * exact planes); at 200k vectors the pinned planes were measured
    * quadratic (93.6 s vs the policy arm — LabelScaleExp), the same
    * law as every other fixed-bits member.
    */
  def labelPlanesFor(corpus: Long, dim: Int = 64,
                     targetOccupancy: Int = 20): Seq[Seq[Seq[Double]]] = {
    val bits = lshBitsFor(corpus, targetOccupancy)
    Similarity.md5Planes(dim, lshGroupsFor(bits), bits)
  }

  /** [[Similarity.hardNegativesBucketed]] with [[labelPlanesFor]]
    * planes.
    */
  def hardNegativesAuto(df: DataFrame, idCol: String, vecCol: String,
                        labelCol: String, queryPred: Column, k: Int,
                        corpus: Long, dim: Int = 64,
                        targetOccupancy: Int = 20): DataFrame =
    Similarity.hardNegativesBucketed(df, idCol, vecCol, labelCol, queryPred,
      k, labelPlanesFor(corpus, dim, targetOccupancy),
      probes = lshBitsFor(corpus, targetOccupancy))

  /** [[Similarity.knnClassifyBucketed]] with [[labelPlanesFor]]
    * planes.
    */
  def knnClassifyAuto(df: DataFrame, idCol: String, vecCol: String,
                      labelCol: String, queryPred: Column, k: Int,
                      corpus: Long, dim: Int = 64,
                      targetOccupancy: Int = 20): DataFrame =
    Similarity.knnClassifyBucketed(df, idCol, vecCol, labelCol, queryPred,
      k, labelPlanesFor(corpus, dim, targetOccupancy),
      probes = lshBitsFor(corpus, targetOccupancy))
}
