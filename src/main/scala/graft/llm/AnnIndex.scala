package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Build-once / probe-many entry points for the ANN family (r7
  * VERDICT #2): the fixed-500-query label decades identified
  * INDEX-SIDE hashing as the shared linear floor of every monolithic
  * arm — [[Similarity.lshTopK]] and friends re-bucket the whole
  * corpus on every invocation, so Q query batches pay Q corpus
  * passes. This module splits the two halves the way
  * [[graft.stream.StreamAnn]] already does for streams: `build*`
  * returns the index PAIR as plain DataFrames the caller materializes
  * (parquet/table) on its own refresh schedule; `topK`/`hammingTopK`
  * probe the persisted tables with corpus work proportional to
  * CANDIDATES, not corpus size.
  *
  * Index layout (the StreamAnn skinny-projection discipline):
  *  - `buckets`: (corpus_id, grp, bucket) — 24-byte rows, `groups`
  *    rows per vector. The hamming variant adds the 2×32-bit sign
  *    sketch (s1, s2) so the SELECT stage reads it off the candidate
  *    row instead of paying a candidate-sized join BEFORE the
  *    shortlist cut (the measured-cheap side of that trade —
  *    [[Similarity.hammingRerankBucketedTopK]] scaladoc).
  *  - `vectors`: (corpus_id, v, nrm) ONCE per vector — full vectors
  *    re-enter by candidate- or shortlist-sized id equi-joins only.
  *
  * Probing with the corpus itself as `queries` reproduces the
  * monolithic operators bit-exactly at equal planes/probes
  * (AnnIndexSpec pins both families, including through a parquet
  * round-trip) — so the pair (build once) + (probe per batch)
  * amortizes the corpus bucketing across query batches without
  * changing a single returned row. `planes` MUST match between build
  * and probe (md5-derived planes make that a pure (dim, groups,
  * bits) contract — nothing to serialize). Probes exclude
  * corpus_id == query id, the monolithic self-exclusion rule; disjoint
  * id spaces are unaffected.
  *
  * Scale shape (100 TB): the index build is one corpus pass (map-side
  * hashing + the explode); each probe shuffles only (grp, bucket)
  * candidate pairs. At 1000 executors the buckets table partitions on
  * (grp, bucket) — bucketBy at write time co-locates every probe's
  * equi-join with zero index-side exchange.
  */
object AnnIndex {

  /** Sign-LSH index pair `(buckets, vectors)` for [[topK]]. */
  def build(df: DataFrame, idCol: String, vecCol: String,
            planes: Seq[Seq[Seq[Double]]]): (DataFrame, DataFrame) = {
    val base = Similarity.withNorm(
      df.select(col(idCol).cast("long").as("corpus_id"),
        Similarity.toDoubleVec(col(vecCol)).as("v")), "v")
    val buckets = base
      .withColumn("__buckets",
        Similarity.bucketsAll(df, col("v"), planes, Similarity.dotAdaptive(df)(_, _)))
      .select(col("corpus_id"), posexplode(col("__buckets")).as(Seq("grp", "bucket")))
    val vectors = base.select(col("corpus_id"), col("v"), col("__norm").as("nrm"))
    (buckets, vectors)
  }

  /** [[build]] plus the 2×32-bit sign sketch on the bucket rows, for
    * the [[hammingTopK]] funnel (bucket GENERATE → popcount SELECT →
    * exact rerank).
    */
  def buildHamming(df: DataFrame, idCol: String, vecCol: String,
                   planes: Seq[Seq[Seq[Double]]]): (DataFrame, DataFrame) = {
    val dim = planes.head.head.length
    val skPlanes = Similarity.md5Planes(dim, groups = 2, bitsPerGroup = 32)
    val dotF = Similarity.dotAdaptive(df)(_, _)
    val base = Similarity.withNorm(
      df.select(col(idCol).cast("long").as("corpus_id"),
        Similarity.toDoubleVec(col(vecCol)).as("v")), "v")
      .withColumn("__sk", Similarity.bucketsAll(df, col("v"), skPlanes, dotF))
      .withColumn("s1", element_at(col("__sk"), 1))
      .withColumn("s2", element_at(col("__sk"), 2))
    val buckets = base
      .withColumn("__buckets", Similarity.bucketsAll(df, col("v"), planes, dotF))
      .select(col("corpus_id"), col("s1"), col("s2"),
        posexplode(col("__buckets")).as(Seq("grp", "bucket")))
    val vectors = base.select(col("corpus_id"), col("v"), col("__norm").as("nrm"))
    (buckets, vectors)
  }

  /** Query-side bucket probe rows: (query_id, grp, bucket) with the
    * Hamming-1 flip masks applied when `probes` > 0 (query side only —
    * the persisted index never grows, [[Similarity.lshTopK]]'s
    * multi-probe shape).
    */
  private def probeBuckets(queries: DataFrame, idCol: String, vecCol: String,
                           planes: Seq[Seq[Seq[Double]]],
                           probes: Int): DataFrame = {
    val q0 = queries
      .select(col(idCol).cast("long").as("query_id"),
        Similarity.toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("__buckets",
        Similarity.bucketsAll(queries, col("qv"), planes,
          Similarity.dotAdaptive(queries)(_, _)))
      .select(col("query_id"), posexplode(col("__buckets")).as(Seq("grp", "bucket")))
    if (probes <= 0) q0 else q0
      .withColumn("__flip",
        explode(typedLit(0L +: Seq.tabulate(probes)(1L << _))))
      .withColumn("bucket", expr("bucket ^ __flip"))
      .drop("__flip")
  }

  /** Query vectors with norms, keyed for the rerank joins. */
  private def queryVecs(queries: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    Similarity.withNorm(
      queries.select(col(idCol).cast("long").as("query_id"),
        Similarity.toDoubleVec(col(vecCol)).as("qv")), "qv")
      .withColumnRenamed("__norm", "qn")

  /** Exact-cosine top-k of each query against the persisted index —
    * [[Similarity.lshTopK]] semantics (candidates share a bucket in
    * ≥1 group, exact scores, cross-group dedup) with the corpus
    * bucketing read from `buckets`/`vectors` instead of recomputed.
    * Shuffle discipline: the dedup exchange carries the 16-byte
    * (query_id, corpus_id) pair; both vector tables re-enter by
    * candidate-sized id joins.
    */
  def topK(buckets: DataFrame, vectors: DataFrame, queries: DataFrame,
           idCol: String, vecCol: String, planes: Seq[Seq[Seq[Double]]],
           k: Int, probes: Int = 0): DataFrame = {
    val dotF = Similarity.dotAdaptive(queries)(_, _)
    val cand = probeBuckets(queries, idCol, vecCol, planes, probes)
      .join(buckets, Seq("grp", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id").as("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = cand
      .join(queryVecs(queries, idCol, vecCol), "query_id")
      .join(vectors.select(col("corpus_id").as("neighbor_id"), col("v"),
        col("nrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        (dotF(col("qv"), col("v")) / (sqrt(col("qn")) * sqrt(col("nrm"))))
          .as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** Binary-sketch funnel top-k against the persisted hamming index —
    * [[Similarity.hammingRerankBucketedTopK]] semantics: persisted
    * buckets GENERATE, the persisted 2×32-bit sketch SELECTS the
    * shortlist (XOR + popcount on the candidate row), exact cosine
    * scores only the shortlist.
    */
  def hammingTopK(buckets: DataFrame, vectors: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  planes: Seq[Seq[Seq[Double]]], k: Int,
                  shortlist: Int = 32, probes: Int = 0): DataFrame = {
    val dim = planes.head.head.length
    val skPlanes = Similarity.md5Planes(dim, groups = 2, bitsPerGroup = 32)
    val dotF = Similarity.dotAdaptive(queries)(_, _)
    val qsk = queries
      .select(col(idCol).cast("long").as("query_id"),
        Similarity.toDoubleVec(col(vecCol)).as("qv"))
      .withColumn("__sk", Similarity.bucketsAll(queries, col("qv"), skPlanes, dotF))
      .select(col("query_id"), element_at(col("__sk"), 1).as("q1"),
        element_at(col("__sk"), 2).as("q2"))
    val cand = probeBuckets(queries, idCol, vecCol, planes, probes)
      .join(qsk, "query_id")
      .join(buckets, Seq("grp", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id").as("neighbor_id"),
        (expr("bit_count(q1 ^ s1)") + expr("bit_count(q2 ^ s2)"))
          .cast("long").as("hamming"))
      .dropDuplicates("query_id", "neighbor_id")
    val sw = Window.partitionBy("query_id").orderBy(col("hamming"), col("neighbor_id"))
    val short = cand.withColumn("srn", row_number().over(sw))
      .filter(col("srn") <= shortlist)
      .select("query_id", "neighbor_id", "hamming")
    val scored = short
      .join(queryVecs(queries, idCol, vecCol), "query_id")
      .join(vectors.select(col("corpus_id").as("neighbor_id"), col("v"),
        col("nrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"), col("hamming"),
        (dotF(col("qv"), col("v")) / (sqrt(col("qn")) * sqrt(col("nrm"))))
          .as("cosine"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "hamming", "cosine", "rank")
  }
}
