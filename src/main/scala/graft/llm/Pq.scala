package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou, Douze, Schmid 2011 — the FAISS `PQ`
  * shape, public knowledge): split each `dim`-vector into `m`
  * subvectors, learn a tiny k-means codebook per subspace, store each
  * vector as `m` small codes (here 4 × 4 bits of code id ≈ 16× the
  * compression of the raw floats), and answer queries by ASYMMETRIC
  * DISTANCE: the exact query subvector against the centroid of each
  * stored code — Σ_s ‖q_s − c_{s,code_s(x)}‖². Completes the engine's
  * vector-compression family: int8 scalar quantization
  * ([[Similarity.quantizeInt8]]) shrinks 4×, PQ shrinks 16–64× and is
  * what makes billion-vector scans affordable.
  *
  * Determinism: codebooks reuse the pinned [[Similarity.lloydCentroids]]
  * recipe per subspace (seeds = k smallest ids' subvectors, order-
  * pinned folds, ties to smallest code); the collected centroid
  * doubles re-enter as exact literals; the ADC sum folds subspaces in
  * fixed order (init 0.0 — identical IEEE chain to the oracle's
  * list_reduce). The full pipeline — 4 Lloyd runs, encoding, distance
  * tables — replays in the DuckDB oracle.
  *
  * Scale design (100 TB): codebooks are m·k·(dim/m) = dim·k doubles —
  * driver metadata, broadcast as ONE nested literal. Encoding is m
  * broadcast assignment passes (k rows each). The query scan reads
  * only the (vec_id, m codes) table — the 16×-smaller index IS the
  * point; at production scale the scan composes with IVF cells
  * ([[Similarity.ivfTopK]]) so each query touches only its probed
  * cells' code lists (classic IVF-PQ). Top-k plans as
  * WindowGroupLimit.
  */
object Pq {

  /** `(query_id, neighbor_id, adist, rank)` — top-k by asymmetric PQ
    * distance, ties broken by neighbor id, self excluded.
    */
  def pqTopK(df: DataFrame, idCol: String, vecCol: String,
             queryPred: Column, k: Int,
             dim: Int = 64, m: Int = 4, codes: Int = 16,
             iters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim=$dim must split evenly into m=$m subspaces")
    val sub = dim / m
    val base = df.select(col(idCol).cast("long").as("id"),
      Similarity.toDoubleVec(col(vecCol)).as("v")).persist()

    def subDf(s: Int): DataFrame =
      base.select(col("id"), slice(col("v"), s * sub + 1, sub).as("vs"))

    // per-subspace codebooks (driver metadata: m × codes × sub doubles)
    val books: Seq[Seq[(Int, Seq[Double])]] =
      (0 until m).map(s => Similarity.lloydCentroids(subDf(s), "id", "vs", codes, iters))

    // encode: m assignment passes → one (vec_id, [code_0..code_{m-1}]) row
    val codeRows = (0 until m).map { s =>
      Similarity.assignCells(subDf(s), "id", "vs", books(s))
        .select(col("vec_id"), lit(s).as("s"), col("cell").as("code"))
    }.reduce(_.unionByName(_))
    val encoded = codeRows.groupBy("vec_id")
      .agg(transform(array_sort(collect_list(struct(col("s"), col("code")))),
        x => x.getField("code")).as("codes"))

    // ADC via hoisted per-query distance tables (the classic trick):
    // dt[s][code] = ‖q_s − c_{s,code}‖² computed ONCE per query row
    // (m·codes values), so the corpus-sized scan pays 4 array lookups
    // + 3 adds per pair instead of 4 × 16-dim squared-diff folds
    // (measured 131 → 27 s at 20k vectors; 9× more pairs at 60k
    // vectors stays 27 s — job overhead dominates once the per-pair
    // expression is 4 lookups). Pure hoisting — the same
    // IEEE ops on the same inputs in the same fold order, so adist is
    // bit-identical to the unhoisted form and the oracle's per-pair
    // restatement.
    val cent = typedlit(books.map(_.sortBy(_._1).map(_._2)))
    def sqd(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x)
    val dtCol = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(sequence(lit(0), lit(codes - 1)), c =>
        sqd(slice(col("qv"), s * lit(sub) + lit(1), lit(sub)),
          element_at(element_at(cent, s + 1), c + 1))))
    val q = base.filter(queryPred)
      .select(col("id").as("query_id"), col("v").as("qv"))
      .withColumn("dt", dtCol)
      .select("query_id", "dt")
    val adist = aggregate(sequence(lit(0), lit(m - 1)), lit(0.0), (acc, s) =>
      acc + element_at(element_at(col("dt"), s + 1),
        element_at(col("codes"), s + 1).cast("int") + 1))
    val scored = q.join(encoded, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        adist.as("adist"))
    base.unpersist()
    val w = Window.partitionBy("query_id").orderBy(col("adist"), col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "adist", "rank")
  }
}
