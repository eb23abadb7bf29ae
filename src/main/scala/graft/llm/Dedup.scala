package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextHash._

/** Deduplication operators for training-data pipelines: exact
  * (hash-groupBy), MinHash-LSH near-dup (shingle → minhash → band →
  * bucket-join → exact-Jaccard verify), and SimHash.
  *
  * Scale design (100 TB):
  * - exact: one hash shuffle on the normalized-text digest; group
  *   payload is ids only.
  * - minhash: signatures are computed map-side with higher-order
  *   array expressions (no shuffle, no UDF); the only shuffle is the
  *   band-bucket self-join, keyed by (band index, band hash) — the
  *   standard LSH trick that replaces the O(n²) pair space with
  *   per-bucket candidate generation. Hot buckets (boilerplate docs)
  *   are the skew risk: cap candidates per bucket or salt in a
  *   production run; kept exact here.
  * - simhash: map-side 60-bit signature; banded (4 × 15 bits) bucket
  *   join for candidates, then popcount(xor) Hamming verify.
  */
object Dedup {

  /** Mersenne prime 2³¹−1 for the affine minhash permutations. */
  val P: Long = 2147483647L

  /** Exact dedup groups over normalized text: one row per distinct
    * normalized form with representative (min id) and group size.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), md5(normalize(col(textCol))).as("text_hash"))
      .groupBy("text_hash")
      .agg(min(col(idCol)).as("rep_id"), count(lit(1)).as("group_size"))

  /** MinHash signature from a *materialized* token-hash array column
    * (materialize `transform(toks, h32)` once — md5 inside the
    * permutation lambda would be recomputed numPerm× per row):
    * `numPerm` affine permutations `(h·a_j + b_j) mod P` with
    * `a_j = 1 + 7919·j`, `b_j = 1 + 104729·j` — literal constants so
    * the oracle can restate them — folded to their minima.
    */
  def minhashSignature(hashesCol: Column, numPerm: Int): Column =
    transform(sequence(lit(0), lit(numPerm - 1)), j =>
      array_min(transform(hashesCol, h =>
        (h * (lit(1L) + j.cast("long") * 7919L) + (lit(1L) + j.cast("long") * 104729L)) % P)))

  /** Fold `rows` signature values per band into one bucket hash
    * (base-31 accumulation; init 0 ⇒ identical to DuckDB's init-free
    * list_reduce since 0·31+m₀ = m₀).
    */
  def bandHashes(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      aggregate(slice(sig, b * rows + 1, lit(rows)), lit(0L), (acc, m) => acc * 31L + m))

  /** Drop rows of (band_idx, band_hash) buckets holding more than
    * `cap` members — a bucket shared by hundreds of documents is a
    * non-discriminative band (boilerplate), and its O(c²) pair blowup
    * is the classic LSH skew failure at scale. Deterministic (count
    * depends only on data), mirrored in the oracle SQL.
    */
  private def capBuckets(buckets: DataFrame, cap: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("band_idx", "band_hash")
    buckets.withColumn("__bc", count(lit(1)).over(w))
      .filter(col("__bc") <= cap)
      .drop("__bc")
  }

  /** Near-duplicate pairs via MinHash-LSH with exact-Jaccard
    * verification: returns (id_a, id_b, jaccard) with id_a < id_b and
    * jaccard ≥ tau, deduplicated across bands. Buckets larger than
    * `maxBucket` are skipped (see [[capBuckets]]).
    */
  def minHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      numPerm: Int, bands: Int, tau: Double,
                      maxBucket: Int = 64): DataFrame = {
    val rows = numPerm / bands
    // The exact-Jaccard verify runs on the hashed-long token sets, not
    // the strings: primitive intersects, 8-byte shuffle payloads
    // (collisions, if any, perturb the oracle identically).
    val docs = df.select(col(idCol).as("id"), wordSet(col(textCol)).as("toks"))
      .withColumn("hs", array_distinct(transform(col("toks"), t => h32(t))))
      .withColumn("sig", minhashSignature(col("hs"), numPerm))
      .withColumn("bands", bandHashes(col("sig"), bands, rows))
    // persist: the self-join would otherwise recompute the md5 token
    // hashing + 16-perm signatures on both sides (at production scale,
    // write the signature table out instead of caching).
    val buckets = capBuckets(docs.select(col("id"), col("hs"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash"))), maxBucket)
      .persist()
    val cand = buckets.as("a")
      .join(buckets.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.hs").as("toks_a"), col("b.hs").as("toks_b"))
      .dropDuplicates("id_a", "id_b")
    // |A∪B| = |A|+|B|−|A∩B| from precomputed sizes — one set op per
    // pair instead of two (array_union is the costlier of the pair).
    cand
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("toks_a")) + size(col("toks_b")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= tau)
      .select("id_a", "id_b", "jaccard")
  }

  /** 60-bit SimHash over a materialized token-hash array (h60 per
    * distinct token): bit j is set when the +1/−1 vote sum of
    * token-hash bits j is positive.
    */
  def simhash(hashes: Column): Column = {
    aggregate(
      sequence(lit(0), lit(59)),
      lit(0L),
      (acc, j) => {
        val votes = aggregate(hashes, lit(0L), (a, h) =>
          a + when(call_function("shiftright", h, j.cast("int")).bitwiseAND(1L) === 1L, 1L).otherwise(-1L))
        acc + when(votes > 0, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L)
      })
  }

  /** SimHash near-dup pairs: banded 15-bit buckets (any shared band ⇒
    * candidate), Hamming distance popcount(xor) ≤ maxDist.
    */
  def simHashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxDist: Int, maxBucket: Int = 64): DataFrame = {
    val docs = df
      .select(col(idCol).as("id"), transform(wordSet(col(textCol)), t => h60(t)).as("hs"))
      .select(col("id"), simhash(col("hs")).as("sim"))
    val banded = capBuckets(docs.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("sim"), b.cast("int") * 15).bitwiseAND(32767L)))
        .as(Seq("band_idx", "band_hash"))), maxBucket)
      .persist()
    banded.as("a")
      .join(banded.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.sim").as("sim_a"), col("b.sim").as("sim_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxDist)
      .select("id_a", "id_b", "sim_a", "sim_b", "hamming")
  }

  /** Exact n-gram (character trigram) Jaccard over blocked pairs —
    * blocking on (lang, length band) bounds the pair space; at scale
    * swap the block key for an LSH bucket (minHashNearDups).
    */
  /** @param modP keep only grams with hash ≡ 0 (mod modP) — a
    *              deterministic mod-p sketch: Jaccard over the sketch
    *              estimates full-set Jaccard while cutting both the
    *              pair-join payload and the per-pair intersect by
    *              ~modP² (identical sketch in the oracle). modP=1
    *              disables sketching.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        blockCols: Seq[String], n: Int, tau: Double,
                        modP: Int = 4): DataFrame = {
    // Grams are hashed to 32-bit longs map-side BEFORE the pair join:
    // the per-pair intersect then runs on primitive longs instead of
    // strings (~an order of magnitude cheaper), and the shuffle
    // carries 8-byte values. Hash collisions would perturb Jaccard
    // identically in the oracle (same md5-derived hash).
    val docs = df.select((col(idCol).as("id") +: blockCols.map(col)) :+
      array_distinct(filter(transform(
        sequence(lit(1), greatest(length(col(textCol)) - (n - 1), lit(1))),
        i => h32(col(textCol).substr(i, lit(n)))),
        h => h % modP === 0)).as("grams"): _*)
      .persist()
    val cond = blockCols.map(c => col(s"a.$c") === col(s"b.$c"))
      .reduce(_ && _) && col("a.id") < col("b.id")
    docs.as("a").join(docs.as("b"), cond)
      .withColumn("inter", size(array_intersect(col("a.grams"), col("b.grams"))))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (col("inter").cast("double") /
          (size(col("a.grams")) + size(col("b.grams")) - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= tau)
  }
}
