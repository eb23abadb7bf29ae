package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-verifiable query: a Spark program over the testdata
  * tables plus (where SQL-expressible) an equivalent DuckDB oracle.
  *
  * Numeric determinism policy (SURVEY.md §7.4 "double summation
  * order"): any aggregate that *sums* floating-point columns casts
  * the inputs to fixed-scale DECIMAL first — decimal addition is
  * exact and associative, so Spark and DuckDB produce bit-identical
  * results regardless of partitioning/order; the final value is cast
  * back to DOUBLE. Order-sensitive picks use `min_by`/`max_by` (Spark)
  * = `arg_min`/`arg_max` (DuckDB) on a unique ordering key. Recursive
  * folds (EWMA) perform the same IEEE ops in the same order on both
  * sides. Float-vector math rounds to 6 dp with an id tie-break.
  *
  * DuckDB pitfall: `CAST(decimal AS DOUBLE)` double-rounds when the
  * unscaled int128 exceeds 2^53 (it converts the integer first, then
  * divides by 10^scale). Oracles therefore use the correctly-rounded
  * `CAST(CAST(x AS VARCHAR) AS DOUBLE)` for any decimal with scale > 4
  * or magnitude where unscaled ≥ 2^53; Spark's BigDecimal.doubleValue
  * is correctly rounded already.
  *
  * Second DuckDB literal pitfall: a plain numeric literal like
  * `2.7725887222397812` parses as DECIMAL(17,16), NOT double — an
  * expression mixing it with doubles then runs decimal arithmetic
  * first and diverges in the last ulp from Spark's double literal.
  * Any high-precision constant in oracle SQL must be written
  * `CAST(2.7725887222397812 AS DOUBLE)` (short exact literals like
  * 0.5 / 0.25 convert exactly and may stay bare).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Registry {
  val all: Seq[Q] =
    MarketQueries.all ++ RelationalQueries.all ++ LlmQueries.all ++
      CurationQueries.all ++ ScaleQueries.all ++ AnalyticsQueries.all ++
      IndicatorQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
