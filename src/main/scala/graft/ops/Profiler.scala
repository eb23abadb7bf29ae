package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Single-pass numeric column profiler: per column — row count,
  * null count, distinct count, min, max. The data-quality census a
  * pipeline runs before training ingestion.
  *
  * Scale design (100 TB): ONE scan computes every metric for every
  * column (all aggregates ride the same partial-aggregation pass;
  * `count(distinct)` for multiple columns plans as Spark's Expand —
  * one extra map-side row per distinct-column, still a single scan);
  * the wide one-row result is exploded to long format driver-free.
  * Only exact metrics (counts, min, max) — means/sums of arbitrary
  * doubles are order-sensitive and belong to the decimal-policy
  * operators (`incremental_stats`).
  */
object Profiler {

  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(count(lit(1)).as(s"__n_$c"),
        (count(lit(1)) - count(col(c))).as(s"__null_$c"),
        countDistinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__null_$c").as("n_null"), col(s"__dist_$c").as("n_distinct"),
        col(s"__min_$c").as("vmin"), col(s"__max_$c").as("vmax"))
    }
    wide.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }
}
