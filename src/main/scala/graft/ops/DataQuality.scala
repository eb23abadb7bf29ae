package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks over a table — the
  * constraint-report stage a production ingest pipeline runs before
  * publishing a partition (completeness / uniqueness / range /
  * referential integrity), modeled as data: each check contributes a
  * metric column, the report is one long-format (constraint, metric,
  * passed) frame.
  *
  * Scale (100 TB): every ROW-LOCAL check (completeness, range) fuses
  * into ONE aggregate pass over the scan — adding a check adds an
  * aggregate expression, not a job; uniqueness joins the same pass
  * but its exact count-distinct adds one shuffle stage (two-phase
  * distinct — still no second scan). The single 1-row result then
  * unpivots driver-side for free. Set checks (subset-of / coverage
  * against another table) each cost one key-projected anti-join —
  * ids only cross the network, and the count is partially aggregated
  * map-side. N checks ≠ N scans. All of this is job-count-asserted in
  * DataQualitySpec.
  */
object DataQuality {

  sealed trait Check { def name: String }

  /** Fraction of non-null values must be ≥ `atLeast`. */
  final case class Completeness(col: String, atLeast: Double = 1.0) extends Check {
    def name = s"completeness.$col"
  }

  /** distinct(cols)/rows must equal 1 (key property). */
  final case class Uniqueness(cols: Seq[String]) extends Check {
    def name = s"uniqueness.${cols.mkString("_")}"
  }

  /** Count of values outside [lo, hi] must be 0 (nulls don't count). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"range.$col"
  }

  /** Every non-null value of `col` must exist in `refCol` of `ref`
    * (referential integrity); metric = count of distinct violating
    * keys.
    */
  final case class SubsetOf(col: String, ref: DataFrame, refCol: String,
                            refName: String) extends Check {
    def name = s"subset.${col}_in_$refName"
  }

  /** Run all checks; returns (constraint, metric, passed) rows. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._

    val rowLocal = checks.filter(!_.isInstanceOf[SubsetOf])
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: rowLocal.map {
      case Completeness(c, _) => count(col(c)).cast("double").as(s"m_${c}_comp")
      // distinct over the STRUCT so rows with a null key component
      // still count as a distinct tuple (plain count_distinct(a, b)
      // drops them — diverging from SQL's struct-distinct and
      // reporting false uniqueness failures on nullable keys)
      case Uniqueness(cs)     => count_distinct(struct(cs.map(col): _*))
        .cast("double").as(s"m_${cs.mkString("_")}_uniq")
      case InRange(c, lo, hi) => sum(when(col(c) < lo || col(c) > hi, 1L)
        .otherwise(0L)).cast("double").as(s"m_${c}_range")
      case _: SubsetOf        => lit(0).as("unused")
    }
    val row = df.agg(aggs.head, aggs.tail: _*).collect().head
    val n = row.getLong(0).toDouble
    val local = rowLocal.zipWithIndex.map { case (chk, i) =>
      // sum() over zero rows is NULL — an empty table has zero
      // violations, not a crash
      val m = if (row.isNullAt(i + 1)) 0.0 else row.getDouble(i + 1)
      chk match {
        case Completeness(_, atLeast) =>
          (chk.name, if (n == 0) 1.0 else m / n, (if (n == 0) 1.0 else m / n) >= atLeast)
        case Uniqueness(_) =>
          (chk.name, if (n == 0) 1.0 else m / n, m == n)
        case InRange(_, _, _) => (chk.name, m, m == 0.0)
        case _: SubsetOf      => throw new IllegalStateException("filtered")
      }
    }

    val subset = checks.collect { case s0 @ SubsetOf(c, ref, rc, _) =>
      val viol = df.select(col(c).as("__k")).filter(col("__k").isNotNull).distinct()
        .join(ref.select(col(rc).as("__k")).distinct(), Seq("__k"), "left_anti")
        .count().toDouble
      (s0.name, viol, viol == 0.0)
    }

    (local ++ subset).toDF("check_name", "metric", "passed")
  }
}
