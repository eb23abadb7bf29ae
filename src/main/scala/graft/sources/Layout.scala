package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Data-layout writer: Hive-style partition directories for coarse
  * predicate pruning + within-partition sort for parquet row-group
  * clustering (min/max stats become selective when values are
  * clustered, so predicate pushdown skips row groups, not just
  * directories).
  *
  * At 100 TB, layout is the cheapest query accelerator there is: a
  * `lang='en'` filter over lang-partitioned data never lists, opens,
  * or reads the other partitions (LayoutSpec asserts the scan's
  * partition count and file count drop), and a time-range filter over
  * ts-sorted row groups reads only matching stripes.
  *
  * The repartition-by-partition-columns before write bounds the file
  * count to one file per (partition, shuffle task) instead of
  * (input partition × partition value) small-file blowup.
  */
object Layout {

  def writePartitioned(df: DataFrame, path: String,
                       partCols: Seq[String], sortCols: Seq[String]): Unit =
    df.repartition(partCols.map(col): _*)
      .sortWithinPartitions((partCols ++ sortCols).map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .partitionBy(partCols: _*)
      .parquet(path)

  /** Morton (Z-order) interleave of `dims.size` non-negative integer
    * dimensions, `bits` bits each: bit i of dim j lands at position
    * `i·d + (d−1−j)` — dim 0 is the most significant within each bit
    * group. Clustering files by this single value gives row-group
    * min/max stats locality in EVERY dimension at once, so a
    * multi-column box predicate skips row groups that a single-column
    * sort could only skip on its leading column — the standard
    * multi-dimensional layout trick (public: Morton 1966; Delta/
    * Iceberg `ZORDER BY`). Pure bit arithmetic (shift/and), fully
    * codegen'd, restatable in any engine.
    *
    * Dimensions are masked to `bits` (callers bucket/rescale first);
    * `bits * dims.size` must fit a signed long. Disjoint bit
    * positions make the combining `+` an exact OR.
    */
  def zValue(dims: Seq[Column], bits: Int): Column = {
    val d = dims.size
    require(d > 0 && bits > 0 && bits * d <= 63,
      s"need 0 < bits*dims <= 63, got bits=$bits dims=$d")
    val masked = dims.map(c => c.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      i <- 0 until bits
      (c, j) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * d + (d - 1 - j))
    terms.reduce(_ + _)
  }

  /** The same interleave as [[zValue]] in portable SQL, for oracle
    * restatement: `dims` are SQL expressions already masked to
    * `bits` non-negative bits.
    */
  def zValueSql(dims: Seq[String], bits: Int): String = {
    val d = dims.size
    (for {
      i <- 0 until bits
      (e, j) <- dims.zipWithIndex
    } yield s"((($e >> $i) & 1) << ${i * d + (d - 1 - j)})").mkString(" + ")
  }

  /** Z-ordered write: range-partition and sort by the z-value so both
    * file boundaries and row groups cluster in all `dims` at once.
    */
  def writeZOrdered(df: DataFrame, path: String, dims: Seq[Column],
                    bits: Int, numFiles: Int): Unit = {
    val z = zValue(dims, bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }
}
