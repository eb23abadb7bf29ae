package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

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
}
