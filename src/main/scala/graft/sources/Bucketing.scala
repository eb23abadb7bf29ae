package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-free co-located join path
  * (SURVEY brief: "repartition/bucketing for co-located joins").
  * Writing both join sides bucketed by the join key with the same
  * bucket count lets Spark's bucketed scan satisfy the join's
  * ClusteredDistribution directly: the join plans with NO Exchange on
  * either side (asserted in BucketingSpec). At 100 TB this converts
  * every recurring join against a bucketed fact table from a full
  * shuffle into a local merge.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table in the session
    * catalog. `sortCols` pre-sorts within buckets so downstream
    * SortMergeJoins can also skip the per-partition sort.
    */
  def writeBucketed(df: DataFrame, table: String, numBuckets: Int,
                    keyCols: Seq[String], sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  def drop(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
