package graft.ops

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DecimalType, LongType}

/** Two-phase distributed prefix sum — the 100 TB form of the
  * reference's per-key running cumsum (SURVEY.md W1/§7.4 "3-key
  * skew"). `Window.partitionBy(key).orderBy(ts)` serializes each key
  * into ONE task: with the reference's 3 instrument codes the whole
  * 100 TB cumsum would run on 3 cores. This operator instead:
  *
  * 1. range-partitions by (key, order) — a key may span many
  *    partitions, so parallelism is data-proportional, not
  *    key-proportional;
  * 2. computes per-(partition, key) partial sums (one tiny
  *    aggregation: ≤ #partitions + #keys rows to the driver);
  * 3. broadcasts exclusive per-(partition, key) offsets back and does
  *    one sequential `mapPartitions` scan adding local running sum to
  *    the offset.
  *
  * The summed column must be DECIMAL: decimal addition is exact and
  * associative, so the result is bit-identical to the single-task
  * window form no matter where the range boundaries fall (proved in
  * PrefixSumSpec). Output column is the DOUBLE cast of the exact
  * running value, matching `DollarBars.withBarNum`.
  *
  * The input is materialized once (`persist`) so phase 1 and phase 3
  * see the same shuffle output without recomputing the sort.
  */
object PrefixSum {

  def withRunningSum(df: DataFrame, keyCol: String, orderCols: Seq[String],
                     decimalValCol: String, outCol: String): DataFrame = {
    require(df.schema(decimalValCol).dataType.isInstanceOf[DecimalType],
      s"$decimalValCol must be DECIMAL for an exact, partitioning-independent prefix sum")
    val sortCols = (keyCol +: orderCols).map(col)
    val sorted = df
      .repartitionByRange(sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val keyIdx = sorted.schema.fieldIndex(keyCol)
    val valIdx = sorted.schema.fieldIndex(decimalValCol)
    val pidIdx = sorted.schema.fieldIndex("__pid")

    // Phase 1: per-(partition, key) totals — tiny driver collect.
    val partials = sorted
      .groupBy(col("__pid"), col(keyCol))
      .agg(sum(col(decimalValCol)).as("__s"))
      .collect()
      .map(r => (r.getInt(0), r.get(1), r.getDecimal(2)))

    // Exclusive prefix offset per (pid, key): sum of the same key's
    // partials in earlier partitions (range partitioning ⇒ partition
    // order == global order).
    val offsets: Map[(Int, Any), JBigDecimal] = partials
      .groupBy(_._2)
      .flatMap { case (k, ps) =>
        var acc = JBigDecimal.ZERO
        ps.sortBy(_._1).map { case (pid, _, s) =>
          val o = ((pid, k), acc)
          acc = acc.add(s)
          o
        }
      }
    val bc = df.sparkSession.sparkContext.broadcast(offsets)

    // Phase 3: sequential local scan + offset.
    val outSchema = sorted.schema.add(outCol, DoubleType)
    val result = sorted.mapPartitions { it =>
      var curKey: Any = null
      var started = false
      var acc: JBigDecimal = JBigDecimal.ZERO
      it.map { row =>
        val k = row.get(keyIdx)
        if (!started || k != curKey) {
          curKey = k
          started = true
          acc = bc.value.getOrElse((row.getInt(pidIdx), k), JBigDecimal.ZERO)
        }
        acc = acc.add(row.getDecimal(valIdx))
        Row.fromSeq(row.toSeq :+ acc.doubleValue())
      }
    }(Encoders.row(outSchema))
    result.drop("__pid")
  }

  /** Two-phase EXCLUSIVE running max over a globally DESC-ordered long
    * column — the skyline/prefix-max sibling of [[withRunningSum]].
    * `Window.orderBy(...)` with no partition key moves the entire input
    * to ONE task (Spark's own WindowExec warning); this form instead:
    *
    * 1. range-partitions by `orderCol` DESC (parallelism follows
    *    `spark.sql.shuffle.partitions` / data size, not key count);
    * 2. collects one (partition, max) row per partition to the driver
    *    and folds them into exclusive per-partition prefix maxima —
    *    O(partitions) metadata, never data;
    * 3. runs the window PER PARTITION (parallel) and merges with the
    *    broadcast offset via `greatest`.
    *
    * max is associative/commutative, so the result is bit-identical to
    * the single-task window for any partition boundaries (asserted in
    * PrefixSumSpec against the naive form). Output column is nullable
    * LONG, null for the global first row(s) — exactly the exclusive
    * window's frame-empty semantics. `orderCol` values must be
    * distinct (the caller here feeds a groupBy key); with ties the
    * single-task window's exclusive frame would itself be
    * row-order-dependent, so the contract is the caller's anyway.
    */
  def withRunningMaxDesc(df: DataFrame, orderCol: String, valCol: String,
                         outCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // persist: `marked` feeds both the partition-maxima pass and the
    // final scan — without it the upstream (often an expensive
    // aggregation) runs twice; the cached relation is the POST-agg
    // table, no wider than its input (the r12 §5 persist rule). Same
    // caller-clears-cache contract as withRunningSum.
    val marked = df
      .repartitionByRange(col(orderCol).desc)
      .withColumn("__pid", spark_partition_id())
      .persist()
    // Exclusive prefix max of the PER-PARTITION maxima, computed as a
    // window over the partition-id table — #partitions rows, i.e.
    // metadata-scale (bounded by shuffle-partition config, never by
    // data), so its single-task window is free at any data size.
    // Range partitioning ⇒ ascending pid == descending orderCol order.
    val pmax = marked.groupBy(col("__pid"))
      .agg(max(col(valCol)).as("__m"))
      .withColumn("__off", max(col("__m")).over(
        Window.partitionBy(lit(0)).orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid").as("__opid"), col("__off"))
    // Local exclusive prefix max per partition + broadcast offset fold.
    // The window's partitionBy("__pid") keeps parallelism equal to the
    // range partitioning; `greatest` skips the nulls of first rows /
    // the first partition exactly like the single-task window's
    // empty-frame NULL.
    val localWin = Window.partitionBy(col("__pid"))
      .orderBy(col(orderCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    marked
      .join(broadcast(pmax), col("__pid") === col("__opid"), "left")
      .withColumn(outCol,
        greatest(max(col(valCol)).over(localWin), col("__off")))
      .drop("__pid", "__opid", "__off")
  }
}
