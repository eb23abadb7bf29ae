package graft.ops

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, DecimalType}

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
}
