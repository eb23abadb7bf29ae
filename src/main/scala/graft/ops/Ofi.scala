package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Order-flow imbalance — the reference's lag-based feature
  * (SURVEY.md W3+P7, `kafka_upbit_realtime_processing.py:121-128`):
  * compare each snapshot's price to the previous one per instrument
  * and emit signed size flow:
  *
  * {{{
  * ofi = (price >= prev_price ?  size : -prev_size)
  *     - (price <= prev_price ?  size : -prev_size)
  * }}}
  *
  * (the reference applies the two halves to bid and ask books; with a
  * single (price, size) stream the same formula shape applies both
  * comparisons to one series). First row per key → null (lag default).
  *
  * Scale: one hash shuffle on the key + per-partition sort; `lag(1)`
  * needs no buffering beyond the sort — linear.
  */
object Ofi {

  /** Appends `prev_<price>`, `prev_<size>` and `outCol`. */
  def withOfi(df: DataFrame, keyCol: String, orderCols: Seq[String],
              priceCol: String, sizeCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCols.map(col): _*)
    val prevP = lag(col(priceCol), 1).over(w)
    val prevS = lag(col(sizeCol), 1).over(w)
    val bidTerm: Column = when(col(priceCol) >= prevP, col(sizeCol)).otherwise(-prevS)
    val askTerm: Column = when(col(priceCol) <= prevP, col(sizeCol)).otherwise(-prevS)
    df.withColumn(s"prev_$priceCol", prevP)
      .withColumn(s"prev_$sizeCol", prevS)
      .withColumn(outCol, bidTerm - askTerm)
  }
}
