package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Tick-imbalance bars (López de Prado, "Advances in Financial
  * Machine Learning" §2.3.2 — the third bar family next to
  * [[DollarBars]] and tick bars): sign every trade by the tick rule
  * (up-tick +1, down-tick −1, unchanged carries the last sign,
  * leading ties +1 — the [[Vpin]] convention, so the two operators
  * agree on signs), accumulate the signed count WITHIN the current
  * bar, and close the bar ON the row where |θ| reaches the
  * threshold; θ then resets. Unlike dollar bars — whose boundaries
  * are a floor-division of a GLOBAL cumsum — the reset makes
  * boundaries data-dependent state, so the scalable implementation
  * is the [[Ewma.rowwise]] shape: `repartition(key) +
  * sortWithinPartitions + one sequential mapPartitions scan`, O(n)
  * with parallelism = key cardinality and O(1) state per key.
  *
  * Determinism: signs are exact integer comparisons over a pinned
  * total order (time + tie columns), θ is integer arithmetic — bar
  * boundaries are bit-reproducible, and the oracle restates the
  * closes as a per-key recursive chain (each recursion step finds
  * the next crossing of the GLOBAL sign cumsum at distance ≥ T from
  * the previous close's anchor — the reset re-expressed without
  * state).
  */
object ImbalanceBars {

  /** Appends `tick_sign` (INT) and `bar_num` (INT, 0-based; the
    * crossing row belongs to the bar it closes).
    */
  def withBarNum(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 priceCol: String, threshold: Long): DataFrame = {
    require(threshold >= 1, "imbalance threshold must be >= 1")
    val outSchema = df.schema
      .add("tick_sign", IntegerType).add("bar_num", IntegerType)
    val keyIdx = df.schema.fieldIndex(keyCol)
    val priceIdx = df.schema.fieldIndex(priceCol)
    df.repartition(col(keyCol))
      .sortWithinPartitions((keyCol +: orderCols).map(col): _*)
      .mapPartitions { it =>
        var curKey: Any = null
        var started = false
        var lastPrice = 0.0
        var lastSign = 1
        var theta = 0L
        var barNum = 0
        it.map { row =>
          val k = row.get(keyIdx)
          val p = row.getDouble(priceIdx)
          if (!started || k != curKey) {
            curKey = k; started = true
            lastPrice = p; lastSign = 1; theta = 0L; barNum = 0
            // first trade of a key: no prior tick — the Vpin leading-
            // tie rule says buy (+1)
          } else {
            lastSign =
              if (p > lastPrice) 1 else if (p < lastPrice) -1 else lastSign
            lastPrice = p
          }
          theta += lastSign
          val out = Row.fromSeq(row.toSeq :+ lastSign :+ barNum)
          if (math.abs(theta) >= threshold) { barNum += 1; theta = 0L }
          out
        }
      }(Encoders.row(outSchema))
  }

  /** OHLC imbalance bars keyed by (key, bar_num): open/high/low/close
    * by the pinned order, the bar's signed imbalance (±threshold for
    * every closed bar — the defining invariant — and a partial value
    * only on each key's trailing bar), trade count, and the time
    * span. `orderCols` must totally order rows within a key.
    */
  def bars(df: DataFrame, keyCol: String, timeCol: String,
           priceCol: String, threshold: Long,
           tieCols: Seq[String] = Nil): DataFrame = {
    // open/close pick by the FULL pinned order (time + ties), not time
    // alone — min_by on a tied timestamp would be nondeterministic
    val ord = struct((timeCol +: tieCols).map(col): _*)
    withBarNum(df, keyCol, timeCol +: tieCols, priceCol, threshold)
      .groupBy(col(keyCol), col("bar_num"))
      .agg(
        min_by(col(priceCol), ord).as("open"),
        max(col(priceCol)).as("high"),
        min(col(priceCol)).as("low"),
        max_by(col(priceCol), ord).as("close"),
        sum(col("tick_sign")).cast("long").as("theta"),
        count(lit(1)).as("n_trades"),
        min(col(timeCol)).as("start_ts"),
        max(col(timeCol)).as("end_ts"))
  }
}
