package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import graft.ops.DollarBars

/** Market-data (reference-parity) queries over the `events` table,
  * which plays the trade/orderbook stream role (FIXTURES.md §B):
  * `ts` → exchange timestamp, `user_id` → instrument code,
  * `value` → price/notional.
  */
object MarketQueries {

  /** Dollar-bar size for the `events.value` notional (value ∈ ~[0,200],
    * ~67 events/key ⇒ ~13 bars/key). Reference uses 3 000 000 KRW
    * (`dags_spark_submit_bash_process_raw_data_from_gcs.py:40`).
    */
  val BarSize = 500.0

  /** Flagship: dollar bars (reference `processing_raw_data_from_gcs.py:108-141`). */
  val dollarBars: Q = Q(
    "dollar_bars",
    (s, dir) => {
      val ev = Tables
        .events(s, dir)
        .select(
          col("user_id"),
          col("ts"),
          col("value"),
          col("value").cast(DecimalType(20, 4)).as("notional")
        )
      DollarBars.bars(ev, "user_id", "ts", "value", "notional", BarSize)
    },
    Some("""
      WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
      t AS (
        SELECT user_id, ts, value,
               CAST(sum(CAST(value AS DECIMAL(20,4)))
                    OVER (PARTITION BY user_id ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS cumsum
        FROM ev),
      b AS (SELECT *, CAST(floor(cumsum / 500.0) AS INT) AS bar_num FROM t)
      SELECT user_id, bar_num,
             arg_min(value, ts) AS open,
             max(value)         AS high,
             min(value)         AS low,
             arg_max(value, ts) AS close,
             CAST(sum(CAST(value AS DECIMAL(20,4))) AS DOUBLE) AS volume,
             count(*)           AS n_trades,
             min(ts)            AS start_ts,
             max(ts)            AS end_ts
      FROM b GROUP BY 1, 2
    """)
  )

  val all: Seq[Q] = Seq(dollarBars)
}
