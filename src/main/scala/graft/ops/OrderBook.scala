package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch L2 order-book reconstruction from incremental depth updates —
  * the batch twin of `graft.stream.StatefulFeatures.bookReplay`
  * (reference consumes only pre-built `orderbook_units` snapshots,
  * `spark_src/kafka_upbit_realtime_processing.py:121-128`; both
  * operators rebuild those snapshots from the raw per-level feed).
  *
  * The streaming form replays updates through per-key state and emits
  * a top-of-book row per update; after the last update its state IS
  * the final book. That final state is pure SQL: each (key, side,
  * price) level's final size is the level's LAST update in `seqCol`
  * order (`max_by(size, seq)` — one shuffle on the level key), size 0
  * deletes the level, and the surviving levels aggregate per key to
  * best bid (max price), best ask (min price) and their sizes
  * (`max_by`/`min_by` with a side-null ordering — null-ordering rows
  * are ignored identically in Spark and DuckDB, so an empty side
  * yields NULL exactly like the streaming operator's Option fields).
  *
  * Scale (100 TB): two hash aggregations — (key, side, price) then
  * (key) — both with map-side partial aggregation; no window, no
  * join, no per-key sort. Level count is venue-capped (book depth),
  * so the second aggregate's input is O(keys · depth), not O(updates).
  * Equality with the streaming replay's final state is pinned in
  * BookReplaySpec; the driver query `book_replay_final` anchors it to
  * the DuckDB oracle.
  *
  * @param seqCol unique per-key replay-order column (ties would make
  *               "last update wins" nondeterministic — same contract
  *               as the stream's arrival order)
  */
object OrderBook {

  def finalTopOfBook(updates: DataFrame, keyCol: String, seqCol: String,
                     sideCol: String, priceCol: String,
                     sizeCol: String): DataFrame = {
    val side = col(sideCol)
    val levels = updates
      .groupBy(col(keyCol), side.as("side"), col(priceCol).as("price"))
      .agg(max_by(col(sizeCol), col(seqCol)).as("size"))
      .filter(col("size") > 0)
    val bidPrice = when(col("side") === "bid", col("price"))
    val askPrice = when(col("side") === "ask", col("price"))
    levels
      .groupBy(col(keyCol))
      .agg(
        max(bidPrice).as("bid_price"),
        max_by(col("size"), bidPrice).as("bid_size"),
        min(askPrice).as("ask_price"),
        min_by(col("size"), askPrice).as("ask_size"))
      .withColumn("spread", col("ask_price") - col("bid_price"))
      .withColumn("mid", (col("ask_price") + col("bid_price")) / 2)
  }
}
