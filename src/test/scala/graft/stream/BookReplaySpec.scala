package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** L2 book replay: hand-computed top-of-book transitions, naive
  * single-machine replay equality over random update streams, and
  * state carried across micro-batches.
  */
class BookReplaySpec extends SparkSpec {

  private type Top = (Long, Long, Option[Double], Option[Double],
    Option[Double], Option[Double], Option[Double], Option[Double])

  private def naive(updates: Seq[(Long, Long, String, Double, Double)]): Seq[Top] = {
    val byKey = updates.groupBy(_._1)
    byKey.toSeq.flatMap { case (k, us) =>
      var bids = Map.empty[Double, Double]
      var asks = Map.empty[Double, Double]
      us.sortBy(_._2).map { case (_, ts, side, p, sz) =>
        if (side == "bid") bids = if (sz == 0.0) bids - p else bids.updated(p, sz)
        else asks = if (sz == 0.0) asks - p else asks.updated(p, sz)
        val bb = bids.keys.maxOption
        val ba = asks.keys.minOption
        (k, ts, bb, bb.map(bids), ba, ba.map(asks),
          for { b <- bb; a <- ba } yield a - b,
          for { b <- bb; a <- ba } yield (a + b) / 2)
      }
    }.sortBy(t => (t._1, t._2))
  }

  private def runStream(updates: Seq[(Long, Long, String, Double, Double)],
                        splitAt: Int): Seq[Top] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Double, Double)]
    val sdf = mem.toDF().toDF("key", "tsUs", "side", "price", "size")
    val q = StatefulFeatures.bookReplay(sdf)
      .writeStream.format("memory").queryName(s"book_replay_$splitAt")
      .outputMode("append").start()
    try {
      mem.addData(updates.take(splitAt))
      q.processAllAvailable()
      mem.addData(updates.drop(splitAt))
      q.processAllAvailable()
      spark.table(s"book_replay_$splitAt").orderBy("key", "tsUs").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double]),
          Option(r.get(7)).map(_.asInstanceOf[Double])))
        .toSeq
    } finally q.stop()
  }

  test("hand-computed: inserts, improvement, deletion, one-sided book") {
    val ups = Seq(
      (1L, 1L, "bid", 99.0, 1.0),  // one-sided: no ask yet
      (1L, 2L, "ask", 101.0, 2.0), // spread 2, mid 100
      (1L, 3L, "bid", 100.0, 1.5), // bid improves → spread 1
      (1L, 4L, "bid", 100.0, 0.0), // level deleted → back to 99
      (1L, 5L, "ask", 101.0, 0.0)  // ask side empty again
    )
    val out = runStream(ups, splitAt = 3)
    assert(out(0) === ((1L, 1L, Some(99.0), Some(1.0), None, None, None, None)))
    assert(out(1) === ((1L, 2L, Some(99.0), Some(1.0), Some(101.0), Some(2.0),
      Some(2.0), Some(100.0))))
    assert(out(2) === ((1L, 3L, Some(100.0), Some(1.5), Some(101.0), Some(2.0),
      Some(1.0), Some(100.5))))
    assert(out(3) === ((1L, 4L, Some(99.0), Some(1.0), Some(101.0), Some(2.0),
      Some(2.0), Some(100.0))))
    assert(out(4) === ((1L, 5L, Some(99.0), Some(1.0), None, None, None, None)))
  }

  test("batch finalTopOfBook equals the streaming replay's final state (3 seeds)") {
    // the book_replay_final driver query's operator == the last
    // emitted top-of-book per key of the stateful replay, so the
    // DuckDB oracle hash transitively anchors the streaming operator
    import spark.implicits._
    for (seed <- 10 to 12) {
      val rnd = new scala.util.Random(seed)
      val ups = (1 to 150).map { t =>
        val key = 1L + rnd.nextInt(3)
        val side = if (rnd.nextBoolean()) "bid" else "ask"
        val base = if (side == "bid") 95 else 105
        val price = (base + rnd.nextInt(5) - 2).toDouble
        val size = if (rnd.nextInt(4) == 0) 0.0 else (1 + rnd.nextInt(9)).toDouble
        (key, t.toLong, side, price, size)
      }
      val streamFinal = runStream(ups, splitAt = 70 + seed)
        .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }
        .map(t => (t._1, t._3, t._4, t._5, t._6, t._7, t._8))
        // a key whose book ends with BOTH sides empty has no surviving
        // level, so the batch aggregate (and the SQL oracle) has no row
        // for it; the stream emits an all-null top — drop those here
        .filter(t => t._2.nonEmpty || t._4.nonEmpty).toSet
      val batch = graft.ops.OrderBook.finalTopOfBook(
          ups.toDF("key", "tsUs", "side", "price", "size"),
          "key", "tsUs", "side", "price", "size")
        .collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[Double]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Double]),
          Option(r.get(4)).map(_.asInstanceOf[Double]),
          Option(r.get(5)).map(_.asInstanceOf[Double]),
          Option(r.get(6)).map(_.asInstanceOf[Double])))
        .toSet
      assert(batch === streamFinal, s"seed $seed")
    }
  }

  test("random update streams equal the naive replay across micro-batch splits (3 seeds)") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val ups = (1 to 120).map { t =>
        val key = 1L + rnd.nextInt(2)
        val side = if (rnd.nextBoolean()) "bid" else "ask"
        val base = if (side == "bid") 95 else 105
        val price = (base + rnd.nextInt(5) - 2).toDouble
        val size = if (rnd.nextInt(4) == 0) 0.0 else (1 + rnd.nextInt(9)).toDouble
        (key, t.toLong, side, price, size)
      }
      val got = runStream(ups, splitAt = 47 + seed)
      assert(got === naive(ups), s"seed $seed")
    }
  }
}
