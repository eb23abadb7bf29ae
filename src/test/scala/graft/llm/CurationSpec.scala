package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.CurationQueries

/** End-to-end curation pipeline invariants (bitwise correctness is
  * the DuckDB oracle's job — these are the structural guarantees).
  */
class CurationSpec extends SparkSpec {

  private lazy val out =
    CurationQueries.curationPipeline.fn(spark, sf("sf0.01")).cache()

  test("cumulative tokens are monotone in quality order and within budget") {
    val rows = out.orderBy(col("quality_score").desc, col("doc_id"))
      .select("re_tokens", "cum_tokens").collect()
    assert(rows.nonEmpty)
    var acc = 0L
    rows.foreach { r =>
      acc += r.getInt(0)
      assert(r.getLong(1) === acc, "cum_tokens must be the running total")
    }
    assert(acc <= CurationQueries.TokenBudget)
  }

  test("survivors pass the quality filter and contain no exact duplicates") {
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    val surv = out.join(docs, "doc_id")
    val q = TextStats.withQuality(surv, "text")
    assert(q.filter(!col("pass_filter")).count() === 0)
    val normed = surv.select(TextHash.normalize(col("text")).as("n"))
    assert(normed.count() === normed.distinct().count())
  }

  test("ccnet buckets: every doc bucketed; per-lang mean LL orders head > middle > tail") {
    val b = CurationQueries.ccnetBucketsQ.fn(spark, sf("sf0.01")).cache()
    val docs = graft.Tables.documents(spark, sf("sf0.01"))
    assert(b.count() === docs.count())
    assert(b.filter(!col("bucket").isin("head", "middle", "tail")).count() === 0)
    val means = b.groupBy("lang", "bucket").agg(avg("avg_ll").as("m"))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("bucket")) ->
        r.getAs[Double]("m")).toMap
    means.keys.map(_._1).toSeq.distinct.foreach { lang =>
      for (h <- means.get((lang, "head")); t <- means.get((lang, "tail"))) {
        assert(h > t, s"$lang: head mean $h must exceed tail mean $t")
        means.get((lang, "middle")).foreach { m =>
          assert(h > m && m > t, s"$lang: bucket means must be ordered")
        }
      }
    }
    b.unpersist()
  }
}
