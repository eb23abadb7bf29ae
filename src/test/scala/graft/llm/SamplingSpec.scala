package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SamplingSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf("sf0.01"))

  test("split proportions approximate the weights and cover every row") {
    val out = Sampling.withSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count()
    assert(counts.values.sum === n)
    // binomial sd at n=500, p=0.8 is ~9; allow 5 sd
    assert(math.abs(counts("train") - 0.8 * n) <= 45, counts.toString)
    assert(math.abs(counts("val") - 0.1 * n) <= 34, counts.toString)
    assert(math.abs(counts("test") - 0.1 * n) <= 34, counts.toString)
  }

  test("assignment is stable under repartitioning and re-evaluation") {
    val a = Sampling.withSplit(docs, "doc_id", Seq("train" -> 0.9, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.withSplit(docs.repartition(13), "doc_id",
        Seq("train" -> 0.9, "test" -> 0.1))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
  }

  test("split is a pure map-side projection — no shuffle in the plan") {
    val plan = Sampling.withSplit(docs, "doc_id", Seq("train" -> 0.8, "val" -> 0.2))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("stratified sample hits per-stratum fractions and is a stable subset") {
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.5), default = 0.2)
    val byLang = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    totals.foreach { case (lang, tot) =>
      val p = if (lang == "en") 0.5 else 0.2
      val sd = math.sqrt(tot * p * (1 - p))
      assert(math.abs(byLang.getOrElse(lang, 0L) - p * tot) <= 5 * sd + 1,
        s"$lang: ${byLang.get(lang)} of $tot")
    }
    // raising a fraction only ADDS rows (threshold monotonicity)
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.8), default = 0.2)
    assert(s1.filter(col("lang") === "en").select("doc_id").collect().map(_.getLong(0)).toSet
      .subsetOf(s2.filter(col("lang") === "en").select("doc_id").collect().map(_.getLong(0)).toSet))
  }

  test("temperature sample keeps the smallest stratum whole and evens the mix") {
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = before.values.min
    val out = Sampling.temperatureSample(docs, "doc_id", "lang")
    val after = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val minLang = before.minBy(_._2)._1
    // rate for the smallest stratum is sqrt(n_min/n_min) = 1 → all kept
    assert(after(minLang) === before(minLang))
    // every stratum's expectation is sqrt(n_min * n_l); check within 5 sd
    before.foreach { case (lang, n) =>
      val p = math.sqrt(nMin.toDouble / n)
      val sd = math.sqrt(n * p * (1 - p))
      assert(math.abs(after.getOrElse(lang, 0L) - p * n) <= 5 * sd + 1,
        s"$lang: ${after.get(lang)} of $n, expect ${p * n}")
    }
    // post-sample imbalance (max/min) must shrink toward sqrt of the original
    val ratioBefore = before.values.max.toDouble / nMin
    val ratioAfter = after.values.max.toDouble / after.values.min
    assert(ratioAfter < ratioBefore)
  }

  test("temperature sample is deterministic and a pure broadcast-join plan") {
    val a = Sampling.temperatureSample(docs, "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.temperatureSample(docs.repartition(7), "doc_id", "lang")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    // the corpus side must not shuffle: rates join via broadcast
    val plan = Sampling.temperatureSample(docs, "doc_id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("weightedSample: p=0 keeps none, p>=1 keeps all, monotone in p, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1L to 400L).map(i => (i, (i % 10) / 10.0)).toDF("id", "p")
    assert(Sampling.weightedSample(df, "id", lit(0.0)).count() === 0L)
    assert(Sampling.weightedSample(df, "id", lit(1.0)).count() === 400L)
    assert(Sampling.weightedSample(df, "id", lit(7.0)).count() === 400L) // clamped
    val lo = Sampling.weightedSample(df, "id", col("p"))
      .select("id").collect().map(_.getLong(0)).toSet
    val hi = Sampling.weightedSample(df, "id", col("p") + 0.3)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(lo.subsetOf(hi)) // raising every probability only ADDS rows
    val again = Sampling.weightedSample(df.repartition(7), "id", col("p"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again === lo) // partitioning-independent
  }

  test("weightedTopN: exactly N per stratum, deterministic, weight-sensitive") {
    import org.apache.spark.sql.functions._
    val sizes = Sampling.weightedTopN(docs, "doc_id", "lang",
        col("n_chars").cast("double"), n = 10)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1))
    assert(sizes.nonEmpty && sizes.forall(_._2 == 10L)) // every stratum has ≥ 10 docs here
    val a = Sampling.weightedTopN(docs, "doc_id", "lang",
        col("n_chars").cast("double"), n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.weightedTopN(docs.repartition(7), "doc_id", "lang",
        col("n_chars").cast("double"), n = 10)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b) // partitioning-independent
    // a different weighting changes the selection (weights matter)
    val c = Sampling.weightedTopN(docs, "doc_id", "lang",
        lit(1.0), n = 10).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== c)
  }

  test("globalShuffle: contiguous permutation equal to the global window rank") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 500L).map(i => (i, s"payload$i")).toDF("id", "text")
    val out = Sampling.globalShuffle(df, "id", nShards = 4)
      .select("id", "pos", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // permutation: positions are exactly 0..n-1, each once
    assert(out.map(_._2).sorted.toSeq === (0L until 500L))
    assert(out.forall { case (_, p, s) => s == p % 4 })
    // equals the single-window rank form
    val keyed = df.withColumn("skey", graft.llm.TextHash.h60(
      concat_ws(":", lit("shuffle"), col("id").cast("string"))))
    val win = keyed.withColumn("pos",
        row_number().over(Window.orderBy(col("skey"), col("id"))) - 1)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.forall { case (id, p, _) => win(id) == p })
    // stable under input partitioning
    val again = Sampling.globalShuffle(df.repartition(7), "id", nShards = 4)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (id, p, _) => again(id) == p })
  }

  test("curriculumOrder: bands consumed in order, shuffled within, permutation exact") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 400L).map(i => (i, (i % 4).toInt)).toDF("id", "quality_band")
    val out = Sampling.curriculumOrder(df, "id", col("quality_band"), nShards = 4)
      .select("id", "band", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(out.map(_._3).sorted.toSeq === (0L until 400L))
    // band blocks are contiguous and ascending along the position axis
    val byPos = out.sortBy(_._3).map(_._2)
    assert(byPos.toSeq === byPos.sorted.toSeq)
    // within a band the order is the md5 shuffle, not id order
    val band0Ids = out.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(band0Ids.toSeq !== band0Ids.sorted.toSeq)
    // equals the single-window rank form
    val keyed = df.withColumn("skey", graft.llm.TextHash.h60(
      concat_ws(":", lit("curriculum"), col("id").cast("string"))))
    val win = keyed.withColumn("pos",
        row_number().over(Window.orderBy(col("quality_band"), col("skey"), col("id"))) - 1)
      .select("id", "pos").collect().map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    assert(out.forall { case (id, _, p) => win(id) == p })
  }
}
