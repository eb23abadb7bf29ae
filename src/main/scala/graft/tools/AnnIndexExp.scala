package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.Tables
import graft.llm.{AnnIndex, ScalePolicy, Similarity}

/** Amortization curve for the build-once/probe-many split (r7 VERDICT
  * #2): the fixed-500-query label decades identified INDEX-SIDE
  * hashing as the shared linear floor of every monolithic arm — each
  * [[Similarity.lshTopK]] call re-buckets the whole corpus. This
  * experiment measures, per decade slice:
  *
  *  - `build`: one [[AnnIndex.build]] pass persisted to parquet
  *  - `probe`: [[AnnIndex.topK]] per query batch against the
  *    persisted tables (median over `batches` runs)
  *  - `mono`: the monolithic [[Similarity.lshTopK]] per batch
  *
  * Break-even = build / (mono − probe): the number of query batches
  * after which the persisted index is pure profit. Policy planes
  * (occupancy-constant, [[ScalePolicy]]) in every arm, noop sink.
  *
  * Usage: tools/run.sh graft.tools.AnnIndexExp <sfDir> [queryMod] [batches]
  */
object AnnIndexExp {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/scale/sf1")
    val queryMod = args.lift(1).map(_.toInt).getOrElse(40)
    val batches = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val work = java.nio.file.Files.createTempDirectory("ann_idx_exp")
      .toFile.getAbsolutePath
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      // own warehouse: the bucketed-table arm must not collide with a
      // previous run's orphaned managed-table location
      .config("spark.sql.warehouse.dir", s"$work/warehouse")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val bits = ScalePolicy.lshBitsFor(n)
    val planes = Similarity.md5Planes(64, ScalePolicy.lshGroupsFor(bits), bits)
    val pred = col("id") % queryMod === 0
    val queries = emb.filter(col("vec_id") % queryMod === 0)
    val dir = s"$work/index"

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT/scan caches once with the monolithic arm
    Similarity.lshTopK(emb, "vec_id", "embedding", pred, 5, planes)
      .write.format("noop").mode("overwrite").save()

    val buildS = time {
      val (b, v) = AnnIndex.build(emb, "vec_id", "embedding", planes)
      b.write.mode("overwrite").parquet(s"$dir/buckets")
      v.write.mode("overwrite").parquet(s"$dir/vectors")
    }
    val bkts = spark.read.parquet(s"$dir/buckets")
    val vecs = spark.read.parquet(s"$dir/vectors")
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    val probeS = med((1 to batches).map { _ =>
      time(AnnIndex.topK(bkts, vecs, queries, "vec_id", "embedding", planes, 5)
        .write.format("noop").mode("overwrite").save())
    })
    val monoS = med((1 to batches).map { _ =>
      time(Similarity.lshTopK(emb, "vec_id", "embedding", pred, 5, planes)
        .write.format("noop").mode("overwrite").save())
    })
    val breakeven = if (monoS > probeS) buildS / (monoS - probeS) else Double.NaN
    println(f"corpus=$n planes=${ScalePolicy.lshGroupsFor(bits)}x$bits " +
      f"queryMod=$queryMod batches=$batches")
    println(f"lsh  build=$buildS%.2f s  probe_med=$probeS%.2f s  mono_med=$monoS%.2f s  " +
      f"breakeven=$breakeven%.1f batches")

    // A/B the r8-ADVICE nrm-carry layout: bucket rows widened to
    // (corpus_id, nrm, grp, bucket) so the rerank's vectors join
    // fetches v alone — topK schema-sniffs the extra column
    bkts.join(vecs.select(col("corpus_id"), col("nrm")), "corpus_id")
      .write.mode("overwrite").parquet(s"$dir/buckets_nrm")
    val bktsN = spark.read.parquet(s"$dir/buckets_nrm")
    val probeNrmS = med((1 to batches).map { _ =>
      time(AnnIndex.topK(bktsN, vecs, queries, "vec_id", "embedding", planes, 5)
        .write.format("noop").mode("overwrite").save())
    })
    println(f"lsh  probe_nrmcarry_med=$probeNrmS%.2f s (vs $probeS%.2f skinny)")

    // The layout lever the scaladoc claims for 1000 executors: both
    // index tables bucketed on their probe-join keys, so neither pays
    // an exchange per probe (plan contract in AnnIndexSpec)
    val bucketedS = time {
      graft.sources.Bucketing.writeBucketed(bkts, "annexp_buckets",
        cpus.toInt, Seq("grp", "bucket"), Seq("grp", "bucket"))
      graft.sources.Bucketing.writeBucketed(vecs, "annexp_vectors",
        cpus.toInt, Seq("corpus_id"), Seq("corpus_id"))
    }
    val probeBkS = med((1 to batches).map { _ =>
      time(AnnIndex.topK(spark.table("annexp_buckets"),
        spark.table("annexp_vectors"), queries, "vec_id", "embedding", planes, 5)
        .write.format("noop").mode("overwrite").save())
    })
    // the bucketed write replaces the plain parquet write as the build,
    // so ITS cost is the one a bucketed deployment amortizes
    val beBk = if (monoS > probeBkS) bucketedS / (monoS - probeBkS) else Double.NaN
    println(f"lsh  probe_bucketed_med=$probeBkS%.2f s  bucketed_build=$bucketedS%.2f s  " +
      f"breakeven_bucketed=$beBk%.1f batches")

    // split the levers: vectors-only bucketing keeps the candidate-gen
    // join on the broadcast-hash path (probe side is small) while the
    // corpus-sized rerank join reads vectors pre-partitioned
    val probeVbS = med((1 to batches).map { _ =>
      time(AnnIndex.topK(bkts, spark.table("annexp_vectors"),
        queries, "vec_id", "embedding", planes, 5)
        .write.format("noop").mode("overwrite").save())
    })
    println(f"lsh  probe_vecbucketed_med=$probeVbS%.2f s (vs $probeS%.2f plain)")

    // IVF pair: the Lloyd training is the expensive build the
    // monolithic path repeats per query batch
    val cells = ScalePolicy.ivfCellsFor(n)
    val ivfBuildS = time {
      val (v, c, _) = AnnIndex.buildIvf(emb, "vec_id", "embedding", cells)
      v.write.mode("overwrite").parquet(s"$dir/ivf_vectors")
      c.write.mode("overwrite").parquet(s"$dir/ivf_cents")
    }
    val iv = spark.read.parquet(s"$dir/ivf_vectors")
    val ic = spark.read.parquet(s"$dir/ivf_cents")
    val ivfProbeS = med((1 to batches).map { _ =>
      time(AnnIndex.ivfTopK(iv, ic, queries, "vec_id", "embedding", 5, nprobe = 4)
        .write.format("noop").mode("overwrite").save())
    })
    val ivfMonoS = med((1 to batches).map { _ =>
      time(ScalePolicy.ivfTopKAuto(emb, "vec_id", "embedding", pred, 5, corpus = n)
        .write.format("noop").mode("overwrite").save())
    })
    val ivfBe = if (ivfMonoS > ivfProbeS) ivfBuildS / (ivfMonoS - ivfProbeS)
      else Double.NaN
    println(f"ivf  cells=$cells build=$ivfBuildS%.2f s  probe_med=$ivfProbeS%.2f s  " +
      f"mono_med=$ivfMonoS%.2f s  breakeven=$ivfBe%.1f batches")
    spark.stop()
  }
}
