package graft.llm

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video travel as opaque
  * `binary` columns with typed metadata; decode / feature-extract /
  * resize / frame-sample run as partition-local batch functions over
  * the bytes (Scala `mapPartitions` — the JVM analogue of a
  * vectorized Pandas-UDF stage).
  *
  * The decode step is STUBBED (no codec libraries in this
  * environment): [[StubCodec]] produces deterministic pseudo-features
  * from the raw bytes. The Spark-side contract — schema, batch
  * iteration, partitioning, spill-free streaming over rows — is real
  * and what matters at 100 TB:
  *
  * - decode runs inside `mapPartitions`, so each task streams its
  *   parquet row-group without materializing the partition;
  * - binary payloads stay columnar until the decode boundary (no
  *   JSON/string detour);
  * - feature output is a fixed-width `array<double>` + scalar
  *   metadata, so downstream similarity/dedup operators (Similarity,
  *   Dedup) compose directly;
  * - partition sizing: binary rows are large — repartition by
  *   `bytes`-size bucket before decode so task memory is bounded
  *   (`spark.sql.files.maxPartitionBytes` governs the scan side).
  */
object Multimodal {

  /** Deterministic stand-in for a real image/audio decoder. */
  object StubCodec {
    val FeatureDim = 8

    /** "Decode" bytes → (width, height, channel-mean features).
      * Pure function of the payload — reproducible anywhere.
      */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Double]) = {
      val n = bytes.length
      val w = 16 + (if (n == 0) 0 else java.lang.Byte.toUnsignedInt(bytes(0)) % 16)
      val h = 16 + (if (n < 2) 0 else java.lang.Byte.toUnsignedInt(bytes(1)) % 16)
      val feats = Array.tabulate(FeatureDim) { d =>
        var acc = 0L
        var i = d
        while (i < n) { acc += java.lang.Byte.toUnsignedInt(bytes(i)); i += FeatureDim }
        if (n == 0) 0.0 else acc.toDouble / n
      }
      (w, h, feats)
    }

    /** "Resize": rescale the fake feature vector to a target grid. */
    def resize(feats: Array[Double], targetW: Int, targetH: Int): Array[Double] =
      feats.map(f => f * targetW.toDouble / (targetW + targetH))

    /** "Frame-sample": every k-th feature (video → frames analogue). */
    def frameSample(feats: Array[Double], k: Int): Array[Double] =
      feats.zipWithIndex.collect { case (f, i) if i % k == 0 => f }
  }

  val FeatureSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("modality", StringType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** Decode + feature-extract a binary column. Input df must have
    * (`idCol`: long, `bytesCol`: binary); modality is caller-declared
    * metadata (the bytes are opaque).
    */
  def extractFeatures(df: DataFrame, idCol: String, bytesCol: String,
                      modality: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (w, h, feats) = StubCodec.decode(bytes)
        Row(r.getLong(idIdx), modality, bytes.length, w, h, feats.toSeq)
      }
    }(Encoders.row(FeatureSchema))
  }
}
