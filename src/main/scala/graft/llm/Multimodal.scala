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
  * Decoding: payloads with a recognized image magic (PNG/BMP/GIF/JPEG)
  * are decoded for real with JDK-only [[ImageIoCodec]]
  * (`javax.imageio` — true width/height/channel means); everything
  * else falls back to [[StubCodec]], a deterministic stand-in for the
  * audio/video codecs this environment lacks. The Spark-side contract
  * — schema, batch iteration, partitioning, spill-free streaming over
  * rows — is real and what matters at 100 TB:
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

  /** Real JDK-only image decoding (`javax.imageio`): PNG, BMP, GIF and
    * JPEG readers ship with the JDK — no external codec needed. The
    * 8-dim feature vector is [meanR, meanG, meanB, meanLuma(BT.601),
    * width, height, n_pixels, aspect], channel means normalized to
    * [0, 1].
    */
  object ImageIoCodec {
    val FeatureDim: Int = StubCodec.FeatureDim

    /** Magic-sniff: is this payload one of the JDK-decodable formats? */
    def looksLikeImage(bytes: Array[Byte]): Boolean = {
      def at(i: Int): Int = java.lang.Byte.toUnsignedInt(bytes(i))
      bytes.length >= 4 && (
        (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') || // PNG
        (at(0) == 'B' && at(1) == 'M') ||                                  // BMP
        (at(0) == 'G' && at(1) == 'I' && at(2) == 'F') ||                  // GIF
        (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF))                 // JPEG
    }

    /** Decode bytes → (width, height, features); None when imageio
      * cannot parse them (caller falls back to the stub).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
      try {
        javax.imageio.ImageIO.setUseCache(false) // memory-only, no /tmp files
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF
              sg += (rgb >> 8) & 0xFF
              sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val n = w.toLong * h
          val mr = sr.toDouble / (255.0 * n)
          val mg = sg.toDouble / (255.0 * n)
          val mb = sb.toDouble / (255.0 * n)
          val luma = 0.299 * mr + 0.587 * mg + 0.114 * mb
          Some((w, h, Array(mr, mg, mb, luma,
            w.toDouble, h.toDouble, n.toDouble, w.toDouble / h)))
        }
      } catch { case _: Exception => None }
    }
  }

  /** Real resize: average BT.601 luma per cell of a `gw`×`gh` grid
    * (box filter over the pixel blocks `[x·w/gw, (x+1)·w/gw)` — the
    * classic thumbnail used by perceptual hashing). Deterministic
    * integer pixel partitioning, no resampling library needed.
    */
  def lumaGrid(img: java.awt.image.BufferedImage, gw: Int, gh: Int): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](gw * gh)
    var cy = 0
    while (cy < gh) {
      val y0 = cy * h / gh
      val y1 = math.max((cy + 1) * h / gh, y0 + 1)
      var cx = 0
      while (cx < gw) {
        val x0 = cx * w / gw
        val x1 = math.max((cx + 1) * w / gw, x0 + 1)
        var s = 0.0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            s += 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)
            x += 1
          }
          y += 1
        }
        val px = (math.min(x1, w) - x0).toLong * (math.min(y1, h) - y0)
        out(cy * gw + cx) = if (px == 0) 0.0 else s / (255.0 * px)
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Average hash (aHash, public perceptual-hash family): bit i set
    * iff grid cell i is brighter than the grid mean. Near-duplicate
    * images differ in few bits — compose with the SimHash banding
    * machinery (Dedup) for bucketed image dedup at scale.
    */
  def averageHash(grid: Array[Double]): Long = {
    require(grid.length == 64, s"aHash needs an 8x8 grid, got ${grid.length}")
    val mean = grid.sum / grid.length
    var h = 0L
    var i = 0
    while (i < 64) {
      if (grid(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  val HashSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("ahash", LongType),
    StructField("luma_grid", ArrayType(DoubleType))))

  /** Perceptual image hashing over a binary column: real decode
    * (`javax.imageio`) → 8×8 luma thumbnail → aHash. Non-image or
    * unparseable payloads yield a null hash (callers filter or route
    * them to the stub pipeline). Same mapPartitions streaming
    * contract as [[extractFeatures]].
    */
  def imageHashes(df: DataFrame, idCol: String, bytesCol: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val decoded =
          if (ImageIoCodec.looksLikeImage(bytes))
            try {
              javax.imageio.ImageIO.setUseCache(false)
              Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
            } catch { case _: Exception => None }
          else None
        decoded match {
          case Some(img) =>
            val grid = lumaGrid(img, 8, 8)
            Row(r.getLong(idIdx), img.getWidth, img.getHeight,
              averageHash(grid), grid.toSeq)
          case None =>
            Row(r.getLong(idIdx), null, null, null, null)
        }
      }
    }(Encoders.row(HashSchema))
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
    * metadata. Recognized image payloads decode for real through
    * [[ImageIoCodec]]; anything else (or an unparseable image) takes
    * the deterministic [[StubCodec]] path.
    */
  def extractFeatures(df: DataFrame, idCol: String, bytesCol: String,
                      modality: String): DataFrame = {
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (w, h, feats) =
          (if (ImageIoCodec.looksLikeImage(bytes)) ImageIoCodec.decode(bytes) else None)
            .getOrElse(StubCodec.decode(bytes))
        Row(r.getLong(idIdx), modality, bytes.length, w, h, feats.toSeq)
      }
    }(Encoders.row(FeatureSchema))
  }
}
