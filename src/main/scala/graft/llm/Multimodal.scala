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

    /** Channel-mean feature vector of a decoded frame — shared by the
      * single-image path and the GIF container demux.
      */
    def features(img: java.awt.image.BufferedImage): Array[Double] = {
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
      Array(mr, mg, mb, luma, w.toDouble, h.toDouble, n.toDouble, w.toDouble / h)
    }

    /** Decode bytes → (width, height, features); None when imageio
      * cannot parse them (caller falls back to the stub).
      */
    def decode(bytes: Array[Byte]): Option[(Int, Int, Array[Double])] = {
      try {
        javax.imageio.ImageIO.setUseCache(false) // memory-only, no /tmp files
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None
        else Some((img.getWidth, img.getHeight, features(img)))
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

  /** Minimal RIFF/WAVE parser — REAL audio decoding with zero
    * dependencies (PCM16 is just little-endian shorts; only exotic
    * codecs need a library). Multi-channel audio is averaged to mono.
    */
  object WavCodec {
    def looksLikeWav(b: Array[Byte]): Boolean =
      b.length > 44 &&
        b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
        b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

    private def le16(b: Array[Byte], i: Int): Int =
      (java.lang.Byte.toUnsignedInt(b(i + 1)) << 8) | java.lang.Byte.toUnsignedInt(b(i))
    private def le32(b: Array[Byte], i: Int): Int =
      (le16(b, i + 2) << 16) | le16(b, i)

    /** Walk the chunk list; decode PCM16 to mono [-1, 1] doubles.
      * Untrusted corpus bytes reach this path, so the walk is hardened:
      * chunk sizes are read as UNSIGNED 32-bit (a high-bit size must
      * not turn into a negative Int that stalls or reverses `pos`),
      * the data length is clamped to what the buffer actually holds,
      * and the walk terminates unless the cursor strictly advances.
      * @return (sampleRate, nChannels, monoSamples); None unless
      *         format is PCM (1) at 16 bits.
      */
    def decode(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
      if (!looksLikeWav(b)) return None
      var pos = 12
      var rate = 0; var channels = 0; var bits = 0; var fmtOk = false
      var data: Option[(Int, Int)] = None // (offset, len)
      while (pos >= 0 && pos + 8 <= b.length) {
        val id = new String(b, pos, 4, "US-ASCII")
        val sz = le32(b, pos + 4).toLong & 0xFFFFFFFFL // unsigned
        if (id == "fmt " && pos + 24 <= b.length) {
          fmtOk = le16(b, pos + 8) == 1 // PCM
          channels = le16(b, pos + 10)
          rate = le32(b, pos + 12)
          bits = le16(b, pos + 22)
        } else if (id == "data") {
          data = Some((pos + 8, math.min(sz, (b.length - pos - 8).toLong).toInt))
        }
        val next = pos.toLong + 8L + sz + (sz & 1L) // chunks are word-aligned
        pos = if (next > pos && next <= Int.MaxValue) next.toInt else -1
      }
      for ((off, len) <- data if fmtOk && bits == 16 && channels >= 1) yield {
        val nFrames = len / (2 * channels)
        val mono = new Array[Double](nFrames)
        var f = 0
        while (f < nFrames) {
          var s = 0.0
          var c = 0
          while (c < channels) {
            s += le16(b, off + 2 * (f * channels + c)).toShort / 32768.0
            c += 1
          }
          mono(f) = s / channels
          f += 1
        }
        (rate, channels, mono)
      }
    }
  }

  /** WAV decode with the headerless-PCM16 fallback [[audioWindows]]
    * documents (sample_rate = 16000 & n_channels = 1 defaults).
    */
  private def decodeOrRawPcm(bytes: Array[Byte]): (Int, Int, Array[Double]) =
    WavCodec.decode(bytes).getOrElse {
      val n = bytes.length / 2
      val m = new Array[Double](n)
      var i = 0
      while (i < n) {
        m(i) = (((java.lang.Byte.toUnsignedInt(bytes(2 * i + 1)) << 8) |
          java.lang.Byte.toUnsignedInt(bytes(2 * i))).toShort) / 32768.0
        i += 1
      }
      (16000, 1, m)
    }

  val AudioWindowSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("window_idx", IntegerType),
    StructField("start_sample", IntegerType),
    StructField("rms", DoubleType),
    StructField("peak", DoubleType)))

  /** Audio feature windows over a binary column: WAV payloads decode
    * for REAL ([[WavCodec]] — PCM16 needs no codec library); anything
    * else is interpreted as headerless 16 kHz mono PCM16 (the
    * deterministic fallback, flagged by sample_rate = 16000 &
    * n_channels = 1 defaults). Each payload explodes partition-locally
    * into hop-strided RMS/peak windows — the mapPartitions `flatMap`
    * shape is the 100 TB contract: row explosion happens inside the
    * task (bounded by one payload at a time), never via a
    * shuffle-backed explode of pre-materialized arrays.
    */
  def audioWindows(df: DataFrame, idCol: String, bytesCol: String,
                   winSamples: Int, hopSamples: Int): DataFrame = {
    require(winSamples > 0 && hopSamples > 0, "window/hop must be positive")
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (rate, channels, mono) = decodeOrRawPcm(bytes)
        val nWin = if (mono.length < winSamples) 0
                   else (mono.length - winSamples) / hopSamples + 1
        (0 until nWin).iterator.map { w =>
          val start = w * hopSamples
          var ss = 0.0
          var pk = 0.0
          var i = start
          while (i < start + winSamples) {
            val s = mono(i)
            ss += s * s
            if (math.abs(s) > pk) pk = math.abs(s)
            i += 1
          }
          Row(r.getLong(idIdx), rate, channels, w, start,
            math.sqrt(ss / winSamples), pk)
        }
      }
    }(Encoders.row(AudioWindowSchema))
  }

  val AudioSpectrumSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("window_idx", IntegerType),
    StructField("start_sample", IntegerType),
    StructField("band_energy", ArrayType(DoubleType)),
    StructField("dominant_band", IntegerType),
    StructField("spectral_centroid_hz", DoubleType)))

  /** Per-window band energy at fixed probe frequencies via the
    * Goertzel recurrence — REAL frequency analysis with zero
    * dependencies (a Goertzel probe is a 2-state IIR filter: `s =
    * x + 2cos(ω)·s₁ − s₂`, power = `s₁² + s₂² − 2cos(ω)·s₁·s₂`),
    * the speech/music/tone-vs-noise signal for audio curation.
    * Output per window: per-probe energies, the argmax band (ties →
    * lowest), and the energy-weighted centroid over the probe grid
    * (0 Hz for silence).
    *
    * Same 100 TB shape as [[audioWindows]]: the per-payload window
    * explosion happens inside the task via `mapPartitions` flatMap,
    * so memory is bounded by one decoded payload and nothing shuffles
    * unless a downstream aggregate asks it to. k probes cost k
    * multiply-adds per sample — O(k·n) total, no FFT library needed.
    */
  def audioSpectra(df: DataFrame, idCol: String, bytesCol: String,
                   winSamples: Int, hopSamples: Int,
                   probesHz: Seq[Double]): DataFrame = {
    require(winSamples > 0 && hopSamples > 0, "window/hop must be positive")
    require(probesHz.nonEmpty, "need at least one probe frequency")
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    val probes = probesHz.toArray
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val (rate, _, mono) = decodeOrRawPcm(bytes)
        val coeffs = probes.map(f => 2.0 * math.cos(2.0 * math.Pi * f / rate))
        val nWin = if (mono.length < winSamples) 0
                   else (mono.length - winSamples) / hopSamples + 1
        (0 until nWin).iterator.map { w =>
          val start = w * hopSamples
          val energy = new Array[Double](probes.length)
          var p = 0
          while (p < probes.length) {
            val c = coeffs(p)
            var s1 = 0.0; var s2 = 0.0
            var i = start
            while (i < start + winSamples) {
              val s = mono(i) + c * s1 - s2
              s2 = s1; s1 = s
              i += 1
            }
            // normalize by window length so energies compare across sizes
            energy(p) = (s1 * s1 + s2 * s2 - c * s1 * s2) / winSamples
            p += 1
          }
          var dom = 0
          var tot = 0.0
          var cen = 0.0
          var j = 0
          while (j < energy.length) {
            if (energy(j) > energy(dom)) dom = j
            tot += energy(j)
            cen += energy(j) * probes(j)
            j += 1
          }
          Row(r.getLong(idIdx), rate, w, start,
            energy.toSeq, dom, if (tot > 0) cen / tot else 0.0)
        }
      }
    }(Encoders.row(AudioSpectrumSchema))
  }

  val FrameSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("byte_offset", IntegerType),
    StructField("n_bytes", IntegerType),
    StructField("features", ArrayType(DoubleType))))

  /** REAL container demux for the one animated format the JDK ships a
    * multi-frame reader for: GIF (`ImageReader.getNumImages(true)` /
    * `read(i)` — javax.imageio, zero dependencies). mp4/mkv still need
    * an external demuxer and keep the fixed-slice stub path.
    */
  object GifDemux {
    def looksLikeGif(b: Array[Byte]): Boolean =
      b.length >= 3 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F'

    /** Demux and decode every `stride`-th frame.
      * @return (frameIdx, width, height, features) per sampled frame;
      *         None when the payload is not GIF or the reader fails
      *         (caller falls back to the stub demux).
      */
    def sampleFrames(bytes: Array[Byte],
                     stride: Int): Option[Seq[(Int, Int, Int, Array[Double])]] = {
      if (!looksLikeGif(bytes)) return None
      val readers = javax.imageio.ImageIO.getImageReadersByFormatName("gif")
      if (!readers.hasNext) return None
      val reader = readers.next()
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        reader.setInput(iis, false, true) // allowSearch needs seekForwardOnly=false
        val n = reader.getNumImages(true)
        if (n <= 0) None
        else Some((0 until n).filter(_ % stride == 0).map { i =>
          val img = reader.read(i)
          (i, img.getWidth, img.getHeight, ImageIoCodec.features(img))
        })
      } catch { case _: Exception => None }
      finally {
        reader.dispose()
        iis.close()
      }
    }
  }

  /** REAL MP4 container demux with zero codec work: the `stbl` sample
    * table inside `moov/trak/mdia/minf` declares every sample's exact
    * byte range in the file — `stsz` (per-sample sizes), `stco`/`co64`
    * (chunk start offsets), `stsc` (samples-per-chunk runs; samples
    * are laid out back-to-back inside a chunk). Walking those three
    * tables yields real frame SLICES without touching a codec, which
    * is precisely the demux/decode split: demux is container
    * arithmetic (JDK-only, done here), decode needs libavcodec-class
    * software this environment lacks (the sampled slices go through
    * the usual decode chain, i.e. [[StubCodec]] for compressed video
    * samples). ISO/IEC 14496-12 box layout; every read is
    * bounds-checked and any malformation returns None (caller falls
    * back to the fixed-slice stub path), same hardening contract as
    * the RIFF/WAV parser above.
    */
  object Mp4Demux {
    def looksLikeMp4(b: Array[Byte]): Boolean =
      b.length >= 12 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    private def be64(b: Array[Byte], o: Int): Long =
      (be32(b, o) << 32) | be32(b, o + 4)

    /** Child boxes of [start, end): (type, payloadStart, payloadEnd). */
    private def children(b: Array[Byte], start: Int, end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var p = start
      var ok = true
      while (ok && p + 8 <= end) {
        val size32 = be32(b, p)
        val typ = new String(b, p + 4, 4, "ISO-8859-1")
        val (boxSize, hdr) =
          if (size32 == 1L && p + 16 <= end) (be64(b, p + 8), 16)
          else if (size32 == 0L) ((end - p).toLong, 8) // extends to end
          else (size32, 8)
        if (boxSize < hdr || p + boxSize > end) ok = false // malformed: stop
        else {
          out += ((typ, p + hdr, p + boxSize.toInt))
          p += boxSize.toInt
        }
      }
      out.result()
    }

    private def child(b: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] =
      children(b, start, end).collectFirst { case (`typ`, s, e) => (s, e) }

    /** Exact (byteOffset, nBytes) of every sample of the FIRST video
      * track, in sample order; None unless the payload is a
      * well-formed MP4 whose sample table is internally consistent
      * and entirely inside the buffer.
      */
    def sampleRanges(bytes: Array[Byte]): Option[Seq[(Long, Int)]] = {
      if (!looksLikeMp4(bytes)) return None
      try {
        val (moovS, moovE) = child(bytes, 0, bytes.length, "moov").getOrElse(return None)
        val stblOpt = children(bytes, moovS, moovE)
          .collect { case ("trak", ts, te) => (ts, te) }
          .flatMap { case (ts, te) =>
            for {
              (mdS, mdE) <- child(bytes, ts, te, "mdia")
              (hS, _) <- child(bytes, mdS, mdE, "hdlr")
              // handler_type at payload offset 8: pre_defined(4) comes
              // first in the hdlr payload after version/flags
              if hS + 12 <= bytes.length &&
                new String(bytes, hS + 8, 4, "ISO-8859-1") == "vide"
              (mnS, mnE) <- child(bytes, mdS, mdE, "minf")
              stbl <- child(bytes, mnS, mnE, "stbl")
            } yield stbl
          }.headOption
        val (sS, sE) = stblOpt.getOrElse(return None)

        // stsz: ver/flags, uniform sample_size, count [, sizes...]
        val (szS, szE) = child(bytes, sS, sE, "stsz").getOrElse(return None)
        if (szS + 12 > szE) return None
        val uniform = be32(bytes, szS + 4)
        val nSamples = be32(bytes, szS + 8).toInt
        if (nSamples <= 0 || nSamples > (1 << 24)) return None
        val sizes: Array[Int] =
          if (uniform != 0L) Array.fill(nSamples)(uniform.toInt)
          else {
            if (szS + 12 + 4L * nSamples > szE) return None
            Array.tabulate(nSamples)(i => be32(bytes, szS + 12 + 4 * i).toInt)
          }

        // stco/co64: chunk start offsets
        val (offs: Array[Long]) = child(bytes, sS, sE, "stco") match {
          case Some((cS, cE)) =>
            val n = be32(bytes, cS + 4).toInt
            if (n <= 0 || cS + 8 + 4L * n > cE) return None
            Array.tabulate(n)(i => be32(bytes, cS + 8 + 4 * i))
          case None =>
            val (cS, cE) = child(bytes, sS, sE, "co64").getOrElse(return None)
            val n = be32(bytes, cS + 4).toInt
            if (n <= 0 || cS + 8 + 8L * n > cE) return None
            Array.tabulate(n)(i => be64(bytes, cS + 8 + 8 * i))
        }

        // stsc: (first_chunk, samples_per_chunk) run-length table
        val (scS, scE) = child(bytes, sS, sE, "stsc").getOrElse(return None)
        val nRuns = be32(bytes, scS + 4).toInt
        if (nRuns <= 0 || scS + 8 + 12L * nRuns > scE) return None
        val runs = Array.tabulate(nRuns)(i =>
          (be32(bytes, scS + 8 + 12 * i).toInt, be32(bytes, scS + 12 + 12 * i).toInt))
        if (runs(0)._1 != 1 || runs.exists(_._2 <= 0)) return None

        // walk chunks in order; each run applies from its first_chunk
        // until the next run's; samples are contiguous within a chunk
        val out = Vector.newBuilder[(Long, Int)]
        var sample = 0
        var run = 0
        var chunk = 1
        while (sample < nSamples && chunk <= offs.length) {
          while (run + 1 < nRuns && runs(run + 1)._1 <= chunk) run += 1
          var off = offs(chunk - 1)
          var k = 0
          while (k < runs(run)._2 && sample < nSamples) {
            val sz = sizes(sample)
            if (sz < 0 || off < 0 || off + sz > bytes.length) return None
            out += ((off, sz))
            off += sz
            sample += 1
            k += 1
          }
          chunk += 1
        }
        if (sample < nSamples) None else Some(out.result())
      } catch { case _: Exception => None }
    }
  }

  /** Video frame sampling: every `stride`-th frame, feature-extracted.
    * GIF payloads demux for REAL ([[GifDemux]] — true per-frame decode
    * through the JDK's multi-frame reader; `byte_offset` is -1 because
    * codec-delimited frames have no fixed byte range, and `n_bytes` is
    * the decoded frame's pixel count). MP4 payloads demux for REAL
    * too ([[Mp4Demux]] — the stbl sample table gives every sample's
    * exact byte range; `byte_offset`/`n_bytes` are the true file
    * ranges, and only the codec decode of each compressed sample goes
    * through [[StubCodec]]). Remaining containers (mkv/webm — EBML,
    * no JDK parser) take the STUB path: fixed `frameBytes` slices,
    * each through the usual decode chain (image-magic slices decode
    * for real, others [[StubCodec]]). The Spark contract is identical
    * for all three: partition-local 1→N explosion with one frame
    * materialized at a time, fixed output schema, frames composing
    * with imageHashes/Similarity downstream.
    */
  def sampleFrames(df: DataFrame, idCol: String, bytesCol: String,
                   frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes/stride must be positive")
    val idIdx = df.schema.fieldIndex(idCol)
    val bIdx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](bIdx)
        val id = r.getLong(idIdx)
        GifDemux.sampleFrames(bytes, stride) match {
          case Some(frames) =>
            frames.iterator.map { case (f, w, h, feats) =>
              Row(id, f, -1, w * h, feats.toSeq)
            }
          case None => Mp4Demux.sampleRanges(bytes) match {
          case Some(ranges) =>
            ranges.iterator.zipWithIndex
              .filter { case (_, f) => f % stride == 0 }
              .map { case ((off, sz), f) =>
                val frame = java.util.Arrays.copyOfRange(bytes, off.toInt,
                  off.toInt + sz)
                val (_, _, feats) =
                  (if (ImageIoCodec.looksLikeImage(frame)) ImageIoCodec.decode(frame) else None)
                    .getOrElse(StubCodec.decode(frame))
                Row(id, f, off.toInt, sz, feats.toSeq)
              }
          case None =>
            val nFrames = (bytes.length + frameBytes - 1) / frameBytes
            (0 until nFrames).iterator
              .filter(_ % stride == 0)
              .map { f =>
                val off = f * frameBytes
                val frame = java.util.Arrays.copyOfRange(bytes, off,
                  math.min(off + frameBytes, bytes.length))
                val (_, _, feats) =
                  (if (ImageIoCodec.looksLikeImage(frame)) ImageIoCodec.decode(frame) else None)
                    .getOrElse(StubCodec.decode(frame))
                Row(id, f, off, frame.length, feats.toSeq)
              }
          }
        }
      }
    }(Encoders.row(FrameSchema))
  }
}
