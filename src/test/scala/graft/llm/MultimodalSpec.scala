package graft.llm

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class MultimodalSpec extends SparkSpec {

  test("binary decode stub: deterministic features, schema contract") {
    val docs = Tables.documents(spark, sf()).limit(50)
      .select(col("doc_id"), col("text").cast("binary").as("bytes"))
    val out = Multimodal.extractFeatures(docs, "doc_id", "bytes", "image")
    assert(out.schema === Multimodal.FeatureSchema)
    val rows = out.orderBy("id").collect()
    assert(rows.length === 50)
    assert(rows.forall(_.getAs[String]("modality") === "image"))
    assert(rows.forall(r => r.getAs[Seq[Double]]("features").length === Multimodal.StubCodec.FeatureDim))
    assert(rows.forall { r =>
      val w = r.getAs[Int]("width"); w >= 16 && w < 32
    })
    // deterministic across partitionings
    val again = Multimodal.extractFeatures(docs.repartition(7), "doc_id", "bytes", "image")
      .orderBy("id").collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("stub resize and frame-sample shape") {
    val (_, _, feats) = Multimodal.StubCodec.decode("hello multimodal".getBytes("UTF-8"))
    assert(Multimodal.StubCodec.resize(feats, 8, 8).length === feats.length)
    assert(Multimodal.StubCodec.frameSample(feats, 2).length === (feats.length + 1) / 2)
  }

  /** A w×h PNG byte array rendered in memory: left half pure red,
    * right half pure blue.
    */
  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if (x < w / 2) 0xFF0000 else 0x0000FF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("real PNG decode via javax.imageio: true dimensions and channel means") {
    import spark.implicits._
    val bytes = pngBytes(40, 20)
    assert(Multimodal.ImageIoCodec.looksLikeImage(bytes))
    val df = Seq((1L, bytes), (2L, pngBytes(8, 8))).toDF("id", "bytes")
    val rows = Multimodal.extractFeatures(df, "id", "bytes", "image")
      .orderBy("id").collect()
    val r1 = rows(0)
    assert(r1.getAs[Int]("width") === 40 && r1.getAs[Int]("height") === 20)
    val feats = r1.getAs[scala.collection.Seq[Double]]("features")
    assert(math.abs(feats(0) - 0.5) < 1e-9) // half the pixels full red
    assert(feats(1) === 0.0)                // no green anywhere
    assert(math.abs(feats(2) - 0.5) < 1e-9) // half the pixels full blue
    assert(feats(6) === 800.0 && feats(7) === 2.0) // n_pixels, aspect
    assert(rows(1).getAs[Int]("width") === 8)
    // non-image bytes still take the stub path with its width range
    val txt = Multimodal.extractFeatures(
      Seq((3L, "plain text".getBytes("UTF-8"))).toDF("id", "bytes"),
      "id", "bytes", "text").collect()(0)
    assert(txt.getAs[Int]("width") >= 16 && txt.getAs[Int]("width") < 32)
  }

  /** A noisy gradient PNG: deterministic per-pixel pattern, optionally
    * perturbed by a tiny per-pixel offset (near-duplicate generator).
    */
  private def gradientPng(w: Int, h: Int, noise: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / w + y * 255 / h) / 2
      val v = math.min(255, math.max(0, base + ((x * 31 + y * 17) % 7 - 3) * noise))
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("image aHash: near-duplicates within few bits, distinct images far apart") {
    import spark.implicits._
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val df = Seq(
      (1L, gradientPng(64, 64, 0)),      // original
      (2L, gradientPng(64, 64, 2)),      // same image + slight noise
      (3L, pngBytes(64, 64)),            // completely different content
      (4L, "not an image".getBytes("UTF-8"))
    ).toDF("id", "bytes")
    val rows = Multimodal.imageHashes(df, "id", "bytes")
      .orderBy("id").collect()
    val h = rows.take(3).map(_.getAs[Long]("ahash"))
    assert(hamming(h(0), h(1)) <= 6,
      s"near-dup hash distance ${hamming(h(0), h(1))}")
    assert(hamming(h(0), h(2)) > 16,
      s"distinct images too close: ${hamming(h(0), h(2))}")
    // grid: 64 cells, luma in [0,1]; real dimensions carried through
    val grid = rows(0).getAs[scala.collection.Seq[Double]]("luma_grid")
    assert(grid.length === 64 && grid.forall(v => v >= 0.0 && v <= 1.0))
    assert(rows(0).getAs[Int]("width") === 64)
    // non-image payload -> null hash (routed to the stub pipeline)
    assert(rows(3).isNullAt(rows(3).fieldIndex("ahash")))
  }

  test("lumaGrid box filter: uniform halves average to their luma") {
    // left half red (luma .299), right half blue (luma .114)
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xFF0000 else 0x0000FF)
    val g = Multimodal.lumaGrid(img, 8, 8)
    (0 until 8).foreach { cy =>
      (0 until 4).foreach(cx => assert(math.abs(g(cy * 8 + cx) - 0.299) < 1e-9))
      (4 until 8).foreach(cx => assert(math.abs(g(cy * 8 + cx) - 0.114) < 1e-9))
    }
  }

  /** Hand-built PCM16 mono WAV: RIFF header + sine samples. */
  private def wavBytes(rate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(rate).putInt(rate * 2)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    bb.array()
  }

  test("audioWindows: real WAV parse — rate from header, sine RMS = A/sqrt(2)") {
    import spark.implicits._
    val rate = 8000
    val amp = 0.5
    // whole number of cycles per 400-sample window -> exact RMS
    val samples = Array.tabulate[Short](1200) { i =>
      (amp * 32767 * math.sin(2 * math.Pi * 100 * i / rate)).toShort
    }
    val df = Seq((7L, wavBytes(rate, samples))).toDF("id", "payload")
    val out = Multimodal.audioWindows(df, "id", "payload",
      winSamples = 400, hopSamples = 400).collect()
    assert(out.length === 3) // 1200 / 400 exact tiling
    assert(out.forall(_.getInt(1) === rate))
    out.foreach { r =>
      assert(math.abs(r.getDouble(5) - amp / math.sqrt(2)) < 0.01, s"rms ${r.getDouble(5)}")
      assert(math.abs(r.getDouble(6) - amp) < 0.01)
    }
    // non-WAV payload takes the headerless-PCM fallback (rate 16000)
    val raw = Seq((8L, Array.fill[Byte](1600)(0))).toDF("id", "payload")
    val fb = Multimodal.audioWindows(raw, "id", "payload", 400, 200).collect()
    assert(fb.length === 3 && fb.forall(_.getInt(1) === 16000)) // (800-400)/200+1
    assert(fb.forall(_.getDouble(5) === 0.0))
  }

  test("audioSpectra: Goertzel probe at the sine's frequency dominates by orders of magnitude") {
    import spark.implicits._
    val rate = 8000
    // 1 kHz sine, whole cycles per 400-sample window (50 cycles)
    val samples = Array.tabulate[Short](1200) { i =>
      (0.5 * 32767 * math.sin(2 * math.Pi * 1000 * i / rate)).toShort
    }
    val df = Seq((7L, wavBytes(rate, samples))).toDF("id", "payload")
    val probes = Seq(250.0, 1000.0, 3000.0)
    val out = Multimodal.audioSpectra(df, "id", "payload",
      winSamples = 400, hopSamples = 400, probesHz = probes).collect()
    assert(out.length === 3)
    out.foreach { r =>
      val e = r.getSeq[Double](4)
      assert(r.getInt(5) === 1, s"dominant band should be the 1 kHz probe: $e")
      assert(e(1) > 100 * e(0) && e(1) > 100 * e(2),
        s"on-frequency energy must dominate off-frequency leakage: $e")
      assert(math.abs(r.getDouble(6) - 1000.0) < 50.0, s"centroid ${r.getDouble(6)}")
    }
    // silence → zero energies, centroid pinned to 0
    val quiet = Seq((8L, wavBytes(rate, Array.fill[Short](800)(0)))).toDF("id", "payload")
    val q = Multimodal.audioSpectra(quiet, "id", "payload", 400, 400, probes).collect()
    assert(q.length === 2)
    q.foreach { r =>
      assert(r.getSeq[Double](4).forall(_ === 0.0))
      assert(r.getDouble(6) === 0.0)
    }
  }

  test("WavCodec: corrupt chunk sizes terminate (unsigned walk, no hang/crash)") {
    val good = wavBytes(8000, Array.tabulate[Short](400)(i => (i * 37).toShort))
    // data chunk size with the high bit set: signed le32 = -8 made the old
    // walk increment by 0 (infinite loop); unsigned it clamps to the buffer.
    val hiBit = good.clone()
    val dataSzOff = 40 // RIFF(12) + fmt(8+16) + "data"(4)
    hiBit(dataSzOff) = 0xF8.toByte; hiBit(dataSzOff + 1) = 0xFF.toByte
    hiBit(dataSzOff + 2) = 0xFF.toByte; hiBit(dataSzOff + 3) = 0xFF.toByte
    val decoded = Multimodal.WavCodec.decode(hiBit)
    assert(decoded.nonEmpty && decoded.get._3.length === 400) // clamped to real payload
    // junk chunk with size -9 between fmt and data: old walk went backwards
    // (ArrayIndexOutOfBounds); new walk stops without finding data -> None.
    val junk = java.nio.ByteBuffer.allocate(good.length + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    junk.put(good, 0, 36) // RIFF header + fmt chunk
      .put("junk".getBytes("US-ASCII")).putInt(-9)
      .put(good, 36, good.length - 36)
    assert(Multimodal.WavCodec.decode(junk.array()).isEmpty)
    // truncated payload clamps to the bytes present (9 -> 4 frames), never throws
    val trunc = Multimodal.WavCodec.decode(good.take(45) ++ Array.fill[Byte](8)(0x7F))
    assert(trunc.nonEmpty && trunc.get._3.length === 4)
  }

  /** Multi-frame GIF via the JDK's sequence writer: frame i is a solid
    * gray of level `levels(i)`.
    */
  private def gifBytes(w: Int, h: Int, levels: Seq[Int]): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      levels.foreach { v =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, (v << 16) | (v << 8) | v)
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      }
      writer.endWriteSequence()
    } finally {
      writer.dispose()
      ios.close()
    }
    bos.toByteArray
  }

  test("sampleFrames: REAL multi-frame GIF demux, stride over true frames") {
    import spark.implicits._
    val levels = Seq(0, 30, 60, 90, 120, 150, 180, 210, 240, 255)
    val gif = gifBytes(12, 8, levels)
    assert(Multimodal.GifDemux.looksLikeGif(gif))
    val df = Seq((5L, gif)).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "id", "payload",
      frameBytes = 1000, stride = 3).orderBy("frame_idx").collect()
    // 10 real frames, stride 3 -> frames 0, 3, 6, 9 (NOT byte slices)
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 3, 6, 9))
    assert(out.forall(_.getInt(2) === -1)) // codec-delimited: no byte offset
    assert(out.forall(_.getInt(3) === 96)) // decoded 12x8 pixel count
    out.zip(Seq(0, 90, 180, 255)).foreach { case (r, v) =>
      val feats = r.getSeq[Double](4)
      assert(math.abs(feats(0) - v / 255.0) < 1e-9, s"frame meanR ${feats(0)} vs $v")
      assert(feats(4) === 12.0 && feats(5) === 8.0) // true frame dimensions
    }
    // a single-frame GIF still demuxes (1 frame at idx 0)
    val one = Multimodal.sampleFrames(
      Seq((6L, gifBytes(4, 4, Seq(128)))).toDF("id", "payload"),
      "id", "payload", 1000, 2).collect()
    assert(one.length === 1 && one(0).getInt(1) === 0)
  }

  // --- minimal MP4 builder: ftyp + mdat (2 non-contiguous chunks) +
  // moov/trak/mdia/(hdlr,minf/stbl/(stsz,stsc,stco)); a 'soun' track
  // precedes the video track to prove handler selection
  private def u32(v: Long): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def mp4box(t: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    u32(8L + body.length) ++ t.getBytes("ISO-8859-1") ++ body
  }

  private def mp4Bytes(sizes: Seq[Int], spc: Seq[(Int, Int)],
                       gap: Int): (Array[Byte], Seq[(Long, Int)]) = {
    val ftyp = mp4box("ftyp", "isom".getBytes, u32(0), "isom".getBytes)
    // chunk partition of the samples per the stsc runs
    val perChunk = {
      var rem = sizes
      val out = Seq.newBuilder[Seq[Int]]
      var chunk = 1
      while (rem.nonEmpty) {
        val n = spc.takeWhile(_._1 <= chunk).last._2
        out += rem.take(n); rem = rem.drop(n); chunk += 1
      }
      out.result()
    }
    val mdatStart = ftyp.length
    var off = mdatStart + 8L
    val chunkOffsets = Seq.newBuilder[Long]
    val ranges = Seq.newBuilder[(Long, Int)]
    val data = Array.newBuilder[Byte]
    perChunk.zipWithIndex.foreach { case (ch, i) =>
      if (i > 0) { data ++= Array.fill(gap)(0x5a.toByte); off += gap }
      chunkOffsets += off
      ch.foreach { sz =>
        ranges += ((off, sz))
        data ++= Array.tabulate(sz)(j => ((off + j) % 251).toByte)
        off += sz
      }
    }
    val mdat = mp4box("mdat", data.result())
    def hdlr(kind: String) =
      mp4box("hdlr", u32(0), u32(0), kind.getBytes, u32(0), u32(0), u32(0))
    val stsz = mp4box("stsz", u32(0), u32(0), u32(sizes.length),
      sizes.map(s => u32(s)).flatten.toArray)
    val stsc = mp4box("stsc", u32(0), u32(spc.length),
      spc.map { case (fc, n) => u32(fc) ++ u32(n) ++ u32(1) }.flatten.toArray)
    val stco = mp4box("stco", u32(0), u32(perChunk.length),
      chunkOffsets.result().map(u32).flatten.toArray)
    def trak(kind: String) = mp4box("trak",
      mp4box("mdia", hdlr(kind),
        mp4box("minf", mp4box("stbl", stsz, stsc, stco))))
    val moov = mp4box("moov", trak("soun"), trak("vide"))
    (ftyp ++ mdat ++ moov, ranges.result())
  }

  test("Mp4Demux: stbl sample table gives exact byte ranges across chunks") {
    val sizes = Seq(3, 4, 5, 6, 7)
    val (mp4, expected) = mp4Bytes(sizes, Seq((1, 2), (2, 3)), gap = 5)
    assert(Multimodal.Mp4Demux.looksLikeMp4(mp4))
    val got = Multimodal.Mp4Demux.sampleRanges(mp4)
    assert(got === Some(expected))
    // the demuxed slices are the bytes we wrote, not fixed slices:
    // chunk 2 starts after a 5-byte gap the fixed-slice path would eat
    expected.foreach { case (off, sz) =>
      val slice = mp4.slice(off.toInt, off.toInt + sz)
      assert(slice.toSeq === Array.tabulate(sz)(j => ((off + j) % 251).toByte).toSeq)
    }
  }

  test("Mp4Demux: malformed tables reject, sampleFrames falls back to fixed slices") {
    val (mp4, _) = mp4Bytes(Seq(3, 4, 5), Seq((1, 3)), gap = 0)
    // truncate inside moov -> parse must return None, not throw
    assert(Multimodal.Mp4Demux.sampleRanges(mp4.dropRight(12)) === None)
    // sample range past EOF -> reject; the corrupted stco must be the
    // VIDEO trak's (the last one — the decoy soun trak embeds an
    // identical stbl first), and the first chunk offset sits at +16
    // from the box start (8 header + 4 ver/flags + 4 entry_count)
    val oob = mp4.clone()
    val stcoAt = mp4.lastIndexOfSlice("stco".getBytes) - 4 + 16
    System.arraycopy(u32(mp4.length.toLong + 100), 0, oob, stcoAt, 4)
    assert(Multimodal.Mp4Demux.sampleRanges(oob) === None)
    // non-MP4 payloads never match
    assert(Multimodal.Mp4Demux.sampleRanges("RIFFxxxxWAVE".getBytes) === None)
  }

  test("sampleFrames: REAL MP4 stbl demux, stride over true samples") {
    import spark.implicits._
    val sizes = Seq(3, 4, 5, 6, 7)
    val (mp4, expected) = mp4Bytes(sizes, Seq((1, 2), (2, 3)), gap = 5)
    val df = Seq((9L, mp4)).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "id", "payload",
      frameBytes = 1000, stride = 2).orderBy("frame_idx").collect()
    // 5 real samples, stride 2 -> samples 0, 2, 4 with TRUE byte ranges
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 2, 4))
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 2, 4).map(expected(_)._1.toInt))
    assert(out.map(_.getInt(3)).toSeq === Seq(0, 2, 4).map(expected(_)._2))
    // features come from the exact sample slice through the stub codec
    out.zip(Seq(0, 2, 4)).foreach { case (r, i) =>
      val (off, sz) = expected(i)
      val want = Multimodal.StubCodec.decode(mp4.slice(off.toInt, off.toInt + sz))._3
      assert(r.getSeq[Double](4).toArray.toSeq === want.toSeq)
    }
  }

  test("sampleFrames: stride sampling over fixed-size frames, offsets correct") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](10000)(i => (i % 251).toByte)
    val df = Seq((3L, payload)).toDF("id", "payload")
    val out = Multimodal.sampleFrames(df, "id", "payload",
      frameBytes = 1000, stride = 3).collect()
    assert(out.map(_.getInt(1)).toSeq === Seq(0, 3, 6, 9))
    assert(out.map(_.getInt(2)).toSeq === Seq(0, 3000, 6000, 9000))
    assert(out.forall(_.getInt(3) === 1000))
    // deterministic stub features per frame
    val again = Multimodal.sampleFrames(df, "id", "payload", 1000, 3).collect()
    assert(out.map(_.getSeq[Double](4)).toSeq === again.map(_.getSeq[Double](4)).toSeq)
  }
}
