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
}
