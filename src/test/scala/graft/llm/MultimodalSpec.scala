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
}
