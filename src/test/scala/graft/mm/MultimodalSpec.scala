package graft.mm

import graft.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.get("local[4]")

  test("batched featurizer: schema, determinism, batch independence") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs)
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)

    assert(feats.length === docs.count())
    val f0 = feats.head
    assert(f0.byte_len > 0 && f0.width >= 1 && f0.width <= 64)
    assert(f0.feature.length === Multimodal.FeatureDim)
    assert(f0.n_frames === (f0.byte_len + 255) / 256)

    // determinism: re-running yields identical features
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(feats.map(_.feature.toSeq).toSeq === again.map(_.feature.toSeq).toSeq)

    // batch shape must not affect results: single-partition run == local run
    val one = Multimodal.extractFeatures(media.repartition(1)).collect().sortBy(_.media_id)
    assert(one.map(_.mean_byte).toSeq === feats.map(_.mean_byte).toSeq)
  }

  test("frame sampling and resize keep the binary schema contract") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.mediaFromDocuments(spark, docs).toDF()

    val sampled = Multimodal.frameSample(media, frameBytes = 256, stride = 4)
    val r = sampled.select(col("media_id"), col("frames"), length(col("payload"))).head()
    val frames = r.getSeq[Array[Byte]](1)
    val totalFrames = math.ceil(r.getInt(2) / 256.0).toInt
    assert(frames.size === (0 until totalFrames).count(_ % 4 == 0))
    assert(frames.head.length <= 256)

  }
}
