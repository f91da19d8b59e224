package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.syntheticMedia(spark, 30)

  test("synthetic media table has the documented schema shape") {
    val df = media.toDF()
    assert(df.count() === 30)
    assert(df.schema("payload").dataType.typeName === "binary")
    assert(df.select("kind").distinct().count() === 3)
  }

  test("decode is partition-parallel, deterministic, and drops null payloads") {
    val withNull = media.map(m =>
      if (m.media_id == 7) m.copy(payload = null) else m)
    val decoded = Multimodal.decode(withNull)
    assert(decoded.count() === 29)
    val a = Multimodal.decode(media).filter(_.media_id == 3).collect()(0)
    val b = Multimodal.decode(media.repartition(7)).filter(_.media_id == 3)
      .collect()(0)
    assert(a.width === b.width && a.feature.toSeq === b.feature.toSeq)
    assert(a.feature.length === 8)
  }

  test("frameSample slices n binary windows of the requested size") {
    val got = Multimodal.frameSample(media.toDF(), "payload", 4, 16)
      .select($"media_id", $"frames")
      .collect()
    got.foreach { r =>
      val frames = r.getSeq[Array[Byte]](1)
      assert(frames.length === 4)
      assert(frames.forall(_.length === 16))
    }
  }

  test("withResizeTarget attaches target dims without touching payload") {
    val df = Multimodal.withResizeTarget(media.toDF(), 224, 224)
    val r = df.select($"resize_target.w", $"resize_target.h").distinct().collect()
    assert(r.length === 1 && r(0).getInt(0) === 224)
  }

  test("batched decode == streaming decode, including at odd batch boundaries") {
    val m = Multimodal.syntheticMedia(spark, 101) // not a multiple of batchSize
    val streaming = Multimodal.decode(m).collect().map(_.media_id).sorted
    val batched = Multimodal.decodeBatched(m, batchSize = 16)
      .collect().map(_.media_id).sorted
    assert(batched.sameElements(streaming))
    val one = Multimodal.decodeBatched(m, batchSize = 16)
      .filter(_.media_id == 7).collect()(0)
    val oneStreaming = Multimodal.decode(m).filter(_.media_id == 7).collect()(0)
    assert((one.media_id, one.kind, one.width, one.height, one.n_frames) ===
      (oneStreaming.media_id, oneStreaming.kind, oneStreaming.width,
        oneStreaming.height, oneStreaming.n_frames))
    assert(one.feature.sameElements(oneStreaming.feature))
  }

  test("real image decode: known 2x2 PNG yields exact dims and an exact " +
      "luminance histogram") {
    // two black pixels (luma 0 -> bin 0) + two white (luma 255 -> bin 7)
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0x000000); img.setRGB(1, 0, 0xFFFFFF)
    img.setRGB(0, 1, 0x000000); img.setRGB(1, 1, 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val Some((w, h, f, feat)) = Multimodal.MediaCodec.decodeImage(bos.toByteArray)
    assert((w, h, f) === ((2, 2, 1)))
    assert(feat.toSeq === Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f))
  }

  test("corrupt image payloads are DROPPED, audio/video stay stub-decoded") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", "image/png",
        Array[Byte](1, 2, 3, 4), Map.empty),              // not a PNG
      Multimodal.MediaRow(2L, "image", "image/png",
        Multimodal.syntheticPng(2L), Map.empty),          // real PNG
      Multimodal.MediaRow(3L, "audio", "application/octet-stream",
        Array[Byte](9, 9, 9), Map.empty))                 // stub path
    val got = Multimodal.decode(rows.toDS()).collect().sortBy(_.media_id)
    assert(got.map(_.media_id).toSeq === Seq(2L, 3L))
    assert(got(0).width === 8 && got(0).height === 8 && got(0).n_frames === 1)
    // histogram is a probability vector over the decoded raster
    assert(math.abs(got(0).feature.sum - 1f) < 1e-6)
  }

  test("multimodal ANN query returns k nearest decoded features") {
    val topk = graft.queries.DataQueries.q99MultimodalAnn.fn(spark, sf0001).collect()
    assert(topk.length === 10)
    val scores = topk.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "descending cosine order")
    assert(!topk.map(_.getLong(0)).contains(0L), "query item excluded")
  }
}
