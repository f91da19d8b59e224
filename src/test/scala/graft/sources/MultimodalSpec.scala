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

  test("multimodal ANN query returns k nearest decoded features") {
    val topk = graft.queries.DataQueries.q99MultimodalAnn.fn(spark, sf0001).collect()
    assert(topk.length === 10)
    val scores = topk.map(_.getDouble(1))
    assert(scores.sameElements(scores.sorted.reverse), "descending cosine order")
    assert(!topk.map(_.getLong(0)).contains(0L), "query item excluded")
  }
}
