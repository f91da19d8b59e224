package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column handling for training-data pipelines: image /
  * audio / video payloads travel as opaque `binary` columns alongside
  * typed metadata, and per-item decode / feature-extraction runs as a
  * partition-parallel typed transformation (the Scala analogue of
  * mapInPandas batches).
  *
  * The Spark-side plumbing — schema, partition sizing, batch shape,
  * null/corrupt handling — is real and tested. The actual codec call
  * is STUBBED behind [[MediaCodec]] (this environment ships no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions/features from the payload bytes. Swapping in a real
  * codec touches ONLY [[MediaCodec]].
  */
object Multimodal {

  /** One media item: payload + sidecar metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType),        // image | audio | video
    StructField("mime", StringType),
    StructField("payload", BinaryType),     // opaque encoded bytes
    StructField("meta", MapType(StringType, StringType))))

  final case class MediaRow(media_id: Long, kind: String, mime: String,
                            payload: Array[Byte],
                            meta: Map[String, String])

  final case class DecodedMedia(media_id: Long, kind: String,
                                width: Int, height: Int, n_frames: Int,
                                feature: Array[Float])

  /** The codec seam. Replace the stub bodies with real decoders
    * (javax.imageio / ffmpeg bindings / etc.) when available. */
  object MediaCodec {
    /** STUB: deterministic fake decode — dimensions and a 8-dim
      * feature vector derived from payload bytes. Real impl would
      * parse the container header and decode pixels/samples. */
    def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val h = java.util.Arrays.hashCode(payload)
      val width = 64 + math.abs(h % 1024)
      val height = 64 + math.abs((h / 1024) % 1024)
      val frames = 1 + math.abs(h % 7)
      val feature = Array.tabulate(8)(i =>
        ((h >> (i * 4)) & 0xF).toFloat / 15f)
      (width, height, frames, feature)
    }

    /** STUB batch decode: one call per batch (where a real codec
      * amortizes setup); per-item results identical to [[decodeStub]].
      * Corrupt (null) payloads are dropped, not thrown. */
    def decodeBatchStub(batch: Array[MediaRow]): Array[DecodedMedia] =
      batch.flatMap { m =>
        Option(m.payload).map { p =>
          val (w, h, f, feat) = decodeStub(p)
          DecodedMedia(m.media_id, m.kind, w, h, f, feat)
        }
      }
  }

  /** Decode/feature-extract as a partition-parallel typed map: one
    * task per partition, items streamed through the codec without
    * materializing the whole partition (same batch shape a real
    * decoder needs). Corrupt payloads (null) are dropped, not thrown,
    * mirroring permissive-mode scan semantics. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        Option(m.payload).map { p =>
          val (w, ht, frames, feat) = MediaCodec.decodeStub(p)
          DecodedMedia(m.media_id, m.kind, w, ht, frames, feat)
        }
      }
    }
  }

  /** Batched decode — the mapInPandas/Arrow batch shape: the codec is
    * called once per `batchSize` items, not per item (real decoders
    * amortize model/codec setup across a batch; a per-item call is
    * the classic 100× slowdown). Same output as [[decode]], proven in
    * the spec. */
  def decodeBatched(media: Dataset[MediaRow], batchSize: Int = 64)
      : Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        MediaCodec.decodeBatchStub(batch.toArray)
      }
    }
  }

  /** Frame sampling plumbing: slice `n` evenly-spaced byte windows
    * from the payload — pure Catalyst `substring` on binary, standing
    * in for keyframe extraction; the array-of-binary shape is what a
    * real frame sampler produces. */
  def frameSample(df: DataFrame, payloadCol: String, n: Int,
                  frameBytes: Int = 16): DataFrame = {
    val payload = col(payloadCol)
    val span = greatest(length(payload) - frameBytes, lit(0))
    df.withColumn("frames",
      transform(sequence(lit(0), lit(n - 1)), i => {
        val offset = (i * span) / lit(math.max(n - 1, 1)) + 1
        call_function("substring", payload, offset, lit(frameBytes))
      }))
  }

  /** Resize is metadata-only at the plumbing level: record the target
    * dims; the pixel work happens inside the codec seam. */
  def withResizeTarget(df: DataFrame, w: Int, h: Int): DataFrame =
    df.withColumn("resize_target", struct(lit(w).as("w"), lit(h).as("h")))

  /** Deterministic synthetic media table for tests/demos (no media
    * libs in this environment): payload bytes derived from the id. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val bytes = Array.tabulate(128)(j => ((i * 131 + j * 7) % 256).toByte)
      MediaRow(i, if (i % 3 == 0) "image" else if (i % 3 == 1) "audio" else "video",
        "application/octet-stream", bytes, Map("src" -> s"synthetic/$i"))
    }
  }
}
