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
  * null/corrupt handling — is real and tested. The codec seam
  * ([[MediaCodec]]) is real for IMAGES (round 8: pure-JDK
  * `javax.imageio`, PNG/BMP/GIF/JPEG) and AUDIO (round 9: pure-JDK
  * `javax.sound.sampled`, WAV/AIFF/AU — true sample rate, channels,
  * frame count, and a deterministic 8-bin amplitude-histogram
  * feature); a corrupt payload of either kind is DROPPED
  * (permissive-scan semantics), never faked. Video remains stubbed
  * (`decodeStub` — the JDK ships no video codec): deterministic fake
  * dimensions/features from the payload bytes. Swapping in a real
  * video codec still touches ONLY [[MediaCodec]].
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

    /** REAL image decode — pure-JDK `javax.imageio` (PNG, BMP, GIF,
      * JPEG readers ship with the JRE): true raster dimensions,
      * n_frames = 1, and an 8-bin luminance-histogram feature. The
      * histogram bins integer luma `(299r + 587g + 114b)/1000` by
      * `>> 5` (exact integer arithmetic); the only float op is the
      * final per-bin count/total division — deterministic across
      * JVMs, and PNG being lossless makes the whole decode a pure
      * function of the encoded pixels. Returns None for anything
      * imageio cannot parse (corrupt/truncated/not-an-image). */
    def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
      try {
        Option(javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(payload))).map { img =>
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Long](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xFF) * 299 +
                ((rgb >> 8) & 0xFF) * 587 + (rgb & 0xFF) * 114) / 1000
              hist(math.min(lum >> 5, 7)) += 1
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toFloat
          (w, h, 1, hist.map(c => c / n))
        }
      } catch { case _: Exception => None }

    /** REAL audio decode — pure-JDK `javax.sound.sampled` (WAV, AIFF,
      * AU file readers ship with the JRE): the payload parses through
      * `AudioSystem`, converts to canonical 16-bit signed
      * little-endian PCM (a pure-JDK conversion, so 8-bit and
      * big-endian sources decode too), and yields
      * `(sample_rate, channels, frame_count)` in the (width, height,
      * n_frames) slots plus an 8-bin amplitude-magnitude histogram:
      * `bin = min(|sample| >> 12, 7)` — exact integer arithmetic over
      * the decoded samples, the [[decodeImage]] luminance-histogram
      * discipline for sound. The only float op is the final per-bin
      * count/total division. Returns None for anything the JDK cannot
      * parse (corrupt/truncated/unknown container) and for
      * zero-sample streams — dropped downstream, never faked. */
    def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(payload))
        try {
          val src = in.getFormat
          val target = new javax.sound.sampled.AudioFormat(
            javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
            src.getSampleRate, 16, src.getChannels,
            src.getChannels * 2, src.getSampleRate, false)
          val pcm = javax.sound.sampled.AudioSystem
            .getAudioInputStream(target, in)
          try {
            val bytes = pcm.readAllBytes()
            val nSamples = bytes.length / 2
            if (nSamples == 0) None
            else {
              val hist = new Array[Long](8)
              var i = 0
              while (i < nSamples * 2) {
                // little-endian signed 16-bit
                val s = (bytes(i) & 0xFF) | (bytes(i + 1).toInt << 8)
                hist(math.min(math.abs(s) >> 12, 7)) += 1
                i += 2
              }
              val n = nSamples.toFloat
              Some((src.getSampleRate.toInt, src.getChannels,
                nSamples / src.getChannels, hist.map(c => c / n)))
            }
          } finally pcm.close()
        } finally in.close()
      } catch { case _: Exception => None }

    /** Per-item dispatch: images and audio decode for REAL (corrupt →
      * None, dropped downstream); video goes through the stub. Null
      * payloads are dropped for every kind. */
    def decodeItem(m: MediaRow): Option[DecodedMedia] =
      Option(m.payload).flatMap { p =>
        m.kind match {
          case "image" =>
            decodeImage(p).map { case (w, h, f, feat) =>
              DecodedMedia(m.media_id, m.kind, w, h, f, feat) }
          case "audio" =>
            decodeAudio(p).map { case (w, h, f, feat) =>
              DecodedMedia(m.media_id, m.kind, w, h, f, feat) }
          case _ =>
            val (w, h, f, feat) = decodeStub(p)
            Some(DecodedMedia(m.media_id, m.kind, w, h, f, feat))
        }
      }

    /** Batch decode: one call per batch (where a real codec amortizes
      * setup); per-item results identical to [[decodeItem]]. Corrupt
      * and null payloads are dropped, not thrown. */
    def decodeBatch(batch: Array[MediaRow]): Array[DecodedMedia] =
      batch.flatMap(decodeItem)
  }

  /** Decode/feature-extract as a partition-parallel typed map: one
    * task per partition, items streamed through the codec without
    * materializing the whole partition (same batch shape a real
    * decoder needs). Corrupt payloads (null) are dropped, not thrown,
    * mirroring permissive-mode scan semantics. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap(MediaCodec.decodeItem))
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
        MediaCodec.decodeBatch(batch.toArray)
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

  /** Deterministic 8×8 PNG payload: pixel colors are a pure function
    * of (id, x, y), encoded losslessly — so the DECODED raster (and
    * every feature derived from it) is byte-stable even if the PNG
    * encoder's compression details differ between JREs. */
  def syntheticPng(i: Long, side: Int = 8): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(side, side,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < side) {
      var x = 0
      while (x < side) {
        val v = ((i * 131 + x * 17 + y * 29) % 256).toInt
        img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Deterministic 16-bit PCM mono WAV payload: sample t is a pure
    * integer function of (id, t), the container is raw PCM — so the
    * decoded samples (and every feature derived from them) are
    * byte-stable across JREs, the [[syntheticPng]] discipline for
    * sound. */
  def syntheticWav(i: Long, nSamples: Int = 256,
                   sampleRate: Int = 8000): Array[Byte] = {
    val data = new Array[Byte](nSamples * 2)
    var t = 0
    while (t < nSamples) {
      val s = (((i * 131 + t.toLong * 7919) % 65536L) - 32768L).toShort
      data(2 * t) = (s & 0xFF).toByte
      data(2 * t + 1) = ((s >> 8) & 0xFF).toByte
      t += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(
      javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
      sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(data), fmt, nSamples.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** Deterministic synthetic media table for tests/demos: image rows
    * carry REAL 8×8 PNGs (decoded by the real imageio path), audio
    * rows carry REAL mono WAVs (decoded by the real javax.sound
    * path); video rows carry opaque deterministic bytes (their decode
    * is the documented stub seam). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      if (i % 3 == 0)
        MediaRow(i, "image", "image/png", syntheticPng(i),
          Map("src" -> s"synthetic/$i"))
      else if (i % 3 == 1)
        MediaRow(i, "audio", "audio/wav", syntheticWav(i),
          Map("src" -> s"synthetic/$i"))
      else {
        val bytes = Array.tabulate(128)(j => ((i * 131 + j * 7) % 256).toByte)
        MediaRow(i, "video", "application/octet-stream", bytes,
          Map("src" -> s"synthetic/$i"))
      }
    }
  }
}
