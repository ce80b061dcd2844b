package graft.ops

import graft.core.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched per-partition
  * passes (the Scala analog of `mapInPandas` batches).
  *
  * The IMAGE path is real: payloads are PNG bytes decoded with the
  * JDK's `javax.imageio` (no native deps), mirroring the reference's
  * frame decode (pipeline/video_input/inspection_video_input.py:118-138)
  * at the pixel level — width/height/mean-luma come from the decoded
  * raster. Audio/video decode remains STUBBED ([[fakeDecode]], clearly
  * marked — no audio/video codecs ship with the JDK or this container);
  * the dataflow around the stub (schema, batch shape, partitioning,
  * frame sampling) is real and tested either way.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("source", StringType)
    )))
  ))

  final case class Decoded(media_id: Long, kind: String, width: Int, height: Int,
                           nFrames: Int, meanLuma: Double)

  /** Real image decode: PNG/BMP/GIF bytes → (width, height, mean luma).
    * Mean luma sums the first raster band as exact integers before one
    * double division chain (sum / pixels / 255) so the value is
    * reproducible bit-for-bit regardless of pixel visit order.
    */
  def decodeImage(payload: Array[Byte]): Decoded = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { sum += raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    // long pixel count: w*h in Int overflows past ~2^31 pixels (a
    // 47k×47k scan) and would silently divide by a negative count
    Decoded(0L, "image", w, h, 1, sum.toDouble / (w.toLong * h) / 255.0)
  }

  /** STUB container decoder for audio/video ONLY (no audio/video codec
    * in the JDK or this container). The stub parses a synthetic
    * container header — magic "GRAF", then width/height/frame-count
    * ints and a mean-luma byte — instead of decoding real samples; a
    * real implementation would replace this with a codec lib. The
    * dataflow around it (batched per-partition map, fixed output
    * schema, frame sampling) is real either way, and because the header
    * fields are what a probe step would surface, the parse itself is
    * oracle-checkable end to end.
    */
  def fakeDecode(payload: Array[Byte], kind: String): Decoded = {
    val buf = java.nio.ByteBuffer.wrap(payload)
    require(buf.getInt(0) == 0x47524146, "bad synthetic container magic") // "GRAF"
    Decoded(0L, kind, buf.getInt(4), buf.getInt(8), buf.getInt(12),
      (payload(16) & 0xff).toDouble / 255.0)
  }

  /** Synthetic audio/video container bytes: "GRAF" magic + header +
    * opaque noise payload (see [[fakeDecode]]).
    */
  def syntheticContainer(w: Int, h: Int, nFrames: Int, lumaByte: Int,
                         noise: Array[Byte]): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(17 + noise.length)
    buf.putInt(0x47524146).putInt(w).putInt(h).putInt(nFrames)
      .put(lumaByte.toByte).put(noise)
    buf.array()
  }

  /** Batched decode + feature extraction (mapPartitions = the batch
    * boundary; decoder state initialized once per partition). Image rows
    * go through the real `javax.imageio` decoder; audio/video through
    * the marked stub.
    */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init: ImageIO's disk cache is pure
        // overhead for in-memory byte payloads on an executor
        ImageIO.setUseCache(false)
        it.map { case (id, kind, payload) =>
          val d = if (kind == "image") decodeImage(payload)
                  else fakeDecode(payload, kind)
          d.copy(media_id = id)
        }
      }
      .toDF()
  }

  /** Deterministic gray PNG: pixel(x, y) = (x*7 + y*13 + seed) % 256.
    * The mean luma of that pattern is closed-form from (w, h, seed), so
    * a decode over the REAL bytes is checkable by an engine that never
    * sees the image.
    */
  def syntheticPng(w: Int, h: Int, seed: Long): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        raster.setSample(x, y, 0, ((x * 7 + y * 13 + seed) % 256).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic synthetic media table for tests/bench. Kind cycles by
    * media_id (id % 3 → image/audio/video) so which rows are images is a
    * plain predicate; image payloads are REAL PNGs with formula-derived
    * dims (w = 8 + id%16, h = 8 + (id/16)%16) and pixel pattern
    * [[syntheticPng]]; audio/video payloads are [[syntheticContainer]]
    * bytes whose header fields are formula-derived from media_id
    * (w = 64 + id%256, h = 64 + (id/7)%256, video nFrames =
    * 1 + id%290, luma byte = id%251) so every decode output is
    * independently recomputable.
    */
  def syntheticMedia(spark: SparkSession, rows: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, rows, 1, partitions).map { id =>
      val rng = new Rng(Rng.mix(0x11ed1a, id))
      val kind = kinds((id % 3).toInt)
      val payload =
        if (kind == "image")
          syntheticPng(8 + (id % 16).toInt, 8 + ((id / 16) % 16).toInt, id)
        else syntheticContainer(
          64 + (id % 256).toInt, 64 + ((id / 7) % 256).toInt,
          if (kind == "video") 1 + (id % 290).toInt else 1,
          (id % 251).toInt,
          Array.fill(16 + rng.nextInt(48))(rng.nextLong().toByte))
      (id, kind, payload, rng.nextInt(2) == 0)
    }.toDF("media_id", "kind", "payload", "flag")
  }

  /** Frame sampling for video rows: every `step`-th frame index —
    * the `sequence` + explode shape that scales (no driver loops).
    */
  def sampleFrames(decoded: DataFrame, step: Int): DataFrame =
    decoded.where(col("kind") === "video")
      .withColumn("frame_index",
        explode(sequence(lit(0), col("nFrames") - 1, lit(step))))
      .select("media_id", "frame_index", "width", "height")
}
