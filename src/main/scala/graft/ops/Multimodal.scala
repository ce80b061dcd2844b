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
  * raster. The AUDIO path is real too: payloads are WAV/PCM bytes
  * decoded with `javax.sound.sampled` (also JDK-only) — sample rate,
  * sample count and mean amplitude come from the decoded sample
  * stream. VIDEO decode remains STUBBED ([[fakeDecode]], clearly
  * marked — no video codec ships with the JDK or this container); the
  * dataflow around the stub (schema, batch shape, partitioning, frame
  * sampling) is real and tested either way.
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

  /** Real WAV/PCM audio decode via `javax.sound.sampled` (the audio
    * analog of the [[decodeImage]] move — JDK-only, no native deps):
    * parses the RIFF container, checks the 16-bit mono little-endian
    * PCM format, and folds the decoded sample stream into exact
    * integers — sample count and summed |amplitude| — before any float
    * touches a value, so the result is bit-reproducible regardless of
    * read order and replayable by an engine that never hears the audio.
    */
  def decodeAudio(payload: Array[Byte]): AudioDecoded = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new ByteArrayInputStream(payload))
    try {
      val fmt = ais.getFormat
      require(fmt.getSampleSizeInBits == 16 && fmt.getChannels == 1 &&
        !fmt.isBigEndian, s"expected 16-bit mono little-endian PCM, got $fmt")
      val bytes = ais.readAllBytes()
      var sum = 0L
      var n = 0L
      var i = 0
      while (i + 1 < bytes.length) {
        val s = (((bytes(i + 1) & 0xff) << 8) | (bytes(i) & 0xff)).toShort.toLong
        sum += math.abs(s)
        n += 1
        i += 2
      }
      AudioDecoded(0L, fmt.getSampleRate.toLong, n, sum)
    } finally ais.close()
  }

  final case class AudioDecoded(media_id: Long, sample_rate: Long,
                                n_samples: Long, amp_sum: Long)

  /** Real WAV/PCM bytes for the synthetic audio rows: 16-bit mono
    * little-endian samples s_i = ((seed·131 + i·37) mod 65536) − 32768,
    * encoded through `javax.sound.sampled.AudioSystem.write` — so the
    * decode path exercises the real RIFF parser and every decoded
    * field is closed-form from (sampleRate, nSamples, seed).
    */
  def syntheticWav(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val data = new Array[Byte](nSamples * 2)
    var i = 0
    while (i < nSamples) {
      val s = (((seed * 131 + i * 37) % 65536) - 32768).toInt
      data(i * 2) = (s & 0xff).toByte
      data(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, nSamples.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** STUB container decoder for VIDEO ONLY (no video codec in the JDK
    * or this container; image and audio decode are real — see
    * [[decodeImage]] / [[decodeAudio]]). The stub parses a synthetic
    * container header — magic "GRAF", then width/height/frame-count
    * ints and a mean-luma byte — instead of decoding real frames; a
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
    * go through the real `javax.imageio` decoder, audio rows through the
    * real `javax.sound.sampled` decoder, video through the marked stub.
    *
    * Unified `Decoded` schema across kinds — audio maps as
    * width = sample rate, height = channels (1), nFrames = sample
    * count, meanLuma = mean |amplitude| in [0,1]
    * (amp_sum / n / 32768, the same integer-sum-then-one-float-chain
    * discipline as the image path).
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
          val d = kind match {
            case "image" => decodeImage(payload)
            case "audio" =>
              val a = decodeAudio(payload)
              Decoded(0L, "audio", a.sample_rate.toInt, 1, a.n_samples.toInt,
                a.amp_sum.toDouble / a.n_samples / 32768.0)
            case _ => fakeDecode(payload, kind)
          }
          d.copy(media_id = id)
        }
      }
      .toDF()
  }

  /** Audio-only decode surface with the natural audio column names —
    * every output an exact integer: (media_id, sample_rate, n_samples,
    * amp_sum, amp_milli) with amp_milli = (1000·amp_sum) div
    * (n_samples·32768), so the whole table is engine-portable with no
    * float anywhere.
    */
  def decodeAudioFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.where(col("kind") === "audio")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, p) =>
          val a = decodeAudio(p)
          (id, a.sample_rate, a.n_samples, a.amp_sum,
            1000L * a.amp_sum / (a.n_samples * 32768L))
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "amp_sum", "amp_milli")
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
    * [[syntheticPng]]; audio payloads are REAL WAVs ([[syntheticWav]],
    * sample rate = 8000 + (id%8)·1000, n = 256 + id%512, seed = id);
    * video payloads are [[syntheticContainer]] bytes whose header fields
    * are formula-derived from media_id (w = 64 + id%256,
    * h = 64 + (id/7)%256, nFrames = 1 + id%290, luma byte = id%251) —
    * so every decode output is independently recomputable.
    */
  def syntheticMedia(spark: SparkSession, rows: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, rows, 1, partitions).map { id =>
      val rng = new Rng(Rng.mix(0x11ed1a, id))
      val kind = kinds((id % 3).toInt)
      val payload = kind match {
        case "image" =>
          syntheticPng(8 + (id % 16).toInt, 8 + ((id / 16) % 16).toInt, id)
        case "audio" =>
          syntheticWav(8000 + (id % 8).toInt * 1000, 256 + (id % 512).toInt, id)
        case _ => syntheticContainer(
          64 + (id % 256).toInt, 64 + ((id / 7) % 256).toInt,
          1 + (id % 290).toInt,
          (id % 251).toInt,
          Array.fill(16 + rng.nextInt(48))(rng.nextLong().toByte))
      }
      (id, kind, payload, rng.nextInt(2) == 0)
    }.toDF("media_id", "kind", "payload", "flag")
  }

  /** Difference-hash (dHash) of one decoded image: the perceptual
    * fingerprint behind image near-dup at corpus scale (aHash/dHash are
    * the standard cheap tier below learned embeddings). The raster is
    * block-reduced to a 9-column × 8-row grid of integer (sum, count)
    * cells — cell of pixel (x, y) is (x*9/w, y*8/h), the same integer
    * floor both here and in the oracle, so there is no resampling
    * kernel to match — and bit (i, j) records whether cell (i, j) is
    * brighter than its right neighbor (i+1, j). The brightness compare
    * is the exact cross-multiplication `sum_l·cnt_r > sum_r·cnt_l`
    * (never a float mean; products stay under 2^63 for any image below
    * ~2^26 pixels per cell, i.e. beyond 500-megapixel frames). Empty
    * ninth-column cells (w < 9) compare 0 > 0 = false on both engines.
    * 64 bits, split as two unsigned-32 longs (hi = bits 32..63) so no
    * engine ever shifts into a sign bit.
    */
  def dhashImage(payload: Array[Byte]): (Int, Int, Long, Long) = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    val w = img.getWidth
    val h = img.getHeight
    val raster = img.getRaster
    val sums = Array.ofDim[Long](9, 8)
    val cnts = Array.ofDim[Long](9, 8)
    var y = 0
    while (y < h) {
      val cj = (y * 8 / h).min(7)
      var x = 0
      while (x < w) {
        val ci = (x * 9 / w).min(8)
        sums(ci)(cj) += raster.getSample(x, y, 0)
        cnts(ci)(cj) += 1
        x += 1
      }
      y += 1
    }
    var hi = 0L
    var lo = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (sums(i)(j) * cnts(i + 1)(j) > sums(i + 1)(j) * cnts(i)(j)) {
          val k = j * 8 + i
          if (k < 32) lo |= 1L << k else hi |= 1L << (k - 32)
        }
        i += 1
      }
      j += 1
    }
    (w, h, hi, lo)
  }

  /** Perceptual image near-dup: dHash every image row (real PNG decode)
    * and canonicalize exact hash groups — `canon_id` = least media_id
    * sharing the (hi, lo) fingerprint, the image analog of the text
    * dedup family's keeper rule. Plan: batched mapPartitions decode
    * (map-only over the binary column) → one window keyed by the
    * 64-bit fingerprint; at 100 TB the window is a hash shuffle on the
    * fingerprint — no pairwise image comparison anywhere. Hamming-ball
    * (distance > 0) matching would ride the same banding machinery as
    * [[Dedup.simhashPairs]]; exact-group canonicalization is the tier
    * that needs no verify pass.
    */
  def imageDhash(media: DataFrame)(implicit spark: SparkSession): DataFrame =
    dhashFrame(media).withColumn("canon_id",
      min(col("media_id")).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("dhash_hi"), col("dhash_lo"))))

  /** The shared decode→fingerprint stage of [[imageDhash]] and
    * [[imageNearDup]]: map-only over the binary column.
    */
  private def dhashFrame(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.where(col("kind") === "image")
      .select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        ImageIO.setUseCache(false)
        it.map { case (id, p) =>
          val (w, h, hi, lo) = dhashImage(p)
          (id, w, h, hi, lo)
        }
      }
      .toDF("media_id", "width", "height", "dhash_hi", "dhash_lo")
  }

  /** Hamming-ball image near-dup: candidate pairs whose dHash
    * fingerprints differ in at most `maxHamming` of 64 bits — the
    * distance>0 tier above [[imageDhash]]'s exact groups, catching
    * re-encodes / slight crops whose block grid moves a few compares.
    * Same machinery as [[Dedup.simhashPairs]]: the 64-bit fingerprint
    * splits into 4×16-bit bands (pigeonhole: hamming ≤ 3 GUARANTEES a
    * shared band; larger radii trade recall for the same linear cost),
    * candidates meet in a (band, value) bucket — an EQUI-join, with the
    * rank≤`maxBucket` anchor cap so a hot fingerprint family can't go
    * quadratic — and the exact popcount runs only on bucket-colocated
    * pairs. The decode output is localCheckpoint'd before the self-join
    * so PNG decoding runs once, not once per join side.
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 6, maxBucket: Int = 64)(
      implicit spark: SparkSession): DataFrame = {
    val hashed = dhashFrame(media)
      .select("media_id", "dhash_hi", "dhash_lo").localCheckpoint(true)
    val banded = hashed.select(col("media_id"), col("dhash_hi"), col("dhash_lo"),
      posexplode(array(
        col("dhash_lo").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("dhash_lo"), 16).bitwiseAND(lit(0xffffL)),
        col("dhash_hi").bitwiseAND(lit(0xffffL)),
        shiftrightunsigned(col("dhash_hi"), 16).bitwiseAND(lit(0xffffL))))
        .as(Seq("band", "bval")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("band", "bval").orderBy("media_id")
    val a = banded.withColumn("rk", row_number().over(w))
      .where(col("rk") <= maxBucket)
      .select(col("media_id").as("a"), col("dhash_hi").as("hia"),
        col("dhash_lo").as("loa"), col("band"), col("bval"))
    val b = banded.select(col("media_id").as("b"), col("dhash_hi").as("hib"),
      col("dhash_lo").as("lob"), col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .where(col("a") < col("b"))
      .withColumn("hamming",
        (bit_count(col("hia").bitwiseXOR(col("hib"))) +
          bit_count(col("loa").bitwiseXOR(col("lob")))).cast("int"))
      .where(col("hamming") <= maxHamming)
      .select("a", "b", "hamming").distinct()
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
