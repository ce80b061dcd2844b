package graft.ops

import graft.core.Rng
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in batched per-partition
  * passes (the Scala analog of `mapInPandas` batches).
  *
  * The decode step is STUBBED (no image/audio codecs in this
  * container): [[fakeDecode]] is a clearly-marked deterministic fake
  * producing plausible (width, height, n_frames) from the byte stream.
  * Everything around it — schema, batch shape, partitioning, feature
  * extraction over decoded structs — is real and tested, so swapping
  * in a real codec is a one-function change.
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

  /** STUB decoder — deterministic fake keyed on payload bytes. A real
    * implementation would decode with a codec lib; the dataflow
    * (batched per-partition map, fixed output schema) is the real part.
    */
  def fakeDecode(payload: Array[Byte], kind: String): Decoded = {
    var h = 0xdec0deL
    var i = 0
    while (i < payload.length) { h = Rng.mix(h, payload(i)); i += 1 }
    val w = 64 + (Math.floorMod(h, 1024L)).toInt
    val ht = 64 + (Math.floorMod(h >>> 13, 1024L)).toInt
    val nf = if (kind == "video") 1 + (Math.floorMod(h >>> 29, 300L)).toInt else 1
    Decoded(0L, kind, w, ht, nf, (Math.floorMod(h >>> 37, 256L)).toDouble / 255.0)
  }

  /** Batched decode + feature extraction (mapPartitions = the batch
    * boundary; decoder state initialized once per partition).
    */
  def decodeFeatures(media: DataFrame)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init would go here (codec contexts etc.)
        it.map { case (id, kind, payload) =>
          fakeDecode(payload, kind).copy(media_id = id)
        }
      }
      .toDF()
  }

  /** Deterministic synthetic media table for tests/bench. */
  def syntheticMedia(spark: SparkSession, rows: Long, partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val kinds = Array("image", "audio", "video")
    spark.range(0, rows, 1, partitions).map { id =>
      val rng = new Rng(Rng.mix(0x11ed1a, id))
      val kind = kinds(rng.nextInt(3))
      val payload = Array.fill(16 + rng.nextInt(48))(rng.nextLong().toByte)
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
