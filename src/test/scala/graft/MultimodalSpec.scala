package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real image decode (javax.imageio) + the multimodal batch plumbing. */
class MultimodalSpec extends AnyFunSuite {
  lazy implicit val spark: org.apache.spark.sql.SparkSession = SparkTestSession.spark

  test("decodeImage reads real PNG bytes: exact dims and mean luma") {
    val w = 5; val h = 3; val seed = 42L
    val d = Multimodal.decodeImage(Multimodal.syntheticPng(w, h, seed))
    assert(d.width === w)
    assert(d.height === h)
    // closed-form mean of pixel(x,y) = (x*7 + y*13 + seed) % 256
    val sum = (for (y <- 0 until h; x <- 0 until w)
      yield (x * 7 + y * 13 + seed) % 256).sum
    assert(d.meanLuma === sum.toDouble / (w * h) / 255.0)
    assert(d.nFrames === 1)
  }

  test("decodeImage is exact on a solid-color image") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 4; x <- 0 until 4) img.getRaster.setSample(x, y, 0, 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val d = Multimodal.decodeImage(out.toByteArray)
    assert(d.width === 4 && d.height === 4)
    assert(d.meanLuma === 128.0 / 255.0)
  }

  test("decodeAudio reads real WAV bytes: exact rate, count and amplitude sum") {
    val rate = 11000; val n = 300; val seed = 7L
    val a = Multimodal.decodeAudio(Multimodal.syntheticWav(rate, n, seed))
    assert(a.sample_rate === rate)
    assert(a.n_samples === n.toLong)
    // closed-form |amplitude| sum of s_i = ((seed*131 + i*37) % 65536) - 32768
    val sum = (0 until n).map(i =>
      math.abs(((seed * 131 + i * 37) % 65536) - 32768)).sum
    assert(a.amp_sum === sum)
    // a non-WAV payload must fail loudly, not decode garbage
    assertThrows[Exception](
      Multimodal.decodeAudio(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
  }

  test("synthetic container header round-trips through the stub decoder") {
    val payload = Multimodal.syntheticContainer(320, 240, 77, 129,
      Array[Byte](1, 2, 3))
    val d = Multimodal.fakeDecode(payload, "video")
    assert(d.width === 320 && d.height === 240 && d.nFrames === 77)
    assert(d.meanLuma === 129.0 / 255.0)
    // corrupted magic must fail loudly, not decode garbage
    val bad = payload.clone(); bad(0) = 0
    assertThrows[IllegalArgumentException](Multimodal.fakeDecode(bad, "video"))
  }

  test("decodeFeatures routes image rows through the real decoder") {
    val decoded = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 60))
    val imgs = decoded.where(col("kind") === "image")
      .select("media_id", "width", "height").collect()
    assert(imgs.length === 20) // ids ≡ 0 (mod 3)
    imgs.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8 + (id % 16).toInt)
      assert(r.getInt(2) === 8 + ((id / 16) % 16).toInt)
    }
    // audio rows through the real WAV decoder (width carries the sample
    // rate in the unified schema), video through the marked stub
    val auds = decoded.where(col("kind") === "audio")
      .select("media_id", "width", "nFrames").collect()
    auds.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) === 8000 + (id % 8).toInt * 1000)
      assert(r.getInt(2) === 256 + (id % 512).toInt)
    }
    assert(decoded.where(col("kind") =!= "image").count() === 40)
  }

  test("dhash: identical pixel patterns share a fingerprint and a keeper") {
    // ids 0 and 3840 are pixel-identical by construction: same dims
    // (3840 % 16 = 0, (3840/16) % 16 = 0) and the additive seed agrees
    // mod 256 (3840 % 256 = 0) — planted cross-corpus image duplicates
    val d = Multimodal.imageDhash(Multimodal.syntheticMedia(spark, 3843))
      .select("media_id", "dhash_hi", "dhash_lo", "canon_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(d(3840L)._1 === d(0L)._1)
    assert(d(3840L)._2 === d(0L)._2)
    assert(d(3840L)._3 === 0L) // keeper = least media_id of the group
    assert(d(0L)._3 === 0L)
    // a wide image crosses the mod-256 wrap and gets a NONZERO
    // fingerprint distinct from the small-gradient (0, 0) group
    assert((d(15L)._1, d(15L)._2) !== ((d(0L)._1, d(0L)._2)))
    assert(d(15L)._1 > 0L)
    // hashes stay in unsigned-32 halves — no sign bit on either engine
    d.values.foreach { case (hi, lo, _) =>
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32))
    }
  }

  test("imageNearDup: planted identical pair at hamming 0, radius bound holds") {
    // ids 0 and 768 are pixel-identical (same dims mod 16/256, seed
    // agrees mod 256) — they MUST surface as a hamming-0 pair; 768 sits
    // in 0's band buckets and 0 is always a rank-1 anchor
    val pairs = Multimodal.imageNearDup(Multimodal.syntheticMedia(spark, 1000))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val asMap = pairs.map(p => (p._1, p._2) -> p._3).toMap
    assert(asMap((0L, 768L)) === 0)
    pairs.foreach { case (a, b, h) =>
      assert(a < b, s"pair ($a, $b) not ordered")
      assert(h >= 0 && h <= 6, s"pair ($a, $b) hamming $h outside radius")
    }
    assert(pairs.length === pairs.distinct.length)
  }

  test("sampleFrames explodes every step-th frame index of video rows") {
    val decoded = Multimodal.decodeFeatures(Multimodal.syntheticMedia(spark, 30))
    val frames = Multimodal.sampleFrames(decoded, step = 30)
    val perVideo = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = decoded.where(col("kind") === "video")
      .select("media_id", "nFrames").collect()
      .map(r => r.getLong(0) -> ((r.getInt(1) - 1) / 30 + 1).toLong).toMap
    assert(perVideo === expected)
  }
}
