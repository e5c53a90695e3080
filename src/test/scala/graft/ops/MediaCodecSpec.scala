package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pure-JVM media codec laws + the Spark-side multimodal operators over
  * REAL payloads (PPM/BMP/PNG images, RIFF/PCM WAV audio).
  */
class MediaCodecSpec extends SparkSpec {
  import spark.implicits._
  import MediaCodec._

  private def testImage(w: Int, h: Int, seed: Int = 0): Image = {
    val px = Array.tabulate(w * h * 3)(i => ((i * 31 + seed) % 256).toByte)
    Image(w, h, 3, px)
  }

  test("ppm roundtrip: encode then decode is the identity") {
    val img = testImage(5, 3)
    val back = decodePpm(encodePpm(img)).get
    assert(back.width === 5 && back.height === 3 && back.channels === 3)
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("ppm decode handles comments and rejects garbage") {
    val img = testImage(2, 2)
    val withComment = ("P6\n# a comment\n2 2\n255\n").getBytes("US-ASCII") ++
      img.pixels
    assert(decodePpm(withComment).get.pixels.toSeq === img.pixels.toSeq)
    assert(decodePpm("not an image at all".getBytes).isEmpty)
    assert(decodePpm(Array[Byte]('P', '6')).isEmpty)
    // truncated raster
    assert(decodePpm(encodePpm(img).dropRight(3)).isEmpty)
  }

  test("bmp encode -> ImageIO decode recovers pixels exactly (padding + bottom-up)") {
    // width 3: rowSize 9 pads to 12 — the padding path; width 4: no pad
    for (w <- Seq(3, 4); h <- Seq(2, 5)) {
      val img = testImage(w, h, seed = w * 10 + h)
      val back = decodeImage(encodeBmp(img)).get
      assert(back.width === w && back.height === h)
      assert(back.pixels.toSeq === img.pixels.toSeq,
        s"pixel mismatch at ${w}x$h — row padding or bottom-up handling broken")
    }
  }

  test("png encode -> decode roundtrip (lossless)") {
    val img = testImage(7, 4)
    val back = decodeImage(encodePng(img)).get
    assert(back.width === 7 && back.height === 4)
    assert(back.pixels.toSeq === img.pixels.toSeq)
  }

  test("channelSums is per-channel and integer-exact") {
    val img = Image(2, 1, 3, Array[Byte](10, 20, 30, 40, 50, 60))
    assert(img.channelSums.toSeq === Seq(50L, 70L, 90L))
  }

  test("hostile payloads decode to None, never throw (task-crash regression)") {
    // PPM header whose w*h*3 wraps Int: must be None, not a wrong-sized
    // Image that later crashes channelSums
    val overflowPpm = "P6\n40000 40000\n255\n".getBytes("US-ASCII") ++
      Array.fill[Byte](64)(1)
    assert(decodePpm(overflowPpm).isEmpty)
    assert(decodeImage(overflowPpm).isEmpty)
    // RIFF/WAVE with a lying fmt size over a truncated buffer
    val lyingFmt = "RIFF".getBytes ++ Array[Byte](40, 0, 0, 0) ++
      "WAVE".getBytes ++ "fmt ".getBytes ++ Array[Byte](16, 0, 0, 0) ++
      Array.fill[Byte](6)(1) // fmt body cut short
    assert(decodeWav(lyingFmt).isEmpty)
    // unknown chunk with odd size equal to the remaining bytes
    val oddTail = "RIFF".getBytes ++ Array[Byte](40, 0, 0, 0) ++
      "WAVE".getBytes ++ "junk".getBytes ++ Array[Byte](29, 0, 0, 0) ++
      Array.fill[Byte](29)(0)
    assert(decodeWav(oddTail).isEmpty)
    // 1-bit mono PCM: frame size rounds to zero bytes — None, not /0
    val zeroFrame = {
      val b = java.nio.ByteBuffer.allocate(44)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(1000).putShort(0).putShort(1) // 1 bit/sample
      b.put("data".getBytes).putInt(0)
      b.array()
    }
    assert(decodeWav(zeroFrame).isEmpty)
    // lying DATA size: claims 1000 sample bytes but only 8 are present —
    // must be None, not Some(Audio) with an inflated numFrames
    val lyingData = {
      val b = java.nio.ByteBuffer.allocate(44 + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes).putInt(44).put("WAVE".getBytes)
      b.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
        .putInt(8000).putInt(16000).putShort(2).putShort(16)
      b.put("data".getBytes).putInt(1000)
      b.putShort(1).putShort(2).putShort(3).putShort(4)
      b.array()
    }
    assert(decodeWav(lyingData).isEmpty)
  }

  test("wav: data chunk before fmt still decodes (chunk order freedom)") {
    val samples = Array.tabulate(16)(i => (i * 100).toShort)
    val std = encodeWav(1, 8000, 16, samples)
    // reorder: header, data chunk, then fmt chunk
    val fmtChunk = std.slice(12, 12 + 8 + 16)
    val dataChunk = std.slice(36, std.length)
    val reordered = std.slice(0, 12) ++ dataChunk ++ fmtChunk
    val a = decodeWav(reordered).get
    assert(a.channels === 1 && a.sampleRate === 8000 && a.numFrames === 16)
  }

  test("wav roundtrip: header fields and frame count") {
    val samples = Array.tabulate(800)(i => (i * 37 % 30000).toShort)
    val a = decodeWav(encodeWav(2, 16000, 16, samples)).get
    assert(a.channels === 2 && a.sampleRate === 16000 && a.bitsPerSample === 16)
    assert(a.numFrames === 400) // 800 samples / 2 channels
    assert(a.durationMs === 25) // 400 / 16000 s
    assert(decodeWav("RIFFxxxxJUNK".getBytes).isEmpty)
    assert(decodeWav(Array.empty[Byte]).isEmpty)
  }

  test("resizeImage: nearest-neighbor, exact on integer upscale, corners fixed") {
    val img = testImage(4, 4)
    val up = resizeImage(img, 8, 8)
    assert(up.width === 8 && up.height === 8)
    // 2x nearest upscale: pixel (2x, 2y) equals source (x, y)
    for (y <- 0 until 4; x <- 0 until 4; c <- 0 until 3)
      assert(up.pixels(((y * 2) * 8 + x * 2) * 3 + c) ===
        img.pixels((y * 4 + x) * 3 + c))
    val down = resizeImage(img, 2, 2)
    assert(down.pixels((0 * 2 + 0) * 3) === img.pixels(0))
  }

  test("Multimodal.decodeMeta: real formats classify, garbage stays null") {
    val img = testImage(6, 2)
    val wav = encodeWav(1, 8000, 16, Array.tabulate(80)(_.toShort))
    val df = Seq(
      (1L, encodePpm(img)), (2L, encodeBmp(img)), (3L, encodePng(img)),
      (4L, wav), (5L, "just text".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val meta = Multimodal.decodeMeta(df).orderBy("media_id").collect()
    assert(meta(0).getAs[String]("format") === "ppm")
    assert(meta(1).getAs[String]("format") === "bmp")
    assert(meta(2).getAs[String]("format") === "png")
    Seq(0, 1, 2).foreach { i =>
      assert(meta(i).getAs[Int]("width") === 6)
      assert(meta(i).getAs[Int]("height") === 2)
    }
    assert(meta(3).getAs[String]("format") === "wav")
    assert(meta(3).getAs[Int]("sample_rate") === 8000)
    assert(meta(3).getAs[Long]("duration_ms") === 10L) // 80/8000 s
    assert(meta(4).isNullAt(meta(4).fieldIndex("format")))
  }

  test("Multimodal.extractFeatures: decoded images get codec-invariant luminance features") {
    val img = testImage(8, 8)
    val df = Seq((1L, encodePpm(img)), (2L, encodePng(img)))
      .toDF("media_id", "bytes")
    val rows = Multimodal.extractFeatures(df, featureDim = 8)
      .orderBy("media_id").collect()
    assert(rows.forall(_.getAs[Boolean]("decoded")))
    // SAME picture through two different codecs -> same features
    assert(rows(0).getAs[collection.Seq[Float]]("features").toSeq ===
      rows(1).getAs[collection.Seq[Float]]("features").toSeq)
    // histogram sums to ~1
    val s = rows(0).getAs[collection.Seq[Float]]("features").sum
    assert(math.abs(s - 1.0f) < 1e-5)
  }

  test("Multimodal.resize: payloads re-encode at the target size, garbage nulls") {
    val img = testImage(6, 4)
    val df = Seq((1L, encodePpm(img)), (2L, "nope".getBytes("UTF-8")))
      .toDF("media_id", "bytes")
    val out = Multimodal.resize(df, "bytes", 3, 2).orderBy("media_id").collect()
    val resized = decodeImage(out(0).getAs[Array[Byte]]("bytes")).get
    assert(resized.width === 3 && resized.height === 2)
    // nearest-neighbor 2x downscale picks source (2x, 2y)
    assert(resized.pixels(0) === img.pixels(0))
    assert(out(1).isNullAt(out(1).fieldIndex("bytes")))
  }
}
