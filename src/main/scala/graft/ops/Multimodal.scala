package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * / resize / frame-sample run as partition-local batch functions
  * (`mapPartitions` — the Scala analogue of `mapInPandas`, same schema
  * contract, codec state initialized once per partition, no shuffle).
  *
  * The codecs are REAL pure-JVM implementations ([[MediaCodec]]): PPM
  * parse, PNG/JPEG/BMP/GIF via `javax.imageio`, WAV RIFF/PCM parse.
  * Payloads that decode as no known format fall back to a deterministic
  * byte-derived feature vector — the honest behavior for a corpus where
  * some blobs are garbage; the `decoded` flag separates the populations.
  */
object Multimodal {

  /** Canonical media-table schema: id, kind, payload bytes, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType), // image | audio | video
    StructField("bytes", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("format", StringType),
      StructField("duration_ms", LongType))))))

  /** Fallback feature vector for payloads no codec recognizes: per-block
    * byte means, deterministic in the payload. Keeps garbage rows flowing
    * (flagged, not dropped) — a 100 TB crawl always contains undecodable
    * blobs.
    */
  private[ops] def byteFallbackFeatures(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    if (bytes == null || bytes.isEmpty) return out
    var i = 0
    while (i < bytes.length) {
      out(i % featureDim) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    val blocks = math.ceil(bytes.length.toDouble / featureDim).toFloat
    var j = 0
    while (j < featureDim) { out(j) /= blocks; j += 1 }
    out
  }

  /** Real image features: a luminance histogram with `featureDim` bins
    * over the DECODED raster (codec-invariant: the same picture encoded
    * as PPM or PNG produces the same vector, which no byte-level feature
    * can promise).
    */
  private[ops] def imageFeatures(img: MediaCodec.Image, featureDim: Int): Array[Float] = {
    val out = new Array[Float](featureDim)
    val n = img.width * img.height
    if (n == 0) return out
    var p = 0
    while (p < n) {
      val base = p * img.channels
      // integer ITU-R 601 luma; exact, no float accumulation drift
      val luma = (299 * (img.pixels(base) & 0xFF) +
        587 * (img.pixels(base + 1) & 0xFF) +
        114 * (img.pixels(base + 2) & 0xFF)) / 1000
      out(math.min(featureDim - 1, luma * featureDim / 256)) += 1.0f
      p += 1
    }
    var j = 0
    while (j < featureDim) { out(j) /= n; j += 1 }
    out
  }

  /** Decode + feature-extract: adds `features array<float>` (fixed dim),
    * `byte_len`, and `decoded` (did a real codec recognize the payload).
    * Partition-local; the codec runs where the bytes already are.
    */
  def extractFeatures(df: DataFrame, bytesCol: String = "bytes",
      featureDim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType)),
      StructField("byte_len", IntegerType),
      StructField("decoded", BooleanType)))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val img = MediaCodec.decodeImage(bytes)
        val feats = img.map(imageFeatures(_, featureDim))
          .getOrElse(byteFallbackFeatures(bytes, featureDim))
        Row.fromSeq(r.toSeq ++ Seq(feats.toSeq,
          Option(bytes).map(_.length).getOrElse(0), img.isDefined))
      }
    }(enc)
  }

  /** Decode metadata: format/width/height/channels for images,
    * sample-rate/duration for WAV audio — the `meta` struct materialized
    * from the payload itself (crawl metadata lies; the bytes don't).
    */
  def decodeMeta(df: DataFrame, bytesCol: String = "bytes"): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("format", StringType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("channels", IntegerType),
      StructField("sample_rate", IntegerType),
      StructField("duration_ms", LongType)))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val extra: Seq[Any] = MediaCodec.decodeWav(bytes) match {
          case Some(a) =>
            Seq("wav", null, null, a.channels, a.sampleRate, a.durationMs)
          case None => MediaCodec.decodeImage(bytes) match {
            case Some(img) =>
              val fmt = if (bytes(0) == 'P') "ppm"
                else if (bytes(0) == 'B' && bytes(1) == 'M') "bmp"
                else if ((bytes(0) & 0xFF) == 0x89) "png"
                else if ((bytes(0) & 0xFF) == 0xFF) "jpeg"
                else "image"
              Seq(fmt, img.width, img.height, img.channels, null, null)
            case None => Seq(null, null, null, null, null, null)
          }
        }
        Row.fromSeq(r.toSeq ++ extra)
      }
    }(enc)
  }

  /** Real resize: decode, nearest-neighbor resample to `(newW, newH)`,
    * re-encode as PNG. Undecodable payloads pass through as null (the
    * `decoded` population split again).
    */
  def resize(df: DataFrame, bytesCol: String, newW: Int, newH: Int): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val resized = MediaCodec.decodeImage(bytes)
          .map(img => MediaCodec.encodePng(
            MediaCodec.resizeImage(img, newW, newH)))
          .orNull
        Row.fromSeq(r.toSeq.updated(idx, resized))
      }
    }(enc)
  }

  /** Frame-sample: one synthetic "frame" digest per `frameSize` bytes —
    * the video→frames explode shape (generator, no shuffle).
    */
  def frameSample(df: DataFrame, idCol: String, bytesCol: String,
      frameSize: Int = 256): DataFrame = {
    val frames = transform(
      sequence(lit(0),
        greatest(ceil(length(col(bytesCol)) / frameSize.toDouble).cast("int") - 1, lit(0))),
      i => struct(
        i.as("frame_no"),
        // digest over the frame's OWN byte slice (1-based substring on
        // binary), not a prefix of the whole payload
        xxhash64(col(bytesCol).substr(i * frameSize + 1, lit(frameSize)), i)
          .as("frame_digest")))
    df.select(col(idCol), posexplode(frames).as(Seq("pos", "frame")))
      .select(col(idCol), col("frame.frame_no").as("frame_no"),
        col("frame.frame_digest").as("frame_digest"))
  }
}
