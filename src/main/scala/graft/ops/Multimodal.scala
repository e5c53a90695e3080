package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as opaque
  * `binary` columns with a typed metadata struct; decode / feature-extract
  * / resize / frame-sample run as partition-local batch functions.
  *
  * The actual codecs are STUBBED (no image/audio libraries in this
  * environment): [[decodeStub]] derives a deterministic fake "decoded
  * frame" from the bytes. Everything Spark-side — the schema contract,
  * partition-local batching, feature-column shapes — is real: swap
  * `decodeStub` for an actual codec (JNI/javacv) without touching the
  * dataflow. In PySpark this layer maps to `mapInPandas` with the same
  * schema contract.
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

  /** STUB codec: a real implementation decodes `bytes` with an image/audio
    * library; this deterministic stand-in derives per-"pixel-block" values
    * from the payload so the pipeline shape (batch iteration, fixed-size
    * feature vectors) is faithful. Marked for replacement.
    */
  private[ops] def decodeStub(bytes: Array[Byte], featureDim: Int): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
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

  /** Decode + feature-extract: adds `features array<float>` (fixed dim) and
    * `byte_len`. Partition-local (`mapPartitions` over row batches — the
    * Scala analogue of `mapInPandas`): no shuffle, codec state initialized
    * once per partition, vectorizable batch shape.
    */
  def extractFeatures(df: DataFrame, bytesCol: String = "bytes",
      featureDim: Int = 16): DataFrame = {
    val schema = StructType(df.schema.fields ++ Seq(
      StructField("features", ArrayType(FloatType)),
      StructField("byte_len", IntegerType)))
    val idx = df.schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // per-partition codec init would happen here (once, not per row)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val feats = decodeStub(bytes, featureDim)
        Row.fromSeq(r.toSeq ++ Seq(feats.toSeq, Option(bytes).map(_.length).getOrElse(0)))
      }
    }(enc)
  }

  /** "Resize": STUB re-encode keeping only every `factor`-th byte —
    * placeholder for a real resample; preserves the binary-column contract.
    */
  def resizeStub(df: DataFrame, bytesCol: String, factor: Int): DataFrame = {
    val schema = df.schema
    val idx = schema.fieldIndex(bytesCol)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](idx)
        val resized =
          if (bytes == null) null
          else bytes.indices.collect { case i if i % factor == 0 => bytes(i) }.toArray
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
