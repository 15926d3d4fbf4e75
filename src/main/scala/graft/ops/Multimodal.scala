package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal column support: media payloads travel as opaque
  * `binary` columns plus a typed metadata struct; decode / feature
  * extraction runs partition-wise so one task never holds more than a
  * partition of payloads.
  *
  * The decode kernel itself is a STUB (no image/audio codecs in this
  * environment): `fakeFeatures` derives a deterministic feature vector
  * from the payload bytes. The Spark-side plumbing — schema, batch
  * shape, partition-wise execution, pruned payload column — is real and
  * tested (graft.PipelineSpec).
  *
  * Scale notes: payloads never pass through a shuffle here — metadata
  * extraction and feature extraction are map-side; downstream joins
  * should carry only (id, features, meta) and re-join payloads by id
  * when materially needed.
  */
object Multimodal {

  val FeatureDim = 8

  /** Attach a payload (bytes) + metadata struct to any DataFrame with a
    * string content column — the ingest shape a real pipeline would get
    * from `spark.read.format("binaryFile")`.
    */
  def ingest(df: DataFrame, idCol: String, contentCol: String, mediaType: String): DataFrame =
    df.select(
      col(idCol),
      col(contentCol).cast("binary").as("payload"),
      struct(
        lit(mediaType).as("media_type"),
        octet_length(col(contentCol).cast("binary")).cast("long").as("byte_len"),
        sha2(col(contentCol).cast("binary"), 256).as("sha256")).as("meta"))

  /** Partition-wise feature extraction over binary payloads.
    *
    * STUB decode: a real deployment swaps `fakeFeatures` for a codec
    * call (JNI/onnx); the mapPartitions batch shape — iterator-in /
    * iterator-out, one partition per task, payload column pruned after
    * use — is exactly what the real kernel needs.
    */
  def extractFeatures(df: DataFrame, idCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("features", ArrayType(FloatType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        Row(r.get(idIdx), fakeFeatures(r.getAs[Array[Byte]](payloadIdx)))
      }
    }(enc)
  }

  /** Frame sampling over binary payloads: split each payload into
    * fixed-size byte frames, one output row per frame — the shape a
    * video/audio pipeline needs before per-frame decoding (which would
    * run as `extractFeatures` over the frame column). Pure map-side:
    * slicing + explode, no shuffle; payload bytes never leave the
    * task that read them.
    */
  def frames(df: DataFrame, idCol: String, frameBytes: Int): DataFrame = {
    val nFrames = greatest(
      ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int"),
      lit(1))
    df.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), nFrames - 1),
        i => col("payload").substr(i * frameBytes + 1, lit(frameBytes))))
        .as(Seq("frame_idx", "frame")))
  }

  /** Resize (downsample) binary payloads by average-pooling windows of
    * `factor` bytes — the deterministic stand-in for an image/audio
    * resample (a real deployment swaps the pooling loop for the codec's
    * scaler; the partition-wise batch shape, pruned columns, and output
    * schema are what it would use). Integer window mean (floor) keeps
    * the result exact and engine-portable. Map-side only — payloads
    * never shuffle.
    *
    * Output: (idCol, resized: array<long>) — one pooled value per
    * window, ceil(len/factor) windows, empty payloads give an empty
    * array.
    */
  def resize(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    require(factor > 0, "factor must be positive")
    val outSchema = StructType(Seq(
      StructField(idCol, df.schema(idCol).dataType),
      StructField("resized", ArrayType(LongType, containsNull = false))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex("payload")
    df.mapPartitions { rows =>
      rows.map { r =>
        val p = r.getAs[Array[Byte]](payloadIdx)
        val n = (p.length + factor - 1) / factor
        val out = new Array[Long](n)
        var w = 0
        while (w < n) {
          val start = w * factor
          val end = math.min(start + factor, p.length)
          var s = 0
          var i = start
          while (i < end) { s += p(i) & 0xff; i += 1 }
          out(w) = (s / (end - start)).toLong
          w += 1
        }
        Row(r.get(idIdx), out)
      }
    }(enc)
  }

  /** Deterministic stand-in for a media decoder: folds payload bytes
    * into FeatureDim buckets and scales to [0, 1). Replace with the
    * real codec at deployment; signature and batch shape are stable.
    */
  def fakeFeatures(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](FeatureDim)
    var i = 0
    while (i < payload.length) {
      val d = i % FeatureDim
      acc(d) = (acc(d) * 31 + (payload(i) & 0xff)) % 1000003L
      i += 1
    }
    acc.map(v => v.toFloat / 1000003.0f)
  }
}
