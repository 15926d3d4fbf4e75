package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.{expr => exprBridge}
import org.apache.spark.sql.types._

import graft.functions.Kernels

/** Pluggable media-decoder SPI: the seam where a REAL image/audio
  * codec drops into the multimodal pipeline without touching
  * [[Multimodal]] or the compiled kernels. Decoders are resolved by
  * type string through [[MediaDecoders]], user-local registrations
  * shadowing built-ins — the same convention as
  * [[graft.connections.ConnectionRegistry]] (`lib/book.js:176-184`'s
  * buildConnection override order).
  *
  * A decoder instance is SERIALIZABLE and rides the plan itself (a
  * codegen reference object, the same shipping mechanism as UDF
  * closures), so executors need no registry state — at cluster scale
  * the driver resolves once and every task carries the decoder. The
  * default [[StubDecoder]] keeps the compiled-kernel StaticInvoke path
  * (bit-identical plans for the oracle queries); custom decoders plan
  * as a codegen `Invoke` on the instance — still inside
  * WholeStageCodegen, still map-side, payload column still pruned.
  */
trait MediaDecoder extends Serializable {
  def name: String

  /** Decode payload bytes to a fixed-dim feature vector. */
  def features(payload: Array[Byte], dim: Int): Array[Float]

  /** Downsample payload bytes by `factor` (the resample stand-in). */
  def resize(payload: Array[Byte], factor: Int): Array[Long]

  // catalyst bridges — what the planned Invoke actually calls
  final def featuresData(payload: Array[Byte], dim: Int): ArrayData =
    new GenericArrayData(features(payload, dim))
  final def resizeData(payload: Array[Byte], factor: Int): ArrayData =
    new GenericArrayData(resize(payload, factor))
}

/** The deterministic no-codec decoder (this container ships no
  * image/audio libraries): delegates to the compiled
  * [[Kernels.mediaFeatures]]/[[Kernels.poolBytes]] kernels, so the
  * stub JVM path and the planned StaticInvoke path share ONE
  * implementation and the oracle queries (q27, q52) stay exact.
  */
object StubDecoder extends MediaDecoder {
  override val name: String = "stub"
  override def features(payload: Array[Byte], dim: Int): Array[Float] =
    Kernels.mediaFeatures(payload, dim).toFloatArray()
  override def resize(payload: Array[Byte], factor: Int): Array[Long] =
    Kernels.poolBytes(payload, factor).toLongArray()
}

/** REAL pixel decoder over `javax.imageio` — PNG/JPEG/GIF/BMP readers
  * ship inside the JDK, so this is pure-JVM with no native libraries,
  * registered as the built-in type "imageio". It plans through the
  * same Invoke surface as any custom decoder; the stub remains the
  * default (oracle queries q27/q52 pin the stub kernels).
  *
  * `features(payload, dim)`: decode, then mean LUMINANCE (BT.601
  * 0.299R+0.587G+0.114B) over a `dim`-cell partition of the raster in
  * row-major order, normalized to [0,1] — a deterministic global
  * image descriptor. `resize(payload, factor)`: factor×factor block
  * mean luminance rounded to [0,255], row-major — a real downsample.
  *
  * Undecodable payloads (wrong magic, truncated stream) fall back to
  * the stub's byte-level kernels instead of throwing: one corrupt
  * object inside a 100 TB scan must degrade that row, not kill the
  * job. ImageIO's disk cache is disabled — executor tasks must not
  * contend on temp-file scratch for an in-memory decode.
  */
object ImageIoDecoder extends MediaDecoder {
  javax.imageio.ImageIO.setUseCache(false)

  override val name: String = "imageio"

  // NonFatal, not just IOException: imageio readers throw
  // IllegalArgumentException / ArrayIndexOutOfBounds / CMMException on
  // malformed streams — any of those must degrade the row, not the job
  private def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload)))
    catch { case scala.util.control.NonFatal(_) => None }

  private def lum(rgb: Int): Double =
    0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)

  override def features(payload: Array[Byte], dim: Int): Array[Float] =
    decode(payload) match {
      case None => StubDecoder.features(payload, dim)
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val sums = new Array[Double](dim)
        val counts = new Array[Long](dim)
        val n = w.toLong * h
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val cell = (((y.toLong * w + x) * dim) / n).toInt
            sums(cell) += lum(img.getRGB(x, y))
            counts(cell) += 1
            x += 1
          }
          y += 1
        }
        Array.tabulate(dim)(i =>
          if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat)
    }

  override def resize(payload: Array[Byte], factor: Int): Array[Long] =
    decode(payload) match {
      case None => StubDecoder.resize(payload, factor)
      case Some(img) =>
        val w = img.getWidth
        val h = img.getHeight
        val ow = math.max(1, w / factor)
        val oh = math.max(1, h / factor)
        val out = new Array[Long](ow * oh)
        var by = 0
        while (by < oh) {
          var bx = 0
          while (bx < ow) {
            var s = 0.0
            var cnt = 0
            var y = by * factor
            val yEnd = math.min((by + 1) * factor, h)
            val xEnd = math.min((bx + 1) * factor, w)
            while (y < yEnd) {
              var x = bx * factor
              while (x < xEnd) { s += lum(img.getRGB(x, y)); cnt += 1; x += 1 }
              y += 1
            }
            out(by * ow + bx) = math.round(s / cnt)
            bx += 1
          }
          by += 1
        }
        out
    }
}

/** Decoder registry: resolve by type string, user-local registrations
  * shadowing built-ins. Driver-side only by design — the resolved
  * instance is serialized into the plan, so nothing here needs to
  * exist on executors.
  */
object MediaDecoders {
  private val builders =
    scala.collection.concurrent.TrieMap[String, () => MediaDecoder](
      "stub" -> (() => StubDecoder),
      "imageio" -> (() => ImageIoDecoder))

  /** User-local decoder types shadow built-ins. */
  def register(tpe: String)(b: => MediaDecoder): Unit =
    builders(tpe) = () => b

  def resolve(tpe: String): MediaDecoder =
    builders.getOrElse(tpe, throw new IllegalArgumentException(
      s"unknown media decoder type '$tpe'; registered: ${builders.keys.toSeq.sorted.mkString(",")}"))()

  /** Plan `decoder.features(payload, dim)` as a codegen Invoke on the
    * shipped instance; the stub routes through its StaticInvoke kernel
    * (same implementation, tighter codegen, unchanged oracle plans).
    */
  private[ops] def featureCol(decoder: MediaDecoder, payload: Column, dim: Int): Column =
    if (decoder eq StubDecoder) Kernels.mediaFeaturesOf(payload, dim)
    else exprBridge.column(Invoke(
      Literal.fromObject(decoder, ObjectType(classOf[MediaDecoder])),
      "featuresData", ArrayType(FloatType, containsNull = false),
      Seq(exprBridge.expression(payload), exprBridge.expression(lit(dim))),
      Seq(BinaryType, IntegerType)))

  private[ops] def resizeCol(decoder: MediaDecoder, payload: Column, factor: Int): Column =
    if (decoder eq StubDecoder) Kernels.poolBytesOf(payload, factor)
    else exprBridge.column(Invoke(
      Literal.fromObject(decoder, ObjectType(classOf[MediaDecoder])),
      "resizeData", ArrayType(LongType, containsNull = false),
      Seq(exprBridge.expression(payload), exprBridge.expression(lit(factor))),
      Seq(BinaryType, IntegerType)))
}
