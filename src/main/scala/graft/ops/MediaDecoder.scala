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

/** Decoder registry: resolve by type string, user-local registrations
  * shadowing built-ins. Driver-side only by design — the resolved
  * instance is serialized into the plan, so nothing here needs to
  * exist on executors.
  */
object MediaDecoders {
  private val builders =
    scala.collection.concurrent.TrieMap[String, () => MediaDecoder](
      "stub" -> (() => StubDecoder))

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
