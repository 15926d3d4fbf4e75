package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.types._

import graft.functions.Kernels

/** SQL surface for the [EXT] kernels, registered through the standard
  * `SparkSessionExtensions` hook:
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  *   SELECT graft_simhash60(text), graft_minhash(text, 16, 3) FROM docs
  * }}}
  *
  * For an already-running session (extensions bind at SparkContext
  * creation), `GraftExtensions.register(spark)` installs the same
  * functions as temp functions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    (GraftExtensions.descriptions ++
        graft.functions.SketchAgg.sqlFunctions).foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(Kernels.getClass.getName, name), builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.EditDistancePrefilter)
  }
}

object GraftExtensions {

  private def invoke(dt: DataType, fn: String, args: Seq[Expression],
      in: Seq[DataType]): Expression =
    StaticInvoke(Kernels.getClass, dt, fn, args, in)

  private[graft] val descriptions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_minhash" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "minhashSig", es,
        Seq(StringType, IntegerType, IntegerType))),
    "graft_shingles" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(StringType, containsNull = false), "wordShingles", es,
        Seq(StringType, IntegerType))),
    "graft_simhash60" -> ((es: Seq[Expression]) =>
      invoke(LongType, "simhash60", es, Seq(StringType))),
    "graft_shingle_hashes" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "shingleHashes60", es,
        Seq(StringType, IntegerType))),
    "graft_pairs" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))), containsNull = false),
        "sortedPairs", es, Seq(ArrayType(LongType)))),
    "graft_string_pairs" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(StructType(Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false))), containsNull = false),
        "stringPairs", es, Seq(ArrayType(StringType)))),
    "graft_fingerprint" -> ((es: Seq[Expression]) =>
      invoke(LongType, "fingerprint", es, Seq(StringType))),
    "graft_cosine" -> ((es: Seq[Expression]) =>
      invoke(DoubleType, "cosine",
        es.map(e => Cast(e, ArrayType(DoubleType))),
        Seq(ArrayType(DoubleType), ArrayType(DoubleType)))),
    "graft_media_features" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(FloatType, containsNull = false), "mediaFeatures", es,
        Seq(BinaryType, IntegerType))),
    "graft_pool_bytes" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "poolBytes", es,
        Seq(BinaryType, IntegerType))),
    "graft_pair_keys" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "sortedPairKeys", es,
        Seq(ArrayType(LongType)))),
    "graft_byte_histogram" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "byteHistogram", es,
        Seq(BinaryType, IntegerType))),
    "graft_dhash60" -> ((es: Seq[Expression]) =>
      invoke(LongType, "dhash60", es, Seq(BinaryType))),
    // [total_hits, phrases_hit] of a '\n'-packed phrase list:
    // `SELECT graft_phrase_scan(text, 'fast key\nslow scan') FROM docs`
    "graft_phrase_scan" -> ((es: Seq[Expression]) =>
      invoke(ArrayType(LongType, containsNull = false), "phraseScan", es,
        Seq(StringType, StringType))))

  /** Install into a live session: temp functions + optimizer rule. */
  def register(spark: SparkSession): Unit = {
    (descriptions ++ graft.functions.SketchAgg.sqlFunctions).foreach {
      case (name, builder) =>
        org.apache.spark.sql.graft.expr.registerTempFunction(spark, name, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(graft.plans.EditDistancePrefilter))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.EditDistancePrefilter
  }
}
