package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Blocked fuzzy (edit-distance) matching: candidate pairs come
  * from an EQUI-join on blocking keys; the quadratic edit-distance
  * comparison runs only inside a block — never an all-pairs product.
  *
  * Scale notes: the block join is a plain shuffle (or broadcast) hash
  * join on the blocking columns; `levenshtein` is a codegen'd builtin
  * evaluated post-join, so the whole comparison stage stays inside
  * WholeStageCodegen. Block-size skew is the operator's knob: pick
  * blocking columns whose largest block is shuffle-partition sized
  * (the same discipline as Dedup's LSH bands; a hot block can be
  * tightened by adding a column or pre-capped with
  * CappedCollect-style counting).
  */
object FuzzyJoin {

  /** i<j pairs of `df` rows sharing `blockCols`, with
    * levenshtein(textCol) ≤ maxDist. Output: id_a, id_b, dist plus the
    * blocking columns.
    */
  def blockedLevenshtein(
      df: DataFrame, idCol: String, textCol: String,
      blockCols: Seq[String], maxDist: Int): DataFrame = {
    val left = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_a")) :+ col(textCol).as("__ta"): _*)
    val right = df.select(
      (blockCols.map(col) :+ col(idCol).as("id_b")) :+ col(textCol).as("__tb"): _*)
    left.join(right, blockCols)
      .filter(col("id_a") < col("id_b"))
      // length bound first: |len(a)-len(b)| <= maxDist is necessary for
      // the edit distance, O(1) vs O(|a|·|b|) — short-circuits most
      // pairs before levenshtein (same rewrite EditDistancePrefilter
      // applies to raw SQL predicates)
      .filter(abs(length(col("__ta")) - length(col("__tb"))) <= maxDist)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .filter(col("dist") <= maxDist)
      .select(blockCols.map(col) :+ col("id_a") :+ col("id_b") :+ col("dist"): _*)
  }
}
