package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Frequent-itemset mining, the pair (2-itemset) step — the
  * A-Priori candidate-prune pattern (Agrawal–Srikant, VLDB '94; public
  * algorithm): a pair can only be frequent if BOTH its members are, so
  * the corpus is first reduced to frequent-token occurrences and only
  * those expand into pairs. That prune is the entire scale story —
  * pair expansion over a document is quadratic in its token count, but
  * quadratic in its FREQUENT token count after the prune, and the
  * frequent-token table (vocabulary-sized, support-filtered) is the
  * only thing joined against the corpus.
  *
  * Shuffle inventory: one distinct-(doc, token) aggregation, one
  * vocabulary-sized support count, one semi-join of the occurrence
  * stream against the frequent set, one per-doc set collection, one
  * pair count — every key either doc_id or token/pair, nothing
  * corpus×corpus. The i<j pair expansion happens map-side from each
  * doc's sorted frequent-token array.
  */
object Itemsets {

  /** Frequent token pairs with support ≥ minSupport (token_a < token_b
    * lexicographically; presence counts — a token twice in one doc
    * counts once, the standard market-basket semantics).
    *
    * @return (token_a, token_b, support)
    */
  def frequentPairs(docs: DataFrame, idCol: String, textCol: String,
      minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"need minSupport >= 1: $minSupport")
    val dtok = docs
      .select(col(idCol).as("__doc"),
        explode(array_distinct(split(col(textCol), " ", -1))).as("token"))
      .filter(col("token") =!= "")
    val frequent = dtok.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= minSupport)
      .select(col("token"))
    // the i<j expansion is a compiled kernel (one pass, exact output
    // allocation) — the interpreted transform/slice HOF form re-sliced
    // the set per element and ran outside codegen, measured 3× slower
    // on the dense-vocabulary case
    dtok
      .join(frequent, Seq("token"), "left_semi")
      .groupBy(col("__doc"))
      .agg(sort_array(collect_set(col("token"))).as("__ts"))
      .select(explode(
        graft.functions.Kernels.stringPairsOf(col("__ts"))).as("p"))
      .groupBy(col("p.a").as("token_a"), col("p.b").as("token_b"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }
}
