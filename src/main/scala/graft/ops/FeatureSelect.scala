package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Discriminative-feature selection over a labeled corpus — the
  * χ² (chi-square) token test every text classifier / domain-filter
  * pipeline runs to find the vocabulary that separates one slice of a
  * corpus from the rest (Manning–Raghavan–Schütze IR book §13.5.2;
  * public formula). In a training-data pipeline this is how you mine
  * "which tokens mark this source/domain" before building domain
  * classifiers or contamination filters.
  *
  * Integer-exact by construction: with per-(class, token) document
  * counts a (in-class, with token), b = n_c − a, c = df − a,
  * d = N − n_c − c, the statistic
  *
  *   χ²·2²⁰ = ⌊2²⁰ · N · (ad − bc)² / ((a+b)(c+d)(a+c)(b+d))⌋
  *
  * is one integer division of decimal(38,0) products — both engines
  * divide identical integers, so the selection set is bit-stable. No
  * float, no log.
  *
  * Scale shape: one distinct-(doc, token) explode feeding ONE
  * aggregation to the (class, token) contingency counts; the token
  * document-frequency table is a re-aggregation of those already
  * reduced rows (vocabulary-sized, not corpus-sized), and the class
  * totals are a |classes|-row broadcast. Nothing doc×doc, nothing
  * vocab×vocab.
  */
object FeatureSelect {

  /** χ²-scored (class, token) pairs with support floors.
    *
    * @param minDf    drop tokens seen in fewer than this many docs
    *                  (kills hapax noise before the stats table)
    * @param minChi2Q keep pairs with χ²·2²⁰ at or above this — the
    *                  selection threshold (e.g. 3.841·2²⁰ ≈ 4 027 702
    *                  for p < 0.05 at 1 d.f.)
    * @return (class, token, n_in_class, df, chi2_q) for every OBSERVED
    *         (class, token) cell — a class that never contains a token
    *         emits no row for it (the symmetric in-class rows already
    *         carry that evidence; materializing the absent cells would
    *         be a |classes|×|vocab| blow-up). Tokens present in EVERY
    *         document are excluded (their χ² is undefined — zero
    *         denominator — and they discriminate nothing)
    */
  def chiSquareTokens(docs: DataFrame, textCol: String, classCol: String,
      idCol: String, minDf: Long, minChi2Q: Long): DataFrame = {
    require(minDf >= 1, s"need minDf >= 1: $minDf")
    val dec = "decimal(38,0)"
    val dtok = docs
      .select(col(idCol).as("__doc"), col(classCol).as("cls"),
        explode(array_distinct(split(col(textCol), " ", -1))).as("token"))
      .filter(col("token") =!= "")
    val clsTok = dtok.groupBy(col("cls"), col("token"))
      .agg(count(lit(1)).as("a"))
    val df_ = clsTok.groupBy(col("token")).agg(sum(col("a")).as("df"))
      .filter(col("df") >= minDf)
    val clsN = docs.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("n_cls"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    clsTok
      .join(df_, Seq("token"))
      .join(broadcast(clsN), Seq("cls"))
      .crossJoin(broadcast(n))
      .filter(col("df") < col("n_total")) // in-every-doc ⇒ zero denominator
      .select(col("cls"), col("token"), col("a"), col("df"),
        col("n_cls"), col("n_total"))
      .withColumn("b", (col("n_cls") - col("a")).cast(dec))
      .withColumn("c", (col("df") - col("a")).cast(dec))
      .withColumn("d",
        (col("n_total") - col("n_cls") - col("df") + col("a")).cast(dec))
      .withColumn("ad_bc",
        col("a").cast(dec) * col("d") - col("b") * col("c"))
      .withColumn("chi2_q", expr(
        s"""CAST((CAST(1048576 AS $dec) * CAST(n_total AS $dec) * ad_bc * ad_bc)
            div (CAST(n_cls AS $dec) * CAST(n_total - n_cls AS $dec)
              * CAST(df AS $dec) * CAST(n_total - df AS $dec)) AS BIGINT)"""))
      .filter(col("chi2_q") >= minChi2Q)
      .select(col("cls"), col("token"), col("a").as("n_in_class"),
        col("df"), col("chi2_q"))
  }
}
