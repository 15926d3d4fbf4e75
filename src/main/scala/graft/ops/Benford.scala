package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Benford first-digit audit — the classic forensic data-quality
  * screen (Newcomb–Benford law; public): naturally occurring monetary
  * amounts have leading digit d with probability log₁₀(1 + 1/d), and a
  * per-group digit histogram that deviates hard from that curve flags
  * synthetic, truncated, or corrupted feeds before they poison
  * downstream aggregates.
  *
  * Integer-exact: the expected masses are the PRE-QUANTIZED literals
  * ⌊2²⁰·log₁₀(1+1/d)⌋ (the same nine constants on both engines — no
  * runtime log), observed mass is ⌊2²⁰·n/total⌋ by integer division,
  * and the deviation is their difference. The first digit comes from
  * the decimal string of the integer cent amount — no float log10 /
  * pow digit extraction.
  *
  * Scale shape: one map-side digit extraction riding the scan, one
  * |groups|×9-row aggregation, and a |groups|-row broadcast for the
  * totals. Nothing else.
  */
object Benford {

  /** ⌊2²⁰·log₁₀(1+1/d)⌋ for d = 1..9. */
  private val BenfordQ: Seq[Long] =
    Seq(315652L, 184645L, 131007L, 101617L, 83027L, 70198L, 60808L, 53637L, 47980L)

  /** Per-(group, first digit) observed-vs-Benford masses over a
    * positive integral amount column.
    *
    * @return (groupCol, digit 1–9, n, total, obs_q, benford_q, dev_q)
    *         — dev_q = obs_q − benford_q, units of 2⁻²⁰; digits a
    *         group never produced still appear with n = 0 so the
    *         deviation vector always has all nine components
    */
  def firstDigitAudit(df: DataFrame, groupCol: String,
      amountCol: String): DataFrame = {
    val counts = df
      .filter(col(amountCol) > 0)
      .select(col(groupCol),
        substring(col(amountCol).cast("long").cast("string"), 1, 1)
          .cast("long").as("digit"))
      .groupBy(col(groupCol), col("digit"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col(groupCol)).agg(sum(col("n")).as("total"))
    val digits = totals
      .select(col(groupCol), col("total"),
        explode(array((1 to 9).map(d => lit(d.toLong)): _*)).as("digit"))
    digits
      .join(counts, Seq(groupCol, "digit"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
      .withColumn("obs_q", expr("(1048576 * n) div total"))
      .withColumn("benford_q",
        element_at(array(BenfordQ.map(lit): _*), col("digit").cast("int")))
      .select(col(groupCol), col("digit"), col("n"), col("total"),
        col("obs_q"), col("benford_q"),
        (col("obs_q") - col("benford_q")).as("dev_q"))
  }
}
