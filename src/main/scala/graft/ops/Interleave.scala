package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextKernels

/** Deterministic weighted interleaving of multiple corpus sources into
  * one training-stream order — the "mixture schedule" a trainer
  * consumes (e.g. web:3, books:1), computed as data instead of drawn
  * at read time.
  *
  * Model: within each source, documents get a seeded pseudo-random
  * rank r = 1,2,… (hex60 hash order — no `rand()`, so the schedule is
  * reproducible). A source with integer weight w emits its r-th
  * document at virtual time r·(L/w) where L = lcm(weights): a
  * weight-3 source fires 3× as often as a weight-1 source, exactly and
  * integer-exactly (no float accumulation drift at position 10^9 —
  * the reason for the lcm scaling). The global schedule is the merge
  * of all sources by virtual time. This is deficit-round-robin
  * applied to corpus mixing: over any window the realized mix tracks
  * the weights within one document per source.
  */
object Interleave {

  /** First `topN` positions of the schedule:
    * (position, vtime, source, id).
    *
    * Sources not named in `weights` are treated as weight 0 —
    * excluded from the schedule entirely (the mixture IS the list of
    * weighted sources).
    *
    * Shape at scale: the per-source rank is a distributed window
    * (partitioned by source); the prune `r ≤ topN` is exact — the
    * first topN global positions contain at most topN documents from
    * any single source, and always that source's LOWEST ranks — so
    * the final total sort orders at most topN·n_sources rows, bounded
    * and tiny regardless of corpus size. For a full-corpus schedule
    * (topN = corpus size) the global sort is a range-partitioned
    * sort-by-vtime, which Spark distributes; the prune just stops
    * being selective.
    */
  def schedule(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Int],
      topN: Int,
      salt: String = "mix"): DataFrame = {
    val (ranked, step) = rankAndStep(df, sourceCol, idCol, weights, salt)
    val pruned = ranked
      .filter(col("__r") <= topN)
      .withColumn("vtime", col("__r") * step)
    val global = Window.orderBy(col("vtime"), col(sourceCol), col(idCol))
    pruned
      .withColumn("position", row_number().over(global).cast("long"))
      .filter(col("position") <= topN)
      .select(col("position"), col("vtime"), col(sourceCol), col(idCol))
  }

  /** Epoch-aware schedule: like [[schedule]], but a source whose
    * documents run out WRAPS AROUND — its (n+1)-th slot re-emits its
    * rank-1 document as epoch 2 — so a high-weight small source is
    * oversampled across epochs instead of exhausted (the standard
    * corpus-mixing mechanic for up-weighting scarce high-quality
    * sources).
    *
    * Construction: each weighted source gets slot indices m = 1..topN
    * (more can never reach the global top topN); slot m carries
    * vtime = m·(L/w), epoch = (m-1) div n_s + 1, and re-joins the
    * source's rank ((m-1) mod n_s)+1 document. The slot frame is
    * |sources|·topN rows REGARDLESS of corpus size and broadcasts to
    * the ranked corpus, so the only full-data operations are the
    * per-source rank window and one broadcast-probe join.
    */
  def epochSchedule(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Int],
      topN: Int,
      salt: String = "mix"): DataFrame = {
    val (ranked, step) = rankAndStep(df, sourceCol, idCol, weights, salt)
    val counts = ranked.groupBy(col(sourceCol)).agg(max(col("__r")).as("__ns"))
    val slots = counts
      .select(col(sourceCol), col("__ns"),
        explode(sequence(lit(1L), lit(topN.toLong))).as("__m"))
      .withColumn("vtime", col("__m") * step)
      .withColumn("epoch", expr("(__m - 1) div __ns + 1")) // integral div
      .withColumn("__sr", pmod(col("__m") - 1, col("__ns")) + 1)
      .drop("__ns")
    val joined = broadcast(slots)
      .join(ranked.withColumnRenamed(sourceCol, "__src"),
        col(sourceCol) === col("__src") && col("__sr") === col("__r"))
    val global = Window.orderBy(col("vtime"), col(sourceCol), col("__m"))
    joined
      .withColumn("position", row_number().over(global).cast("long"))
      .filter(col("position") <= topN)
      .select(col("position"), col("vtime"), col("epoch"),
        col(sourceCol), col(idCol))
  }

  /** The shared front half of both schedules: per-source seeded rank
    * plus the integer step column. One definition carries the three
    * load-bearing invariants — the lcm-exact step scaling, the
    * weight-0 exclusion of unlisted sources (whose null step would
    * otherwise sort FIRST and seize the schedule head), and the
    * salted-hex60 + id tie-break that makes ranks deterministic —
    * which is also what keeps [[epochSchedule]] provably equal to
    * [[schedule]] before the first wrap.
    */
  private def rankAndStep(
      df: DataFrame,
      sourceCol: String,
      idCol: String,
      weights: Map[String, Int],
      salt: String): (DataFrame, org.apache.spark.sql.Column) = {
    require(weights.nonEmpty && weights.values.forall(_ > 0),
      s"weights must be positive: $weights")
    val lcm = weights.values.toSeq.distinct.foldLeft(1L) { (acc, w) =>
      val g = BigInt(acc).gcd(BigInt(w)).toLong
      acc / g * w
    }
    // steps as a literal map: source -> lcm/weight (exact by construction)
    val stepEntries = weights.toSeq.sortBy(_._1)
      .flatMap { case (s, w) => Seq(lit(s), lit(lcm / w)) }
    val step = element_at(map(stepEntries: _*), col(sourceCol))
    val perSource = Window.partitionBy(col(sourceCol))
      .orderBy(TextKernels.hex60(concat(lit(s"$salt:"), col(idCol).cast("string"))),
        col(idCol))
    val ranked = df.filter(col(sourceCol).isInCollection(weights.keys.toSeq))
      .withColumn("__r", row_number().over(perSource).cast("long"))
    (ranked, step)
  }

  /** Realized-mix audit over the first `topN` positions: per source,
    * how many slots it received vs its weight share — the check that a
    * schedule actually tracks its weights.
    */
  def realizedMix(scheduled: DataFrame, sourceCol: String): DataFrame =
    scheduled.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_slots"),
        min(col("position")).as("first_position"),
        max(col("position")).as("last_position"))
}
