package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{expr => bridge}

/** [EXT] Bloom-filter join pre-filtering — the standard 100 TB join
  * reduction: build a bloom filter over the (small) build side's keys,
  * broadcast the filter bytes, and drop probe-side rows that cannot
  * match BEFORE they reach the join's shuffle. With a selective build
  * side the probe shuffle shrinks by the non-match fraction; false
  * positives only cost a little extra shuffle and are eliminated by
  * the join itself, so results are IDENTICAL to the plain join — which
  * is exactly what the oracle checks.
  *
  * Spark's own InjectRuntimeFilter applies this automatically under
  * AQE in narrow circumstances (shuffle-join, creation-side
  * thresholds); this operator makes the technique explicit and
  * composable — usable ahead of aggregations, against bucketed-table
  * scans, or where the optimizer's heuristics decline.
  *
  * Uses Spark's native `BloomFilterAggregate`/`BloomFilterMightContain`
  * expressions (the runtime-filter machinery) over `xxhash64` of the
  * key — both sides codegen'd.
  */
object BloomJoin {

  /** Aggregate a bloom filter (as bytes) over `key`. */
  def bloomAgg(key: Column, expectedItems: Long): Column =
    bridge.column(
      new BloomFilterAggregate(bridge.expression(xxhash64(key)), expectedItems)
        .toAggregateExpression())

  /** `fact` rows whose `factKey` might match a `dim` key. The bloom
    * aggregation rides as an uncorrelated scalar subquery — Spark
    * executes it once and folds the filter bytes into the probe as a
    * literal (`might_contain` requires a constant/scalar-subquery
    * filter; this is the same plan shape InjectRuntimeFilter builds).
    * The probe is a map-side codegen'd filter: no shuffle of `fact` at
    * all. A NULL filter (empty build side) probes to NULL → dropped —
    * correct, since an empty build side has no matches.
    */
  def prefilter(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val bf = dim.agg(bloomAgg(col(dimKey), expectedItems).as("__bf"))
    val sub = org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
      bf.queryExecution.analyzed)
    fact.filter(bridge.column(BloomFilterMightContain(
      sub, bridge.expression(xxhash64(col(factKey))))))
  }

  /** Inner equi-join with the probe side bloom-prefiltered. Result is
    * bit-identical to `fact.join(dim, factKey === dimKey)` — the join
    * removes bloom false positives. Both sides are ALIASED and the
    * keys alias-qualified: `pre(factKey) === dim(dimKey)` resolves to
    * one attribute when fact and dim share lineage (a self-join to
    * find within-set key overlap), which Spark either rejects as
    * ambiguous or folds to always-true.
    */
  def innerWithBloom(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long = 1000000L): DataFrame = {
    val pre = prefilter(fact, dim, factKey, dimKey, expectedItems)
      .alias("__bloom_probe")
    val build = dim.alias("__bloom_build")
    pre.join(build,
      org.apache.spark.sql.functions.col(s"__bloom_probe.$factKey") ===
        org.apache.spark.sql.functions.col(s"__bloom_build.$dimKey"))
  }
}
