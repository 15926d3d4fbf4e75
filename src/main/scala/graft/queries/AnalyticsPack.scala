package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** [EXT] Pipeline-analytics operators a training-data run leans on
  * beyond the relational core: sessionization, hierarchical rollups,
  * exact quantiles, pivots, blocked fuzzy matching, ordered list
  * aggregation, deterministic argmax, and sketches.
  *
  * Cross-engine rules (same as the other packs): sums accumulate in
  * decimal(18,2) and output double; timestamps compare as microsecond
  * longs (exact integers), never float seconds; every window has a
  * unique tie-break so the total order is engine-portable. Sketch
  * estimates (q46) are implementation-defined per engine, so that
  * query ships rows-only (no oracle SQL) by design.
  */
object AnalyticsPack {

  private val T = OracleSql.T

  /** Gap-based sessionization of the events stream (ops.Sessionize):
    * one shuffle on user_id, one window pass; 30-minute gap.
    */
  private val q39 = QueryDef(
    "q39_sessionize",
    (s, dir) => graft.ops.Sessionize.profile(
      Tables.events(s, dir), "user_id", "ts", "event_id",
      maxGapUs = 1800L * 1000000L),
    Some("""WITH se AS (
        SELECT user_id,
          sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_seq,
          ts FROM (
            SELECT user_id, event_id, ts,
              epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events)),
      per AS (SELECT user_id, session_seq, count(*) AS n,
          max(epoch_us(ts)) - min(epoch_us(ts)) AS dur_us
        FROM se GROUP BY user_id, session_seq)
      SELECT user_id, count(*) AS n_sessions, sum(n)::BIGINT AS n_events,
        max(n) AS max_session_events, max(dur_us) AS max_session_dur_us
      FROM per GROUP BY user_id"""))

  /** Hierarchical ROLLUP over (returnflag, linestatus): Spark's
    * `rollup` = one pass expanding grouping sets, partial-aggregated
    * map-side like any hash aggregate.
    */
  private val q40 = QueryDef(
    "q40_rollup",
    (s, dir) => Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("n_rows"), col("sum_qty")),
    Some("""SELECT coalesce(l_returnflag, 'ALL') AS flag,
        coalesce(l_linestatus, 'ALL') AS status,
        count(*) AS n_rows,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"""))

  /** Exact interpolated quantiles per group: Spark `percentile` and
    * DuckDB `quantile_cont` share the (n-1)·p lower+frac·(upper−lower)
    * definition over doubles, so results are bit-comparable.
    */
  private val q41 = QueryDef(
    "q41_quantiles",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(expr("percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.9D))").as("qs"))
      .select(col("o_orderpriority"),
        col("qs")(0).as("p25"), col("qs")(1).as("p50"),
        col("qs")(2).as("p75"), col("qs")(3).as("p90")),
    Some("""SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.25) AS p25,
        quantile_cont(o_totalprice, 0.50) AS p50,
        quantile_cont(o_totalprice, 0.75) AS p75,
        quantile_cont(o_totalprice, 0.90) AS p90
      FROM orders GROUP BY o_orderpriority"""))

  /** Pivot order counts by status into columns — Spark `pivot` with
    * explicit values (no extra distinct-values pass, plan stays one
    * hash aggregate).
    */
  private val q42 = QueryDef(
    "q42_pivot",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p")),
    Some("""SELECT o_orderpriority,
        count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
        count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
        count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
      FROM orders GROUP BY o_orderpriority"""))

  /** Blocked fuzzy match on part names (ops.FuzzyJoin): equi-join on
    * (brand, size) blocks, codegen'd levenshtein inside the block only.
    */
  private val q43 = QueryDef(
    "q43_fuzzy_join",
    (s, dir) => graft.ops.FuzzyJoin.blockedLevenshtein(
      Tables.part(s, dir), "p_partkey", "p_name",
      blockCols = Seq("p_brand", "p_size"), maxDist = 24)
      .select(col("p_brand"), col("p_size").cast("long").as("p_size"),
        col("id_a"), col("id_b"), col("dist").cast("long").as("dist")),
    Some("""SELECT a.p_brand, a.p_size::BIGINT AS p_size,
        a.p_partkey AS id_a, b.p_partkey AS id_b,
        levenshtein(a.p_name, b.p_name)::BIGINT AS dist
      FROM part a JOIN part b
        ON a.p_brand = b.p_brand AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 24"""))

  /** Ordered list aggregation: nations per region as a sorted CSV —
    * collect_set + array_sort makes the list order engine-independent.
    */
  private val q44 = QueryDef(
    "q44_list_agg",
    (s, dir) => Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", array_sort(collect_set(col("n_name")))).as("nations"),
        count_distinct(col("n_name")).as("n_nations")),
    Some("""SELECT r_name,
        array_to_string(list_sort(list(DISTINCT n_name)), ',') AS nations,
        count(DISTINCT n_name) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name"""))

  /** Deterministic argmax per group: max over a (value, key, payload)
    * struct gives a total lexicographic order — no ties, no
    * first()-style nondeterminism, one hash aggregate.
    */
  private val q45 = QueryDef(
    "q45_argmax",
    (s, dir) => Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(max(struct(col("s_acctbal"), col("s_suppkey"), col("s_name"))).as("m"))
      .select(col("n_name"), col("m.s_name").as("top_supplier"),
        col("m.s_acctbal").as("top_acctbal")),
    Some("""SELECT n_name, s_name AS top_supplier, s_acctbal AS top_acctbal
      FROM (SELECT n_name, s_name, s_acctbal,
          row_number() OVER (PARTITION BY n_name
            ORDER BY s_acctbal DESC, s_suppkey DESC) AS rk
        FROM supplier JOIN nation ON s_nationkey = n_nationkey)
      WHERE rk = 1"""))

  /** Sketches: HyperLogLog distinct counts + approximate quantiles per
    * group. Raw estimates are engine-specific by nature, so the
    * oracle-checked output carries (a) the exact values — comparable
    * cross-engine like q41 — and (b) booleans asserting each estimate
    * landed within a generous error bound of the exact value computed
    * in the SAME plan (HLL rsd 0.01 and percentile accuracy 10000 are
    * both far inside 5%); the oracle emits the exact columns plus
    * literal TRUE, so any out-of-bound sketch flips a boolean and
    * fails the hash. The ScalaTest spec pins the tighter configured
    * error bounds on the raw estimates.
    *
    * Plan shape: the exact distinct count runs as its OWN two-level
    * aggregation (distinct pairs, then count) broadcast-joined back on
    * the tiny group key. Mixing count_distinct into the sketch
    * aggregation triggers Catalyst's distinct-rewrite Expand, which
    * rebuilds the percentile/HLL TypedImperative buffers once per
    * (group × custkey) instead of per group — measured 10× slower at
    * sf0.1 and quadratically worse with cardinality.
    */
  private val q46 = QueryDef(
    "q46_sketches",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val sketches = o.groupBy(col("o_orderpriority"))
        .agg(
          approx_count_distinct(col("o_custkey"), rsd = 0.01).as("est_customers"),
          expr("approx_percentile(o_totalprice, array(0.5D, 0.9D), 10000)").as("ap"),
          expr("percentile(o_totalprice, array(0.5D, 0.9D))").as("ep"))
      val exactDistinct = o.select(col("o_orderpriority"), col("o_custkey"))
        .distinct()
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("exact_customers"))
      sketches.join(broadcast(exactDistinct), Seq("o_orderpriority"))
    }
      .select(
        col("o_orderpriority"),
        col("exact_customers"),
        col("ep")(0).as("exact_p50"),
        col("ep")(1).as("exact_p90"),
        (abs(col("est_customers") - col("exact_customers")).cast("double") /
          col("exact_customers") <= 0.05).as("hll_within_5pct"),
        (abs(col("ap")(0) - col("ep")(0)) / col("ep")(0) <= 0.05)
          .as("p50_within_5pct"),
        (abs(col("ap")(1) - col("ep")(1)) / col("ep")(1) <= 0.05)
          .as("p90_within_5pct")),
    Some("""SELECT o_orderpriority,
        count(DISTINCT o_custkey) AS exact_customers,
        quantile_cont(o_totalprice, 0.5) AS exact_p50,
        quantile_cont(o_totalprice, 0.9) AS exact_p90,
        TRUE AS hll_within_5pct, TRUE AS p50_within_5pct,
        TRUE AS p90_within_5pct
      FROM orders GROUP BY o_orderpriority"""))

  /** BPE-ish subword token counting: regex units (letter runs, digit
    * runs, single punctuation) approximate a byte-pair tokenizer's
    * pre-tokenization — the standard cheap token estimator for corpus
    * sizing. The pattern uses only character classes + alternation, the
    * regex subset where Java and RE2-family engines agree exactly.
    */
  private val q47 = QueryDef(
    "q47_token_count",
    (s, dir) => {
      val units = regexp_extract_all(col("text"), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))
      val words = regexp_extract_all(col("text"), lit("[a-zA-Z]+"), lit(0))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(units).cast("long").as("n_units"),
        size(words).cast("long").as("n_words"),
        (col("n_chars").cast("double") / size(units)).as("chars_per_unit"))
    },
    Some("""SELECT doc_id,
        len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT AS n_units,
        len(regexp_extract_all(text, '[a-zA-Z]+'))::BIGINT AS n_words,
        n_chars::DOUBLE / len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))
          AS chars_per_unit
      FROM documents"""))

  /** Single-pass table profiler (ops.Profile) over orders: one scan
    * computes every column's null/distinct/min/max stats, then the
    * wide row explodes into per-column rows map-side. Min/max route by
    * type (numerics+timestamps as double, strings as strings) — never
    * stringified numerics, whose formatting is engine-specific.
    */
  private val q48 = QueryDef(
    "q48_profile",
    (s, dir) => graft.ops.Profile.table(Tables.orders(s, dir)),
    Some {
      val num = Seq("o_orderkey" -> "o_orderkey", "o_custkey" -> "o_custkey",
        "o_totalprice" -> "o_totalprice", "o_orderdate" -> "epoch_us(o_orderdate)")
      val str = Seq("o_orderstatus", "o_orderpriority")
      val parts =
        num.map { case (n, e) =>
          s"""SELECT '$n' AS col_name, count(*) AS n_rows,
            count(*) FILTER (WHERE $n IS NULL) AS n_nulls,
            count(DISTINCT $n) AS n_distinct,
            min($e)::DOUBLE AS min_num, max($e)::DOUBLE AS max_num,
            NULL::VARCHAR AS min_str, NULL::VARCHAR AS max_str FROM orders"""
        } ++
        str.map { n =>
          s"""SELECT '$n', count(*), count(*) FILTER (WHERE $n IS NULL),
            count(DISTINCT $n), NULL::DOUBLE, NULL::DOUBLE,
            min($n), max($n) FROM orders"""
        }
      parts.mkString(" UNION ALL ")
    })

  /** One k-means Lloyd iteration over the embeddings corpus
    * (Similarity.kmeansStep): map-side assignment to 8 literal
    * centroids, one (cell, dim) aggregation with exact quantized sums.
    * The oracle replays the assignment with a per-row argmax window
    * and zips parallel unnests for the dimension explode.
    */
  private val q49 = QueryDef(
    "q49_kmeans_step",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      graft.ops.Similarity.kmeansStep(e, "embedding", cents)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      asg AS (SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${OracleSql.cos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      ex AS (SELECT cell_id,
          unnest(range(0, len(embedding))) AS dim,
          unnest(list_transform(embedding, x -> x::DOUBLE)) AS v
        FROM asg)
      SELECT cell_id, dim, count(*) AS n_members,
        (sum(floor(v * 1000000)::BIGINT)::DOUBLE / 1000000) / count(*) AS mean
      FROM ex GROUP BY cell_id, dim"""))

  /** Analytic window frames: 3-row moving sum/avg of a customer's
    * order history plus lag diff, percent_rank and ntile — every
    * window shares one (custkey) shuffle and a (date, key)-tie-broken
    * total order, so frame contents are partitioning-independent.
    */
  private val q50 = QueryDef(
    "q50_window_frames",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val frame = w.rowsBetween(-2, Window.currentRow)
      val price = col("o_totalprice").cast("decimal(18,2)")
      Tables.orders(s, dir).select(
        col("o_custkey"), col("o_orderkey"),
        sum(price).over(frame).cast("double").as("moving_sum3"),
        (price - lag(price, 1).over(w)).cast("double").as("delta_prev"),
        percent_rank().over(w).as("pct_rank"),
        ntile(4).over(w).cast("long").as("quartile"))
    },
    Some("""SELECT o_custkey, o_orderkey,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
        CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
          lag(CAST(o_totalprice AS DECIMAL(18,2)), 1)
          OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE)
          AS delta_prev,
        percent_rank() OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey) AS pct_rank,
        ntile(4) OVER (PARTITION BY o_custkey
          ORDER BY o_orderdate, o_orderkey)::BIGINT AS quartile
      FROM orders"""))

  /** Deterministic stratified sample (ops.Sample): first 50 orders per
    * priority in md5-hash order — balanced, unbiased, and a pure
    * function of the data (reproducible across engines and
    * partitionings, unlike RNG sampling).
    */
  private val q53 = QueryDef(
    "q53_stratified_sample",
    (s, dir) => graft.ops.Sample.stratifiedByHash(
      Tables.orders(s, dir), Seq("o_orderpriority"), "o_orderkey", n = 50)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice")),
    Some(s"""SELECT o_orderkey, o_orderpriority, o_totalprice FROM (
        SELECT o_orderkey, o_orderpriority, o_totalprice,
          row_number() OVER (PARTITION BY o_orderpriority
            ORDER BY ${OracleSql.hex60("o_orderkey::VARCHAR")} ASC, o_orderkey ASC) AS rk
        FROM orders) WHERE rk <= 50"""))

  /** Train/test contamination check (decontamination): deterministic
    * hash split (q38's rule), then NEAR-dup collisions across the
    * split boundary via the minhash band join
    * (Dedup.incrementalCandidates) — test docs whose near-duplicate
    * also sits in train leak evaluation data into training. Exact
    * contamination is the degenerate case (identical text ⇒ identical
    * bands), so this subsumes an md5 join.
    */
  private val q57 = QueryDef(
    "q57_contamination",
    (s, dir) => {
      val bucket = pmod(graft.functions.TextKernels.hex60(col("doc_id").cast("string")), lit(100L))
      val docs = Tables.documents(s, dir)
        .withColumn("split", when(bucket < 80, lit("train")).otherwise(lit("test")))
      graft.ops.Dedup.incrementalCandidates(
        docs.filter(col("split") === "train"),
        docs.filter(col("split") === "test"),
        "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 4)
        .groupBy(col("batch_id").as("test_id"))
        .agg(count(lit(1)).as("n_train_neardups"), min(col("corpus_id")).as("first_train_id"))
    },
    Some(s"""WITH d AS (SELECT doc_id, text,
        CASE WHEN ${OracleSql.hex60("doc_id::VARCHAR")} % 100 < 80
          THEN 'train' ELSE 'test' END AS split FROM documents),
      sh AS (SELECT doc_id, split,
        list_distinct(list_transform(range(1, greatest(len($T) - 2, 1) + 1),
          i -> array_to_string(($T)[i:i+2], ' '))) AS s FROM d),
      sig AS (SELECT doc_id, split, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${OracleSql.hex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, split, b,
          md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      pairs AS (SELECT DISTINCT x.doc_id AS test_id, y.doc_id AS train_id
        FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk
        WHERE x.split = 'test' AND y.split = 'train')
      SELECT test_id, count(*) AS n_train_neardups, min(train_id) AS first_train_id
      FROM pairs GROUP BY test_id"""))

  /** Repetition quality signal: the share of repeated tokens per doc
    * (1 - distinct/total) — entirely map-side, the standard cheap
    * boilerplate detector alongside q24's stopword/length ratios.
    */
  private val q58 = QueryDef(
    "q58_repetition",
    (s, dir) => {
      val toks = graft.functions.TextKernels.tokens(col("text"))
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
        (lit(1.0) - size(array_distinct(toks)).cast("double") / size(toks))
          .as("repetition_ratio"))
    },
    Some(s"""SELECT doc_id, len($T)::BIGINT AS n_tokens,
        len(list_distinct($T))::BIGINT AS n_distinct_tokens,
        1.0 - len(list_distinct($T))::DOUBLE / len($T) AS repetition_ratio
      FROM documents"""))

  /** Mixture sampling (ops.Sample.mixtureByHash): per-language keep
    * rates applied as a pure hash function of the id — the data-mixing
    * step of a corpus build, verified by per-language counts of the
    * surviving sample.
    */
  private val q59 = QueryDef(
    "q59_mixture_sample",
    (s, dir) => graft.ops.Sample.mixtureByHash(
      Tables.documents(s, dir), "lang", "doc_id",
      rates = Map("en" -> 1.0, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.25, "zh" -> 0.1))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars")),
    Some(s"""SELECT lang, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
      FROM documents
      WHERE ${OracleSql.hex60("doc_id::VARCHAR")} % 1000000 <
        CASE lang WHEN 'en' THEN 1000000 WHEN 'de' THEN 500000
          WHEN 'fr' THEN 500000 WHEN 'es' THEN 250000
          WHEN 'zh' THEN 100000 ELSE 1000000 END
      GROUP BY lang"""))

  /** Corpus report: per-source doc counts, volume, language spread and
    * mean token length — the summary table a corpus build publishes.
    * Mean = exact integer sums divided once at the end (no float
    * accumulation order).
    */
  private val q60 = QueryDef(
    "q60_corpus_report",
    (s, dir) => {
      val toks = graft.functions.TextKernels.tokens(col("text"))
      Tables.documents(s, dir)
        .select(col("source"), col("lang"), col("n_chars"),
          size(toks).cast("long").as("n_toks"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          count_distinct(col("lang")).as("n_langs"),
          (sum(col("n_toks")).cast("double") / count(lit(1))).as("mean_tokens"))
    },
    Some(s"""SELECT source, count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars,
        count(DISTINCT lang) AS n_langs,
        sum(len($T))::DOUBLE / count(*) AS mean_tokens
      FROM documents GROUP BY source"""))

  /** Fixed-width histogram of order values: floor bucketing is exact
    * double math with identical expression trees on both engines (no
    * width_bucket dialect dependence), one hash aggregate.
    */
  private val q61 = QueryDef(
    "q61_histogram",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(floor(col("o_totalprice") / 25000.0).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("bucket_total")),
    Some("""SELECT floor(o_totalprice / 25000.0)::BIGINT AS bucket,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
      FROM orders GROUP BY 1"""))

  /** IQR outlier detection per group: exact quartiles (the q41
    * machinery), Tukey fences at 1.5×IQR, outliers counted against a
    * broadcast of the 5-row bounds table. Bounds are derived doubles
    * but both engines build them from bit-identical quantiles with the
    * same expression tree, so the comparison is exact.
    */
  private val q62 = QueryDef(
    "q62_outliers",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val bounds = orders.groupBy(col("o_orderpriority"))
        .agg(expr("percentile(o_totalprice, array(0.25D, 0.75D))").as("qs"))
        .select(col("o_orderpriority"),
          (col("qs")(0) - (col("qs")(2 - 1) - col("qs")(0)) * 1.5).as("lo"),
          (col("qs")(1) + (col("qs")(1) - col("qs")(0)) * 1.5).as("hi"))
      orders.join(broadcast(bounds), Seq("o_orderpriority"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
          count(when(col("o_totalprice") < col("lo") ||
            col("o_totalprice") > col("hi"), 1)).as("n_outliers"),
          min(col("lo")).as("lo"), max(col("hi")).as("hi"))
    },
    Some("""WITH b AS (SELECT o_orderpriority,
        quantile_cont(o_totalprice, 0.25) AS q1,
        quantile_cont(o_totalprice, 0.75) AS q3
      FROM orders GROUP BY o_orderpriority),
      f AS (SELECT o_orderpriority, q1 - (q3 - q1) * 1.5 AS lo,
        q3 + (q3 - q1) * 1.5 AS hi FROM b)
      SELECT o_orderpriority, count(*) AS n_orders,
        count(*) FILTER (WHERE o_totalprice < lo OR o_totalprice > hi) AS n_outliers,
        min(lo) AS lo, max(hi) AS hi
      FROM orders JOIN f USING (o_orderpriority)
      GROUP BY o_orderpriority"""))

  /** Bloom-prefiltered join (ops/BloomJoin): the selective dim side
    * (one p_size) builds a bloom over its keys, the fact scan drops
    * non-candidate rows map-side BEFORE any join/shuffle, and the join
    * then removes the bloom's false positives — so the result is
    * bit-identical to the plain join the oracle runs. At 100 TB this
    * is the difference between shuffling the whole fact table and
    * shuffling ~the matching fraction.
    */
  private val q65 = QueryDef(
    "q65_bloom_join",
    (s, dir) => {
      val hotParts = Tables.part(s, dir).filter(col("p_size") === 50)
      graft.ops.BloomJoin.innerWithBloom(
        Tables.lineitem(s, dir), hotParts, "l_partkey", "p_partkey",
        expectedItems = 100000L)
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
    },
    Some("""SELECT p_brand, count(*) AS n_items,
        CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_size = 50 GROUP BY p_brand"""))

  /** SCD type-2 dimension build (ops/Scd2): per-user event_type
    * validity intervals from the event stream — consecutive identical
    * states compress, each change opens an interval the next change
    * closes. Timestamps compare as epoch-microsecond longs (exact on
    * both engines); (ts, event_id) gives a total order.
    */
  private val q67 = QueryDef(
    "q67_scd2",
    (s, dir) => graft.ops.Scd2.fromChanges(
      Tables.events(s, dir), "user_id", "ts", Seq("event_type"), "event_id")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("effective_from").cast("timestamp_ltz")).as("from_us"),
        unix_micros(col("effective_to").cast("timestamp_ltz")).as("to_us"),
        col("is_current")),
    Some("""WITH ordered AS (SELECT user_id, event_type, ts, event_id,
        lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
          AS prev_type
        FROM events),
      changes AS (SELECT user_id, event_type, ts, event_id FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type)
      SELECT user_id, event_type, epoch_us(ts) AS from_us,
        epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
          AS to_us,
        (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
          AS is_current
      FROM changes"""))

  /** Ordered conversion funnel (ops.Funnel): view → click → purchase,
    * each stage strictly after the user's earliest completion of the
    * prior one. One shuffle on user_id; the chained stage minimums are
    * whole-partition window expressions on that single exchange.
    */
  private val q68 = QueryDef(
    "q68_funnel",
    (s, dir) => graft.ops.Funnel.counts(
      Tables.events(s, dir), "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")),
    Some("""WITH s0 AS (SELECT user_id, ts, event_type,
        min(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id) AS t0 FROM events),
      s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t0 THEN ts END)
          OVER (PARTITION BY user_id) AS t1 FROM s0),
      s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t1 THEN ts END)
          OVER (PARTITION BY user_id) AS t2 FROM s1),
      per AS (SELECT user_id, max(t0) AS t0, max(t1) AS t1, max(t2) AS t2
        FROM s2 GROUP BY user_id),
      c AS (SELECT count(t0) AS c0, count(t1) AS c1, count(t2) AS c2 FROM per)
      SELECT 0::BIGINT AS stage_idx, 'view' AS stage, c0 AS n_users FROM c
      UNION ALL SELECT 1::BIGINT, 'click', c1 FROM c
      UNION ALL SELECT 2::BIGINT, 'purchase', c2 FROM c"""))

  /** Calendar-spine gap fill: daily order counts per priority with
    * missing days zero-filled — the resample step reporting pipelines
    * need before charting/regression. The spine (span-days ×
    * priorities) is derived IN-PLAN from two 1-row aggs, and the fact
    * side is pre-aggregated to at most |spine| rows before the join,
    * so the outer join is broadcast-tiny no matter how large the raw
    * table is. Days compare as integer day indexes (µs div 86400e6) —
    * no date-normalization asymmetry.
    */
  private val q70 = QueryDef(
    "q70_gap_fill",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      // o_orderdate is TIMESTAMP_NTZ; the UTC session cast is exact
      val dayIdx = expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      val daily = orders
        .groupBy(col("o_orderpriority").as("priority"), dayIdx.as("day_idx"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("day_total"))
      val days = orders.agg(min(dayIdx).as("lo"), max(dayIdx).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day_idx"))
      val spine = orders.select(col("o_orderpriority").as("priority"))
        .distinct().crossJoin(days)
      spine.join(broadcast(daily), Seq("priority", "day_idx"), "left")
        .select(col("priority"), col("day_idx"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("day_total"), lit(0.0)).as("day_total"))
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS priority,
          epoch_us(o_orderdate) // 86400000000 AS day_idx,
          count(*) AS n_orders,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_total
        FROM orders GROUP BY 1, 2),
      span AS (SELECT min(epoch_us(o_orderdate) // 86400000000) AS lo,
          max(epoch_us(o_orderdate) // 86400000000) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM span),
      prios AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
      spine AS (SELECT priority, day_idx FROM prios CROSS JOIN days)
      SELECT priority, day_idx,
        COALESCE(n_orders, 0)::BIGINT AS n_orders,
        COALESCE(day_total, 0.0) AS day_total
      FROM spine LEFT JOIN daily USING (priority, day_idx)"""))

  /** CUBE over (priority, order year): all four grouping-set levels in
    * ONE pass — Catalyst expands the sets and partial-aggregates
    * map-side exactly like a plain hash aggregate, so the cost is the
    * set count, not extra scans. `grouping_id()` disambiguates real
    * NULLs from subtotal rows (both engines put the leftmost grouping
    * column in the most significant bit).
    */
  private val q71 = QueryDef(
    "q71_cube",
    (s, dir) => Tables.orders(s, dir)
      .withColumn("yr", year(col("o_orderdate")).cast("long"))
      .cube(col("o_orderpriority"), col("yr"))
      .agg(grouping_id().cast("long").as("gid"),
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .select(col("gid"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        coalesce(col("yr"), lit(-1L)).as("yr"),
        col("n_orders"), col("total")),
    Some("""SELECT GROUPING(o_orderpriority, yr)::BIGINT AS gid,
        COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(yr, -1)::BIGINT AS yr,
        count(*) AS n_orders,
        CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM (SELECT o_orderpriority, year(o_orderdate)::BIGINT AS yr,
        o_totalprice FROM orders)
      GROUP BY CUBE (o_orderpriority, yr)"""))

  /** Peak concurrent sessions (ops.Sweep): sessions become ±1 endpoint
    * events and a DISTRIBUTED two-phase prefix sum finds the global
    * maximum — the naive `sum over (order by t)` form would funnel
    * every endpoint through one task; Sweep buckets the sort and
    * single-partitions only the ~1k bucket totals. Inclusive
    * intervals: the -1 lands one µs past the session end.
    */
  private val q72 = QueryDef(
    "q72_peak_concurrency",
    (s, dir) => {
      val us = unix_micros(col("ts").cast("timestamp_ltz"))
      val sessions = graft.ops.Sessionize.assignSessions(
        Tables.events(s, dir), "user_id", "ts", "event_id",
        maxGapUs = 1800L * 1000000L)
        .groupBy(col("user_id"), col("session_seq"))
        .agg(min(us).as("start_us"), max(us).as("end_us"))
      val points = sessions.select(explode(array(
          struct(col("start_us").as("t"), lit(1L).as("d")),
          struct((col("end_us") + 1L).as("t"), lit(-1L).as("d")))).as("p"))
        .select(col("p.t").as("t"), col("p.d").as("d"))
      // sweep-cell bounds from the RAW scan (endpoints ⊆ [min ts,
      // max ts + 1]) so the bounds job does not sessionize twice
      val b = Tables.events(s, dir).agg(min(us), max(us) + 1L).head()
      val bounds = if (b.isNullAt(0)) None // empty table: let Sweep handle it
        else Some((b.getLong(0), b.getLong(1)))
      graft.ops.Sweep.peak(points, "t", "d", bounds = bounds)
        .select(col("peak").as("peak_sessions"), col("at_t").as("at_us"))
    },
    Some("""WITH se AS (
        SELECT user_id,
          sum(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_seq,
          ts FROM (
            SELECT user_id, event_id, ts,
              epoch_us(ts) - lag(epoch_us(ts)) OVER
                (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events)),
      sess AS (SELECT user_id, session_seq,
          min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
        FROM se GROUP BY user_id, session_seq),
      pts AS (SELECT start_us AS t, 1 AS d FROM sess
        UNION ALL SELECT end_us + 1, -1 FROM sess),
      byt AS (SELECT t, sum(d)::BIGINT AS d FROM pts GROUP BY t),
      run AS (SELECT t, (sum(d) OVER (ORDER BY t))::BIGINT AS running FROM byt)
      SELECT max(running)::BIGINT AS peak_sessions,
        (SELECT min(t) FROM run WHERE running = (SELECT max(running) FROM run))
          AS at_us
      FROM run"""))

  /** One PageRank-style message-passing step over the supplier→part
    * bipartite graph induced by lineitem: each supplier splits a fixed
    * integer mass across its distinct parts, parts sum what they
    * receive. INTEGER mass (floor-divided) keeps the reduction exact
    * under any accumulation order — the float version would be
    * engine- and partitioning-dependent. The out-degree comes from a
    * pre-aggregated groupBy JOINED back, not a `partitionBy(src)`
    * window: the window would re-shuffle the FULL edge list on src at
    * every graph size, while the degree table has one row per source
    * (dim-sized at 100 TB) and joins broadcast — so the plan is the
    * distinct, a degree rollup that partial-aggregates map-side, a
    * broadcast probe, and the final sum on dst.
    */
  private val q73 = QueryDef(
    "q73_pagerank_step",
    (s, dir) => {
      val edges = Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_partkey")).distinct()
      val outdeg = edges.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("outdeg"))
      edges.join(outdeg, Seq("l_suppkey"))
        .withColumn("contrib", expr("1000000000000 div outdeg"))
        .groupBy(col("l_partkey").as("part_key"))
        .agg(sum(col("contrib")).as("score"), count(lit(1)).as("n_src"))
    },
    Some("""WITH e AS (SELECT DISTINCT l_suppkey, l_partkey FROM lineitem),
      d AS (SELECT l_partkey,
          count(*) OVER (PARTITION BY l_suppkey) AS outdeg FROM e)
      SELECT l_partkey AS part_key,
        sum(1000000000000 // outdeg)::BIGINT AS score,
        count(*) AS n_src
      FROM d GROUP BY 1"""))

  /** Percentile-threshold quality gate: per-language p25 of document
    * length, then keep-counts against the broadcast 2-column
    * threshold table — the shape of "drop the bottom quartile" corpus
    * filters. Thresholds are interpolated doubles but both engines
    * derive them from identical sorted longs with the same linear
    * interpolation, so the gate compares exactly (q62's contract).
    */
  private val q74 = QueryDef(
    "q74_quality_gate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val th = docs.groupBy(col("lang"))
        .agg(expr("percentile(n_chars, 0.25D)").as("p25_chars"))
      docs.join(broadcast(th), Seq("lang"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("n_chars") >= col("p25_chars"), 1)).as("n_kept"),
          min(col("p25_chars")).as("p25_chars"))
    },
    Some("""WITH th AS (SELECT lang, quantile_cont(n_chars, 0.25) AS p25_chars
        FROM documents GROUP BY lang)
      SELECT lang, count(*) AS n_docs,
        count(*) FILTER (WHERE n_chars >= p25_chars) AS n_kept,
        min(p25_chars) AS p25_chars
      FROM documents JOIN th USING (lang)
      GROUP BY lang"""))

  /** Event-transition matrix (first-order Markov counts): per user,
    * each event pairs with its successor in (ts, event_id) order; the
    * count per (from, to) is the bigram model product analytics and
    * next-event prediction both start from. One shuffle on user_id
    * shared by the window and pre-reduced before the tiny final agg.
    */
  private val q75 = QueryDef(
    "q75_transitions",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some("""WITH nx AS (SELECT event_type AS from_type,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS to_type
        FROM events)
      SELECT from_type, to_type, count(*) AS n_pairs
      FROM nx WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type"""))

  /** Weight-proportional systematic sample (ops.Sample
    * .weightedSystematic): k evenly spaced points along the cumulative
    * n_chars line — PPS sampling as a pure integer function of the
    * data (no RNG), with the global prefix sum computed DISTRIBUTED
    * via ops.Sweep rather than a one-partition sort.
    */
  private val q76 = QueryDef(
    "q76_weighted_sample",
    (s, dir) => graft.ops.Sample.weightedSystematic(
      Tables.documents(s, dir), "doc_id", "n_chars", k = 50),
    Some("""WITH pos AS (SELECT doc_id, n_chars AS w FROM documents
        WHERE n_chars > 0),
      cum AS (SELECT doc_id, w,
          (sum(w) OVER (ORDER BY doc_id))::BIGINT AS running FROM pos),
      st AS (SELECT greatest(max(running) // 50, 1) AS step FROM cum)
      SELECT doc_id, w,
        least(running // step, 50) - least((running - w) // step, 50)
          AS n_hits
      FROM cum CROSS JOIN st
      WHERE least(running // step, 50) - least((running - w) // step, 50) > 0"""))

  /** Distribution drift between two deterministic halves of the event
    * stream (event_id parity — the train/serve split shape): per-type
    * counts plus the total-variation numerator
    * |n_a·N_b − n_b·N_a| kept INTEGER (cross-multiplied instead of
    * divided), so the drift ranking is exact under any accumulation
    * order. Safe in long arithmetic up to ~3e9 rows per split; past
    * that, lift the products to decimal(38,0).
    */
  private val q77 = QueryDef(
    "q77_drift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      // totals as an unpartitioned window over the per-type counts —
      // a single-partition pass over ~|event types| rows, which keeps
      // the counts lineage (and the events scan) out of the plan twice
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.events(s, dir)
        .groupBy(col("event_type"))
        // % (remainder), not pmod: DuckDB's % is remainder, and the
        // two must classify any future negative id identically
        .agg(count(when(col("event_id") % 2 === 0, 1)).as("n_a"),
          count(when(col("event_id") % 2 === 1, 1)).as("n_b"))
        .withColumn("tot_a", sum(col("n_a")).over(w))
        .withColumn("tot_b", sum(col("n_b")).over(w))
        .select(col("event_type"), col("n_a"), col("n_b"),
          abs(col("n_a") * col("tot_b") - col("n_b") * col("tot_a"))
            .as("tv_num"))
    },
    Some("""WITH c AS (SELECT event_type,
          count(*) FILTER (WHERE event_id % 2 = 0) AS n_a,
          count(*) FILTER (WHERE event_id % 2 = 1) AS n_b
        FROM events GROUP BY 1),
      t AS (SELECT sum(n_a)::BIGINT AS tot_a, sum(n_b)::BIGINT AS tot_b
        FROM c)
      SELECT event_type, n_a, n_b,
        abs(n_a * tot_b - n_b * tot_a)::BIGINT AS tv_num
      FROM c CROSS JOIN t"""))

  /** Concat-and-chunk packing offsets (ops.TextClean.packIntoChunks):
    * documents laid end-to-end in doc_id order, cut into 512-token
    * training windows; each doc's global offset and window span, all
    * integer, prefix-summed via the distributed sweep. Token counts
    * are the q47 unit regex, identical on both engines.
    */
  private val q78 = QueryDef(
    "q78_packing",
    (s, dir) => {
      val toks = Tables.documents(s, dir).select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long").as("n_tok"))
      graft.ops.TextClean.packIntoChunks(toks, "doc_id", "n_tok", budget = 512L)
    },
    Some("""WITH toks AS (SELECT doc_id,
          len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]'))::BIGINT
            AS n_tok
        FROM documents),
      cum AS (SELECT doc_id, n_tok,
          (sum(n_tok) OVER (ORDER BY doc_id))::BIGINT AS running
        FROM toks WHERE n_tok > 0)
      SELECT doc_id, n_tok,
        running - n_tok AS offset,
        (running - n_tok) // 512 AS first_chunk,
        (running - 1) // 512 AS last_chunk,
        (running - 1) // 512 - (running - n_tok) // 512 + 1 AS n_chunks
      FROM cum"""))

  /** Equi-depth histogram of order totals: 9 interior decile
    * boundaries from one exact-percentile aggregation (both engines
    * interpolate the same sorted doubles — the q62 contract), then a
    * map-side bucket assignment by counting boundaries ≤ value
    * against the broadcast 1-row boundary array. Equal-population
    * buckets are what range-partitioners and BI axes want; the
    * fixed-width q61 is the cheap cousin.
    */
  private val q80 = QueryDef(
    "q80_equidepth",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val bs = orders.agg(expr(
        "percentile(o_totalprice, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("bs"))
      orders.crossJoin(broadcast(bs))
        .select(size(filter(col("bs"),
          b => b <= col("o_totalprice"))).cast("long").as("bucket"),
          col("o_totalprice"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
    },
    Some("""WITH b AS (SELECT [quantile_cont(o_totalprice, 0.1),
          quantile_cont(o_totalprice, 0.2), quantile_cont(o_totalprice, 0.3),
          quantile_cont(o_totalprice, 0.4), quantile_cont(o_totalprice, 0.5),
          quantile_cont(o_totalprice, 0.6), quantile_cont(o_totalprice, 0.7),
          quantile_cont(o_totalprice, 0.8), quantile_cont(o_totalprice, 0.9)]
          AS bs FROM orders)
      SELECT len(list_filter(bs, x -> x <= o_totalprice))::BIGINT AS bucket,
        count(*) AS n_orders, min(o_totalprice) AS lo, max(o_totalprice) AS hi
      FROM orders CROSS JOIN b
      GROUP BY 1"""))

  /** Weekly cohort retention: users cohorted by first-activity week,
    * actives counted per (cohort, week offset) — the canonical
    * retention triangle, all integer (week indexes are µs div a week;
    * counts are exact distincts). Two shuffles carry (user, week)
    * pairs pre-deduped map-side; the distinct-count shuffle carries
    * (cohort, offset, user) — bounded by active pairs, not events.
    */
  private val q81 = QueryDef(
    "q81_cohort_retention",
    (s, dir) => {
      val wk = expr("unix_micros(cast(ts as timestamp_ltz)) div 604800000000")
      val ev = Tables.events(s, dir).select(col("user_id"), wk.as("week"))
      val cohorts = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
      ev.join(cohorts, Seq("user_id"))
        .groupBy(col("cohort"), (col("week") - col("cohort")).as("offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
    },
    Some("""WITH ev AS (SELECT user_id, epoch_us(ts) // 604800000000 AS week
        FROM events),
      cohorts AS (SELECT user_id, min(week) AS cohort FROM ev GROUP BY user_id)
      SELECT cohort, week - cohort AS offset,
        count(DISTINCT user_id) AS n_active
      FROM ev JOIN cohorts USING (user_id)
      GROUP BY 1, 2"""))

  /** Per-priority price trend (least-squares slope of order totals
    * over order day): every sum — n, Σx, Σy, Σxy, Σx² — accumulates
    * EXACTLY (longs and decimal(38,0): day indexes × cent-quantized
    * totals), and the slope itself reports as exact integer
    * MICRO-cents/day via truncating integral division (both engines
    * truncate toward zero) — the regression analogue of the pack's
    * integer-mass rule, with NO float step at all: a final double
    * division looked exact until the 30× gate, where the integer mass
    * passed 2⁵³ and the two engines' int→double conversions diverged
    * by one ulp. One shuffle, partial map-side. A degenerate group
    * with zero day-variance (one order, or all orders on one day) has
    * no defined slope: both sides NULL it symmetrically (Spark
    * non-ANSI DIV would return NULL anyway, but DuckDB `//` raises
    * Division by zero — the NULLIF keeps the engines agreeing instead
    * of one erroring).
    */
  private val q82 = QueryDef(
    "q82_trend",
    (s, dir) => {
      val x = expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
        .cast("decimal(38,0)")
      val y = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("priority"), x.as("x"), y.as("y"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"))
        .select(col("priority"), col("n").cast("long").as("n_orders"),
          expr("""CAST((1000000 * (n * sxy - sx * sy))
                    DIV nullif(n * sxx - sx * sx, 0) AS BIGINT)""")
            .as("slope_ucents_per_day"))
    },
    Some("""WITH q AS (SELECT o_orderpriority AS priority,
          (epoch_us(o_orderdate) // 86400000000)::HUGEINT AS x,
          (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::HUGEINT AS y
        FROM orders),
      agg AS (SELECT priority, count(*)::HUGEINT AS n,
          sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
          sum(x * y)::HUGEINT AS sxy, sum(x * x)::HUGEINT AS sxx
        FROM q GROUP BY priority)
      SELECT priority, n::BIGINT AS n_orders,
        ((1000000::HUGEINT * (n * sxy - sx * sy))
          // NULLIF(n * sxx - sx * sx, 0))::BIGINT AS slope_ucents_per_day
      FROM agg"""))

  /** Customer-concentration index per order priority (Herfindahl):
    * share² summed over customers, kept EXACT by cross-multiplying —
    * the numerator Σcᵢ² and denominator (Σcᵢ)² are both integer
    * aggregates, so the single final division is the only float step
    * (the q82 integer-mass rule). Two shuffles, both partial map-side:
    * per-(priority, customer) counts, then the per-priority rollup
    * carrying 3 longs per customer. Long-safe to ~3e9 orders per
    * customer-priority cell.
    */
  private val q84 = QueryDef(
    "q84_concentration",
    (s, dir) => {
      val per = Tables.orders(s, dir)
        .groupBy(col("o_orderpriority").as("priority"), col("o_custkey"))
        .agg(count(lit(1)).as("c"))
      per.groupBy(col("priority"))
        .agg(sum(col("c")).as("n_orders"),
          count(lit(1)).as("n_customers"),
          sum(col("c") * col("c")).as("sum_sq"))
        .select(col("priority"), col("n_orders"), col("n_customers"),
          (col("sum_sq").cast("double") /
            (col("n_orders") * col("n_orders")).cast("double")).as("hhi"))
    },
    Some("""WITH per AS (SELECT o_orderpriority AS priority, o_custkey,
          count(*) AS c
        FROM orders GROUP BY 1, 2)
      SELECT priority, sum(c)::BIGINT AS n_orders,
        count(*) AS n_customers,
        sum(c * c)::BIGINT::DOUBLE / (sum(c)::BIGINT * sum(c)::BIGINT)::DOUBLE
          AS hhi
      FROM per GROUP BY priority"""))

  /** Exact per-language ECDF of document length: percent-rank of each
    * DISTINCT (lang, n_chars) value — the normalization curve quality
    * filters read thresholds from. The scale trick: pre-aggregate to
    * (lang, n_chars) counts FIRST — document length has a bounded
    * domain, so the window sorts |langs × distinct lengths| rows (a
    * function of the domain, not the corpus; ~10⁶ at any corpus
    * size), never the raw table. Both windows share one exchange on
    * lang; percent_rank = (rows strictly below) / (n − 1), all longs
    * to the single division.
    */
  private val q87 = QueryDef(
    "q87_length_ecdf",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.documents(s, dir)
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("n_docs"))
      val cumW = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("cum", sum(col("n_docs")).over(cumW))
        .withColumn("n", sum(col("n_docs")).over(totW))
        .select(col("lang"), col("n_chars"), col("n_docs"), col("cum"),
          when(col("n") > 1,
            (col("cum") - col("n_docs")).cast("double") /
              (col("n") - 1).cast("double"))
            .otherwise(lit(0.0)).as("pr"))
    },
    Some("""WITH per AS (SELECT lang, n_chars, count(*) AS n_docs
        FROM documents GROUP BY 1, 2),
      w AS (SELECT lang, n_chars, n_docs,
          (sum(n_docs) OVER (PARTITION BY lang ORDER BY n_chars
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
          (sum(n_docs) OVER (PARTITION BY lang))::BIGINT AS n
        FROM per)
      SELECT lang, n_chars, n_docs, cum,
        CASE WHEN n > 1
          THEN (cum - n_docs)::DOUBLE / (n - 1)::DOUBLE ELSE 0.0 END AS pr
      FROM w"""))

  /** Byte-budget weighted median per language: the smallest document
    * length X such that docs of length ≤ X hold at least half the
    * corpus CHARS — the statistic a token-budget planner reads ("half
    * the bytes live in docs shorter than X"), which the unweighted
    * median badly misestimates on heavy-tailed corpora. Same
    * pre-aggregated value-domain trick as q87: all windows run over
    * (lang, n_chars) DISTINCT rows; weights are integer char counts,
    * so the 2·cum ≥ total cut is exact under any partitioning.
    */
  private val q88 = QueryDef(
    "q88_weighted_median",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val per = Tables.documents(s, dir)
        .groupBy(col("lang"), col("n_chars"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("w", col("n_chars") * col("n_docs"))
      val cumW = Window.partitionBy(col("lang")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("lang"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      per
        .withColumn("cum", sum(col("w")).over(cumW))
        .withColumn("total_chars", sum(col("w")).over(totW))
        .filter(col("cum") * 2 >= col("total_chars"))
        .groupBy(col("lang"))
        .agg(min(col("n_chars")).as("wmedian_chars"),
          min(col("total_chars")).as("total_chars"))
    },
    Some("""WITH per AS (SELECT lang, n_chars, count(*) AS n_docs,
          (n_chars * count(*))::BIGINT AS w
        FROM documents GROUP BY 1, 2),
      c AS (SELECT lang, n_chars,
          (sum(w) OVER (PARTITION BY lang ORDER BY n_chars
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
          (sum(w) OVER (PARTITION BY lang))::BIGINT AS total_chars
        FROM per)
      SELECT lang, min(n_chars) AS wmedian_chars,
        min(total_chars) AS total_chars
      FROM c WHERE cum * 2 >= total_chars
      GROUP BY lang"""))

  /** Inter-arrival gap statistics per outgoing event type: how long
    * after each event type the same user acts again — the latency
    * companion to q75's transition counts. One shuffle on user_id for
    * the lag window; gaps are exact microsecond longs, pre-reduced
    * map-side in the final per-type aggregation; the mean divides two
    * exactly-agreed integers once.
    */
  private val q89 = QueryDef(
    "q89_interarrival",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_us",
          lead(unix_micros(col("ts").cast("timestamp_ltz")), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("gap_us",
          col("next_us") - unix_micros(col("ts").cast("timestamp_ltz")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          min(col("gap_us")).as("min_us"), max(col("gap_us")).as("max_us"),
          sum(col("gap_us")).as("sum_us"))
        .withColumn("mean_us",
          col("sum_us").cast("double") / col("n_gaps").cast("double"))
    },
    Some("""WITH g AS (SELECT event_type,
          lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            - epoch_us(ts) AS gap_us
        FROM events)
      SELECT event_type, count(*) AS n_gaps,
        min(gap_us) AS min_us, max(gap_us) AS max_us,
        sum(gap_us)::BIGINT AS sum_us,
        sum(gap_us)::BIGINT::DOUBLE / count(*)::DOUBLE AS mean_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type"""))

  /** Rolling 7-day distinct active users — the engagement trend metric.
    * Exact rolling COUNT DISTINCT does not decompose over a window
    * frame, so instead each (user, active-day) row fans out to the ≤7
    * report days its activity supports, then one distinct + one count:
    * the blowup is a FIXED ×7 of the pre-reduced |user × day| set (not
    * of raw events), keys are uniform, and no window function ever
    * sees more than the day-domain. Report days are the OBSERVED days
    * (broadcast day-dimension join), so trailing empty dates never
    * appear. Days are integer epoch-day indexes (the pack's
    * tz-proof date rule).
    */
  private val q92 = QueryDef(
    "q92_rolling_active",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .distinct()
      val days = ev.select(col("day").as("window_day")).distinct()
      ev.select(col("user_id"),
          explode(expr("sequence(day, day + 6)")).as("window_day"))
        .distinct()
        .join(broadcast(days), Seq("window_day"))
        .groupBy(col("window_day"))
        .agg(count(lit(1)).as("active_7d"))
    },
    Some("""WITH ev AS (SELECT DISTINCT user_id,
          epoch_us(ts) // 86400000000 AS day FROM events),
      days AS (SELECT DISTINCT day AS window_day FROM ev),
      w AS (SELECT DISTINCT user_id, day + off AS window_day
        FROM ev CROSS JOIN range(0, 7) AS t(off))
      SELECT window_day, count(*) AS active_7d
      FROM w JOIN days USING (window_day)
      GROUP BY window_day"""))

  /** Pre-flight join cardinality/skew estimator: the exact output size
    * and worst per-key fanout a key-equi-join WOULD produce, from the
    * two sides' per-key histograms — the check run before committing a
    * 100 TB shuffle (est_rows says whether the join explodes;
    * max_key_fanout says whether one reducer will). Costs two
    * pre-reduced aggregations and a join over |distinct keys| slim
    * rows — far cheaper than the join it prices; all counts exact
    * longs.
    */
  private val q93 = QueryDef(
    "q93_join_cardinality",
    (s, dir) => {
      val a = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("ca"))
      val b = Tables.orders(s, dir)
        .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
      a.join(b, Seq("k"))
        .agg(count(lit(1)).as("n_matched_keys"),
          sum(col("ca") * col("cb")).as("est_rows"),
          max(col("ca") * col("cb")).as("max_key_fanout"))
    },
    Some("""WITH a AS (SELECT l_orderkey AS k, count(*) AS ca
        FROM lineitem GROUP BY 1),
      b AS (SELECT o_orderkey AS k, count(*) AS cb FROM orders GROUP BY 1)
      SELECT count(*) AS n_matched_keys,
        sum(ca * cb)::BIGINT AS est_rows,
        max(ca * cb) AS max_key_fanout
      FROM a JOIN b USING (k)"""))

  /** Hot-key skew report — q93's operational companion: the top-20
    * heaviest join/shuffle keys with their share of total rows, the
    * list an engineer reads before choosing a salting factor or
    * trusting AQE's skew split. Per-key counts pre-reduce map-side;
    * the top-k is a TakeOrderedAndProject over the count table (k
    * rows per partition to the driver, no global sort); the share
    * divides two exactly-agreed longs against a 1-row broadcast
    * total.
    */
  private val q95 = QueryDef(
    "q95_hot_keys",
    (s, dir) => {
      val per = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("c"))
      val total = per.agg(sum(col("c")).as("total"))
      per.join(broadcast(total))
        .withColumn("share", col("c").cast("double") / col("total").cast("double"))
        .orderBy(col("c").desc, col("k").asc)
        .limit(20)
    },
    Some("""WITH per AS (SELECT l_orderkey AS k, count(*) AS c
        FROM lineitem GROUP BY 1),
      t AS (SELECT sum(c)::BIGINT AS total FROM per)
      SELECT k, c, total,
        c::DOUBLE / total::DOUBLE AS share
      FROM per, t
      ORDER BY c DESC, k ASC LIMIT 20"""))

  /** Inter-arrival latency percentiles per event type (q89's
    * distribution companion): exact p50/p95/p99 over the integer
    * microsecond gaps — the long-tail view a mean hides. Gaps come
    * from the one lag-window shuffle on user_id; `percentile` over
    * longs is exact and maps 1:1 to DuckDB's quantile_cont (the q41
    * correspondence).
    */
  private val q96 = QueryDef(
    "q96_gap_percentiles",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("next_us",
          lead(unix_micros(col("ts").cast("timestamp_ltz")), 1).over(w))
        .filter(col("next_us").isNotNull)
        .withColumn("gap_us",
          col("next_us") - unix_micros(col("ts").cast("timestamp_ltz")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap_us, array(0.5D, 0.95D, 0.99D))").as("qs"))
        .select(col("event_type"), col("n_gaps"),
          col("qs")(0).as("p50_us"), col("qs")(1).as("p95_us"),
          col("qs")(2).as("p99_us"))
    },
    Some("""WITH g AS (SELECT event_type,
          lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
            - epoch_us(ts) AS gap_us
        FROM events)
      SELECT event_type, count(*) AS n_gaps,
        quantile_cont(gap_us, 0.50) AS p50_us,
        quantile_cont(gap_us, 0.95) AS p95_us,
        quantile_cont(gap_us, 0.99) AS p99_us
      FROM g WHERE gap_us IS NOT NULL
      GROUP BY event_type"""))

  /** Functional-dependency check (schema profiling): does column A
    * determine column B? Exactly when |distinct A| = |distinct (A,B)|.
    * The test a modeler runs before declaring a key or denormalizing —
    * here over three candidate FDs on `part` (one true by
    * construction, two empirically false). Each check pre-reduces to
    * its DISTINCT value set before counting (two-level aggregation, no
    * multi-distinct Expand), and the three 1-row results union —
    * integer-exact everywhere.
    */
  private val q97 = QueryDef(
    "q97_fd_check",
    (s, dir) => {
      val p = Tables.part(s, dir)
      def check(lhs: String, rhs: String) = {
        val nL = p.select(col(lhs)).distinct().agg(count(lit(1)).as("n_lhs"))
        val nP = p.select(col(lhs), col(rhs)).distinct()
          .agg(count(lit(1)).as("n_pair"))
        nL.crossJoin(nP)
          .select(lit(s"$lhs->$rhs").as("fd"), col("n_lhs"), col("n_pair"),
            (col("n_lhs") === col("n_pair")).as("holds"))
      }
      check("p_partkey", "p_brand")
        .unionByName(check("p_brand", "p_type"))
        .unionByName(check("p_name", "p_size"))
    },
    Some("""WITH
      a1 AS (SELECT count(*) AS n_lhs FROM (SELECT DISTINCT p_partkey FROM part)),
      a2 AS (SELECT count(*) AS n_pair FROM (SELECT DISTINCT p_partkey, p_brand FROM part)),
      b1 AS (SELECT count(*) AS n_lhs FROM (SELECT DISTINCT p_brand FROM part)),
      b2 AS (SELECT count(*) AS n_pair FROM (SELECT DISTINCT p_brand, p_type FROM part)),
      c1 AS (SELECT count(*) AS n_lhs FROM (SELECT DISTINCT p_name FROM part)),
      c2 AS (SELECT count(*) AS n_pair FROM (SELECT DISTINCT p_name, p_size FROM part))
      SELECT 'p_partkey->p_brand' AS fd, n_lhs, n_pair, n_lhs = n_pair AS holds FROM a1, a2
      UNION ALL
      SELECT 'p_brand->p_type' AS fd, n_lhs, n_pair, n_lhs = n_pair AS holds FROM b1, b2
      UNION ALL
      SELECT 'p_name->p_size' AS fd, n_lhs, n_pair, n_lhs = n_pair AS holds FROM c1, c2"""))

  /** Forward-fill imputation over the q70 calendar spine: days with no
    * observation carry the LAST OBSERVED daily count forward per group
    * (a time-series feature-engineering staple; copying an observed
    * value is exact, unlike interpolation). One window exchange on the
    * group key, ordered by the integer day index; days before a
    * group's first observation stay NULL — both engines' IGNORE NULLS
    * semantics agree.
    */
  private val q99 = QueryDef(
    "q99_forward_fill",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val orders = Tables.orders(s, dir)
      val dayIdx = expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      val daily = orders
        .groupBy(col("o_orderpriority").as("priority"), dayIdx.as("day_idx"))
        .agg(count(lit(1)).as("n_obs"))
      val days = orders.agg(min(dayIdx).as("lo"), max(dayIdx).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day_idx"))
      val spine = orders.select(col("o_orderpriority").as("priority"))
        .distinct().crossJoin(days)
      val w = Window.partitionBy(col("priority")).orderBy(col("day_idx"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      spine.join(broadcast(daily), Seq("priority", "day_idx"), "left")
        .withColumn("filled", last(col("n_obs"), ignoreNulls = true).over(w))
        .select(col("priority"), col("day_idx"),
          col("n_obs"), col("filled"))
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS priority,
          epoch_us(o_orderdate) // 86400000000 AS day_idx,
          count(*) AS n_obs
        FROM orders GROUP BY 1, 2),
      span AS (SELECT min(epoch_us(o_orderdate) // 86400000000) AS lo,
          max(epoch_us(o_orderdate) // 86400000000) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM span),
      prios AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
      spine AS (SELECT priority, day_idx FROM prios CROSS JOIN days)
      SELECT priority, day_idx, n_obs,
        last_value(n_obs IGNORE NULLS) OVER (PARTITION BY priority
          ORDER BY day_idx ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS filled
      FROM spine LEFT JOIN daily USING (priority, day_idx)"""))

  /** Per-group z-score normalization with integer-exact moments: n,
    * Σx, Σx² accumulate as decimal(38,0) over cent-quantized prices,
    * so mean and variance on both engines derive from IDENTICAL
    * integers and the per-row z divides bit-equal doubles (the q82
    * integer-mass rule applied to feature scaling). Two passes over
    * the group — a 5-row moment table broadcast back — never a window
    * over the raw rows.
    */
  private val q100 = QueryDef(
    "q100_zscore",
    (s, dir) => {
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("decimal(38,0)")
      val moments = Tables.orders(s, dir)
        .select(col("o_orderpriority").as("priority"), cents.as("x"))
        .groupBy(col("priority"))
        .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
          cents.as("x"))
        .join(broadcast(moments), Seq("priority"))
        .select(col("o_orderkey"), col("priority"),
          ((col("n") * col("x") - col("sx")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
            .as("z"))
    },
    Some("""WITH q AS (SELECT o_orderkey,
          o_orderpriority AS priority,
          (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::HUGEINT AS x
        FROM orders),
      m AS (SELECT priority, count(*)::HUGEINT AS n, sum(x)::HUGEINT AS sx,
          sum(x * x)::HUGEINT AS sxx
        FROM q GROUP BY priority)
      SELECT o_orderkey, priority,
        (n * x - sx)::DOUBLE / sqrt((n * sxx - sx * sx)::DOUBLE) AS z
      FROM q JOIN m USING (priority)"""))

  /** Event-type co-occurrence / association mining — which behaviors
    * travel together (the market-basket lift table over the event
    * stream). The pair space never materializes corpus-side: events
    * pre-reduce to distinct (user, type), each user's type SET
    * collects in one shuffle (bounded by the type domain, not their
    * event count), and the sorted i<j pairs expand MAP-SIDE from that
    * array — so the exchange carries |users| set rows, never a
    * per-user self-join product. Supports are exact longs; lift
    * cross-multiplies them and divides once, so both engines divide
    * identical integers.
    */
  private val q102 = QueryDef(
    "q102_cooccurrence",
    (s, dir) => {
      // ONE corpus pass: per-user type sets aggregate map-side (the
      // partial set union is bounded by the type domain, not the
      // user's event count), and supports / the user universe / the
      // i<j pair expansion all derive from that identical subtree —
      // ReuseExchange collapses the three consumers onto one scan and
      // one corpus-side shuffle.
      val sets = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("event_type"))).as("ts"))
      val perType = sets.select(explode(col("ts")).as("event_type"))
        .groupBy(col("event_type")).agg(count(lit(1)).as("n_t"))
      // reference ts so column pruning cannot rewrite this branch to a
      // second events scan — with the subtree identical to the one
      // pairs/perType consume, ReuseExchange serves all three from one
      // scan + one shuffle
      val totals = sets.filter(size(col("ts")) >= 0)
        .agg(count(lit(1)).as("n_users"))
      val pairs = sets
        .select(explode(
          graft.functions.Kernels.stringPairsOf(col("ts"))).as("p"))
        .groupBy(col("p.a").as("type_a"), col("p.b").as("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(perType.select(col("event_type").as("type_a"),
          col("n_t").as("n_a"))), Seq("type_a"))
        .join(broadcast(perType.select(col("event_type").as("type_b"),
          col("n_t").as("n_b"))), Seq("type_b"))
        .join(broadcast(totals))
        .withColumn("lift",
          (col("n_both") * col("n_users")).cast("double") /
            (col("n_a") * col("n_b")).cast("double"))
        .select(col("type_a"), col("type_b"), col("n_both"),
          col("n_a"), col("n_b"), col("n_users"), col("lift"))
    },
    Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      t AS (SELECT event_type, count(*) AS n FROM ut GROUP BY 1),
      u AS (SELECT count(DISTINCT user_id) AS n_users FROM ut),
      p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          count(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, n_both, ta.n AS n_a, tb.n AS n_b, u.n_users,
        (n_both * u.n_users)::DOUBLE / (ta.n * tb.n)::DOUBLE AS lift
      FROM p
      JOIN t ta ON ta.event_type = type_a
      JOIN t tb ON tb.event_type = type_b
      CROSS JOIN u"""))

  /** Grouped top-k (ops.TopK.groupedTopK) — the per-group "best k
    * examples" selection every curation run needs, planned as the
    * bounded-heap partial aggregate instead of a per-group window
    * sort: the exchange carries ≤ k rows per (group × partition), so
    * a hot group cannot become a single-task sort. Scores here are
    * integer lengths (exact as doubles), cast back to long on output.
    */
  private val q104 = QueryDef(
    "q104_grouped_topk",
    (s, dir) => graft.ops.TopK.groupedTopK(
        Tables.documents(s, dir), Seq("source"), "n_chars", "doc_id", k = 3)
      .select(col("source"), col("rank"), col("doc_id"),
        col("score").cast("long").as("n_chars")),
    Some("""SELECT source, rank, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rank
        FROM documents) WHERE rank <= 3"""))

  /** Time-window retry dedup (DEBOUNCE semantics) — the telemetry-
    * ingest rule that A4's keep-latest cannot express: an IDENTICAL
    * event (same user, type, value) re-sent within 5 s of the
    * PREVIOUS submission — kept or itself suppressed — is a duplicate;
    * the suppression window slides with each retry (a burst of
    * sub-window retries collapses to its first event however long the
    * burst), and a repeat arriving ≥ 5 s after the previous submission
    * is a new observation. Ties (exact duplicate rows) break on
    * event_id, so gap 0 drops them too; gaps compare as exact
    * microsecond longs.
    *
    * Scale shape: the window partitions on (identity, DAY), not the
    * identity alone — an identity that recurs forever (a heartbeat
    * with a constant value) would otherwise accumulate its entire
    * history in one window partition. The day bound caps any
    * partition at one identity-day; the cost is that a burst
    * straddling midnight keeps one extra event (the retry window is
    * 5 s, so at most one burst per identity per day is split).
    */
  private val q106 = QueryDef(
    "q106_retry_dedup",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val day = expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000")
      val w = Window
        .partitionBy(col("user_id"), col("event_type"), col("value"), day)
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_us",
          lag(unix_micros(col("ts").cast("timestamp_ltz")), 1).over(w))
        .filter(col("prev_us").isNull ||
          unix_micros(col("ts").cast("timestamp_ltz")) - col("prev_us") > 5000000L)
        .select(col("event_id"), col("user_id"), col("event_type"))
    },
    Some("""SELECT event_id, user_id, event_type FROM (
        SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
          lag(epoch_us(ts)) OVER (
            PARTITION BY user_id, event_type, value, epoch_us(ts) // 86400000000
            ORDER BY ts, event_id) AS prev_us
        FROM events)
      WHERE prev_us IS NULL OR us - prev_us > 5000000"""))

  /** Incremental aggregate maintenance (ops.Cdc): a per-customer
    * COUNT/SUM snapshot built from an OLD state of orders is updated
    * by applying the changeSet to the NEW state — inserts (keys %7=0
    * were absent), deletes (keys %5=0 leave), and value updates (keys
    * %3=0 get +1) — WITHOUT re-aggregating the base table. The oracle
    * recomputes the new state from scratch; matching hashes prove the
    * delta-merge is exact, including groups that empty out (dropped)
    * and rows whose update moves money between groups.
    *
    * The sums run in decimal(18,2) end-to-end (cast the raw double
    * column first, then arithmetic — the cross-engine float rule) and
    * only the final output casts to double.
    */
  private val q107 = QueryDef(
    "q107_ivm",
    (s, dir) => {
      val priced = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val olds = priced.filter(col("o_orderkey") % 7 =!= 0)
      val news = priced.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("price",
          when(col("o_orderkey") % 3 === 0, col("price") + lit(1))
            .otherwise(col("price")).cast("decimal(18,2)"))
      val snapshot = olds.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_rows"), sum(col("price")).as("price"))
      graft.ops.Cdc.applyDelta(
          snapshot, graft.ops.Cdc.changeSet(olds, news, "o_orderkey"),
          "o_custkey", Seq("price"))
        .select(col("o_custkey"), col("n_rows"),
          col("price").cast("double").as("sum_price"))
    },
    Some("""SELECT o_custkey, count(*) AS n_rows,
        sum((CASE WHEN o_orderkey % 3 = 0
             THEN o_totalprice::DECIMAL(18,2) + 1
             ELSE o_totalprice::DECIMAL(18,2) END)::DECIMAL(18,2))::DOUBLE
          AS sum_price
      FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY o_custkey"""))

  /** Deterministic shard export manifest (ops.ShardExport): 16-way
    * seeded hash sharding of the documents corpus with a within-shard
    * shuffle order, summarized per shard — count, bytes, ord range,
    * and a positional checksum that pins the exact within-shard
    * order (the restartable-export contract; both engines derive
    * identical placement from the portable hex60 hash).
    */
  private val q108 = QueryDef(
    "q108_shard_manifest",
    (s, dir) => graft.ops.ShardExport.manifest(
      graft.ops.ShardExport.assign(
        Tables.documents(s, dir), "doc_id", numShards = 16, seed = 8L),
      "doc_id", "n_chars"),
    Some {
      val shard = OracleSql.shard("doc_id::VARCHAR", 16, 8L)
      val ord = OracleSql.ord("doc_id::VARCHAR", 8L)
      s"""WITH a AS (SELECT doc_id, n_chars, $shard AS shard, $ord AS ord
           FROM documents),
         p AS (SELECT shard, n_chars, ord, doc_id,
             row_number() OVER (PARTITION BY shard ORDER BY ord, doc_id) AS pos
           FROM a),
         g AS (SELECT shard, count(*) AS n_docs,
             sum(n_chars)::BIGINT AS total_bytes,
             min(ord) AS min_ord, max(ord) AS max_ord,
             sum((pos % 1000000007) * (doc_id % 1000000007) %
               1000000007)::BIGINT AS raw_check
           FROM p GROUP BY shard)
       SELECT shard, n_docs, total_bytes, min_ord, max_ord,
         raw_check % 1000000007 AS perm_check FROM g"""
    })

  /** Deterministic mixture-interleave schedule (ops.Interleave): the
    * 20 document sources get integer weights 1–4 (from the source
    * index), and the first 240 positions of the merged training
    * stream are emitted with their virtual times. Integer-exact lcm
    * scaling keeps both engines' orderings identical; the per-source
    * rank prune keeps the global sort bounded at scale.
    */
  private val q109 = QueryDef(
    "q109_interleave",
    (s, dir) => {
      val weights = (0 until 20).map(i => s"src$i" -> (i % 4 + 1)).toMap
      graft.ops.Interleave.schedule(
        Tables.documents(s, dir), "source", "doc_id", weights, topN = 240)
    },
    Some(s"""WITH r AS (SELECT doc_id, source,
          12 // ((substr(source, 4)::INT % 4) + 1) AS step,
          row_number() OVER (PARTITION BY source
            ORDER BY ${OracleSql.hex60("'mix:' || doc_id::VARCHAR")}, doc_id)
            AS rnk
        FROM documents),
      v AS (SELECT doc_id, source, rnk * step AS vtime FROM r
        WHERE rnk <= 240)
      SELECT * FROM (
        SELECT row_number() OVER (ORDER BY vtime, source, doc_id) AS position,
          vtime, source, doc_id FROM v)
      WHERE position <= 240"""))

  /** Epoch-aware mixture schedule (ops.Interleave.epochSchedule): the
    * first 600 positions of a 20-source weighted interleave where each
    * source wraps around when its 25 (sf0.01) documents run out —
    * weight-4 sources re-enter epoch 2+ instead of exhausting, the
    * oversample-scarce-sources mechanic. The oracle rebuilds the slot
    * frame with generate_series and the same integer wrap/epoch
    * arithmetic.
    */
  private val q110 = QueryDef(
    "q110_epoch_schedule",
    (s, dir) => {
      val weights = (0 until 20).map(i => s"src$i" -> (i % 4 + 1)).toMap
      graft.ops.Interleave.epochSchedule(
        Tables.documents(s, dir), "source", "doc_id", weights, topN = 600)
    },
    Some(s"""WITH r AS (SELECT doc_id, source,
          row_number() OVER (PARTITION BY source
            ORDER BY ${OracleSql.hex60("'mix:' || doc_id::VARCHAR")}, doc_id)
            AS rnk
        FROM documents),
      n AS (SELECT source, count(*) AS ns,
          12 // ((substr(source, 4)::INT % 4) + 1) AS step
        FROM documents GROUP BY source),
      s AS (SELECT n.source, t.m, t.m * n.step AS vtime,
          (t.m - 1) // n.ns + 1 AS epoch,
          (t.m - 1) % n.ns + 1 AS rnk
        FROM n, generate_series(1, 600) t(m)),
      j AS (SELECT s.vtime, s.epoch, s.source, s.m, r.doc_id
        FROM s JOIN r ON s.source = r.source AND s.rnk = r.rnk)
      SELECT * EXCLUDE (m) FROM (
        SELECT row_number() OVER (ORDER BY vtime, source, m) AS position,
          vtime, epoch, source, m, doc_id FROM j)
      WHERE position <= 600"""))

  /** Non-distributive IVM (ops.Cdc.refreshGroups): the same
    * orders-table CDC scenario as q107, but maintaining MIN/MAX
    * aggregates a delta cannot patch — only the groups the change set
    * touches re-aggregate from the new base state; every other group's
    * snapshot row carries over unread. Oracle = full recompute.
    */
  private val q111 = QueryDef(
    "q111_ivm_minmax",
    (s, dir) => {
      val priced = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val olds = priced.filter(col("o_orderkey") % 7 =!= 0)
      val news = priced.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("price",
          when(col("o_orderkey") % 3 === 0, col("price") + lit(1))
            .otherwise(col("price")).cast("decimal(18,2)"))
      def aggFn(df: org.apache.spark.sql.DataFrame) =
        df.groupBy(col("o_custkey")).agg(
          count(lit(1)).as("n_rows"),
          min(col("price")).as("min_price"),
          max(col("price")).as("max_price"))
      graft.ops.Cdc.refreshGroups(
          aggFn(olds), news, graft.ops.Cdc.changeSet(olds, news, "o_orderkey"),
          "o_custkey")(aggFn)
        .select(col("o_custkey"), col("n_rows"),
          col("min_price").cast("double").as("min_price"),
          col("max_price").cast("double").as("max_price"))
    },
    Some("""SELECT o_custkey, count(*) AS n_rows,
        min((CASE WHEN o_orderkey % 3 = 0
             THEN o_totalprice::DECIMAL(18,2) + 1
             ELSE o_totalprice::DECIMAL(18,2) END)::DECIMAL(18,2))::DOUBLE
          AS min_price,
        max((CASE WHEN o_orderkey % 3 = 0
             THEN o_totalprice::DECIMAL(18,2) + 1
             ELSE o_totalprice::DECIMAL(18,2) END)::DECIMAL(18,2))::DOUBLE
          AS max_price
      FROM orders WHERE o_orderkey % 5 <> 0 GROUP BY o_custkey"""))

  /** k-anonymity audit (ops.Privacy): re-identification risk of the
    * customer table's quasi-identifier combination (nation, segment,
    * account-balance band) — combos and rows that are unique, small
    * (< k=5), or anonymous. The band uses floor() on BOTH engines
    * (Spark double→long truncates toward zero, DuckDB rounds — floor
    * is the portable form, and balances go negative).
    */
  private val q113 = QueryDef(
    "q113_k_anonymity",
    (s, dir) => graft.ops.Privacy.kAnonymityReport(
      Tables.customer(s, dir).select(
        col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band")),
      k = 5),
    Some("""WITH g AS (SELECT c_nationkey, c_mktsegment,
          floor(c_acctbal / 1000.0)::BIGINT AS bal_band, count(*) AS n
        FROM customer GROUP BY 1, 2, 3)
      SELECT CASE WHEN n = 1 THEN 'unique'
                  WHEN n < 5 THEN 'small'
                  ELSE 'anonymous' END AS bucket,
        count(*) AS n_combos, sum(n)::BIGINT AS n_rows
      FROM g GROUP BY 1"""))

  /** t-closeness audit (ops.Privacy.tClosenessReport — q113's
    * distribution-level companion): per (mktsegment, nation) combo,
    * the ordered-domain earth-mover's distance between the combo's
    * balance-band distribution and the global one, as an exact
    * integer ppm (cross-multiplied masses in decimal(38,0), one
    * integer division at the end — no float anywhere). The grid is
    * combos × |domain| rows — bounded by construction, never
    * corpus-sized (the PlanContractSpec boundedBnlj contract).
    */
  private val q212 = QueryDef(
    "q212_t_closeness",
    (s, dir) => graft.ops.Privacy.tClosenessReport(
      Tables.customer(s, dir).select(
        col("c_mktsegment"),
        col("c_nationkey"),
        floor(col("c_acctbal") / 1000.0).cast("long").as("bal_band")),
      Seq("c_mktsegment", "c_nationkey"), "bal_band"),
    Some("""WITH rows_ AS (SELECT c_mktsegment AS seg, c_nationkey AS nat,
          floor(c_acctbal / 1000.0)::BIGINT AS v
        FROM customer WHERE c_acctbal IS NOT NULL),
      cell AS (SELECT seg, nat, v, count(*) AS c FROM rows_ GROUP BY 1, 2, 3),
      dom AS (SELECT DISTINCT v FROM cell),
      combos AS (SELECT seg, nat, sum(c) AS ng FROM cell GROUP BY 1, 2),
      grid AS (SELECT combos.seg, combos.nat, combos.ng, dom.v,
          coalesce(cell.c, 0) AS c
        FROM combos CROSS JOIN dom
        LEFT JOIN cell ON cell.seg = combos.seg AND cell.nat = combos.nat
          AND cell.v = dom.v),
      domcum AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cum
        FROM (SELECT v, sum(c) AS cv FROM cell GROUP BY v)),
      tot AS (SELECT count(*) AS n FROM rows_),
      nd AS (SELECT count(*) AS d FROM dom),
      st AS (SELECT g.seg, g.nat, g.ng, g.v,
          sum(g.c) OVER (PARTITION BY g.seg, g.nat ORDER BY g.v) AS cumg,
          dc.cum,
          row_number() OVER (PARTITION BY g.seg, g.nat ORDER BY g.v) AS rn
        FROM grid g JOIN domcum dc USING (v)),
      terms AS (SELECT seg, nat, ng,
          abs(cumg * (SELECT n FROM tot) - cum * ng) AS term
        FROM st WHERE rn < (SELECT d FROM nd))
      SELECT seg AS c_mktsegment, nat AS c_nationkey,
        min(ng)::BIGINT AS n_rows,
        (sum(term) * 1000000 // (min(ng) * (SELECT n FROM tot)
          * ((SELECT d FROM nd) - 1)))::BIGINT AS emd_ppm
      FROM terms GROUP BY 1, 2"""))

  /** Per-source quota cap report — corpus balancing: each source keeps
    * at most its 10 highest-quality documents (n_chars as the quality
    * stand-in, the q104 contract) and the report shows what the cap
    * retains per source. The kept set comes from the bounded-heap
    * grouped top-k (shuffle capped at k rows per group × partition),
    * so a dominant source never single-task-sorts.
    */
  private val q114 = QueryDef(
    "q114_quota_report",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val kept = graft.ops.TopK.groupedTopK(
          docs, Seq("source"), "n_chars", "doc_id", k = 10)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("score").cast("long")).as("chars_kept"))
      docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n_total"), sum(col("n_chars")).as("chars_total"))
        .join(kept, Seq("source"))
        .select(col("source"), col("n_total"), col("n_kept"),
          col("chars_total"), col("chars_kept"))
    },
    Some("""WITH r AS (SELECT source, n_chars,
          row_number() OVER (PARTITION BY source
            ORDER BY n_chars DESC, doc_id ASC) AS rank
        FROM documents),
      k AS (SELECT source, count(*) AS n_kept,
          sum(n_chars)::BIGINT AS chars_kept
        FROM r WHERE rank <= 10 GROUP BY source),
      t AS (SELECT source, count(*) AS n_total,
          sum(n_chars)::BIGINT AS chars_total
        FROM documents GROUP BY source)
      SELECT t.source, n_total, n_kept, chars_total, chars_kept
      FROM t JOIN k USING (source)"""))

  /** Per-node triangle count + clustering coefficient
    * (Graph.triangleStats) on the top-3 PARTNER graph: each supplier
    * keeps its 3 strongest co-part partners (shared-part count DESC,
    * id ASC — the TopKHeap order), via the bounded-heap groupedTopK.
    * The raw "shares ≥2 parts" co-occurrence graph saturates into a
    * near-complete graph on a small vertex set (at sf0.1 it IS
    * K_1000: 499,500 edges, ~166M triangles) — a top-k partner
    * sparsification bounds degree ≤ 2k at EVERY scale, which is both
    * the honest analysis (clustering among strongest partners) and
    * the only shape whose wedge join survives growth. The oracle
    * enumerates the identical triangle set with plain id-order a<b<c
    * — orientation moves which vertex finds a triangle, never the
    * set.
    */
  /** Top-3 shared-parts supplier graph shared by q127/q135: per-part
    * supplier sets collect in ONE bounded shuffle (suppliers per part
    * is a data-model constant) and the i<j pairs expand map-side from
    * the sorted array — the q102 co-occurrence shape, replacing a
    * self-join shuffle of the full (p, sup) set; top-k partner
    * sparsification bounds every degree before any graph algorithm
    * runs. `collect_set` fuses the dedup INTO the collection — the
    * partial aggregate drops repeat (part, supplier) sightings
    * map-side, so the lineitem scan reaches the exchange already
    * set-reduced and no separate `distinct()` shuffle precedes it
    * (sortedPairs sorts its input, so set order is irrelevant).
    * Output: directed (src, dst) edge picks.
    */
  /** The SESSION-CACHED supplier co-occurrence graph: built and
    * pinned once per (SparkContext, dir) via [[graft.ops
    * .GraphFrameLite.cached]], then reused by every graph query
    * (q127/q135/q146/q150/q167/q170/q181/q182) — each used to replay
    * the 8.7M-pair co-occurrence prefix from scratch, 1–2 s per query
    * at sf0.1. The derived canonical/symmetric/degree frames are
    * likewise pinned once and shared.
    */
  private def supplierGraphLite(s: org.apache.spark.sql.SparkSession,
      dir: String): graft.ops.GraphFrameLite =
    graft.ops.GraphFrameLite.cached(s, s"supplier:$dir") {
      // the pair stream (the only quadratic object here) shuffles as
      // ONE packed long key (a << 32 | b — suppkeys are well under
      // 2³²), so the dense co-occurrence groupBy hashes/exchanges half
      // the bytes of the two-column struct form; unpack after the
      // count. The RESULT is pinned (localCheckpoint): every consumer
      // is a graph algorithm that references its edges several times
      // (degree tables, wedge joins, adjacency probes), and without
      // the pin each reference replays the co-occurrence prefix —
      // measured 2-3× the whole query's cost on q127/q135/q170. At
      // cluster scale the pin is a persist of ~|V|·k edge rows.
      val shared = Tables.lineitem(s, dir)
        .select(col("l_partkey").as("p"), col("l_suppkey").cast("long").as("sup"))
        .groupBy(col("p"))
        .agg(collect_set(col("sup")).as("sups"))
        .select(explode(
          graft.functions.Kernels.sortedPairKeysOf(col("sups"))).as("pk"))
        .groupBy(col("pk"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 2)
        .select(shiftright(col("pk"), 32).as("x"),
          col("pk").bitwiseAND(lit(0xffffffffL)).as("y"), col("shared"))
      val sym = shared.select(col("x").as("src"), col("y").as("dst"), col("shared"))
        .unionAll(shared.select(col("y").as("src"), col("x").as("dst"), col("shared")))
      graft.ops.TopK.groupedTopK(sym, Seq("src"), "shared", "dst", 3)
        .select(col("src"), col("dst"))
        .localCheckpoint(true)
    }

  private def supplierGraph(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame =
    supplierGraphLite(s, dir).edges

  /** Oracle CTEs mirroring [[supplierGraph]] plus its canonical
    * undirected form `e0(u, v)` — the prefix q127 and q135 share.
    */
  private val sqlSupplierGraphCtes: String =
    // AS MATERIALIZED: DuckDB inlines plain CTEs per reference, so the
    // unrolled graph oracles (3 rank/peel/label rounds, each referencing
    // e0/de) would re-execute the 9M-pair co-occurrence prefix once per
    // reference — measured 7.5 s -> 0.14 s on q146 at sf0.01 alone
    """ps AS MATERIALIZED (SELECT DISTINCT l_partkey AS p, l_suppkey AS sup
          FROM lineitem),
      sh AS MATERIALIZED (SELECT a.sup AS x, b.sup AS y, count(*) AS shared
        FROM ps a JOIN ps b ON a.p = b.p AND a.sup < b.sup
        GROUP BY a.sup, b.sup HAVING count(*) >= 2),
      sym AS MATERIALIZED (SELECT x AS src, y AS dst, shared FROM sh
        UNION ALL SELECT y AS src, x AS dst, shared FROM sh),
      top AS MATERIALIZED (SELECT src, dst FROM (SELECT src, dst,
          row_number() OVER (PARTITION BY src
            ORDER BY shared DESC, dst ASC) AS rk FROM sym) WHERE rk <= 3),
      e0 AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
        FROM top),
      deg AS MATERIALIZED (SELECT node, count(*) AS degree FROM
          (SELECT u AS node FROM e0 UNION ALL SELECT v FROM e0)
        GROUP BY node)"""

  private val q127 = QueryDef(
    "q127_triangles",
    (s, dir) => graft.ops.Graph.triangleStats(supplierGraphLite(s, dir)),
    Some(s"""WITH $sqlSupplierGraphCtes,
      tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM e0 e1 JOIN e0 e2 ON e2.u = e1.v
        JOIN e0 e3 ON e3.u = e1.u AND e3.v = e2.v),
      pn AS (SELECT node, count(*) AS n_triangles FROM
          (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
           UNION ALL SELECT c FROM tri)
        GROUP BY node)
      SELECT d.node, d.degree::BIGINT AS degree,
        coalesce(pn.n_triangles, 0)::BIGINT AS n_triangles,
        CASE WHEN d.degree >= 2 THEN (coalesce(pn.n_triangles, 0) * 2)::DOUBLE
          / (d.degree * (d.degree - 1))::DOUBLE END AS cc
      FROM deg d LEFT JOIN pn ON pn.node = d.node"""))

  /** Exact 2-D Pareto frontier of the part catalog — cheapest price at
    * every size level nothing dominates (ops.Skyline): local frontier
    * per partition via a running-min window, global pass only over the
    * local survivors. Prices compare as exact integer cents (the
    * driver bans DECIMAL outputs); the frontier is order-isomorphic
    * under the ×100 scaling so the semantics are unchanged.
    */
  private val q133 = QueryDef(
    "q133_skyline",
    (s, dir) => {
      val pts = Tables.part(s, dir).select(
        (col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("sz"))
      graft.ops.Skyline.frontier2D(pts, "price_cents", "sz")
    },
    Some("""WITH pts AS (SELECT DISTINCT (p_retailprice * 100)::BIGINT AS price_cents,
          p_size::BIGINT AS sz
        FROM part WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL),
      w AS (SELECT price_cents, sz,
          min(sz) OVER (ORDER BY price_cents, sz
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
        FROM pts)
      SELECT price_cents, sz FROM w WHERE pm IS NULL OR sz < pm"""))

  /** Robust per-priority outlier statistics on order totals
    * (ops.Robust): exact lower median + MAD over the pre-aggregated
    * cents domain, outliers flagged by the integer compare
    * |v − median| > 3·MAD — the heavy-tail-safe companion to q100's
    * z-score, with no float anywhere.
    */
  private val q134 = QueryDef(
    "q134_mad_outliers",
    (s, dir) => {
      val rows = Tables.orders(s, dir).select(
        col("o_orderpriority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      graft.ops.Robust.medianMadOutliers(rows, "o_orderpriority", "cents", k = 3)
    },
    Some("""WITH rows_ AS (SELECT o_orderpriority AS g,
          (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT AS v
          FROM orders),
      dom AS (SELECT g, v, count(*) AS n FROM rows_ GROUP BY 1, 2),
      med AS (SELECT g, min(v) AS median_v FROM (
          SELECT g, v,
            (sum(n) OVER (PARTITION BY g ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
            (sum(n) OVER (PARTITION BY g))::BIGINT AS tot
          FROM dom) WHERE cum * 2 >= tot GROUP BY g),
      dev AS (SELECT r.g, abs(r.v - m.median_v) AS d, m.median_v
        FROM rows_ r JOIN med m ON m.g = r.g),
      ddom AS (SELECT g, d, count(*) AS n FROM dev GROUP BY 1, 2),
      mad AS (SELECT g, min(d) AS mad_v FROM (
          SELECT g, d,
            (sum(n) OVER (PARTITION BY g ORDER BY d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
            (sum(n) OVER (PARTITION BY g))::BIGINT AS tot
          FROM ddom) WHERE cum * 2 >= tot GROUP BY g)
      SELECT dev.g AS o_orderpriority, count(*) AS n_rows,
        min(dev.median_v) AS median_v, min(mad.mad_v) AS mad_v,
        count(CASE WHEN dev.d > mad.mad_v * 3 THEN 1 END) AS n_outliers
      FROM dev JOIN mad ON mad.g = dev.g
      GROUP BY dev.g"""))

  /** Degree assortativity of the sparsified supplier graph
    * (ops.Graph.assortativity): Pearson correlation of endpoint
    * degrees over both edge orientations, moment sums exact
    * decimal(38,0)/int128 so both engines divide identical integers;
    * linear in edges, degree table AQE-broadcastable.
    */
  private val q135 = QueryDef(
    "q135_assortativity",
    (s, dir) => graft.ops.Graph.assortativity(supplierGraphLite(s, dir)),
    Some(s"""WITH $sqlSupplierGraphCtes,
      de AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
      xy AS (SELECT dx.degree AS x, dy.degree AS y
        FROM de JOIN deg dx ON dx.node = de.u JOIN deg dy ON dy.node = de.v),
      m AS (SELECT count(*) AS m, sum(x) AS sx, sum(y) AS sy,
          sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
        FROM xy)
      SELECT m AS n_edges,
        CASE WHEN m * sxx > sx * sx
          THEN (m * sxy - sx * sy)::DOUBLE
            / (sqrt((m * sxx - sx * sx)::DOUBLE)
              * sqrt((m * syy - sy * sy)::DOUBLE)) END AS assortativity
      FROM m"""))

  /** One-pass Pearson correlation matrix over lineitem's four measures
    * (Stats.corrMatrix): all 14 moment sums (n, 4 sums, 4
    * sum-of-squares, 6 cross products) in ONE aggregation over ONE
    * scan — map-side partials to a single row, pair melt map-side from
    * it. Raw doubles scale to decimal(38,0) integers before any sum
    * (the q82 integer-mass rule), so every moment is exact and
    * order-independent; doubles enter only in the final corr
    * expression, an identical tree on both engines.
    */
  private val q142 = QueryDef(
    "q142_corr_matrix",
    (s, dir) => graft.ops.Stats.corrMatrix(
      Tables.lineitem(s, dir),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"), scale = 100),
    Some("""WITH q AS (SELECT
        (CAST(l_quantity AS DECIMAL(18,4)) * 100)::HUGEINT AS a,
        (CAST(l_extendedprice AS DECIMAL(18,4)) * 100)::HUGEINT AS b,
        (CAST(l_discount AS DECIMAL(18,4)) * 100)::HUGEINT AS c,
        (CAST(l_tax AS DECIMAL(18,4)) * 100)::HUGEINT AS d
        FROM lineitem),
      m AS (SELECT count(*)::HUGEINT AS n,
          sum(a)::HUGEINT AS sa, sum(b)::HUGEINT AS sb,
          sum(c)::HUGEINT AS sc, sum(d)::HUGEINT AS sd,
          sum(a*a)::HUGEINT AS saa, sum(b*b)::HUGEINT AS sbb,
          sum(c*c)::HUGEINT AS scc, sum(d*d)::HUGEINT AS sdd,
          sum(a*b)::HUGEINT AS sab, sum(a*c)::HUGEINT AS sac,
          sum(a*d)::HUGEINT AS sad, sum(b*c)::HUGEINT AS sbc,
          sum(b*d)::HUGEINT AS sbd, sum(c*d)::HUGEINT AS scd
        FROM q)
      SELECT p.x, p.y, n::BIGINT AS n, p.corr FROM m, LATERAL (SELECT unnest([
        {'x': 'l_quantity', 'y': 'l_extendedprice',
         'corr': (n*sab - sa*sb)::DOUBLE
           / (sqrt((n*saa - sa*sa)::DOUBLE) * sqrt((n*sbb - sb*sb)::DOUBLE))},
        {'x': 'l_quantity', 'y': 'l_discount',
         'corr': (n*sac - sa*sc)::DOUBLE
           / (sqrt((n*saa - sa*sa)::DOUBLE) * sqrt((n*scc - sc*sc)::DOUBLE))},
        {'x': 'l_quantity', 'y': 'l_tax',
         'corr': (n*sad - sa*sd)::DOUBLE
           / (sqrt((n*saa - sa*sa)::DOUBLE) * sqrt((n*sdd - sd*sd)::DOUBLE))},
        {'x': 'l_extendedprice', 'y': 'l_discount',
         'corr': (n*sbc - sb*sc)::DOUBLE
           / (sqrt((n*sbb - sb*sb)::DOUBLE) * sqrt((n*scc - sc*sc)::DOUBLE))},
        {'x': 'l_extendedprice', 'y': 'l_tax',
         'corr': (n*sbd - sb*sd)::DOUBLE
           / (sqrt((n*sbb - sb*sb)::DOUBLE) * sqrt((n*sdd - sd*sd)::DOUBLE))},
        {'x': 'l_discount', 'y': 'l_tax',
         'corr': (n*scd - sc*sd)::DOUBLE
           / (sqrt((n*scc - sc*sc)::DOUBLE) * sqrt((n*sdd - sd*sd)::DOUBLE))}])
        AS p) p"""))

  /** Data-quality expectations battery (Expectations.check): all
    * row-local rules (not-null, range, accepted-set, uniqueness) fold
    * into ONE wide aggregation over ONE scan — one pass however many
    * rules are declared — and the referential rule is a single
    * distinct-key left join counting misses and total together. The
    * pre-publish validation gate an ETL book runs; exact violation
    * counts, boolean verdicts.
    */
  private val q145 = QueryDef(
    "q145_expectations",
    (s, dir) => {
      import graft.ops.Expectations._
      check(Tables.orders(s, dir), Seq(
        NotNull("o_custkey"),
        Unique("o_orderkey"),
        InRange("o_totalprice", 0, 250000),
        InSet("o_orderstatus", Seq("O", "F")),
        ForeignKey("o_custkey", Tables.customer(s, dir), "c_custkey")))
    },
    Some("""WITH t AS (SELECT count(*) AS total,
        count(*) FILTER (o_custkey IS NULL) AS v_nn,
        count(o_orderkey) - count(DISTINCT o_orderkey) AS v_u,
        count(*) FILTER (o_totalprice IS NOT NULL
          AND (o_totalprice < 0 OR o_totalprice > 250000)) AS v_r,
        count(*) FILTER (o_orderstatus IS NOT NULL
          AND o_orderstatus NOT IN ('O', 'F')) AS v_s
        FROM orders),
      fk AS (SELECT
          count(*) FILTER (o.o_custkey IS NOT NULL AND c.c_custkey IS NULL)
            AS v_fk,
          count(*) AS total
        FROM orders o
        LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
          ON o.o_custkey = c.c_custkey)
      SELECT rule, "column", violations, total, violations = 0 AS pass FROM (
        SELECT 'not_null' AS rule, 'o_custkey' AS "column",
          v_nn::BIGINT AS violations, total::BIGINT AS total FROM t
        UNION ALL SELECT 'unique', 'o_orderkey', v_u::BIGINT, total::BIGINT FROM t
        UNION ALL SELECT 'in_range', 'o_totalprice', v_r::BIGINT, total::BIGINT FROM t
        UNION ALL SELECT 'in_set', 'o_orderstatus', v_s::BIGINT, total::BIGINT FROM t
        UNION ALL SELECT 'foreign_key', 'o_custkey', v_fk::BIGINT, total::BIGINT FROM fk)"""))

  /** Full driver-looped PageRank (Graph.pagerank), 3 iterations over
    * the symmetric top-3-sparsified supplier graph — integer-quantized
    * rank mass (teleport + ⌊85·Σ⌊rank/outdeg⌋/100⌋) so every
    * iteration's trajectory is exact under any partitioning;
    * localCheckpoint cuts lineage per round (the k-means loop rule).
    * The oracle replays the loop UNROLLED as three chained CTEs — the
    * driver loop and the unrolled plan must agree bit-for-bit.
    */
  private val q146 = QueryDef(
    "q146_pagerank",
    (s, dir) =>
      graft.ops.Graph.pagerank(supplierGraphLite(s, dir), iterations = 3),
    Some {
      val steps = (1 to 3).map { k =>
        s"""r$k AS (SELECT b.node,
           (150000000000 + (85 * coalesce(i.inc, 0)) // 100)::BIGINT AS rank,
           b.outdeg
           FROM r${k - 1} b LEFT JOIN (SELECT de.dst AS node,
             sum(r${k - 1}.rank // r${k - 1}.outdeg) AS inc
             FROM de JOIN r${k - 1} ON r${k - 1}.node = de.src
             GROUP BY de.dst) i USING (node))"""
      }.mkString(",\n      ")
      s"""WITH $sqlSupplierGraphCtes,
      de AS MATERIALIZED (SELECT u AS src, v AS dst FROM e0
        UNION ALL SELECT v AS src, u AS dst FROM e0),
      nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
      od AS (SELECT src AS node, count(*) AS outdeg FROM de GROUP BY src),
      r0 AS (SELECT n.node, 1000000000000::BIGINT AS rank, od.outdeg
        FROM nodes n LEFT JOIN od USING (node)),
      $steps
      SELECT node, rank FROM r3"""
    })

  /** Fixed-round k-core peel (Graph.kcore) over the sparsified
    * supplier graph: 3 rounds of "delete nodes with surviving degree
    * < 4" — the dense-region extractor. The oracle replays the peel
    * UNROLLED (three degree/filter CTE rounds), and both trajectories
    * must agree edge-for-edge because each round is a pure function of
    * the previous survivor set.
    */
  private val q150 = QueryDef(
    "q150_kcore",
    (s, dir) => graft.ops.Graph.kcore(supplierGraphLite(s, dir), k = 4, rounds = 3),
    Some {
      val steps = (1 to 3).map { r =>
        s"""dd$r AS (SELECT node, count(*) AS degree FROM
            (SELECT u AS node FROM e${r - 1} UNION ALL SELECT v FROM e${r - 1})
          GROUP BY node),
      e$r AS (SELECT p.u, p.v FROM e${r - 1} p
          JOIN (SELECT node FROM dd$r WHERE degree >= 4) a ON a.node = p.u
          JOIN (SELECT node FROM dd$r WHERE degree >= 4) b ON b.node = p.v)"""
      }.mkString(",\n      ")
      s"""WITH $sqlSupplierGraphCtes,
      $steps
      SELECT node, count(*)::BIGINT AS degree FROM
        (SELECT u AS node FROM e3 UNION ALL SELECT v FROM e3)
      GROUP BY node"""
    })

  /** Banded interval-overlap self-join (IntervalJoin.selfOverlapPairs):
    * overlapping per-(supplier, part) handling windows
    * [ship day, ship day + ⌊quantity/5⌋]. The θ-overlap predicate
    * becomes an EQUI-join on (keys, time band) with a canonical-band
    * guard emitting each pair exactly once — no BroadcastNestedLoop,
    * no post-hoc distinct. The oracle states the naive θ-join directly
    * (exact at oracle scale); the banded plan must reproduce it.
    */
  private val q151 = QueryDef(
    "q151_interval_join",
    (s, dir) => {
      val iv = Tables.lineitem(s, dir).select(
        col("l_suppkey").as("suppkey"), col("l_partkey").as("partkey"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("line_id"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 86400000000")
          .as("s_day"),
        expr("CAST(l_quantity AS BIGINT) div 5").as("__len"))
        .withColumn("e_day", col("s_day") + col("__len"))
      // W swept at sf0.1 (2-pass, local[32]): derived-median 6 ->
      // 2.60s, 16 -> 1.74s, 64 -> 1.56s, effectively-unbanded ->
      // 1.61s. (suppkey, partkey) is selective enough that bucket
      // tightness never pays here and replication is the whole cost;
      // W = 64 rides the flat optimum while still banding time so
      // per-(key, band) candidate sets stay bounded as density grows
      graft.ops.IntervalJoin.selfOverlapPairs(iv,
        Seq("suppkey", "partkey"), "line_id", "s_day", "e_day",
        bandWidth = 64L)
    },
    Some("""WITH iv AS (SELECT l_suppkey AS suppkey, l_partkey AS partkey,
          l_orderkey * 10 + l_linenumber AS line_id,
          epoch_us(l_shipdate) // 86400000000 AS s,
          epoch_us(l_shipdate) // 86400000000
            + CAST(l_quantity AS BIGINT) // 5 AS e
        FROM lineitem)
      SELECT a.suppkey, a.partkey, a.line_id AS id_a, b.line_id AS id_b,
        (least(a.e, b.e) - greatest(a.s, b.s) + 1)::BIGINT AS overlap
      FROM iv a JOIN iv b
        ON a.suppkey = b.suppkey AND a.partkey = b.partkey
        AND a.line_id < b.line_id AND a.s <= b.e AND b.s <= a.e"""))

  /** Linear-interpolation imputation (Interpolate.linear) over the q70
    * calendar spine: gaps in each priority's daily order cents
    * reconstruct as the integer lerp
    * ⌊(vₚ(tₙ−t) + vₙ(t−tₚ)) div (tₙ−tₚ)⌋ between the bracketing
    * observations — pure long arithmetic, so both engines' gap values
    * are identical; ends stay null (no extrapolation). One window
    * exchange serves both frame directions.
    */
  private val q152 = QueryDef(
    "q152_interpolate",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val dayIdx = expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      val daily = orders
        .groupBy(col("o_orderpriority").as("priority"), dayIdx.as("day_idx"))
        .agg(sum((col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long")).as("obs_cents"))
      val days = orders.agg(min(dayIdx).as("lo"), max(dayIdx).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day_idx"))
      val spine = orders.select(col("o_orderpriority").as("priority"))
        .distinct().crossJoin(days)
      val base = spine.join(broadcast(daily), Seq("priority", "day_idx"), "left")
      graft.ops.Interpolate.linear(base, "priority", "day_idx", "obs_cents")
    },
    Some("""WITH daily AS (SELECT o_orderpriority AS priority,
          epoch_us(o_orderdate) // 86400000000 AS day_idx,
          sum((CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT)::BIGINT
            AS obs_cents
        FROM orders GROUP BY 1, 2),
      span AS (SELECT min(epoch_us(o_orderdate) // 86400000000) AS lo,
          max(epoch_us(o_orderdate) // 86400000000) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM span),
      prios AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
      spine AS (SELECT priority, day_idx FROM prios CROSS JOIN days),
      base AS (SELECT priority, day_idx, obs_cents
        FROM spine LEFT JOIN daily USING (priority, day_idx)),
      w AS (SELECT priority, day_idx, obs_cents,
          last_value(obs_cents IGNORE NULLS) OVER (PARTITION BY priority
            ORDER BY day_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
          last_value(CASE WHEN obs_cents IS NOT NULL THEN day_idx END
            IGNORE NULLS) OVER (PARTITION BY priority ORDER BY day_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
          first_value(obs_cents IGNORE NULLS) OVER (PARTITION BY priority
            ORDER BY day_idx
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
          first_value(CASE WHEN obs_cents IS NOT NULL THEN day_idx END
            IGNORE NULLS) OVER (PARTITION BY priority ORDER BY day_idx
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM base)
      SELECT priority, day_idx, obs_cents,
        CASE WHEN obs_cents IS NOT NULL THEN obs_cents
          WHEN pv IS NOT NULL AND nv IS NOT NULL
            THEN (pv * (nt - day_idx) + nv * (day_idx - pt)) // (nt - pt)
        END AS interp
      FROM w"""))

  /** Benford first-digit audit (Benford.firstDigitAudit) of order
    * totals per priority: observed digit mass ⌊2²⁰·n/total⌋ against
    * the PRE-QUANTIZED Benford literals ⌊2²⁰·log₁₀(1+1/d)⌋ — the same
    * nine constants on both engines, so no runtime log/float anywhere.
    * Synthetic uniform-ish prices will deviate hard; that deviation
    * vector is exactly what the audit reports.
    */
  private val q153 = QueryDef(
    "q153_benford",
    (s, dir) => graft.ops.Benford.firstDigitAudit(
      Tables.orders(s, dir)
        .select(col("o_orderpriority").as("priority"),
          (col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long").as("cents")),
      "priority", "cents"),
    Some("""WITH c AS (SELECT o_orderpriority AS priority,
          substring(((CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT)
            ::VARCHAR, 1, 1)::BIGINT AS digit
        FROM orders
        WHERE (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT > 0),
      n AS (SELECT priority, digit, count(*)::BIGINT AS n
        FROM c GROUP BY 1, 2),
      t AS (SELECT priority, sum(n)::BIGINT AS total FROM n GROUP BY 1),
      d AS (SELECT unnest(generate_series(1, 9))::BIGINT AS digit,
          unnest([315652, 184645, 131007, 101617, 83027, 70198, 60808,
            53637, 47980])::BIGINT AS benford_q),
      g AS (SELECT t.priority, d.digit, t.total, d.benford_q,
          coalesce(n.n, 0)::BIGINT AS n
        FROM t CROSS JOIN d LEFT JOIN n
          ON n.priority = t.priority AND n.digit = d.digit)
      SELECT priority, digit, n, total,
        ((1048576 * n) // total)::BIGINT AS obs_q, benford_q,
        ((1048576 * n) // total - benford_q)::BIGINT AS dev_q
      FROM g"""))

  /** Sequential-pattern mining (Sequence.topPaths): the top-25
    * length-3 event paths — the n-gram generalization of q75's
    * transition matrix. ONE exchange on user_id serves both leads
    * (single partitioned sort); top-k is TakeOrderedAndProject with
    * the (n DESC, path ASC) total order, identical on both engines.
    */
  private val q155 = QueryDef(
    "q155_event_paths",
    (s, dir) => graft.ops.Sequence.topPaths(
      Tables.events(s, dir), "user_id", "ts", "event_id", "event_type",
      gramLen = 3, k = 25),
    Some("""WITH g AS (SELECT event_type AS t1,
          lead(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS t2,
          lead(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS t3
        FROM events)
      SELECT t1, t2, t3, count(*)::BIGINT AS n FROM g
      WHERE t1 IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1, 2, 3 ORDER BY n DESC, t1, t2, t3 LIMIT 25"""))

  /** Per-key salting plan (Skew.saltPlan): measured key counts and the
    * ⌈n/target⌉ fan-out each needs so no (key, salt) task exceeds the
    * target — the pre-flight artifact that turns q51's guessed global
    * salt constant into per-key factors (cold keys stay at 1). One
    * map-side pre-reduced aggregation; always cheaper than the skewed
    * shuffle it sizes.
    */
  private val q156 = QueryDef(
    "q156_salt_plan",
    (s, dir) => graft.ops.Skew.saltPlan(
      Tables.events(s, dir), Seq("event_type"), targetRows = 10000L),
    Some("""SELECT event_type, count(*)::BIGINT AS n,
        ((count(*) + 9999) // 10000)::BIGINT AS salt
      FROM events GROUP BY event_type"""))

  /** Consistent-hash ring rebalance plan
    * (ShardExport.ringRebalancePlan): the (from, to) id-move matrix
    * for a 16 → 20 shard resize over two literal vnode rings —
    * placement entirely map-side, one bounded count aggregation. The
    * oracle rebuilds the rings from the same vnode key strings through
    * its own md5, so hash derivation AND placement are both checked;
    * the diagonal mass is the consistent-hashing guarantee mod-N
    * resharding forfeits.
    */
  private val q159 = QueryDef(
    "q159_ring_rebalance",
    (s, dir) => graft.ops.ShardExport.ringRebalancePlan(
      Tables.customer(s, dir), "c_custkey",
      fromShards = 16, toShards = 20, vnodesPerShard = 3, seed = 7L),
    Some {
      import graft.ops.ShardExport.{vnodeHash, vnodeKey}
      def ringSql(shards: Int): (String, String) = {
        val ring = (0 until shards).flatMap { sh =>
          (0 until 3).map(v =>
            (vnodeHash(7L, sh, v), sh.toLong, vnodeKey(7L, sh, v)))
        }.sortBy(_._1)
        (ring.map(r => OracleSql.hex60(s"'${r._3}'")).mkString("[", ",\n          ", "]"),
          ring.map(_._2).mkString("[", ", ", "]"))
      }
      val (hsA, ssA) = ringSql(16)
      val (hsB, ssB) = ringSql(20)
      def assign(hs: String, ss: String, n: Int): String =
        s"""CASE WHEN len(list_filter($hs, h -> h < x)) = $n
            THEN ($ss)[1]
            ELSE ($ss)[len(list_filter($hs, h -> h < x)) + 1] END"""
      s"""WITH ids AS (SELECT ${OracleSql.hex60("c_custkey::VARCHAR")} AS x
          FROM customer)
        SELECT ${assign(hsA, ssA, 48)}::BIGINT AS from_shard,
          ${assign(hsB, ssB, 60)}::BIGINT AS to_shard,
          count(*)::BIGINT AS n_ids
        FROM ids GROUP BY 1, 2"""
    })

  /** Integer EMA smoothing (Smooth.ema) over the zero-filled daily
    * order counts: α = 1/4 as the exact recurrence
    * `y = (3·y_prev + x) div 4` folded per series inside codegen (the
    * bounded-group collect — recurrences are what window frames CANNOT
    * express). The oracle replays the identical recurrence as a
    * RECURSIVE CTE walking the gap-free day spine.
    */
  private val q161 = QueryDef(
    "q161_ema",
    (s, dir) => {
      val orders = Tables.orders(s, dir)
      val dayIdx = expr(
        "unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
      val daily = orders
        .groupBy(col("o_orderpriority").as("priority"), dayIdx.as("day_idx"))
        .agg(count(lit(1)).as("n"))
      val days = orders.agg(min(dayIdx).as("lo"), max(dayIdx).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day_idx"))
      val spine = orders.select(col("o_orderpriority").as("priority"))
        .distinct().crossJoin(days)
      val base = spine.join(broadcast(daily), Seq("priority", "day_idx"), "left")
        .select(col("priority"), col("day_idx"),
          coalesce(col("n"), lit(0L)).as("n_orders"))
      graft.ops.Smooth.ema(base, "priority", "day_idx", "n_orders",
        alphaNum = 1L, alphaDen = 4L)
    },
    Some("""WITH RECURSIVE daily AS (SELECT o_orderpriority AS priority,
          epoch_us(o_orderdate) // 86400000000 AS day_idx, count(*) AS n
        FROM orders GROUP BY 1, 2),
      span AS (SELECT min(epoch_us(o_orderdate) // 86400000000) AS lo,
          max(epoch_us(o_orderdate) // 86400000000) AS hi FROM orders),
      days AS (SELECT unnest(generate_series(lo, hi)) AS day_idx FROM span),
      prios AS (SELECT DISTINCT o_orderpriority AS priority FROM orders),
      base AS (SELECT priority, day_idx, coalesce(n, 0)::BIGINT AS n_orders
        FROM (SELECT priority, day_idx FROM prios CROSS JOIN days)
        LEFT JOIN daily USING (priority, day_idx)),
      r AS (SELECT priority, day_idx, n_orders, n_orders AS ema
          FROM base WHERE day_idx = (SELECT lo FROM span)
        UNION ALL
        SELECT b.priority, b.day_idx, b.n_orders,
          (r.ema * 3 + b.n_orders) // 4
        FROM r JOIN base b ON b.priority = r.priority
          AND b.day_idx = r.day_idx + 1)
      SELECT priority, day_idx, n_orders, ema::BIGINT AS ema FROM r"""))

  /** Quantile normalization (Stats.quantileNormalize): every order's
    * cent amount mapped to ⌊2²⁰·(rank−1)/(N−1)⌋ with MIN-rank ties —
    * ranks from the Sweep value-domain prefix sum (never a
    * single-partition rank() over the corpus), rows joining their rank
    * back on the pre-reduced value key.
    */
  private val q162 = QueryDef(
    "q162_quantile_norm",
    (s, dir) => graft.ops.Stats.quantileNormalize(
      Tables.orders(s, dir).select(col("o_orderkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents")),
      "o_orderkey", "cents"),
    Some("""WITH q AS (SELECT o_orderkey,
          (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT AS cents
        FROM orders),
      n AS (SELECT count(*)::BIGINT AS total FROM q),
      r AS (SELECT o_orderkey, cents,
          rank() OVER (ORDER BY cents) AS rk FROM q)
      SELECT o_orderkey, cents,
        CASE WHEN total > 1
          THEN ((1048576 * (rk - 1)) // (total - 1))::BIGINT
          ELSE 0::BIGINT END AS quant_q
      FROM r CROSS JOIN n"""))

  /** Kaplan–Meier survival curve (Survival.kaplanMeier) over user
    * last-active days: the corpus reduces to one row per user, then to
    * the churn-day DOMAIN; the product-limit estimator is the
    * quantized recurrence ⌊S·(n−d)/n⌋ folded over the sorted domain —
    * the q161 rule (recurrences fold, they don't window). The oracle
    * replays it as a RECURSIVE CTE over row-numbered churn days.
    */
  private val q164 = QueryDef(
    "q164_survival",
    (s, dir) => graft.ops.Survival.kaplanMeier(
      Tables.events(s, dir)
        .select(col("user_id"),
          expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .as("day_idx")),
      "user_id", "day_idx"),
    Some("""WITH RECURSIVE l AS (SELECT user_id,
          max(epoch_us(ts) // 86400000000) AS t
        FROM events GROUP BY user_id),
      dd AS (SELECT t, count(*)::BIGINT AS d FROM l GROUP BY t),
      nn AS (SELECT t, d,
          (sum(d) OVER (ORDER BY t DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS n,
          row_number() OVER (ORDER BY t) AS rn
        FROM dd),
      r AS (SELECT t, d, n, rn, (1048576 * (n - d)) // n AS s
          FROM nn WHERE rn = 1
        UNION ALL
        SELECT nn.t, nn.d, nn.n, nn.rn, (r.s * (nn.n - nn.d)) // nn.n
        FROM r JOIN nn ON nn.rn = r.rn + 1)
      SELECT t AS day_idx, n AS at_risk, d AS churned,
        s::BIGINT AS survival_q
      FROM r"""))

  /** Winsorization report (Robust.winsorizeReport): exact p5/p95
    * bounds per priority from the cents VALUE DOMAIN (integer
    * cross-multiplied percentile cuts, the q134 machinery) plus the
    * clip summary — tail row counts and raw-vs-clipped sums — that
    * decides whether winsorizing is safe before any feature rewrite.
    */
  private val q166 = QueryDef(
    "q166_winsorize",
    (s, dir) => graft.ops.Robust.winsorizeReport(
      Tables.orders(s, dir).select(
        col("o_orderpriority").as("priority"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents")),
      "priority", "cents", pctNum = 5, pctDen = 100),
    Some("""WITH rows_ AS (SELECT o_orderpriority AS priority,
          (CAST(o_totalprice AS DECIMAL(18,2)) * 100)::BIGINT AS v
        FROM orders),
      dom AS (SELECT priority, v, count(*) AS n FROM rows_ GROUP BY 1, 2),
      w AS (SELECT priority, v,
          (sum(n) OVER (PARTITION BY priority ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
          (sum(n) OVER (PARTITION BY priority))::BIGINT AS tot
        FROM dom),
      b AS (SELECT priority,
          min(CASE WHEN cum * 100 >= tot * 5 THEN v END) AS lo,
          min(CASE WHEN cum * 100 >= tot * 95 THEN v END) AS hi
        FROM w GROUP BY priority)
      SELECT r.priority, count(*)::BIGINT AS n_rows,
        min(b.lo)::BIGINT AS lo, min(b.hi)::BIGINT AS hi,
        count(CASE WHEN r.v < b.lo THEN 1 END)::BIGINT AS n_below,
        count(CASE WHEN r.v > b.hi THEN 1 END)::BIGINT AS n_above,
        sum(r.v)::BIGINT AS sum_raw,
        sum(least(greatest(r.v, b.lo), b.hi))::BIGINT AS sum_clipped
      FROM rows_ r JOIN b ON b.priority = r.priority
      GROUP BY r.priority"""))

  /** Deterministic synchronous label propagation (3 rounds,
    * Graph.labelPropagation) over the sparsified supplier graph with
    * node%5 seed labels: majority neighbor vote, ties to the smallest
    * label, the per-node argmax folded into one max(struct) — no
    * window. The oracle unrolls the identical three rounds with
    * QUALIFY row_number argmaxes.
    */
  private val q167 = QueryDef(
    "q167_label_prop",
    (s, dir) => {
      // session-pinned prework: edges, nodes, and the symmetric
      // message list all come from the shared GraphFrameLite
      val g = supplierGraphLite(s, dir)
      graft.ops.Graph.labelPropagation(g,
        g.nodes.select(col("node"), pmod(col("node"), lit(5L)).as("label")),
        "node", "label", rounds = 3)
    },
    Some {
      val steps = (1 to 3).map { r =>
        s"""lp$r AS (SELECT node, label FROM (
            SELECT de.u AS node, l.label, count(*) AS c
            FROM de JOIN lp${r - 1} l ON l.node = de.v
            GROUP BY 1, 2)
          QUALIFY row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label ASC) = 1)"""
      }.mkString(",\n      ")
      s"""WITH $sqlSupplierGraphCtes,
      de AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
      nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
      lp0 AS (SELECT node, node % 5 AS label FROM nodes),
      $steps
      SELECT node, label::BIGINT AS label FROM lp3"""
    })

  /** Link prediction on the sparsified supplier graph
    * (Graph/LinkPredict): non-adjacent pairs scored by common
    * neighbors + the quantized resource-allocation index — the
    * missing-edge densification signal. Wedge work is Σdeg², bounded
    * here because the graph is top-3-truncated (the kNN-graph regime
    * the operator is designed for).
    */
  private val q170 = QueryDef(
    "q170_link_predict",
    (s, dir) => graft.ops.LinkPredict.commonNeighborScores(
      supplierGraph(s, dir), "src", "dst", minCommon = 2),
    Some(s"""WITH $sqlSupplierGraphCtes,
      de AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
      nb AS (SELECT v AS w, u AS x FROM de),
      wed AS (SELECT l.x AS a, r.x AS b, 1048576 // d.degree AS c
        FROM nb l JOIN nb r ON r.w = l.w AND l.x < r.x
        JOIN deg d ON d.node = l.w AND d.degree <= 1000),
      sc AS (SELECT a, b, count(*) AS cn, sum(c) AS ra_q
        FROM wed GROUP BY a, b HAVING count(*) >= 2)
      SELECT sc.a AS node_a, sc.b AS node_b,
        sc.cn::BIGINT AS cn, sc.ra_q::BIGINT AS ra_q
      FROM sc LEFT JOIN e0 ON e0.u = sc.a AND e0.v = sc.b
      WHERE e0.u IS NULL"""))

  /** Lag-7 autocorrelation of each event type's daily volume
    * (TimeSeries.autocorrelation) — the weekly-seasonality detector:
    * the pre-aggregated (type, day, count) series self-equi-joined at
    * day+7, Pearson moments as decimal(38,0) (the q135/q142 rule).
    */
  private val q171 = QueryDef(
    "q171_autocorr",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.autocorrelation(
        daily, "event_type", "day", "x", lag = 7)
        .withColumnRenamed("series", "event_type")
    },
    Some("""WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS x
        FROM events GROUP BY 1, 2),
      pr AS (SELECT l.event_type, l.x AS x, r.x AS y
        FROM d l JOIN d r ON r.event_type = l.event_type
          AND r.day = l.day + 7),
      m AS (SELECT event_type, count(*)::HUGEINT AS n,
          sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
          sum(x::HUGEINT * y)::HUGEINT AS sxy,
          sum(x::HUGEINT * x)::HUGEINT AS sxx,
          sum(y::HUGEINT * y)::HUGEINT AS syy
        FROM pr GROUP BY event_type)
      SELECT event_type, n::BIGINT AS n_pairs,
        CASE WHEN n >= 3 AND n*sxx > sx*sx AND n*syy > sy*sy
          THEN (n*sxy - sx*sy)::DOUBLE
            / (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE))
        END AS acf
      FROM m"""))

  /** CUSUM level-shift changepoint per event type
    * (TimeSeries.cusumChangepoint) over the same daily-volume series:
    * deviations cross-multiplied to `n·x − T` longs so the cumulative
    * sum is exact, argmax |S| as one max(struct) — the feed-monitoring
    * "when did this source's volume regime change" probe.
    */
  private val q172 = QueryDef(
    "q172_cusum",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.cusumChangepoint(daily, "event_type", "day", "x")
        .withColumnRenamed("series", "event_type")
        .withColumnRenamed("cp_t", "cp_day")
    },
    Some("""WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS x
        FROM events GROUP BY 1, 2),
      t AS (SELECT event_type, count(*) AS n, sum(x) AS total
        FROM d GROUP BY event_type),
      s AS (SELECT d.event_type, d.day, t.n,
          sum(t.n * d.x - t.total) OVER (PARTITION BY d.event_type
            ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS cus
        FROM d JOIN t USING (event_type)),
      r AS (SELECT event_type, n, day, abs(cus) AS a,
          row_number() OVER (PARTITION BY event_type
            ORDER BY abs(cus) DESC, day ASC) AS rk
        FROM s)
      SELECT event_type, n::BIGINT AS n_points,
        CASE WHEN n >= 2 THEN day END AS cp_day,
        CASE WHEN n >= 2 THEN a END::BIGINT AS max_abs_cusum_xn
      FROM r WHERE rk = 1"""))

  /** Theil–Sen robust trend per event type (TimeSeries.theilSenSlope)
    * over the daily-volume series: the median pairwise slope a burst
    * day cannot drag (q82's least squares can). Slopes quantize via
    * one IEEE double divide+floor; the median is the exact lower
    * median over the slope DOMAIN (the q134 shape).
    */
  private val q177 = QueryDef(
    "q177_theil_sen",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.theilSenSlope(daily, "event_type", "day", "x")
        .withColumnRenamed("series", "event_type")
    },
    Some("""WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS x
        FROM events GROUP BY 1, 2),
      pr AS (SELECT l.event_type,
          floor((r.x - l.x) * 1048576.0 / (r.day - l.day))::BIGINT AS s
        FROM d l JOIN d r ON r.event_type = l.event_type AND r.day > l.day),
      dom AS (SELECT event_type, s, count(*) AS n FROM pr GROUP BY 1, 2),
      w AS (SELECT event_type, s,
          sum(n) OVER (PARTITION BY event_type ORDER BY s
            ROWS UNBOUNDED PRECEDING) AS cum,
          sum(n) OVER (PARTITION BY event_type) AS tot
        FROM dom)
      SELECT event_type, max(tot)::BIGINT AS n_pairs,
        min(CASE WHEN 2 * cum >= tot THEN s END)::BIGINT AS slope_q_med
      FROM w GROUP BY event_type"""))

  /** l-diversity release audit (Privacy.lDiversityReport): every
    * (nation, segment) quasi-identifier bucket must span ≥ 4 distinct
    * account-balance bands or it leaks the sensitive attribute even
    * when k-anonymous (q113's stronger companion gate). Two stacked
    * exact aggregations, never an Expand, never a base-table join.
    */
  private val q173 = QueryDef(
    "q173_l_diversity",
    (s, dir) => graft.ops.Privacy.lDiversityReport(
      Tables.customer(s, dir).select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 2000).cast("long").as("bal_band")),
      Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 4),
    Some("""WITH q AS (SELECT c_nationkey, c_mktsegment,
          floor(c_acctbal / 2000)::BIGINT AS bal_band
        FROM customer),
      cs AS (SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS n
        FROM q GROUP BY 1, 2, 3),
      combos AS (SELECT c_nationkey, c_mktsegment,
          sum(n) AS rows_, count(*) AS l
        FROM cs GROUP BY 1, 2)
      SELECT CASE WHEN l = 1 THEN 'homogeneous'
          WHEN l < 4 THEN 'low' ELSE 'diverse' END AS bucket,
        count(*)::BIGINT AS n_combos, sum(rows_)::BIGINT AS n_rows,
        min(l)::BIGINT AS min_diversity
      FROM combos GROUP BY 1"""))

  /** Index of dispersion per event type (TimeSeries.dispersion) over
    * the daily-volume series — the burstiness scalar beside q171's
    * seasonality, q172's changepoint, and q177's trend. Decimal
    * moments, one aggregation, one division of exact integers.
    */
  private val q180 = QueryDef(
    "q180_burstiness",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.dispersion(daily, "event_type", "x")
        .withColumnRenamed("series", "event_type")
    },
    Some("""WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS x
        FROM events GROUP BY 1, 2),
      m AS (SELECT event_type, count(*) AS n, sum(x)::HUGEINT AS sx,
          sum(x::HUGEINT * x)::HUGEINT AS sxx
        FROM d GROUP BY 1)
      SELECT event_type, n::BIGINT AS n_points,
        CASE WHEN n >= 2 AND sx > 0
          THEN (n * sxx - sx * sx)::DOUBLE / ((n - 1) * sx)::DOUBLE
        END AS fano
      FROM m"""))

  /** Modularity of the q167 label-propagation partition
    * (Graph.modularity) — the acceptance metric for the clustering:
    * `Q·4m² = Σ_c (4m·e_c − d_c²)` stays an exact long, the double Q
    * divides identical integers. The oracle replays the unrolled
    * 3-round propagation and the same integer algebra.
    */
  private val q181 = QueryDef(
    "q181_modularity",
    (s, dir) => {
      val g = supplierGraphLite(s, dir)
      val labels = graft.ops.Graph.labelPropagation(g,
        g.nodes.select(col("node"), pmod(col("node"), lit(5L)).as("label")),
        "node", "label", rounds = 3)
      graft.ops.Graph.modularity(g, labels, "node", "label")
    },
    Some {
      val steps = (1 to 3).map { r =>
        s"""lp$r AS (SELECT node, label FROM (
            SELECT de.u AS node, l.label, count(*) AS c
            FROM de JOIN lp${r - 1} l ON l.node = de.v
            GROUP BY 1, 2)
          QUALIFY row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label ASC) = 1)"""
      }.mkString(",\n      ")
      s"""WITH $sqlSupplierGraphCtes,
      de AS MATERIALIZED (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
      nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
      lp0 AS (SELECT node, node % 5 AS label FROM nodes),
      $steps,
      dc AS (SELECT l.label, sum(d.degree) AS d_c
        FROM deg d JOIN lp3 l ON l.node = d.node GROUP BY l.label),
      ec AS (SELECT la.label, count(*) AS e_c
        FROM e0 JOIN lp3 la ON la.node = e0.u JOIN lp3 lb ON lb.node = e0.v
        WHERE la.label = lb.label GROUP BY la.label),
      mm AS (SELECT count(*) AS m FROM e0)
      SELECT mm.m::BIGINT AS n_edges, count(*)::BIGINT AS n_communities,
        sum(4 * mm.m * coalesce(ec.e_c, 0) - dc.d_c * dc.d_c)::BIGINT AS q_num,
        CASE WHEN mm.m > 0
          THEN sum(4 * mm.m * coalesce(ec.e_c, 0) - dc.d_c * dc.d_c)::DOUBLE
            / (4 * mm.m * mm.m)::DOUBLE END AS modularity
      FROM dc LEFT JOIN ec USING (label) CROSS JOIN mm GROUP BY mm.m"""
    })

  /** Dangling-mass PageRank (Graph.pagerankDangling), 3 iterations
    * over the DIRECTED canonical supplier graph (u→v for u<v — nodes
    * appearing only on the v side are genuine sinks): per round the
    * summed sink rank is floor-shared back to every node,
    * `teleport + ⌊85·(Σ⌊rank/outdeg⌋ + ⌊dangling/n⌋)/100⌋`, keeping
    * total mass from decaying the way q146's drop-variant does on
    * directed inputs. The oracle unrolls the three rounds with one
    * dangling-sum CTE per round; both trajectories are exact longs.
    */
  private val q182 = QueryDef(
    "q182_pagerank_dangling",
    (s, dir) =>
      graft.ops.Graph.pagerankDangling(supplierGraphLite(s, dir), iterations = 3),
    Some {
      val steps = (1 to 3).map { k =>
        s"""d$k AS (SELECT coalesce(sum(rank), 0) AS dt
           FROM r${k - 1} WHERE outdeg IS NULL),
         r$k AS (SELECT b.node,
           (150000000000
             + (85 * (coalesce(i.inc, 0) + d.dt // nn.n)) // 100)::BIGINT
             AS rank,
           b.outdeg
           FROM r${k - 1} b LEFT JOIN (SELECT e0.v AS node,
             sum(r${k - 1}.rank // r${k - 1}.outdeg) AS inc
             FROM e0 JOIN r${k - 1} ON r${k - 1}.node = e0.u
             GROUP BY e0.v) i USING (node)
           CROSS JOIN d$k d CROSS JOIN nn)"""
      }.mkString(",\n      ")
      s"""WITH $sqlSupplierGraphCtes,
      nodes AS (SELECT u AS node FROM e0 UNION SELECT v FROM e0),
      nn AS (SELECT count(*) AS n FROM nodes),
      od AS (SELECT u AS node, count(*) AS outdeg FROM e0 GROUP BY u),
      r0 AS (SELECT n.node, 1000000000000::BIGINT AS rank, od.outdeg
        FROM nodes n LEFT JOIN od USING (node)),
      $steps
      SELECT node, rank FROM r3"""
    })

  /** Two-sample Kolmogorov–Smirnov drift statistic (Stats.ksStatistic)
    * between the click and error event types over the daily-arrival
    * domain: D's numerator max|cumA·n_B − cumB·n_A| and its location
    * are exact longs (cross-multiplied CDFs), the closing division the
    * only double — the feed-drift alarm next to q171/q172/q177.
    */
  private val q188 = QueryDef(
    "q188_ks_drift",
    (s, dir) => graft.ops.Stats.ksStatistic(
      Tables.events(s, dir).withColumn("day",
        expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000")),
      "event_type", "day", "click", "error"),
    Some("""WITH e AS (SELECT event_type,
          epoch_us(ts) // 86400000000 AS v FROM events
        WHERE event_type IN ('click', 'error')),
      c AS (SELECT v,
          count(*) FILTER (WHERE event_type = 'click') AS ca,
          count(*) FILTER (WHERE event_type = 'error') AS cb
        FROM e GROUP BY v),
      cum AS (SELECT v,
          sum(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cuma,
          sum(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cumb
        FROM c),
      t AS (SELECT sum(ca) AS n_a, sum(cb) AS n_b FROM c),
      d AS (SELECT t.n_a, t.n_b,
          abs(cuma * t.n_b - cumb * t.n_a) AS d, v
        FROM cum CROSS JOIN t)
      SELECT n_a::BIGINT AS n_a, n_b::BIGINT AS n_b,
        d::BIGINT AS ks_num, v::BIGINT AS ks_at_value,
        CASE WHEN n_a > 0 AND n_b > 0
          THEN d::DOUBLE / (n_a * n_b)::DOUBLE END AS ks
      FROM d QUALIFY row_number() OVER (ORDER BY d DESC, v ASC) = 1"""))

  /** Source-concentration report (Stats.concentration) over the
    * documents corpus: exact HHI numerator Σc², the dominant source,
    * and the effective-source count 1/HHI — the "is this mixture
    * actually diverse" acceptance scalar a data-mixing pipeline
    * tracks after sampling.
    */
  private val q189 = QueryDef(
    "q189_source_concentration",
    (s, dir) => graft.ops.Stats.concentration(
      Tables.documents(s, dir), "source"),
    Some("""WITH c AS (SELECT source AS cls, count(*) AS c FROM documents
        WHERE source IS NOT NULL GROUP BY source),
      a AS (SELECT count(*) AS n_classes, sum(c) AS n_rows,
          sum(c::HUGEINT * c) AS ss FROM c),
      mn AS (SELECT cls, c FROM c ORDER BY c DESC, cls ASC LIMIT 1)
      SELECT a.n_classes::BIGINT AS n_classes, a.n_rows::BIGINT AS n_rows,
        a.ss::BIGINT AS sum_sq_num, mn.cls AS top_class,
        mn.c::BIGINT AS top_count,
        a.ss::DOUBLE / (a.n_rows::DOUBLE * a.n_rows) AS hhi,
        (a.n_rows::DOUBLE * a.n_rows) / a.ss::DOUBLE AS effective_classes,
        mn.c::DOUBLE / a.n_rows::DOUBLE AS top_share
      FROM a CROSS JOIN mn"""))

  /** Snapshot-diff audit (TableOps.snapshotDiff): two simulated
    * versions of orders — "before" missing the %7 keys, "after"
    * missing the %5 keys with priorities rewritten on %3 keys — full-
    * outer-joined on the key with md5 row digests, classified
    * added/removed/changed/unchanged and tallied. The incremental-load
    * acceptance check: one equi-join, digests map-side.
    */
  private val q190 = QueryDef(
    "q190_snapshot_diff",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val before = o.filter(col("o_orderkey") % 7 =!= 0)
      val after = o.filter(col("o_orderkey") % 5 =!= 0)
        .withColumn("o_orderpriority",
          when(col("o_orderkey") % 3 === 0, lit("X"))
            .otherwise(col("o_orderpriority")))
      graft.ops.TableOps.snapshotDiff(before, after,
        Seq("o_orderkey"), Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
        .groupBy(col("status")).agg(count(lit(1)).as("n_rows"))
    },
    Some("""WITH b AS (SELECT o_orderkey, md5(
          length(o_custkey::VARCHAR)::VARCHAR || ':' || o_custkey::VARCHAR
          || length(o_orderstatus)::VARCHAR || ':' || o_orderstatus
          || length(o_orderpriority)::VARCHAR || ':' || o_orderpriority) AS h
        FROM orders WHERE o_orderkey % 7 <> 0),
      a AS (SELECT o_orderkey, md5(
          length(o_custkey::VARCHAR)::VARCHAR || ':' || o_custkey::VARCHAR
          || length(o_orderstatus)::VARCHAR || ':' || o_orderstatus
          || length(p2)::VARCHAR || ':' || p2) AS h
        FROM (SELECT o_orderkey, o_custkey, o_orderstatus,
          CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderpriority END AS p2
          FROM orders WHERE o_orderkey % 5 <> 0)),
      st AS (SELECT CASE WHEN b.h IS NULL THEN 'added'
          WHEN a.h IS NULL THEN 'removed'
          WHEN a.h = b.h THEN 'unchanged'
          ELSE 'changed' END AS status
        FROM b FULL OUTER JOIN a USING (o_orderkey))
      SELECT status, count(*)::BIGINT AS n_rows FROM st GROUP BY status"""))

  /** Count–min join-size estimation (Sketch.joinSizeEstimate): the
    * orders⋈customer equi-join size predicted from two 4×1024 sketches
    * via the min-over-rows register inner product, audited against the
    * exact Σ f_A·f_B — the bounded-memory "how big will this shuffle
    * be" probe, never below the truth. The oracle rebuilds both
    * sketches and both folds.
    */
  private val q192 = QueryDef(
    "q192_join_size_est",
    (s, dir) => graft.ops.Sketch.joinSizeEstimate(
      Tables.orders(s, dir), "o_custkey",
      Tables.customer(s, dir), "c_custkey"),
    Some {
      def cells(src: String, key: String) = (0 until 4).map { i =>
        s"SELECT $i AS row, " +
          s"${OracleSql.hex60(s"'cm$i:' || $key::VARCHAR")} % 1024 AS col " +
          s"FROM $src WHERE $key IS NOT NULL"
      }.mkString(" UNION ALL ")
      s"""WITH ta AS (SELECT row, col, count(*) AS cnt FROM
        (${cells("orders", "o_custkey")}) GROUP BY 1, 2),
      tb AS (SELECT row, col, count(*) AS cnt FROM
        (${cells("customer", "c_custkey")}) GROUP BY 1, 2),
      ip AS (SELECT ta.row, sum(ta.cnt::HUGEINT * tb.cnt) AS ip
        FROM ta JOIN tb USING (row, col) GROUP BY ta.row),
      es AS (SELECT min(coalesce(ip.ip, 0)) AS est FROM
        (SELECT unnest(range(0, 4)) AS row) sp LEFT JOIN ip USING (row)),
      fa AS (SELECT o_custkey AS k, count(*) AS ca FROM orders
        WHERE o_custkey IS NOT NULL GROUP BY 1),
      fb AS (SELECT c_custkey AS k, count(*) AS cb FROM customer
        WHERE c_custkey IS NOT NULL GROUP BY 1),
      ex AS (SELECT coalesce(sum(fa.ca::HUGEINT * fb.cb), 0) AS ex
        FROM fa JOIN fb USING (k))
      SELECT ex::BIGINT AS exact_size, est::BIGINT AS est_size,
        (est - ex)::BIGINT AS overshoot
      FROM ex CROSS JOIN es"""
    })

  /** Seasonal-naive MASE forecast evaluation per event type
    * ([[graft.ops.TimeSeries.seasonalNaiveMase]]) over the daily
    * volume series: is the weekly-lag forecast better than the
    * one-step naive scale? Exact integers end to end; < 10⁶ ppm means
    * weekly seasonality is real — the gate before trusting a seasonal
    * model or sampler. Two self-equi-joins on (type, day−lag), both
    * on the day domain.
    */
  private val q217 = QueryDef(
    "q217_mase",
    (s, dir) => {
      val daily = Tables.events(s, dir)
        .groupBy(col("event_type"),
          expr("unix_micros(cast(ts as timestamp_ltz)) div 86400000000").as("day"))
        .agg(count(lit(1)).as("x"))
      graft.ops.TimeSeries.seasonalNaiveMase(daily, "event_type", "day", "x")
        .withColumnRenamed("series", "event_type")
    },
    Some("""WITH d AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
          count(*) AS x
        FROM events GROUP BY 1, 2),
      l7 AS (SELECT a.event_type, sum(abs(a.x - b.x)) AS s7, count(*) AS n7
        FROM d a JOIN d b ON b.event_type = a.event_type
          AND b.day = a.day - 7 GROUP BY 1),
      l1 AS (SELECT a.event_type, sum(abs(a.x - b.x)) AS s1, count(*) AS n1
        FROM d a JOIN d b ON b.event_type = a.event_type
          AND b.day = a.day - 1 GROUP BY 1)
      SELECT l7.event_type, n7::BIGINT AS n_season, n1::BIGINT AS n_one,
        CASE WHEN s1 > 0 AND n7 > 0
          THEN s7 * 1000000 * n1 // (s1 * n7) END::BIGINT AS mase_ppm
      FROM l7 JOIN l1 USING (event_type)"""))

  /** Scale-probe replication audit ([[graft.ScaleProbe.replicate]]):
    * the generator behind the empirical 10× measurement (SCALE.md)
    * must itself be correct, or the probe measures fabricated data.
    * Replicate `part` 3× with the key offset and report per-replica
    * row count, distinct-key count, exact key sum, and size mass —
    * the oracle replays the replication as a relational cross join,
    * so any drift in the offset arithmetic or a dropped/duplicated
    * replica hash-mismatches. Keys are 0-based and the offset (10¹²)
    * dominates any key the corpus can hold — the rep derivation
    * `key div offset` must stay valid on REPLICATED inputs too (the
    * scale probe's own synthesized dirs; a 10⁵ offset collided with
    * sf1's key range and failed exactly this audit there). The key
    * sum fits bigint only WHILE rows · 2 · 10¹² < 2⁶³, i.e. part
    * under ~4.6M rows per replica (sf ≲ 15, covering every driver SF
    * and probe size); past that Spark's non-ANSI sum would wrap where
    * DuckDB raises — the gate fails LOUDLY rather than pass wrongly,
    * and the audit should then sum replica-relative keys
    * (p_partkey % 10¹²) instead.
    */
  private val q218 = QueryDef(
    "q218_scale_replicate",
    (s, dir) => {
      val base = Tables.part(s, dir)
        .select(col("p_partkey"), col("p_size").cast("long").as("sz"))
      graft.ScaleProbe.replicate(base, 3, Map("p_partkey" -> 1000000000000L))
        .withColumn("rep", expr("p_partkey div 1000000000000"))
        .groupBy(col("rep"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("p_partkey")).as("n_keys"),
          sum(col("p_partkey")).as("sum_key"),
          sum(col("sz")).as("sum_size"))
    },
    Some("""WITH r AS (SELECT unnest(range(0, 3)) AS rep),
      x AS (SELECT rep, p_partkey + rep * 1000000000000 AS k,
          p_size::BIGINT AS sz
        FROM part CROSS JOIN r)
      SELECT rep::BIGINT AS rep, count(*)::BIGINT AS n_rows,
        count(DISTINCT k)::BIGINT AS n_keys, sum(k)::BIGINT AS sum_key,
        sum(sz)::BIGINT AS sum_size
      FROM x GROUP BY 1"""))

  /** Scale-probe text-salt audit (the [[graft.ScaleProbe.replicate]]
    * `saltTokens` path): per-replica token salting must keep replica 0
    * verbatim, keep every replica's duplicate structure identical to
    * the source, and never produce cross-replica matches — the
    * property that makes the 10× dedup measurements honest (un-salted
    * replication probes degenerate 10-way-duplicate data, not the
    * plans). The oracle replays the salt as replace(' ' → '_i ') + a
    * trailing '_i', which is exactly token-suffixing; per-replica
    * distinct-text counts and total text mass then pin the semantics.
    */
  private val q219 = QueryDef(
    "q219_scale_salt",
    (s, dir) => {
      val base = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      graft.ScaleProbe.replicate(base, 3, Map("doc_id" -> 1000000000000L),
          saltTokens = Seq("text"))
        .withColumn("rep", expr("doc_id div 1000000000000"))
        .groupBy(col("rep"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("text")).as("n_texts"),
          sum(length(col("text")).cast("long")).as("text_mass"))
    },
    Some("""WITH r AS (SELECT unnest(range(0, 3)) AS rep),
      x AS (SELECT rep,
          CASE WHEN rep = 0 THEN text
            ELSE replace(text, ' ', '_' || rep || ' ') || '_' || rep END AS t
        FROM documents CROSS JOIN r)
      SELECT rep::BIGINT AS rep, count(*)::BIGINT AS n_docs,
        count(DISTINCT t)::BIGINT AS n_texts,
        sum(length(t))::BIGINT AS text_mass
      FROM x GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q39, q40, q41, q42, q43, q44, q45, q46,
    q47, q48, q49, q50, q53, q57, q58, q59, q60, q61, q62, q65, q67, q68,
    q70, q71, q72, q73, q74, q75, q76, q77, q78, q80, q81, q82, q84, q87,
    q88, q89, q92, q93, q95, q96, q97, q99, q100, q102, q104, q106, q107,
    q108, q109, q110, q111, q113, q114, q127, q133, q134, q135, q142,
    q145, q146, q150, q151, q152, q153, q155, q156, q159, q161, q162,
    q164, q166, q167, q170, q171, q172, q173, q177, q180, q181, q182,
    q188, q189, q190, q192, q212, q217, q218, q219)
}
