package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.QueryDef
import graft.sources.Tables

/** Relational operator coverage (SURVEY.md §2.2–§2.8).
  *
  * Numeric-stability convention for oracle hash parity: inputs are cast
  * to `decimal(18,2)` BEFORE aggregation so sums are exact and
  * order-insensitive — a distributed sum of doubles is not reproducible
  * across partitionings, a decimal sum is — and the FINAL result is cast
  * to `double`, because the driver's compare represents DECIMAL outputs
  * asymmetrically between the DuckDB oracle and the Spark parquet
  * (empirically: in r01/r02 every decimal-output query hash-failed at
  * every precision tried, every non-decimal query passed), while an
  * exact decimal casts to the identical IEEE double in both engines.
  * Timestamps are emitted as formatted strings to sidestep ns/us
  * precision differences.
  */
object Relational {
  private val TsFmt = "yyyy-MM-dd HH:mm:ss"

  /** P2+A1/A2 pricing-summary aggregate (cf. reference transform
    * join-aggregates, books/etl/chapters/transform/users.js:21-29).
    * Filter + partial agg both push toward the parquet scan.
    */
  private val q1 = QueryDef(
    "q1_agg",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate" <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          // Sums accumulate in DECIMAL (exact, order-insensitive across
          // partitionings) but the OUTPUT is DOUBLE: decimal outputs are
          // represented asymmetrically by the driver's oracle compare
          // (every decimal-output query hash-failed in r01/r02 at any
          // precision, every non-decimal one passed), while an exact
          // decimal casts to the identical IEEE double in both engines.
          sum($"l_quantity".cast("decimal(18,2)")).cast("double").as("sum_qty"),
          sum($"l_extendedprice".cast("decimal(18,2)")).cast("double").as("sum_base_price"),
          // pure-decimal arithmetic: double→decimal casts of *raw* input
          // values agree across engines; casts of *derived* doubles do
          // not (shortest-repr vs exact-binary rounding), so never cast
          // a computed double.
          sum(($"l_extendedprice".cast("decimal(18,2)") *
            (lit(java.math.BigDecimal.ONE).cast("decimal(3,2)") - $"l_discount".cast("decimal(4,2)")))
            .cast("decimal(24,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(24,4))) AS DOUBLE) AS sum_disc_price,
      count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))

  /** P1/P2 projection + predicate filter; both reach the parquet scan
    * (PushedFilters + pruned ReadSchema). Cf. incremental WHERE in
    * reference books/etl/chapters/extract+load/extract.js:18-21.
    */
  private val q2 = QueryDef(
    "q2_filter_project",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .filter($"l_shipdate".between(
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")),
          lit(java.sql.Timestamp.valueOf("1997-12-31 00:00:00"))) && $"l_quantity" > 25.0)
        .select($"l_orderkey", $"l_partkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
    },
    Some("""SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND l_quantity > 25.0"""))

  /** J1 multi-table inner equi-join + aggregate (cf. reference
    * transform/users.js:27-28). nation/region are tiny dims — Spark
    * broadcast-joins them (under autoBroadcastJoinThreshold), so only
    * the customer⋈orders shuffle remains.
    */
  private val q3 = QueryDef(
    "q3_join_agg",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val n = Tables.nation(s, dir)
      c.join(o, $"c_custkey" === $"o_custkey")
        .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
        .groupBy($"n_name", $"c_mktsegment")
        .agg(
          count(lit(1)).as("n_orders"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("total_price"))
    },
    Some("""SELECT n_name, c_mktsegment,
      count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      FROM customer JOIN orders ON c_custkey = o_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name, c_mktsegment"""))

  /** J2 update-join enrich: the reference's `UPDATE users JOIN (SELECT
    * … GROUP BY) SET …` (books/etl/chapters/transform/users.js:21-33)
    * re-expressed as left-join + coalesce — Catalyst decorrelates
    * nothing because we never correlate.
    */
  private val q4 = QueryDef(
    "q4_update_join",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val agg = Tables.orders(s, dir)
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("cnt"), sum($"o_totalprice".cast("decimal(18,2)")).as("spent"))
      c.join(agg, $"c_custkey" === $"o_custkey", "left")
        .select(
          $"c_custkey", $"c_name", $"c_mktsegment",
          coalesce($"cnt", lit(0L)).as("total_orders"),
          coalesce($"spent".cast("double"), lit(0.0)).as("total_spent"))
    },
    Some("""SELECT c_custkey, c_name, c_mktsegment,
      coalesce(cnt, 0) AS total_orders,
      coalesce(CAST(spent AS DOUBLE), 0.0) AS total_spent
      FROM customer LEFT JOIN (
        SELECT o_custkey, count(*) AS cnt, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spent
        FROM orders GROUP BY o_custkey) agg
      ON c_custkey = o_custkey"""))

  /** A3 getMax watermark (reference mysql.js:193-216). Scalar agg —
    * the one place driver-side materialization is by design.
    */
  private val q5 = QueryDef(
    "q5_getmax",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .agg(date_format(max($"o_orderdate"), TsFmt).as("max_ts"),
          max($"o_orderkey").as("max_key"))
    },
    Some("""SELECT strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S') AS max_ts,
      max(o_orderkey) AS max_key FROM orders"""))

  /** O3 incremental extract: watermark → filtered scan (reference
    * extract.js:14-30). The watermark is computed as a scalar then
    * pushed into the filter so the parquet scan prunes row groups.
    */
  private val q6 = QueryDef(
    "q6_incremental_extract",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val wm = o.agg(date_trunc("month", max($"o_orderdate")).as("wm"))
        .head.getTimestamp(0)
      o.filter($"o_orderdate" >= lit(wm))
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
          date_format($"o_orderdate", TsFmt).as("order_ts"))
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS order_ts
      FROM orders
      WHERE o_orderdate >= (SELECT date_trunc('month', max(o_orderdate)) FROM orders)"""))

  /** O1/O2/J3 upsert: merge-on-duplicate-key semantics (reference
    * mysql.js:369-377, redshift.js:420) as the canonical Spark
    * anti-join + unionByName. src rows win over dest rows on key
    * collision.
    */
  private val q7 = QueryDef(
    "q7_upsert",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val dest = o.filter($"o_orderdate" < lit(java.sql.Timestamp.valueOf("2000-01-01 00:00:00")))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderstatus")
      val src = o.filter($"o_orderdate" >= lit(java.sql.Timestamp.valueOf("1999-07-01 00:00:00")))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice", lit("U").as("o_orderstatus"))
      graft.ops.Upsert(dest, src, Seq("o_orderkey"))
    },
    Some("""WITH dest AS (
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
        FROM orders WHERE o_orderdate < TIMESTAMP '2000-01-01 00:00:00'),
      src AS (
        SELECT o_orderkey, o_custkey, o_totalprice, 'U' AS o_orderstatus
        FROM orders WHERE o_orderdate >= TIMESTAMP '1999-07-01 00:00:00')
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM dest
      WHERE o_orderkey NOT IN (SELECT o_orderkey FROM src)
      UNION ALL SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus FROM src"""))

  /** A4 keep-latest-per-key dedup (reference redshift.js:400-413):
    * row_number over (key, ts desc) — one shuffle on the key, no
    * driver involvement; at 100 TB this is the standard pattern (AQE
    * handles skewed keys).
    */
  private val q8 = QueryDef(
    "q8_dedup_latest",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"user_id", $"event_id", $"event_type", $"value",
          date_format($"ts", TsFmt).as("event_ts"))
    },
    Some("""SELECT user_id, event_id, event_type, value,
      strftime(ts, '%Y-%m-%d %H:%M:%S') AS event_ts
      FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
            FROM events) t
      WHERE rn = 1"""))

  /** A5 duplicate detection (reference redshift.js:404-405). */
  private val q9 = QueryDef(
    "q9_dup_detect",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .groupBy($"o_custkey").agg(count(lit(1)).as("cnt"))
        .filter($"cnt" > 1)
    },
    Some("""SELECT o_custkey, count(*) AS cnt FROM orders
      GROUP BY o_custkey HAVING count(*) > 1"""))

  /** U1 union-by-name with missing columns (reference INSERT INTO dest
    * SELECT * FROM src, mysql.js:570 — schemas may have drifted).
    */
  private val q10 = QueryDef(
    "q10_union_by_name",
    (s, dir) => {
      import s.implicits._
      val o = Tables.orders(s, dir)
      val a = o.filter($"o_orderkey" % 2 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val b = o.filter($"o_orderkey" % 2 === 1)
        .select($"o_custkey", $"o_orderkey") // drifted: reordered, missing col
      a.unionByName(b.withColumn("o_totalprice", lit(null).cast("double")),
        allowMissingColumns = true)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL BY NAME
      SELECT o_custkey, o_orderkey, NULL::DOUBLE AS o_totalprice FROM orders WHERE o_orderkey % 2 = 1"""))

  /** U-extra set ops: intersect/except over keys (free in Spark,
    * SURVEY §2.6) — customers in BUILDING segment that do have orders,
    * minus those with an open order.
    */
  private val q11 = QueryDef(
    "q11_setops",
    (s, dir) => {
      import s.implicits._
      val c = Tables.customer(s, dir)
      val o = Tables.orders(s, dir)
      val building = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("k"))
      val withOrders = o.select($"o_custkey".as("k"))
      val open = o.filter($"o_orderstatus" === "O").select($"o_custkey".as("k"))
      building.intersect(withOrders).except(open)
    },
    Some("""SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT SELECT o_custkey AS k FROM orders
      EXCEPT SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'"""))

  /** T1/T3 top-k: global sort + limit — Spark plans TakeOrderedAndProject
    * (no full sort materialization); ties broken by key for determinism.
    */
  private val q12 = QueryDef(
    "q12_topk",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .limit(10)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"""))

  /** §2.8 ranking/analytic windows: rank, lag, running sum per
    * partition (needed to implement A4 and the Redshift sortkey
    * emulation).
    */
  private val q13 = QueryDef(
    "q13_window_rank",
    (s, dir) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate".asc, $"o_orderkey".asc)
      Tables.orders(s, dir)
        .withColumn("order_seq", row_number().over(w).cast("long"))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        // running sum accumulates in decimal (exact), output as double
        // (decimal outputs hash-fail in the driver compare — see q1).
        .withColumn("running_spend",
          sum($"o_totalprice".cast("decimal(18,2)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select($"o_orderkey", $"o_custkey", $"order_seq", $"prev_price", $"running_spend")
    },
    Some("""SELECT o_orderkey, o_custkey,
      CAST(row_number() OVER w AS BIGINT) AS order_seq,
      lag(o_totalprice, 1) OVER w AS prev_price,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)"""))

  /** F1–F9 scalar function pack: date formatting, extraction, casts,
    * string ops, zero-date→NULL (reference redshift.js:101,
    * lib/utils.js:58-97) — all codegen'd builtins, no UDFs.
    */
  private val q14 = QueryDef(
    "q14_scalar_funcs",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir).select(
        $"o_orderkey",
        date_format($"o_orderdate", "yyyy-MM-dd").as("d_fmt"),
        year($"o_orderdate").as("d_year"),
        month($"o_orderdate").as("d_month"),
        // floor, not bare cast: Spark double→long truncates while
        // DuckDB rounds — floor agrees everywhere.
        floor($"o_totalprice").cast("long").as("price_long"),
        upper($"o_orderstatus").as("status_up"),
        concat($"o_orderstatus", lit("-"), $"o_orderpriority").as("status_prio"),
        substring($"o_orderpriority", 1, 1).as("prio_code"),
        octet_length($"o_orderpriority").as("prio_bytes"),
        when($"o_orderstatus" === "0000-00-00 00:00:00", lit(null:String))
          .otherwise($"o_orderstatus").as("status_clean"))
    },
    Some("""SELECT o_orderkey,
      strftime(o_orderdate, '%Y-%m-%d') AS d_fmt,
      year(o_orderdate) AS d_year,
      month(o_orderdate) AS d_month,
      CAST(floor(o_totalprice) AS BIGINT) AS price_long,
      upper(o_orderstatus) AS status_up,
      o_orderstatus || '-' || o_orderpriority AS status_prio,
      substr(o_orderpriority, 1, 1) AS prio_code,
      strlen(o_orderpriority) AS prio_bytes,
      CASE WHEN o_orderstatus = '0000-00-00 00:00:00' THEN NULL ELSE o_orderstatus END AS status_clean
      FROM orders"""))

  /** F10/F11 JSON extraction from the events.props payload
    * (reference objectFlatten, lib/utils.js:133-156).
    */
  private val q15 = QueryDef(
    "q15_json_extract",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir).select(
        $"event_id",
        get_json_object($"props", "$.k").cast("long").as("k_val"))
    },
    Some("""SELECT event_id, json_extract_string(props, '$.k')::BIGINT AS k_val
      FROM events"""))

  /** [EXT] tumbling-window aggregation over the event stream — batch
    * form of the Structured Streaming lift (SURVEY §2.8); same plan
    * shape a streaming micro-batch would produce.
    */
  private val q16 = QueryDef(
    "q16_window_tumbling",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir)
        .groupBy(date_format(date_trunc("hour", $"ts"), TsFmt).as("hour_start"), $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(18,2)")).cast("double").as("total_value"))
    },
    Some("""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
      event_type, count(*) AS n_events,
      CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2"""))

  /** F4 epoch seconds ↔ timestamp (reference `resp.created_at * 1000`,
    * README.md:504): unix_timestamp → from_unixtime round trip.
    */
  private val q28 = QueryDef(
    "q28_epoch_roundtrip",
    (s, dir) => {
      import s.implicits._
      Tables.events(s, dir).select(
        $"event_id",
        unix_timestamp($"ts").as("epoch_s"),
        from_unixtime(unix_timestamp($"ts")).as("ts_str"))
    },
    // floor, not a bare ::BIGINT: DuckDB epoch() yields fractional
    // seconds and its cast ROUNDS, while Spark unix_timestamp truncates.
    Some("""SELECT event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
      strftime(to_timestamp(CAST(floor(epoch(ts)) AS BIGINT)), '%Y-%m-%d %H:%M:%S') AS ts_str
      FROM events"""))

  /** F10 full recursive JSON/struct flatten (reference `objectFlatten`,
    * lib/utils.js:133-156): nested structs → dotted-path columns via
    * [[graft.functions.StructFlatten]].
    */
  private val q29 = QueryDef(
    "q29_struct_flatten",
    (s, dir) => {
      import s.implicits._
      val nested = Tables.orders(s, dir).select(
        $"o_orderkey",
        struct(
          struct($"o_custkey".as("cust"), $"o_totalprice".as("price")).as("ids"),
          $"o_orderstatus".as("status")).as("ctx"))
      graft.functions.StructFlatten.flatten(nested)
    },
    Some("""SELECT o_orderkey, o_custkey AS "ctx.ids.cust",
      o_totalprice AS "ctx.ids.price", o_orderstatus AS "ctx.status"
      FROM orders"""))

  /** T2 global row cap (--getAllLimit, lib/book.js:74) exercised
    * through the FileConnection source path; the capped row SET is
    * arbitrary, so the oracle checks the deterministic count.
    */
  private val q30 = QueryDef(
    "q30_row_cap",
    (s, dir) => {
      val capped = new graft.connections.FileConnection(s, "cap", dir,
        getAllLimit = Some(500L))
      capped.getAll("orders").agg(count(lit(1)).as("n_rows"))
    },
    Some("""SELECT count(*) AS n_rows FROM (SELECT * FROM orders LIMIT 500) t"""))

  /** P4/P5 sanitize pack: control-char scrub + truncation cap,
    * zero-date → NULL, boolean → 0/1, reserved-word rename
    * (redshift.js:71-104, 63-69; snowflake.js:505-516).
    */
  private val q31 = QueryDef(
    "q31_sanitize",
    (s, dir) => {
      import s.implicits._
      import graft.functions.Sanitize
      val dirty = Tables.orders(s, dir).select(
        $"o_orderkey",
        concat($"o_orderpriority", lit("\u0007x")).as("prio_dirty"),
        when($"o_orderkey" % 2 === 0, lit("0000-00-00 00:00:00"))
          .otherwise($"o_orderstatus").as("status_dirty"),
        ($"o_orderkey" % 2 === 0).as("even_flag"),
        $"o_orderstatus".as("tag")) // Redshift reserved word
      Sanitize.renameReserved(dirty.select(
        $"o_orderkey",
        Sanitize.sanitizeString($"prio_dirty").as("prio_clean"),
        Sanitize.zeroDateToNull($"status_dirty").as("status_clean"),
        Sanitize.boolToInt($"even_flag").as("even_int"),
        $"tag"))
    },
    Some("""SELECT o_orderkey,
      substr(regexp_replace(o_orderpriority || chr(7) || 'x',
        '[\x00-\x08\x0B\x0C\x0E-\x1F]', '', 'g'), 1, 65535) AS prio_clean,
      CASE WHEN o_orderkey % 2 = 0 THEN NULL ELSE o_orderstatus END AS status_clean,
      CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS even_int,
      o_orderstatus AS tag_
      FROM orders"""))

  /** [EXT] salted two-phase aggregation (skew mitigation): identical
    * results to the plain GROUP BY — which is exactly what the oracle
    * runs. Values accumulate in decimal so the salted partial order
    * cannot perturb a float sum.
    */
  private val q35 = QueryDef(
    "q35_salted_agg",
    (s, dir) => {
      import s.implicits._
      graft.ops.Skew.saltedSumCount(
        Tables.orders(s, dir), Seq("o_custkey"),
        $"o_totalprice".cast("decimal(18,2)"), salt = 16)
        .select($"o_custkey", $"sum_value".cast("double").as("sum_value"), $"n_rows")
    },
    Some("""SELECT o_custkey,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      count(*) AS n_rows
      FROM orders GROUP BY o_custkey"""))

  /** [EXT] as-of join: each event enriched with the latest order of
    * the same customer at-or-before the event time (union + one window
    * pass — no range self-join). DuckDB's native ASOF JOIN is the
    * oracle. Right side deduped per (key, ts) by max orderkey so the
    * tie-break is deterministic on both engines.
    */
  private val q36 = QueryDef(
    "q36_asof_join",
    (s, dir) => {
      import s.implicits._
      val ev = Tables.events(s, dir)
        .select($"event_id", $"user_id", $"ts".cast("timestamp_ntz").as("ts"))
      val r = Tables.orders(s, dir)
        .groupBy($"o_custkey", $"o_orderdate")
        .agg(max($"o_orderkey").as("o_orderkey"),
          max_by($"o_totalprice", $"o_orderkey").as("o_totalprice"))
      graft.ops.Skew.asOfJoin(ev, r, "user_id", "o_custkey", "ts", "o_orderdate",
        Seq("o_orderkey", "o_totalprice"))
        .select($"event_id", $"user_id", date_format($"ts", TsFmt).as("event_ts"),
          $"asof_o_orderkey", $"asof_o_totalprice")
    },
    Some("""WITH r AS (
        SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey,
               arg_max(o_totalprice, o_orderkey) AS o_totalprice
        FROM orders GROUP BY o_custkey, o_orderdate)
      SELECT e.event_id, e.user_id, strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS event_ts,
        r.o_orderkey AS asof_o_orderkey, r.o_totalprice AS asof_o_totalprice
      FROM events e ASOF LEFT JOIN r
        ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate"""))

  /** [EXT] salted (replicated-dimension) equi-join: identical result
    * set to the plain join — which is exactly what the oracle runs —
    * while a hot custkey spreads over the salt fan-out. Deterministic
    * salt (hash, not rand) keeps retries exactly-once.
    */
  private val q51 = QueryDef(
    "q51_salted_join",
    (s, dir) => {
      import s.implicits._
      graft.ops.Skew.saltedJoin(
        Tables.orders(s, dir),
        Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment"),
        "o_custkey", "c_custkey", salt = 8)
        .select($"o_orderkey", $"o_custkey", $"c_mktsegment", $"o_totalprice")
    },
    Some("""SELECT o_orderkey, o_custkey, c_mktsegment, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey"""))

  /** [EXT] hybrid hot/cold skew join (Skew.hybridJoin): keys with
    * ≥ 75 event rows take the broadcast path (never crossing a
    * shuffle), the rest the plain equi-join with zero replication —
    * differential skew handling, vs q51's uniform salting. Result set
    * identical to the plain join, which is exactly what the oracle
    * runs.
    */
  private val q138 = QueryDef(
    "q138_hybrid_join",
    (s, dir) => {
      import s.implicits._
      graft.ops.Skew.hybridJoin(
        Tables.events(s, dir).select($"event_id", $"user_id"),
        Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment"),
        "user_id", "c_custkey", hotThreshold = 75)
        .select($"event_id", $"user_id", $"c_mktsegment")
    },
    Some("""SELECT event_id, user_id, c_mktsegment
      FROM events JOIN customer ON user_id = c_custkey"""))

  val all: Seq[QueryDef] = Seq(q1, q2, q3, q4, q5, q6, q7, q8,
    q9, q10, q11, q12, q13, q14, q15, q16, q28, q29, q30, q31, q35, q36,
    q51, q138)
}
