package graft.connections

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JDBC connection: one implementation covers the reference's MySQL /
  * Redshift / Snowflake endpoints (`lib/connections/{mysql,redshift,
  * snowflake}.js`) — Spark's JDBC source owns the dialect differences
  * the reference hand-codes (`LIMIT o,c` vs `OFFSET..FETCH`,
  * S1–S3).
  *
  * The reference's manual OFFSET pagination becomes partitioned reads
  * (`partitionColumn`/`lowerBound`/`upperBound`/`numPartitions`) so a
  * 1000-executor cluster scans ranges concurrently instead of a serial
  * chunk loop.
  *
  * Tested against embedded Derby (graft.JdbcConnectionSpec) — reads,
  * partitioned reads, append, keyed merge, and full-replace all
  * exercise a real JDBC endpoint in-process.
  */
final class JdbcConnection(spark: SparkSession, val name: String,
    opts: Map[String, String]) extends Connection {
  private val url = opts("url")
  private val NonJdbcOpts = Set("url", "getAllLimit", "tablesQuery",
    "partitionColumn", "numPartitions", "mergeStrategy", "abortAfterStage",
    "abortAfterMerge")
  private val common = opts.view.filterKeys(k => !NonJdbcOpts.contains(k)).toMap
  private val getAllLimit = opts.get("getAllLimit").map(_.toLong)

  private def reader = spark.read.format("jdbc").option("url", url).options(common)

  /** DIALECT-aware identifier quoting — the same rule Spark's JDBC
    * writer used to create the table's columns (backticks on
    * MySQL/MariaDB, double quotes elsewhere). Hardcoding ANSI double
    * quotes here would make every quoted identifier a STRING LITERAL
    * on default-mode MySQL — the exact endpoints the deleteInsert
    * merge strategy routes there — silently matching nothing.
    */
  private val dialect = org.apache.spark.sql.jdbc.JdbcDialects.get(url)
  private val quotedQ: String => String = c => dialect.quoteIdentifier(c)

  /** Identifier values (table/column names) are spliced into SQL text,
    * so they are restricted to word characters and dots, optionally
    * double-quoted — a name arriving from config, a catalog listing,
    * or user input cannot smuggle SQL (`x) q; DROP ...`) into the
    * endpoint. Returns the BARE name (quotes stripped); call sites
    * decide quoting. Exotic identifiers go through [[query]], where
    * the caller owns the SQL.
    */
  private def safeIdent(s: String): String = {
    val bare =
      if (s.length > 1 && s.head == '"' && s.last == '"') s.substring(1, s.length - 1)
      else s
    require(bare.matches("[A-Za-z0-9_.]+"), s"unsafe SQL identifier: '$s'")
    bare
  }

  override def getAll(table: String): DataFrame = {
    safeIdent(table)
    val base = opts.get("partitionColumn") match {
      case Some(pc) =>
        // Partitioned range scan replacing the reference's LIMIT-offset
        // recursion (mysql.js:232-256).
        // quote the column: Spark's JDBC writer creates case-preserved
        // quoted identifiers, so unquoted references may not resolve
        // (e.g. Derby upper-cases them).
        val bounds = reader.option("dbtable",
          s"(SELECT min(${quotedQ(safeIdent(pc))}) lo, " +
            s"max(${quotedQ(safeIdent(pc))}) hi FROM $table) b")
          .load().head()
        if (bounds.isNullAt(0))
          // empty table: no range to partition (and .toString on the
          // NULL bound would NPE) — a plain scan of zero rows
          reader.option("dbtable", table).load()
        else reader.option("dbtable", table)
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          // default read parallelism follows the cluster, not a constant
          .option("numPartitions", opts.getOrElse("numPartitions",
            spark.sparkContext.defaultParallelism.toString))
          .load()
      case None => reader.option("dbtable", table).load()
    }
    // caps beyond Int.MaxValue are "unlimited" (the reference default
    // is Infinity, lib/book.js:74) — .limit(int) must not wrap.
    getAllLimit.filter(_ <= Int.MaxValue).fold(base)(n => base.limit(n.toInt))
  }

  override def query(sql: String): DataFrame =
    reader.option("dbtable", s"($sql) q").load()

  /** Catalog query is dialect-specific (information_schema by default;
    * Derby/others override via opts("tablesQuery")).
    */
  override def listTables: Seq[String] =
    query(opts.getOrElse("tablesQuery",
      "SELECT table_name FROM information_schema.tables"))
      .collect().map(_.getString(0)).toSeq.sorted

  override def describe(table: String): StructType = getAll(table).schema

  override def getMax(table: String, column: String): Option[Any] = {
    safeIdent(table)
    val c = safeIdent(column)
    // endpoints differ on whether Spark-written identifiers are quoted
    // case-preserved or normalized: try the quoted form first (matches
    // the partitionColumn path), fall back to unquoted
    val row =
      try query(s"SELECT MAX(${quotedQ(c)}) AS mx FROM $table").head()
      catch { case _: Exception =>
        query(s"SELECT MAX($c) AS mx FROM $table").head()
      }
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** Existence via JDBC catalog metadata, NOT a probe read: a probe
    * that swallows every exception turns a transient endpoint outage
    * into "table absent", silently downgrading a keyed merge to a
    * plain append (duplicate rows, no error). Here an outage fails the
    * connection attempt and propagates.
    */
  private def tableExists(table: String): Boolean = {
    val conn = rawConnection()
    try {
      val md = conn.getMetaData
      // getTables takes a LIKE pattern: '_' matches any one char, so a
      // bare "my_table" would also match "myXtable" and report a
      // missing table as present (merge then reads a nonexistent dest
      // instead of doing the first-batch append). Escaping with
      // getSearchStringEscape is not enough — Derby returns "" (no
      // escape exists) and treats a backslash literally — so the
      // matches are re-filtered by name. The re-filter is
      // case-INSENSITIVE: catalogs that match names case-insensitively
      // but store them case-preserved (SQL Server default collation)
      // would otherwise flunk the equality and silently downgrade
      // every merge to an append — the exact silent-duplicate failure
      // this method exists to prevent. equalsIgnoreCase still rejects
      // the wildcard's different-NAME matches ("myXtable").
      val esc = md.getSearchStringEscape
      def literal(n: String): String =
        if (esc == null || esc.isEmpty) n
        else n.flatMap(c => if (c == '_' || c == '%') s"$esc$c" else c.toString)
      def probe(n: String): Boolean = {
        val rs = md.getTables(null, null, literal(n), null)
        try {
          var found = false
          while (!found && rs.next())
            found = n.equalsIgnoreCase(rs.getString("TABLE_NAME"))
          found
        } finally rs.close()
      }
      val bare = safeIdent(table).split("\\.").last
      probe(bare) || probe(bare.toUpperCase) || probe(bare.toLowerCase)
    } finally conn.close()
  }

  private def write(data: DataFrame, table: String, mode: SaveMode,
      truncate: Boolean = false): Unit = {
    // validate only — keep the caller's original quoting in dbtable.
    // Stripping quotes here while the read path keeps them would make
    // a quoted case-sensitive identifier (Derby "events") read one
    // table and write the merge back to its case-normalized sibling.
    safeIdent(table)
    data.write.format("jdbc").option("url", url).options(common)
      .option("dbtable", table)
      .option("truncate", truncate.toString).mode(mode).save()
  }

  /** The staging table for a keyed merge into `table`, preserving the
    * caller's quoting so the stage lands next to a quoted
    * case-sensitive dest instead of a case-normalized sibling. The
    * `_gstage_` infix is RESERVED for the engine; the random suffix
    * makes each merge run's stage unique, so a pre-existing user table
    * is never clobbered and two concurrent merges into the same dest
    * cannot overwrite each other's stage mid-merge. Normal completion
    * AND a failed merge transaction both drop the stage; only a hard
    * process crash leaves an orphan (harmless — recognizable by the
    * reserved infix, re-created never, cleaned by the operator).
    */
  private def stageName(table: String): String = {
    val bare = safeIdent(table)
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    if (table.headOption.contains('"')) "\"" + bare + s"_gstage_$tag\""
    else table + s"_gstage_$tag"
  }

  /** Keyed-merge strategy: `MERGE INTO` where the dialect has it
    * (Snowflake, Derby ≥10.11, Postgres ≥15, SQL Server), one
    * transactional DELETE-matching-keys + INSERT otherwise (MySQL,
    * Redshift — matching redshift.js:397-424's BEGIN…COMMIT block).
    * Override with opts("mergeStrategy") ∈ {merge, deleteInsert}.
    */
  private val mergeStrategy = opts.getOrElse("mergeStrategy",
    if (url.startsWith("jdbc:mysql") || url.startsWith("jdbc:redshift") ||
        url.startsWith("jdbc:mariadb")) "deleteInsert"
    else "merge")

  /** Raw endpoint connection for the merge/catalog paths. A "driver"
    * option names the JDBC driver CLASS — Spark's reader/writer loads
    * it itself, but DriverManager only finds SPI-registered drivers,
    * so it must be Class.forName'd here (and NOT passed down as a
    * connection property, where endpoints would reject or ignore it).
    */
  private def rawConnection(): java.sql.Connection = {
    opts.get("driver").foreach(Class.forName)
    val props = new java.util.Properties()
    common.foreach { case (k, v) =>
      if (k != "driver") props.setProperty(k, v)
    }
    java.sql.DriverManager.getConnection(url, props)
  }

  private def withEndpoint[A](f: java.sql.Connection => A): A = {
    val conn = rawConnection()
    try f(conn) finally conn.close()
  }

  /** The endpoint-side merge statements. Stage columns are always
    * double-quoted (Spark's JDBC writer creates them case-preserved
    * quoted); dest columns use `q`, which the caller flips between
    * quoted and bare to match how the dest table was created.
    */
  private def mergeStatements(dest: String, stage: String, cols: Seq[String],
      key: String, q: String => String): Seq[String] = {
    def sq(c: String) = quotedQ(c) // stage columns: Spark-written, dialect-quoted
    mergeStrategy match {
      case "merge" =>
        val setCols = cols.filterNot(_ == key)
        val upd =
          if (setCols.isEmpty) ""
          else " WHEN MATCHED THEN UPDATE SET " +
            setCols.map(c => s"${q(c)} = s.${sq(c)}").mkString(", ")
        Seq(s"MERGE INTO $dest USING $stage s ON $dest.${q(key)} = s.${sq(key)}" +
          upd +
          s" WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(", ")})" +
          s" VALUES (${cols.map(c => "s." + sq(c)).mkString(", ")})")
      case _ =>
        Seq(
          s"DELETE FROM $dest WHERE ${q(key)} IN (SELECT ${sq(key)} FROM $stage)",
          s"INSERT INTO $dest (${cols.map(q).mkString(", ")})" +
            s" SELECT ${cols.map(sq).mkString(", ")} FROM $stage")
    }
  }

  /** S9/O1 with the reference's endpoint-transactional merge semantics
    * (`MERGE INTO` via a staged table, snowflake.js:347-397; BEGIN +
    * DELETE/INSERT + COMMIT, redshift.js:397-424): the batch is
    * deduplicated per key, staged to `<table>_gstage` through Spark's
    * JDBC writer, and then the ENDPOINT merges it into the dest inside
    * one transaction driven over a raw JDBC connection. The dest is
    * never read through Spark and never truncated: a crash any time
    * before the final COMMIT leaves it intact (at worst an orphan
    * stage table remains, which the next merge overwrites), closing
    * the lost-merge-window hazard of the previous truncate-reload
    * scheme. Endpoint DDL — primary keys, indexes, column types —
    * survives because only DML touches the dest.
    *
    * Dest identifier case: tables Spark created have quoted
    * case-preserved columns; externally created unquoted tables are
    * case-normalized. The merge tries the quoted form first and on a
    * statement error rolls back and retries with bare dest columns
    * (same convention as [[getMax]]).
    *
    * opts("abortAfterStage")="true" is fault injection for the
    * crash-window spec: it throws after staging, before the merge.
    */
  override def insertData(table: String, data: DataFrame, key: String,
      mergeOnDuplicates: Boolean): Unit = {
    safeIdent(table)
    if (mergeOnDuplicates && tableExists(table)) {
      val batch = graft.ops.Upsert.dedupPerKey(data, Seq(key))
      val stage = stageName(table)
      write(batch, stage, SaveMode.Overwrite)
      if (opts.get("abortAfterStage").contains("true"))
        throw new IllegalStateException(s"fault injection: aborted after staging $stage")
      val cols = batch.columns.toSeq
      // opts("abortAfterMerge")="true" models a hard crash AFTER the
      // merge transaction committed but BEFORE stage cleanup: the
      // cleanup is skipped entirely (a finally would still run it),
      // leaving the orphan stage a real crash leaves
      val hardCrashBeforeCleanup = opts.get("abortAfterMerge").contains("true")
      try runTxn(q => mergeStatements(table, stage, cols, key, q))
      finally if (!hardCrashBeforeCleanup)
        dropQuietly(stage) // failed merge: stage is junk, drop it too
      if (hardCrashBeforeCleanup)
        throw new IllegalStateException(
          s"fault injection: crashed after merge, before cleanup of $stage")
    } else {
      write(data, table, SaveMode.Append)
    }
  }

  /** True for errors that mean "this identifier quoting didn't
    * resolve" — syntax / object-not-found, SQLState class 42xxx. ONLY
    * these may fall through to the next quoting attempt: a transient
    * failure (deadlock, lock timeout) rerun with different quoting
    * could, on an endpoint holding both a quoted case-sensitive and a
    * case-normalized column of the same name, update the wrong column.
    */
  private def identifierError(e: java.sql.SQLException): Boolean =
    e.isInstanceOf[java.sql.SQLSyntaxErrorException] ||
      Option(e.getSQLState).exists(_.startsWith("42"))

  /** One endpoint transaction over `stmts(attempt)` for each attempt
    * in turn: an IDENTIFIER-resolution error rolls back and tries the
    * next quoting form; the last error propagates, and any other
    * SQLException rolls back and rethrows immediately. Any failure
    * leaves the endpoint at the pre-transaction state.
    */
  private def runTxnAttempts[A](attempts: Seq[A])(stmts: A => Seq[String]): Unit =
    withEndpoint { conn =>
      conn.setAutoCommit(false)
      var remaining = attempts
      var done = false
      var lastErr: java.sql.SQLException = null
      while (!done && remaining.nonEmpty) {
        val a = remaining.head
        remaining = remaining.tail
        try {
          val st = conn.createStatement()
          try stmts(a).foreach(st.executeUpdate) finally st.close()
          conn.commit()
          done = true
        } catch { case e: java.sql.SQLException =>
          conn.rollback()
          if (!identifierError(e)) throw e
          lastErr = e
        }
      }
      if (!done) throw lastErr
    }

  /** Quoted identifiers first, bare on a statement error (externally
    * created case-normalized tables) — same convention as [[getMax]].
    */
  private def runTxn(stmts: (String => String) => Seq[String]): Unit =
    runTxnAttempts[String => String](Seq(quotedQ, identity))(stmts)

  /** Best-effort DROP (stage cleanup); an orphan is overwritten by the
    * next merge, so failure here is not an error. */
  private def dropQuietly(table: String): Unit =
    try withEndpoint { conn =>
      val st = conn.createStatement()
      try st.executeUpdate(s"DROP TABLE $table") finally st.close()
    } catch { case _: java.sql.SQLException => () }

  /** O2, fully ENDPOINT-SIDE when the destination exists: both tables
    * live on this connection, so the merge is pure SQL in one
    * transaction with no Spark data transit — exactly
    * redshift.js:397-424's BEGIN…COMMIT block. Incremental:
    * `DELETE FROM dest WHERE key IN (SELECT key FROM src)` +
    * `INSERT INTO dest (cols) SELECT cols FROM src` (duplicate source
    * rows pass through to the endpoint's own key constraint, exactly
    * the reference's contract — redshift.js dedups only via its
    * optional id+updated_at DELETE; a GROUP BY-all dedup is not
    * dialect-safe here because long-text columns land as
    * non-comparable CLOBs on some endpoints). fullMerge with
    * matching schemas: transactional `DELETE FROM dest` + the same
    * insert (replace without dropping endpoint DDL). Only the cases
    * SQL cannot express portably — missing dest, source columns the
    * dest lacks — transit through Spark (Overwrite recreates the
    * table, which is what a schema change needs anyway,
    * mysql.js:567-570; the reference likewise forces fullMerge on
    * column drift, redshift.js:390-395).
    *
    * Identifier case: each side's columns are addressed by its OWN
    * catalog-reported names (matched case-insensitively across
    * sides), so a Spark-written source (quoted lowercase) merges into
    * an externally created dest (case-normalized) and vice versa; the
    * quoted/bare attempt ladder is per-side belt-and-braces on top.
    * Schema comparison is likewise case- and nullability-insensitive
    * — (lowercased name, type) pairs — so the DDL-preserving path is
    * actually reachable for externally created dests.
    */
  override def mergeTables(sourceTable: String, destTable: String, key: String,
      fullMerge: Boolean): Unit = {
    safeIdent(sourceTable)
    safeIdent(destTable)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name.toLowerCase, f.dataType)).toSeq
    if (!tableExists(destTable)) {
      write(getAll(sourceTable), destTable, SaveMode.Overwrite)
    } else {
      val srcSchema = describe(sourceTable)
      val destSchema = describe(destTable)
      val destByLower = destSchema.fieldNames.map(n => n.toLowerCase -> n).toMap
      val covered =
        srcSchema.fieldNames.forall(c => destByLower.contains(c.toLowerCase))
      if (!covered || (fullMerge && shape(srcSchema) != shape(destSchema))) {
        write(getAll(sourceTable), destTable, SaveMode.Overwrite)
      } else {
        // (destName, srcName) per column, each side's own catalog case
        val pairs = srcSchema.fieldNames.toSeq
          .map(c => destByLower(c.toLowerCase) -> c)
        val srcKey = srcSchema.fieldNames.find(_.equalsIgnoreCase(key))
        val destKey = destByLower.get(key.toLowerCase)
        def insertSel(qd: String => String, qs: String => String) =
          s"INSERT INTO $destTable (${pairs.map(p => qd(p._1)).mkString(", ")})" +
            s" SELECT ${pairs.map(p => qs(p._2)).mkString(", ")} FROM $sourceTable"
        val combos = Seq[(String => String, String => String)](
          (quotedQ, quotedQ), (quotedQ, identity), (identity, quotedQ),
          (identity, identity))
        // a key column missing from either side forces fullMerge
        // (the reference's forced-fullMerge when the dest lacks the
        // primary key, mysql.js:565, redshift.js:392) — running the
        // keyed DELETE against a nonexistent column would just burn
        // through all four quoting combos and throw
        if (fullMerge || srcKey.isEmpty || destKey.isEmpty)
          runTxnAttempts(combos) { case (qd, qs) =>
            Seq(s"DELETE FROM $destTable", insertSel(qd, qs)) }
        else
          runTxnAttempts(combos) { case (qd, qs) =>
            Seq(
              s"DELETE FROM $destTable WHERE ${qd(destKey.get)} IN " +
                s"(SELECT ${qs(srcKey.get)} FROM $sourceTable)",
              insertSel(qd, qs)) }
      }
    }
  }

  override def dump(table: String, path: String, fmt: String): DumpSummary =
    Connections.dumpTo(spark, getAll(table), path, fmt)
}
