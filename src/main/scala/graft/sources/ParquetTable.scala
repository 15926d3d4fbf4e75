package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions
import org.apache.spark.sql.functions.{coalesce, col, hash, lit, pmod, struct, when}

/** A named, mutable, parquet-backed table — the engine's analogue of
  * the reference's endpoint tables (SURVEY.md §1.1 "Table").
  *
  * Two layouts:
  *
  *  - flat (buckets = 0): full replace is copy-on-write into a fresh
  *    version directory, published by the `_CURRENT` pointer (below).
  *  - hash-bucketed (buckets = n): rows are partitioned into
  *    `__bucket = pmod(hash(key), n)` parquet partitions, so an
  *    incremental upsert reads ONLY the buckets its batch touches
  *    (partition pruning) and rewrites ONLY those via dynamic
  *    partition overwrite. This is what makes upsert 100 TB-safe: a
  *    1 GB batch over a 100 TB table rewrites ~1/n of the table, not
  *    all of it (round-1 verdict scale-killer #1).
  *
  * '''Commit protocol''' (object-store safe): `overwrite` never
  * renames the table. It writes the new contents to a fresh
  * `<path>/v-NNNNNNNN/` directory, then atomically publishes by
  * PUTting the version name into the small `<path>/_CURRENT` pointer
  * file (single-object PUT is atomic on S3-class stores — the same
  * publish primitive as Iceberg's version-hint file), then
  * garbage-collects superseded versions — retaining the one
  * immediately-prior snapshot so in-flight readers that resolved the
  * old version directory before the flip finish against intact files
  * (the snapshot-retention window; versions older than that go at
  * once). A crash before publish leaves readers on the old version
  * (the orphan directory is GC'd by the next overwrite); a crash
  * after publish only delays GC. On an
  * object store a directory rename is an O(data) copy and non-atomic,
  * so the staged-swap idiom silently breaks exactly when the table
  * gets big — this layout does no table-level rename at all. Tables
  * created by `append` alone use the plain un-versioned layout until
  * their first `overwrite` migrates them.
  *
  * The reference gets atomicity from endpoint transactions
  * (`mysql.js:124-156`, `redshift.js:397-424`); with bare parquet the
  * pointer flip replaces them for full swaps, and the bucketed
  * incremental path relies on the committer's per-partition commit —
  * a crash mid-job can leave a mix of old/new PARTITIONS (not torn
  * files). Task-level commit safety inside a single write job is the
  * cluster committer's concern (S3A magic committer or equivalent),
  * configured per deployment, orthogonal to this table layout. Both
  * layouts inherit the reference's single-writer model (pid lock,
  * `lib/book.js:84-101` — see [[graft.engine.PidLock]]).
  */
final case class ParquetTable(spark: SparkSession, path: String,
    buckets: Int = 0, bucketKey: String = "id") {
  private val hconf = spark.sparkContext.hadoopConfiguration
  private def fs = new Path(path).getFileSystem(hconf)

  /** Published version directory name, None for un-versioned layouts
    * (append-created tables that were never overwritten). See
    * [[VersionedLayout.currentVersion]] for the mid-publish-window
    * retry/fallback semantics.
    */
  private def currentVersion: Option[String] =
    VersionedLayout.currentVersion(fs, path)

  /** The live published version name — the one [[read]] resolves and
    * [[versionMeta]]'s `currentMeta` describes (public alias of the
    * pointer read; None for un-versioned layouts). NOT `versions
    * .head`: after a [[rollback]] the live version is older than the
    * newest retained one.
    */
  def liveVersion: Option[String] = currentVersion

  /** Directory holding the live data files: the published version for
    * versioned tables, the table root for un-versioned layouts.
    */
  def dataDir: String = VersionedLayout.dataDir(fs, path)

  def isBucketed: Boolean = buckets > 0

  /** Deterministic bucket of a key column (computable on any DataFrame
    * carrying the key — batch or table side — without reading state).
    */
  def bucketExpr: org.apache.spark.sql.Column =
    pmod(hash(col(bucketKey)), lit(buckets))

  private val BucketsFile = "_GRAFT_BUCKETS"
  private val BucketsMetaKey = "graft.buckets"
  private def layoutTag: String = s"$buckets:$bucketKey"

  /** Validate the caller-supplied bucket layout against the one
    * recorded on disk (recording it on the first bucketed write): a
    * second call site constructed with a different modulus or key
    * would otherwise prune reads to buckets that don't hold the key's
    * rows and write its duplicates into different `__bucket=` dirs —
    * silent duplicate keys, no error. Every bucketed read/write path
    * calls this first.
    *
    * The record lives in TWO places: the root-level `_GRAFT_BUCKETS`
    * file (spared by [[VersionedLayout.gc]]'s `_GRAFT_*` exemption),
    * and — for versioned tables — the version-pinned `_GRAFT_META`
    * every [[overwrite]] publishes. If the root guard is ever lost
    * (pre-fix GC, hand cleanup), the published version's copy still
    * rejects a mismatched caller and re-heals the root file; the guard
    * is only truly gone if BOTH records are.
    */
  private def checkBucketLayout(writeIfAbsent: Boolean): Unit = {
    val p = new Path(path, BucketsFile)
    val rootRecord: Option[String] =
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    val recorded = rootRecord.orElse(currentMeta.get(BucketsMetaKey))
    recorded match {
      case Some(txt) =>
        require(txt == layoutTag,
          s"bucket layout mismatch at $path: on-disk '$txt' vs " +
            s"constructed '$layoutTag' — a mismatched modulus/key " +
            "silently mis-buckets upserts and mis-prunes reads")
        if (rootRecord.isEmpty) writeRootLayout(p) // heal the root guard
      case None => if (writeIfAbsent) writeRootLayout(p)
    }
  }

  private def writeRootLayout(p: Path): Unit = {
    val out = fs.create(p, true)
    try out.write(layoutTag.getBytes("UTF-8")) finally out.close()
  }

  private val MutsFile = "_GRAFT_MUTS"

  /** Count of IN-PLACE mutations ([[append]]/[[overwriteBuckets]])
    * the live snapshot has received since publish — version-scoped
    * ([[overwrite]] publishes a fresh dir, resetting to 0). Consumers
    * ([[AggView]]/[[RefreshView]]) use it to detect that a version
    * NAME no longer denotes the data it did when recorded, degrading
    * to a loud full rebuild instead of a silently-wrong delta.
    */
  def mutationCount: Long = readMuts(new Path(dataDir, MutsFile))

  /** [[mutationCount]] of a RETAINED named version's directory. */
  def mutationCountOf(version: String): Long =
    readMuts(new Path(s"$path/$version", MutsFile))

  private def readMuts(p: Path): Long =
    if (!fs.exists(p)) 0L
    else {
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toLong
      finally in.close()
    }

  private def bumpMutationCount(): Unit = {
    val p = new Path(dataDir, MutsFile)
    val next = readMuts(p) + 1
    val out = fs.create(p, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
  }

  /** True when the table has PUBLISHED data: a live version pointer,
    * or (un-versioned layouts) actual data files at the root. A
    * crashed never-published overwrite leaves only an unreferenced
    * `v-*` dir — that table reads as absent, and the next write
    * recreates it cleanly (the GC sweeps the orphan).
    */
  def exists: Boolean =
    VersionedLayout.hasPublishedData(fs, path,
      n => n.startsWith("__bucket=") || n.endsWith(".parquet"))

  /** Table contents, logical schema (no layout columns). */
  def read: DataFrame =
    if (isBucketed) readRaw.drop("__bucket") else readRaw

  /** Bucketed read keeping the `__bucket` partition column so filters
    * on it prune partitions. mergeSchema heals per-partition schema
    * drift after evolution (missing columns read as NULL).
    *
    * Legacy (never-overwritten) layouts list the root's immediate data
    * entries explicitly instead of scanning the directory: during the
    * table's FIRST `overwrite` (or after a crash-before-publish) the
    * root transiently also holds the unpublished `v-*` directory, and
    * a whole-root scan would either fail partition discovery
    * ("conflicting directory structures" — leaf files at mixed
    * depths) or leak the partial new version into the read. Explicit
    * listing keeps lock-free readers on the old data, which is the
    * commit protocol's contract.
    */
  def readRaw: DataFrame = currentVersion match {
    case Some(v) => scanDir(s"$path/$v")
    case None =>
      val entries = fs.listStatus(new Path(path)).toSeq.map(_.getPath)
      if (isBucketed) {
        val bucketDirs = entries.filter(_.getName.startsWith("__bucket="))
        spark.read.option("mergeSchema", "true")
          .option("basePath", path).parquet(bucketDirs.map(_.toString): _*)
      } else {
        val files = entries.filter(_.getName.endsWith(".parquet"))
        spark.read.parquet(files.map(_.toString): _*)
      }
  }

  /** Raw scan of one version directory — shared by the live read and
    * time travel so their read options can never drift.
    */
  private def scanDir(d: String): DataFrame =
    if (isBucketed)
      spark.read.option("mergeSchema", "true").option("basePath", d).parquet(d)
    else spark.read.parquet(d)

  /** Only the named buckets — a partition-pruned scan. */
  def readBuckets(ids: Seq[Int]): DataFrame = {
    checkBucketLayout(writeIfAbsent = false)
    readRaw.filter(col("__bucket").isin(ids.map(Integer.valueOf): _*)).drop("__bucket")
  }

  /** Atomic full replace (reference fullMerge drop/recreate/copy,
    * `mysql.js:567-570`) via the versioned-pointer commit (see class
    * doc): write `v-N+1`, flip `_CURRENT`, GC. `distKey`/`sortKey`
    * emulate the Redshift distkey/sortkey physical-layout policy
    * (`redshift.js:340-350`): repartition on the key so co-keyed joins
    * avoid a shuffle, sort within partitions so parquet min/max
    * row-group stats prune scans. Bucketed tables additionally
    * partition the directory by `__bucket`.
    */
  def overwrite(df: DataFrame, distKey: Option[String] = None,
      sortKey: Option[String] = None,
      meta: Map[String, String] = Map.empty): Unit = {
    if (isBucketed) checkBucketLayout(writeIfAbsent = true)
    val laidOut = (distKey.filterNot(_ => isBucketed), sortKey) match {
      case (Some(d), Some(s)) => df.repartition(col(d)).sortWithinPartitions(col(s))
      case (Some(d), None)    => df.repartition(col(d))
      case (None, Some(s))    => df.sortWithinPartitions(col(s))
      case _                  => df
    }
    val prior = currentVersion
    // freshVersion, not nextVersion(prior): after a rollback the
    // demoted dir is still on disk and succeeding the LIVE version
    // would reuse its name for different data
    val next = VersionedLayout.freshVersion(fs, path, prior)
    val target = new Path(path, next)
    if (fs.exists(target)) fs.delete(target, true) // crash leftover
    val w = (if (isBucketed) laidOut.withColumn("__bucket", bucketExpr)
             else laidOut).write.mode("overwrite")
    (if (isBucketed) w.partitionBy("__bucket") else w).parquet(target.toString)
    // version-pinned metadata lands INSIDE the version directory,
    // BEFORE the pointer flip: it becomes visible atomically with the
    // snapshot it describes, so no crash window can publish data with
    // stale/missing metadata (what an out-of-band sidecar file would
    // risk). Consumers: AggView's applied-base-version bookkeeping;
    // bucketed tables also carry their layout tag so the mismatch
    // guard survives even a lost root _GRAFT_BUCKETS file.
    val fullMeta =
      if (isBucketed) meta + (BucketsMetaKey -> layoutTag) else meta
    if (fullMeta.nonEmpty) writeMeta(target, fullMeta)
    VersionedLayout.publish(fs, path, next)
    // retain the just-superseded snapshot: a reader that resolved the
    // old dataDir before the pointer flip keeps valid files under its
    // feet (bounded at one prior version — the snapshot-retention
    // window; older versions and orphans go now)
    VersionedLayout.gc(fs, path, keep = Set(next) ++ prior)
  }

  /** Rewrite ONLY the buckets present in `df` (dynamic partition
    * overwrite); untouched bucket directories are never read or
    * written. `df` must carry the complete new contents of every
    * bucket it touches. In-place within the live version directory —
    * atomicity here is per-partition (committer-level), by design.
    */
  def overwriteBuckets(df: DataFrame): Unit = {
    require(isBucketed, s"$path is not a bucketed table")
    checkBucketLayout(writeIfAbsent = true)
    df.withColumn("__bucket", bucketExpr)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__bucket")
      .parquet(dataDir)
    bumpMutationCount() // in-place change: views must see version-name ≠ data
  }

  /** Plain append (reference `mergeOnDuplicates=false` insert path,
    * `mysql.js:369-377`). Not staged — parquet append is file-additive
    * and each task commits atomically. Appends land in the live
    * version directory (or the table root for un-versioned layouts).
    */
  def append(df: DataFrame): Unit = {
    if (isBucketed) checkBucketLayout(writeIfAbsent = true)
    val w = (if (isBucketed) df.withColumn("__bucket", bucketExpr) else df)
      .write.mode("append")
    (if (isBucketed) w.partitionBy("__bucket") else w).parquet(dataDir)
    bumpMutationCount() // in-place change: views must see version-name ≠ data
  }

  def drop(): Unit = { val p = new Path(path); if (fs.exists(p)) fs.delete(p, true) }

  /** Total bytes of the table's LIVE data files (superseded versions
    * awaiting GC — and, for legacy layouts, a mid-write `v-*`
    * directory — excluded).
    */
  def sizeBytes: Long = currentVersion match {
    case Some(v) => fs.getContentSummary(new Path(s"$path/$v")).getLength
    case None =>
      fs.listStatus(new Path(path)).toSeq
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("__bucket=") || n.endsWith(".parquet")
        }
        .map(st => fs.getContentSummary(st.getPath).getLength).sum
  }

  /** Compact the small-file tail: rewrite the table into
    * ceil(size / targetFileBytes) files (per bucket for bucketed
    * layouts). Incremental appends and per-batch upserts accrete
    * small files; at scan time each file costs a footer read and a
    * task, so a 100 TB table drowning in KB-files wastes the cluster
    * on scheduling. Data is unchanged — only layout; the flat path
    * reuses the staged atomic swap.
    *
    * Bucketed tables coalesce WITHIN each bucket: the shuffle keys on
    * (__bucket, key-hash spread) so a multi-GB bucket splits across
    * ~size/target tasks and files instead of serializing into one
    * task writing one pathological file; partition pruning is intact
    * because the directory layout still keys on `__bucket` alone. The
    * spread hash is salted (extra literal) so it stays independent of
    * the bucket id — `hash(key) % m` would be constant within a
    * bucket whenever m divides the bucket count.
    */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(exists, s"$path does not exist")
    TableLease.withLease(this, "compact") {
    if (isBucketed) {
      // partition-scoped: rewrite ONLY buckets whose file count exceeds
      // what their size warrants; untouched buckets keep their files.
      val d = dataDir // resolve the pointer once, not once per bucket
      val wants: Seq[(Int, Int)] = bucketIds.flatMap { b =>
        val dir = new Path(s"$d/__bucket=$b")
        val files = fs.listStatus(dir).filter(f => f.getPath.getName.endsWith(".parquet"))
        val want = math.max(1, math.ceil(
          files.map(_.getLen).sum.toDouble / targetFileBytes).toInt)
        if (files.length > want) Some(b -> want) else None
      }
      if (wants.nonEmpty) {
        // per-bucket modulus (a bucket wanting 1 file must NOT be
        // shattered by a sibling wanting 800): a bucket-id → want map
        // folds into the plan as a literal, bounded by bucket count
        val wantMap = org.apache.spark.sql.functions.map(
          wants.flatMap { case (b, w) => Seq(lit(b), lit(w)) }: _*)
        val spread = pmod(hash(col(bucketKey), lit(1)),
          org.apache.spark.sql.functions.element_at(wantMap, bucketExpr.cast("int")))
        overwriteBuckets(
          readBuckets(wants.map(_._1))
            .repartition(wants.map(_._2).sum, bucketExpr, spread))
      }
    } else {
      val nFiles = math.max(1, math.ceil(sizeBytes.toDouble / targetFileBytes).toInt)
      overwrite(read.repartition(nFiles))
    }
    }
  }

  /** On-disk snapshot INVENTORY, newest first: every version directory
    * with a complete (`_SUCCESS`) write. Normally the live version
    * plus the one retained prior snapshot; transiently it can also
    * hold a crashed write whose job finished but whose pointer PUT
    * never happened — such an entry is NOT committed history (the
    * pointer alone decides that) and is readable only for forensics.
    * [[rollback]] never targets anything newer than the live version.
    */
  def versions: Seq[String] = VersionedLayout.completeVersions(fs, path)

  /** Read a specific on-disk version (time travel within the
    * retention window — the prior snapshot survives exactly one
    * overwrite, so this is the "what did the last load clobber" view,
    * not unbounded history; a crashed never-published write is also
    * readable here, for forensics).
    */
  def readVersion(version: String): DataFrame = {
    require(versions.contains(version),
      s"version $version not on disk (have: ${versions.mkString(", ")})")
    val df = scanDir(s"$path/$version")
    if (isBucketed) df.drop("__bucket") else df
  }

  private val MetaFile = "_GRAFT_META"

  /** `key=value` lines — no JSON parser dependency; keys and values
    * must not contain '\n' OR '\r' (linesIterator treats a bare CR as
    * a terminator, so a CR would silently truncate the value on
    * read-back; '=' splits on the FIRST occurrence, so values may
    * contain it).
    */
  private def writeMeta(versionDir: Path, meta: Map[String, String]): Unit = {
    require(meta.forall { case (k, v) =>
      !k.exists(c => c == '\n' || c == '\r') &&
        !v.exists(c => c == '\n' || c == '\r') && !k.contains("=") },
      s"meta keys must be '='/CR/LF-free and values CR/LF-free: $meta")
    val out = fs.create(new Path(versionDir, MetaFile), true)
    try out.write(meta.toSeq.sorted.map { case (k, v) => s"$k=$v\n" }
      .mkString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Version-pinned metadata recorded by `overwrite(…, meta = …)` —
    * read from INSIDE the named version directory, so it can never
    * describe a different snapshot than the one being read. Empty for
    * versions written without metadata.
    */
  def versionMeta(version: String): Map[String, String] = {
    val p = new Path(s"$path/$version", MetaFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val bytes =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          Iterator.continually(in.read(chunk)).takeWhile(_ > 0)
            .foreach(n => buf.write(chunk, 0, n))
          buf.toString("UTF-8")
        } finally in.close()
      // a malformed line (hand-edited or torn on a non-atomic store)
      // reads as ABSENT metadata, not an exception — consumers like
      // AggView treat lost metadata as "rebuild", which is the safe
      // degradation; throwing here would wedge that very path
      bytes.linesIterator.filter(l => l.nonEmpty && l.contains("="))
        .map { line =>
          val i = line.indexOf('=')
          line.substring(0, i) -> line.substring(i + 1)
        }.toMap
    }
  }

  /** [[versionMeta]] of the live snapshot (empty for un-versioned
    * layouts or metadata-free versions).
    */
  def currentMeta: Map[String, String] =
    currentVersion.map(versionMeta).getOrElse(Map.empty)

  /** CDC-style diff of two on-disk snapshots in the retention window:
    * the keyed change set between `from` (strictly older) and `to`
    * (newer) — the "what did the last load actually do" view, and the
    * change feed a downstream incremental consumer applies instead of
    * re-reading the table. Assumes `key` is unique per snapshot (the
    * invariant the upsert path maintains); a null key matches null-safe
    * (one unchanged null-keyed row is NOT a delete+insert pair).
    *
    * Semantics, schema-evolution tolerance, and output shape are
    * [[graft.ops.Cdc.changeSet]]'s (this is that diff applied to two
    * retained on-disk versions); see its scaladoc for the
    * struct-alignment and scale notes.
    */
  def diffVersions(from: String, to: String, key: String): DataFrame = {
    require(from < to,
      s"diffVersions arguments are (older, newer): got from=$from, to=$to — " +
        "swapped arguments would silently invert insert/delete labels")
    graft.ops.Cdc.changeSet(readVersion(from), readVersion(to), key)
  }

  /** Roll the table back to the retained prior snapshot: re-publish
    * its version name — the same single atomic pointer PUT as a
    * forward commit, no data moves. Only versions STRICTLY OLDER than
    * the live one are candidates: a newer `_SUCCESS` directory is a
    * crashed never-published write, not committed history, and must
    * not become live by "rolling back". The bad live version is NOT
    * deleted (it stays readable via [[readVersion]] for forensics;
    * the next overwrite GCs it), so a mistaken rollback is undone
    * with an explicit [[publishVersion]] of the version rolled back
    * from.
    */
  def rollback(): Unit = TableLease.withLease(this, "rollback") {
    val live = currentVersion.getOrElse(
      sys.error(s"$path has no published version to roll back from"))
    val candidates = versions.filter(_ < live)
    require(candidates.nonEmpty,
      s"no prior snapshot to roll back to (on disk: ${versions.mkString(", ")})")
    VersionedLayout.publish(fs, path, candidates.max)
  }

  /** Publish a NAMED on-disk version — the deliberate, operator-driven
    * pointer move (redo after a mistaken [[rollback]], or promoting a
    * crashed-but-verified write). Unlike rollback it accepts any
    * complete version, so the caller vouches for the target's
    * contents.
    */
  def publishVersion(version: String): Unit =
    TableLease.withLease(this, "publishVersion") {
      require(versions.contains(version),
        s"version $version not on disk (have: ${versions.mkString(", ")})")
      VersionedLayout.publish(fs, path, version)
    }

  /** Cluster the table on `sortCols` (the OPTIMIZE-style maintenance
    * rewrite): the table is range-partitioned into
    * ceil(size / targetFileBytes) files holding DISJOINT sorted
    * key-TUPLE ranges — every parquet row group outside a predicate's
    * range prunes on its footer min/max, so a point/range query on the
    * sort key touches ~one file's worth of row groups no matter how
    * big the table is. For a SINGLE sort column the per-file [min,max]
    * ranges themselves are disjoint (`LayoutSkippingSpec` proves it
    * from the footers); with compound keys the disjointness is in
    * tuple order, so a leading-column value hot enough to span several
    * range partitions will appear in several files' stats — skipping
    * on the leading column is then "no interleaving" rather than
    * "unique file per value".
    *
    * Bucketed tables range-partition on (__bucket, sortCols): the
    * directory layout still keys on `__bucket` alone (partition
    * pruning intact), each bucket's data splits across ~its-share of
    * the n partitions (a multi-GB bucket never serializes into one
    * task/file), and within a bucket the files carry disjoint sorted
    * ranges for footer skipping.
    *
    * Range boundaries come from Spark's reservoir sample of the sort
    * key (RangePartitioner), so skewed keys still yield balanced
    * files. The rewrite goes through the versioned-pointer commit —
    * readers never see a half-clustered table.
    */
  def optimizeLayout(sortCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(sortCols.nonEmpty, "optimizeLayout needs at least one sort column")
    require(exists, s"$path does not exist")
    TableLease.withLease(this, "optimizeLayout") {
      val n = math.max(1, math.ceil(sizeBytes.toDouble / targetFileBytes).toInt)
      val cols = sortCols.map(col)
      val keys = if (isBucketed) bucketExpr +: cols else cols
      overwrite(read.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*))
    }
  }

  /** Z-ORDER the table on 2–4 columns (the multi-dimensional OPTIMIZE
    * rewrite): each column is normalized to a fixed-width code by
    * exact min/max linear scaling, the codes' bits are Morton-
    * interleaved into one sort key ([[graft.functions.Kernels
    * .interleaveBits]]), and the table range-clusters on that key —
    * so each output file covers a COMPACT HYPER-RECTANGLE of the
    * combined key space and its parquet footer min/max prunes
    * predicates on ANY of the z columns, where a lexicographic
    * `optimizeLayout(Seq(a, b))` leaves b's per-file ranges spanning
    * the whole domain (`LayoutSkippingSpec` measures the bounding-box
    * shrinkage from the footers).
    *
    * Scale shape: one 1-row min/max aggregation (the only driver
    * materialization), then the same repartitionByRange + in-partition
    * sort + versioned-pointer commit as [[optimizeLayout]]. The z
    * expression is computed on the fly for partitioning/sorting and
    * never becomes a table column. Heavily skewed columns degrade to
    * coarse codes (min/max scaling), exactly as in production
    * Z-ordering; range boundaries still balance files via the
    * reservoir sample.
    */
  def optimizeLayoutZOrder(zCols: Seq[String],
      targetFileBytes: Long = 128L * 1024 * 1024): Unit = {
    require(zCols.size >= 2 && zCols.size <= 4,
      s"z-order wants 2-4 columns, got ${zCols.size}")
    require(exists, s"$path does not exist")
    TableLease.withLease(this, "optimizeLayoutZOrder") {
    val bitsPer = math.min(16, 63 / zCols.size)
    val maxCode = (1L << bitsPer) - 1L
    val df = read
    if (!df.isEmpty) { // empty: nothing to lay out; keep the snapshot as-is
    // exact per-column min/max — one scan, one row to the driver
    val aggs = zCols.flatMap(c => Seq(
      functions.min(functions.col(c).cast("double")).as(s"__mn_$c"),
      functions.max(functions.col(c).cast("double")).as(s"__mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head
    val codes = zCols.zipWithIndex.map { case (c, i) =>
      // a null range (all-null column, or a type double can't be cast
      // from — dates, strings) would NPE deep inside Row.getDouble;
      // fail with the column named instead
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"z-order column '$c' has no numeric range (all-null or not " +
          "castable to double)")
      val mn = row.getDouble(2 * i)
      val mx = row.getDouble(2 * i + 1)
      val range = math.max(mx - mn, java.lang.Double.MIN_VALUE)
      functions.least(functions.greatest(
        functions.floor((functions.col(c).cast("double") - mn) / range * maxCode)
          .cast("long"), functions.lit(0L)), functions.lit(maxCode))
    }
    val z = graft.functions.Kernels.interleaveBitsOf(
      functions.array(codes: _*), bitsPer)
    val n = math.max(1, math.ceil(sizeBytes.toDouble / targetFileBytes).toInt)
    val keys = if (isBucketed) Seq(bucketExpr, z) else Seq(z)
    overwrite(df.repartitionByRange(n, keys: _*).sortWithinPartitions(keys: _*))
    }
    }
  }

  private val TableMetaFile = "_GRAFT_TABLEMETA"

  /** TABLE-scoped metadata (root-level `_GRAFT_TABLEMETA`, spared by
    * GC like the bucket-layout guard) — for state that must survive
    * IN-PLACE mutations ([[append]]/[[overwriteBuckets]]), which never
    * flip the version pointer and so can't carry version-pinned
    * metadata. The streaming partition-scoped index publishes record
    * their applied-batch watermark here. Same `key=value` line format
    * and constraints as [[versionMeta]]. Single-writer (the engine's
    * pid-lock model); the read-modify-write in [[putTableMeta]] is not
    * concurrent-safe by design.
    */
  def tableMeta: Map[String, String] = {
    val p = new Path(path, TableMetaFile)
    if (!fs.exists(p)) Map.empty
    else {
      val in = fs.open(p)
      val bytes =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      bytes.linesIterator.filter(l => l.nonEmpty && l.contains("="))
        .map { line =>
          val i = line.indexOf('=')
          line.substring(0, i) -> line.substring(i + 1)
        }.toMap
    }
  }

  /** Merge `kv` into [[tableMeta]] (existing keys overwritten, others
    * retained) — one small-file PUT, atomic on object stores.
    */
  def putTableMeta(kv: (String, String)*): Unit = {
    val merged = tableMeta ++ kv
    require(merged.forall { case (k, v) =>
      !k.exists(c => c == '\n' || c == '\r') &&
        !v.exists(c => c == '\n' || c == '\r') && !k.contains("=") },
      s"meta keys must be '='/CR/LF-free and values CR/LF-free: $merged")
    val out = fs.create(new Path(path, TableMetaFile), true)
    try out.write(merged.toSeq.sorted.map { case (k, v) => s"$k=$v\n" }
      .mkString.getBytes("UTF-8"))
    finally out.close()
  }

  /** Parquet data files currently in one bucket's directory (0 when
    * the bucket has never been written) — the signal an amortized
    * compaction policy keys on: each streaming [[append]] adds files,
    * so file count ≈ un-consolidated delta batches.
    */
  def bucketFileCount(id: Int): Int = {
    require(isBucketed, s"$path is not a bucketed table")
    val dir = new Path(dataDir, s"__bucket=$id")
    if (!fs.exists(dir)) 0
    else fs.listStatus(dir).count(_.getPath.getName.endsWith(".parquet"))
  }

  /** Remove the named buckets' directories entirely (partition-scoped
    * delete — [[overwriteBuckets]] can't express "this bucket is now
    * EMPTY": dynamic partition overwrite only rewrites partitions
    * present in the frame). Used by index compaction when every row of
    * a bucket is evicted.
    */
  def dropBuckets(ids: Seq[Int]): Unit = {
    require(isBucketed, s"$path is not a bucketed table")
    val d = dataDir
    ids.foreach { b =>
      val dir = new Path(d, s"__bucket=$b")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    if (ids.nonEmpty) bumpMutationCount()
  }

  /** Bucket ids present on disk. */
  def bucketIds: Seq[Int] = {
    require(isBucketed, s"$path is not a bucketed table")
    fs.listStatus(new Path(dataDir)).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith("__bucket="))
      .map(_.stripPrefix("__bucket=").toInt)
      .sorted
  }
}
