package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}

/** The versioned-pointer directory commit shared by [[ParquetTable]]
  * and the search-index sink: data lands in `<root>/v-NNNNNNNN/`
  * directories and the small `<root>/_CURRENT` file names the
  * published one (single-object PUT — the Iceberg version-hint
  * publish primitive). No table-level rename exists anywhere in the
  * protocol, so it works on object stores where rename is a
  * non-atomic O(data) copy.
  *
  * Crash semantics: before publish, readers stay on the old version
  * and the orphan directory is GC'd by the next commit; after
  * publish, only GC is delayed. The immediately-prior version is
  * retained through GC so in-flight readers finish on intact files.
  * Single-writer (the engine's pid-lock model); readers are lock-free.
  */
object VersionedLayout {

  val Current = "_CURRENT"

  def pointer(root: String): Path = new Path(root, Current)

  /** Published version name. The overwrite-PUT of the pointer is
    * atomic on S3-class stores but truncate-then-write on HDFS/posix,
    * so an existing-but-empty OR partially-written pointer (a torn
    * read like "v-000" passes a bare nonEmpty check but names no
    * directory) marks the mid-publish window: content is validated
    * against the `v-NNNNNNNN` shape, retried briefly, then healed
    * from the newest fully-committed (`_SUCCESS`-bearing) version —
    * under single-writer that is the version being published. An
    * absent pointer means the un-versioned legacy layout (no
    * fallback: unpublished versions must stay invisible).
    */
  def currentVersion(fs: FileSystem, root: String): Option[String] = {
    def wellFormed(s: String): Boolean = s.matches("v-\\d{8}")
    def readPointer(): Option[String] =
      if (!fs.exists(pointer(root))) None
      else {
        val in = fs.open(pointer(root))
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim)
        finally in.close()
      }
    readPointer() match {
      case None => None
      case Some(s) if wellFormed(s) => Some(s)
      case Some(_) =>
        var attempt = 0
        var v: Option[String] = None
        while (attempt < 3 && v.isEmpty) {
          Thread.sleep(25L << attempt)
          v = readPointer().filter(wellFormed)
          attempt += 1
        }
        v.orElse {
          fs.listStatus(new Path(root)).toSeq
            .map(_.getPath.getName)
            .filter(n => n.startsWith("v-") &&
              fs.exists(new Path(s"$root/$n/_SUCCESS")))
            .sorted.lastOption
        }
    }
  }

  /** Live data directory: the published version, or the root itself
    * for legacy (never-overwritten) layouts.
    */
  def dataDir(fs: FileSystem, root: String): String =
    currentVersion(fs, root).map(v => s"$root/$v").getOrElse(root)

  /** Name of the version a commit should write next. */
  def nextVersion(prior: Option[String]): String =
    "v-%08d".format(prior.map(_.stripPrefix("v-").toInt + 1).getOrElse(0))

  /** Atomically publish a version: the single small-object PUT.
    *
    * On rename-capable stores (HDFS/posix/local) the pointer is
    * written to a temp file and renamed over `_CURRENT` with
    * OVERWRITE — a single-FILE rename, atomic on those stores (it is
    * TABLE-directory renames that are forbidden by the protocol), so
    * a reader can never observe a torn pointer and a crash mid-publish
    * leaves the old pointer intact. Object stores without usable
    * rename fall back to the direct create — their single-object PUT
    * is already atomic, which is the protocol's founding assumption.
    * The torn-pointer heal in [[currentVersion]] stays as defense for
    * pointers written by older code.
    */
  def publish(fs: FileSystem, root: String, version: String): Unit = {
    val bytes = version.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val tmp = new Path(root, s"$Current.tmp")
    def put(p: Path): Unit = {
      val out = fs.create(p, true)
      try out.write(bytes) finally out.close()
    }
    try {
      put(tmp)
      org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
        .rename(tmp, pointer(root), org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: UnsupportedOperationException | _: java.io.IOException =>
        // no atomic file rename on this store: direct PUT (atomic there)
        if (fs.exists(tmp)) fs.delete(tmp, false)
        put(pointer(root))
    }
  }

  /** Remove everything under the root except the pointer and `keep`
    * (live + retained prior snapshot): older versions, crashed
    * un-published writes, and pre-versioning legacy data files.
    */
  def gc(fs: FileSystem, root: String, keep: Set[String]): Unit =
    fs.listStatus(new Path(root)).foreach { st =>
      val n = st.getPath.getName
      if (n != Current && !keep.contains(n)) fs.delete(st.getPath, true)
    }

  /** True when the root holds PUBLISHED data: a live pointer, or (for
    * legacy layouts) data files matched by `isDataFile`. A crashed
    * never-published version directory does not count.
    */
  def hasPublishedData(fs: FileSystem, root: String,
      isDataFile: String => Boolean): Boolean = {
    val p = new Path(root)
    fs.exists(p) && (currentVersion(fs, root).isDefined ||
      fs.listStatus(p).exists(st => isDataFile(st.getPath.getName)))
  }
}
