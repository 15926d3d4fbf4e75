package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text-analysis kernels for the [EXT] LLM-data-pipeline
  * operators (SURVEY.md §2.7 note, §7.1 step 6).
  *
  * Design rules:
  *  - every kernel is a pure `Column` expression over builtins
  *    (codegen'd, stays inside WholeStageCodegen; zero UDFs) — at 100 TB
  *    these run map-side with no shuffle and no driver involvement;
  *  - every kernel is deterministic and reproducible in ANSI SQL, so
  *    each has a DuckDB oracle (graft.queries.PipelinePack);
  *  - the only hash primitive is md5 (identical bytes in every engine);
  *    `hex60` folds its first 15 hex chars into a non-negative 60-bit
  *    long, which survives BIGINT arithmetic in engines that error on
  *    64-bit overflow (DuckDB) as well as ones that wrap (JVM).
  */
object TextKernels {

  /** Stable non-negative 60-bit hash of any string-typed column. */
  def hex60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Whitespace tokenizer (the reference corpus is space-joined). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct n-word shingles; short docs yield one truncated shingle
    * so every non-null document has a non-empty shingle set.
    */
  def wordShingles(toks: Column, n: Int): Column =
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n)))))

  /** MinHash signature: element h = min over shingles of
    * md5(h || '|' || shingle). Min of hex strings is a lexicographic
    * min — identical in any engine — so no integer conversion is
    * needed in the signature itself.
    */
  def minhashSig(shingleCol: Column, numHashes: Int): Column =
    transform(
      sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleCol, sh => md5(concat(h.cast("string"), lit("|"), sh)))))

  /** LSH band keys: band b hashes signature rows [b*r, b*r+r).
    * Docs sharing any band key are near-dup candidates — candidate
    * generation is a groupBy/join on the band key, NEVER an all-pairs
    * crossJoin, which is what makes this 100 TB-safe.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("", slice(sig, b * rowsPerBand + 1, rowsPerBand)))
    }: _*)

  /** 60-bit SimHash over a pre-hashed token array (see `hex60`):
    * bit b is set iff sum over tokens of (bit_b(h)*2 - 1) > 0.
    * Bits are statically unrolled (b is a Scala constant) so everything
    * stays in codegen'd builtins.
    */
  def simhash60(tokenHashes: Column): Column =
    (0 until 60).map { b =>
      when(
        aggregate(tokenHashes, lit(0L),
          (acc, h) => acc + (shiftright(h, b) % 2) * 2 - 1) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-token 60-bit hashes, the simhash input. */
  def tokenHashes(toks: Column): Column = transform(toks, t => hex60(t))

  /** Rolling polynomial fingerprint over the token stream:
    * acc' = (acc * 1000003 + (hex60(t) mod P)) mod P, P = 1e9+7.
    * All intermediates < 2^60 — safe under both wrapping and
    * overflow-checked BIGINT semantics.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, t) => (acc * 1000003L + pmod(hex60(t), lit(1000000007L))) % 1000000007L)

  /** Fraction of tokens present in `stop` (a language stopword list). */
  def stopwordRatio(toks: Column, stop: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(stop.map(lit): _*), t)))
      .cast("double") / size(toks)

  /** Fraction of tokens containing multi-byte (non-ASCII) characters —
    * a cheap CJK / non-Latin signal for language ID.
    */
  def multibyteRatio(toks: Column): Column =
    size(filter(toks, t => octet_length(t) > length(t)))
      .cast("double") / size(toks)
}
