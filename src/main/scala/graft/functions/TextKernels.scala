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

  /** MinHash base prime (< 2^30, so affine products stay < 2^61 and
    * are overflow-safe under both wrapping and checked BIGINT math).
    */
  final val MinhashP = 1073741789L

  /** Per-shingle 30-bit base hashes: ONE md5 per shingle; the k
    * permutations below are integer-only. (The naive alternative —
    * md5(h || shingle) per permutation — costs k× the hashing and
    * dominated the whole LSH pipeline.)
    */
  def shingleHashes(shingleCol: Column): Column =
    transform(shingleCol, s => pmod(hex60(s), lit(MinhashP)))

  /** MinHash signature from PRE-HASHED shingles (`shingleHashes`) via
    * k universal-hash permutations: sig[h] = min over shingles v of
    * (a_h * v + b_h) mod P — identical formula in the DuckDB oracle.
    *
    * SINGLE PASS over the shingle array: each shingle expands to its k
    * permuted values (a_h/b_h are Scala-side constants), merged
    * element-wise with `least` in one `aggregate`. This matters
    * because higher-order functions are interpreted, and an inner
    * array expression referenced inside a per-h lambda is re-evaluated
    * once PER h — the naive transform-of-transforms shape re-ran the
    * whole md5 pass k times (16× slowdown measured at sf0.1).
    */
  def minhashSigFromHashes(hashedCol: Column, numHashes: Int): Column = {
    val ab = (0 until numHashes).map { h =>
      (((h * 2654435761L) % MinhashP) + 1L, (h * 40503L + 12345L) % MinhashP)
    }
    val init = array(ab.map(_ => lit(Long.MaxValue)): _*)
    aggregate(hashedCol, init, (acc, v) =>
      zip_with(acc, array(ab.map { case (a, b) => (lit(a) * v + lit(b)) % lit(MinhashP) }: _*),
        (x, y) => least(x, y)))
  }

  /** MinHash signature straight from shingles. The shingle-hash pass
    * is referenced once at runtime (see above), so inlining is safe.
    */
  def minhashSig(shingleCol: Column, numHashes: Int): Column =
    minhashSigFromHashes(shingleHashes(shingleCol), numHashes)

  /** LSH band keys: band b hashes signature rows [b*r, b*r+r).
    * Docs sharing any band key are near-dup candidates — candidate
    * generation is a groupBy/join on the band key, NEVER an all-pairs
    * crossJoin, which is what makes this 100 TB-safe.
    */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|",
        transform(slice(sig, b * rowsPerBand + 1, rowsPerBand), v => v.cast("string"))))
    }: _*)

  /** 60-bit SimHash over a pre-hashed token array (see `hex60`):
    * bit b is set iff sum over tokens of (bit_b(h)*2 - 1) > 0.
    *
    * SINGLE PASS: one `aggregate` accumulates all 60 per-bit sums as
    * an array (element-wise zip_with add), then one zip_with maps
    * positive sums to their power-of-two and a final fold adds them.
    * The input array is referenced exactly once at runtime — the
    * per-bit-unrolled form re-evaluated the token-hash pass 60×
    * (interpreted higher-order functions re-run inner expressions per
    * lambda invocation).
    */
  def simhash60(tokenHashes: Column): Column = {
    val zeros = array((0 until 60).map(_ => lit(0L)): _*)
    val powers = array((0 until 60).map(b => lit(1L << b)): _*)
    val sums = aggregate(tokenHashes, zeros, (acc, h) =>
      zip_with(acc, array((0 until 60).map(b => (shiftright(h, b) % 2) * 2 - 1): _*),
        (x, y) => x + y))
    aggregate(
      zip_with(sums, powers, (s, p) => when(s > 0, p).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc + v)
  }

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
