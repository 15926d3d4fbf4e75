package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.{expr => exprBridge}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** [EXT] X2: compiled JVM kernels for the hot text/vector operators,
  * invoked from the plan via `StaticInvoke` — a codegen'd direct
  * static call inside WholeStageCodegen, replacing interpreted
  * higher-order-function trees (transform/aggregate lambdas are
  * evaluated interpretively per element; the compiled loop below is
  * 5-20× faster and allocation-free per element).
  *
  * SEMANTICS CONTRACT: each kernel is bit-identical to its
  * Column-expression counterpart in [[TextKernels]]/[[VectorKernels]]
  * (asserted by graft.KernelParitySpec) and therefore to the DuckDB
  * oracles in PipelinePack — same md5/hex60 hashing, same left-fold
  * order for double sums, same null-on-zero-norm cosine.
  */
object Kernels {

  private val P = TextKernels.MinhashP
  private val FP = 1000000007L

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** hex60: first 15 hex chars of md5 → non-negative 60-bit long
    * (identical to conv(substring(md5(c),1,15),16,10)).
    */
  /** JVM-side hex60 of a string — for plan-BUILD-time literal
    * derivation (deterministic sign matrices, salts): the same
    * function the compiled kernels and the oracle's
    * `('0x' || substr(md5(s), 1, 15))::BIGINT` apply at runtime.
    */
  def hex60String(s: String): Long = hex60(s.getBytes("UTF-8"))

  private def hex60(bytes: Array[Byte]): Long = {
    val d = md5Local.get()
    d.reset()
    val h = d.digest(bytes)
    // 15 hex chars = 7.5 bytes: 7 full bytes + high nibble of byte 8
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (h(i) & 0xffL); i += 1 }
    (v << 4) | ((h(7) & 0xf0L) >> 4)
  }

  private def tokenize(text: UTF8String): Array[String] =
    text.toString.split(" ", -1)

  // ---- text kernels (static entry points for StaticInvoke) ----------

  def minhashSig(text: UTF8String, numHashes: Int, shingleWords: Int): ArrayData = {
    val toks = tokenize(text)
    val nShingles = math.max(toks.length - shingleWords + 1, 1)
    // distinct shingle hashes, v = hex60(shingle) mod P
    val seen = new java.util.HashSet[String](nShingles * 2)
    val vs = new Array[Long](nShingles)
    var nv = 0
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + shingleWords, toks.length)
      val sh = toks.slice(i, end).mkString(" ")
      if (seen.add(sh)) {
        vs(nv) = java.lang.Long.remainderUnsigned(hex60(sh.getBytes("UTF-8")), P)
        nv += 1
      }
      i += 1
    }
    val sig = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      val a = (h * 2654435761L) % P + 1L
      val b = (h * 40503L + 12345L) % P
      var m = Long.MaxValue
      var j = 0
      while (j < nv) {
        val x = (a * vs(j) + b) % P
        if (x < m) m = x
        j += 1
      }
      sig(h) = m
      h += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct n-word shingles in first-occurrence order (identical to
    * TextKernels.wordShingles incl. the single truncated shingle for
    * short docs).
    */
  /** All k-token window digests of a token array, one element per
    * window start (starts run 0..size-k): element i is the 16-byte md5
    * of tokens [i, i+k) joined by ' ' — byte-identical to
    * `unhex(md5(array_join(slice(toks, i+1, k), ' ')))` with none of
    * the per-window slice/join/hex-string/unhex allocations that
    * Catalyst form pays (the span-dedup family computes one digest
    * per token position over the whole corpus, so this is its inner
    * loop). Arrays shorter than k yield an empty result — short docs
    * have no windows.
    */
  def windowMd5s(toks: ArrayData, k: Int): ArrayData = {
    val n = toks.numElements() - k + 1
    if (n <= 0) return new GenericArrayData(Array.empty[AnyRef])
    val d = md5Local.get()
    val out = new Array[AnyRef](n)
    var i = 0
    while (i < n) {
      d.reset()
      var j = 0
      while (j < k) {
        if (j > 0) d.update(' '.toByte)
        d.update(toks.getUTF8String(i + j).getBytes)
        j += 1
      }
      out(i) = d.digest()
      i += 1
    }
    new GenericArrayData(out)
  }

  def wordShingles(text: UTF8String, shingleWords: Int): ArrayData = {
    val toks = tokenize(text)
    val nShingles = math.max(toks.length - shingleWords + 1, 1)
    val seen = new java.util.LinkedHashSet[String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + shingleWords, toks.length)
      seen.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct 60-bit hashes of the n-word shingles (full hex60, no
    * modulus): the inverted-index key for jaccard — 8-byte longs
    * shuffle ~3× lighter than shingle strings, and the oracle applies
    * the identical hash so collision behavior (negligible at 2^60)
    * matches exactly.
    */
  def shingleHashes60(text: UTF8String, shingleWords: Int): ArrayData = {
    val toks = tokenize(text)
    val nShingles = math.max(toks.length - shingleWords + 1, 1)
    val seen = new java.util.LinkedHashSet[String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + shingleWords, toks.length)
      seen.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = hex60(it.next().getBytes("UTF-8")); j += 1 }
    new GenericArrayData(out)
  }

  /** WINNOWING selection core (the MOSS algorithm; see Dedup.winnow
    * for the guarantee): positional hex60 hashes of the `shingleWords`
    * -gram stream, each sliding `window` of hashes selects its min
    * (ties → RIGHTMOST), distinct (pos, fp) out in selection order.
    * A compiled single pass — the HOF-expression form recomputed the
    * O(m) hash array per lambda element (Catalyst inlines the alias
    * into the non-codegen lambda tree), turning O(m·w) into O(m²·w).
    * Consecutive-run dedup is exact: a sliding-window argmin re-selects
    * a position only in consecutive windows, so selections form runs.
    *
    * Returns array<struct<pos:long, fp:long>> (1-based pos); empty for
    * docs shorter than one shingle (explode drops them — same rows as
    * the former `size(toks) >= shingleWords` filter).
    */
  def winnowSelect(text: UTF8String, shingleWords: Int, window: Int): ArrayData = {
    val toks = tokenize(text)
    val nH = toks.length - shingleWords + 1
    if (nH < 1) return new GenericArrayData(new Array[AnyRef](0))
    val hs = new Array[Long](nH)
    var i = 0
    while (i < nH) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < shingleWords) { sb.append(' ').append(toks(i + k)); k += 1 }
      hs(i) = hex60(sb.toString.getBytes("UTF-8"))
      i += 1
    }
    val nOut = math.max(nH - window + 1, 1)
    val out = new java.util.ArrayList[AnyRef](nOut)
    var lastP = -1
    var j = 0
    while (j < nOut) {
      val end = math.min(j + window, nH)
      // min by (fp asc, pos desc): >= takes the rightmost tie
      var bestP = j
      var p = j + 1
      while (p < end) {
        if (hs(p) <= hs(bestP)) bestP = p
        p += 1
      }
      if (bestP != lastP) {
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any]((bestP + 1).toLong, hs(bestP))))
        lastP = bestP
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Distinct winnowed fingerprint hashes (the set [[winnowSelect]]
    * selects, positions dropped) — the thinned inverted-index key set
    * for Dedup.winnowOverlapPairs.
    */
  def winnowFps(text: UTF8String, shingleWords: Int, window: Int): ArrayData = {
    val sel = winnowSelect(text, shingleWords, window)
    val n = sel.numElements()
    val seen = new java.util.LinkedHashSet[java.lang.Long](n * 2)
    var i = 0
    while (i < n) {
      seen.add(sel.getStruct(i, 2).getLong(1))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Content-defined chunking over the TOKEN stream: a boundary falls
    * after token p (p ≥ gramTokens) whenever the hex60 hash of the
    * `gramTokens`-gram ending at p is ≡ 0 (mod mask) — boundaries
    * depend only on local content, so an insertion re-chunks O(1)
    * chunks instead of shifting every downstream chunk the way
    * fixed-stride chunking does (the storage-dedup property). Expected
    * chunk length ≈ `mask` tokens; docs shorter than one gram are a
    * single chunk. One compiled pass per document.
    *
    * Returns array<struct<start:long, ntok:long, h:long>> in order —
    * start is the 1-based token index, h the hex60 of the
    * space-joined chunk tokens.
    */
  def cdcChunks(text: UTF8String, gramTokens: Int, mask: Int): ArrayData = {
    val toks = tokenize(text)
    val m = toks.length
    val out = new java.util.ArrayList[AnyRef](m / math.max(mask, 1) + 1)
    var start = 1 // 1-based token index of the current chunk's first token
    var p = gramTokens
    while (p <= m) {
      val sb = new java.lang.StringBuilder(toks(p - gramTokens))
      var k = p - gramTokens + 1
      while (k < p) { sb.append(' ').append(toks(k)); k += 1 }
      if (java.lang.Long.remainderUnsigned(
          hex60(sb.toString.getBytes("UTF-8")), mask) == 0L) {
        out.add(chunkRow(toks, start, p))
        start = p + 1
      }
      p += 1
    }
    if (start <= m) out.add(chunkRow(toks, start, m))
    new GenericArrayData(out.toArray)
  }

  private def chunkRow(toks: Array[String], start: Int, end: Int): AnyRef = {
    val sb = new java.lang.StringBuilder(toks(start - 1))
    var k = start
    while (k < end) { sb.append(' ').append(toks(k)); k += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](start.toLong, (end - start + 1).toLong,
        hex60(sb.toString.getBytes("UTF-8"))))
  }

  def simhash60(text: UTF8String): Long = {
    val toks = tokenize(text)
    val sums = new Array[Int](60)
    var i = 0
    while (i < toks.length) {
      val h = hex60(toks(i).getBytes("UTF-8"))
      var b = 0
      while (b < 60) {
        sums(b) += (((h >> b) & 1L) * 2L - 1L).toInt
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (sums(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def fingerprint(text: UTF8String): Long = {
    val toks = tokenize(text)
    var acc = 0L
    var i = 0
    while (i < toks.length) {
      acc = (acc * 1000003L + hex60(toks(i).getBytes("UTF-8")) % FP) % FP
      i += 1
    }
    acc
  }

  /** UTF-8 binary order (the UTF8String / DuckDB default collation);
    * a null `b` counts as +infinity so any gram beats "none yet".
    */
  private def utf8Less(a: String, b: String): Boolean = {
    if (b == null) return true
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    val lim = math.min(x.length, y.length)
    var i = 0
    while (i < lim) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Code-point length — what Spark `length()` and DuckDB `length()`
    * count (NOT UTF-16 units).
    */
  private def charLen(s: String): Long = s.codePointCount(0, s.length).toLong

  /** Gopher repetition statistics for every requested n-gram size in
    * ONE compiled pass over the document — per n (skipping n > #tokens):
    * (n, n_slots, n_distinct, top_gram, top_occ, top_chars, dup_chars)
    * where top = max count, ties to the UTF-8-binary-smallest gram
    * (the `min(struct(-c, gram))` total order), `top_chars` =
    * occurrences × code-point length, and `dup_chars` sums
    * `c × length(gram)` over grams with c ≥ 2.
    *
    * The whole computation is per-document, so it runs map-side with
    * ZERO shuffle — replacing a (doc, n, gram)-keyed exchange whose
    * payload was every distinct gram STRING. State is one HashMap per
    * (doc, n), bounded by the doc's own token count.
    */
  def repetitionStats(text: UTF8String, ns: ArrayData): ArrayData = {
    val toks = tokenize(text)
    val m = toks.length
    val out = new java.util.ArrayList[AnyRef](ns.numElements())
    var q = 0
    while (q < ns.numElements()) {
      val n = ns.getInt(q)
      if (m >= n) {
        val slots = m - n + 1
        val counts = new java.util.HashMap[String, Int](slots * 2)
        var i = 0
        while (i < slots) {
          val sb = new java.lang.StringBuilder(toks(i))
          var k = i + 1
          while (k < i + n) { sb.append(' ').append(toks(k)); k += 1 }
          counts.merge(sb.toString, 1, Integer.sum)
          i += 1
        }
        var topGram: String = null
        var topOcc = 0
        var dupChars = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue.intValue()
          if (c >= 2) dupChars += c.toLong * charLen(e.getKey)
          if (c > topOcc || (c == topOcc && utf8Less(e.getKey, topGram))) {
            topOcc = c
            topGram = e.getKey
          }
        }
        out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](n.toLong, slots.toLong, counts.size.toLong,
            UTF8String.fromString(topGram), topOcc.toLong,
            topOcc.toLong * charLen(topGram), dupChars)))
      }
      q += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Both hybrid-retrieval signal feature sets of a document in ONE
    * tokenize pass: the distinct `shingleWords`-gram 60-bit hashes
    * (exactly [[shingleHashes60]]'s set, g non-null / w null) followed
    * by the distinct tokens (exactly array_distinct(split)'s set,
    * g null / w non-null). One row per feature; exactly one of (g, w)
    * is set, so a (coalesce(g,−1), coalesce(w,'')) pair is a collision-
    * free equi-join key across kinds (hex60 is non-negative, tokens of
    * a space-split are never compared against the empty sentinel from
    * the other kind). Replaces two separate kernel scans of the corpus
    * (shingles + tokens) with one.
    */
  def hybridFeatures(text: UTF8String, shingleWords: Int): ArrayData = {
    val toks = tokenize(text)
    val nShingles = math.max(toks.length - shingleWords + 1, 1)
    val sh = new java.util.LinkedHashSet[String](nShingles * 2)
    var i = 0
    while (i < nShingles) {
      val end = math.min(i + shingleWords, toks.length)
      sh.add(toks.slice(i, end).mkString(" "))
      i += 1
    }
    val tw = new java.util.LinkedHashSet[String](toks.length * 2)
    i = 0
    while (i < toks.length) { tw.add(toks(i)); i += 1 }
    val out = new Array[AnyRef](sh.size + tw.size)
    var j = 0
    val it = sh.iterator()
    while (it.hasNext) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](hex60(it.next().getBytes("UTF-8")), null))
      j += 1
    }
    val it2 = tw.iterator()
    while (it2.hasNext) {
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, UTF8String.fromString(it2.next())))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Intersection size of two SORTED-ascending distinct long arrays —
    * one two-pointer pass per pair, zero allocation. The
    * `size(array_intersect(a, b))` form this replaces builds a hash
    * set of one side and MATERIALIZES the intersection array per
    * candidate pair just to take its length — pairs outnumber
    * documents in every verify stage, so the per-pair constant is the
    * corpus-scale hot loop. Callers sort each side once per DOCUMENT
    * (array_sort at the feature build); the two-pointer pass then
    * counts equal elements — identical to array_intersect's distinct
    * semantics because the inputs are distinct sets.
    */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (y < x) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }

  // ---- pair-expansion kernels ---------------------------------------

  /** All i<j pairs of a bucket's ids, ordered pairs of the ascending id
    * sort — compiled replacement for the interpreted
    * transform-of-transforms expansion (the output array is the same
    * O(n²/2) size either way; bucket caps bound n upstream).
    */
  def sortedPairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    // n*(n-1)/2 in Int wraps at n = 65536 — a silent too-small
    // allocation, not an error. Buckets this size mean a missing
    // upstream cap (CappedCollect / maxBucket), so reject loudly.
    require(n <= 65535,
      s"pair expansion of a $n-element bucket overflows (cap the bucket upstream)")
    val a = ids.toLongArray()
    java.util.Arrays.sort(a)
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a(i), a(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** i<j pairs of an ALREADY-ORDERED string array (input order is the
    * pair order, so the caller's sort_array defines the a<b convention
    * on both engines). Replaces the interpreted
    * `flatten(transform(.., slice ..))` HOF — that shape re-slices the
    * array per element (O(n²) copies) and evaluates outside codegen;
    * this is one compiled pass allocating exactly the output.
    */
  def stringPairs(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    require(n <= 65535,
      s"pair expansion of a $n-element set overflows (cap the set upstream)")
    val a = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      // The declared element schema is non-nullable, but the function
      // is SQL-registered (graft_string_pairs) so arbitrary input can
      // still carry nulls — reject with a message instead of NPE-ing
      // the task on the clone below.
      require(!toks.isNullAt(i),
        s"graft_string_pairs: null element at index $i (elements must be non-null)")
      // clone: the source ArrayData's backing buffer is reused across
      // rows by the scan; pairs outlive it inside explode/aggregate
      a(i) = toks.getUTF8String(i).clone()
      i += 1
    }
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](a(i), a(j)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Top-M character n-grams of a document by (count desc, gram asc in
    * UTF-8 binary order) with dense ranks 1..M — the per-document side
    * of the Cavnar–Trenkle language-ID distance, computed map-side in
    * ONE compiled pass (per-doc HashMap bounded by the doc's own gram
    * count) instead of exploding every gram into a (doc, gram)-keyed
    * exchange plus a per-doc rank window. Grams slide over CODE
    * POINTS, matching SQL `substring` semantics on both engines.
    *
    * Output: array of (gram, drank) structs, empty when the text holds
    * fewer than n code points.
    */
  /** Per-document character n-gram COUNTS — the pre-reduced form of
    * the profile build's gram explode: one (gram, count) row per
    * DISTINCT gram of the document instead of one row per character
    * position. The corpus-wide (lang, gram) aggregation then sums the
    * per-doc counts, shrinking the explode stream by the document's
    * average gram multiplicity while computing the identical totals.
    * Gram extraction slides over CODE POINTS, exactly like
    * [[topCharGrams]] and SQL `substring` (LangIdSpec pins parity with
    * the charGrams explode). Empty for texts under n code points.
    */
  def charGramCounts(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cp = s.codePointCount(0, s.length)
    if (cp < n) return new GenericArrayData(Array.empty[AnyRef])
    val off = new Array[Int](cp + 1)
    var i = 0
    var u = 0
    while (i < cp) { off(i) = u; u = s.offsetByCodePoints(u, 1); i += 1 }
    off(cp) = u
    val slots = cp - n + 1
    val counts = new java.util.HashMap[String, java.lang.Long](
      math.min(slots * 2L, 1L << 20).toInt)
    i = 0
    while (i < slots) {
      counts.merge(s.substring(off(i), off(i + n)), 1L,
        (a: java.lang.Long, b: java.lang.Long) => a + b)
      i += 1
    }
    val out = new Array[AnyRef](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) {
      val e = it.next()
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(e.getKey), e.getValue.longValue()))
      i += 1
    }
    new GenericArrayData(out)
  }

  def topCharGrams(text: UTF8String, n: Int, topM: Int): ArrayData = {
    val s = text.toString
    val cp = s.codePointCount(0, s.length)
    if (cp < n) return new GenericArrayData(Array.empty[AnyRef])
    // code-point → UTF-16 offset table, one forward walk
    val off = new Array[Int](cp + 1)
    var i = 0
    var u = 0
    while (i < cp) { off(i) = u; u = s.offsetByCodePoints(u, 1); i += 1 }
    off(cp) = u
    val slots = cp - n + 1
    // capacity clamped: slots ≈ document length, and `slots * 2` on a
    // ~1 GiB document overflows Int and HashMap's constructor throws;
    // the map grows on demand past the clamp anyway
    val counts = new java.util.HashMap[String, Int](math.min(slots * 2L, 1L << 20).toInt)
    i = 0
    while (i < slots) {
      counts.merge(s.substring(off(i), off(i + n)), 1, Integer.sum)
      i += 1
    }
    val entries = new Array[(String, Int)](counts.size)
    val it = counts.entrySet().iterator()
    i = 0
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    java.util.Arrays.sort(entries, new java.util.Comparator[(String, Int)] {
      def compare(a: (String, Int), b: (String, Int)): Int =
        if (a._2 != b._2) Integer.compare(b._2, a._2)
        else if (a._1 == b._1) 0
        else if (utf8Less(a._1, b._1)) -1 else 1
    })
    val m = math.min(topM, entries.length)
    val out = new Array[AnyRef](m)
    i = 0
    while (i < m) {
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](UTF8String.fromString(entries(i)._1), (i + 1).toLong))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Byte-class histogram of a binary payload: counts per bucket
    * `(byte & 0xff)·buckets / 256` — the content-sniffing fingerprint
    * a media pipeline uses to sanity-check payloads before decode
    * (text vs binary vs compressed have very different byte-class
    * shapes). One compiled pass, primitive-backed output.
    */
  def byteHistogram(bytes: Array[Byte], buckets: Int): ArrayData = {
    require(buckets >= 1 && buckets <= 256, s"bad bucket count: $buckets")
    val out = new Array[Long](buckets)
    var i = 0
    while (i < bytes.length) {
      out((bytes(i) & 0xff) * buckets / 256) += 1
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** [[sortedPairs]] with the pair PACKED into one long
    * (`a << 32 | b`, requiring 0 ≤ id < 2³²) — for dense co-occurrence
    * counting the downstream `groupBy(pair).count` then hashes and
    * shuffles ONE long key instead of a two-field struct, roughly
    * halving exchange width on the quadratic pair stream (the only
    * corpus-squared object in those plans). Unpack after the count
    * with `key >> 32` / `key & 0xffffffff`.
    */
  def sortedPairKeys(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    require(n <= 65535,
      s"pair expansion of a $n-element bucket overflows (cap the bucket upstream)")
    val a = ids.toLongArray()
    java.util.Arrays.sort(a)
    require(n == 0 || (a(0) >= 0 && a(n - 1) < (1L << 32)),
      "sortedPairKeys packs (a << 32 | b): ids must be in [0, 2^32)")
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = (a(i) << 32) | a(j)
        k += 1
        j += 1
      }
      i += 1
    }
    // primitive-backed array data — no per-element boxing on the one
    // quadratic stream these plans materialize
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Pair expansion carrying a per-id payload (jaccard set sizes):
    * `ids` and `ns` are the aligned collect_list outputs of one
    * groupBy; pairs are emitted in ascending-id order as flattened
    * (a, na, b, nb) structs. Ids within a bucket are distinct (one
    * entry per doc), so sorting by id alone is total.
    */
  def sortedPairsWithSizes(ids: ArrayData, ns: ArrayData): ArrayData = {
    val n = ids.numElements()
    require(n <= 65535,
      s"pair expansion of a $n-element bucket overflows (cap the bucket upstream)")
    val id = ids.toLongArray()
    val sz = ns.toIntArray()
    // indirect sort by id, carrying the payload
    val idx = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(id(x), id(y)))
    val out = new Array[AnyRef](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val pi = idx(i)
      var j = i + 1
      while (j < n) {
        val pj = idx(j)
        out(k) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](id(pi), sz(pi), id(pj), sz(pj)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Hamming-filtered i<j pairs of a bucket: ids with their 64-bit
    * hashes, emitting ONLY pairs within `maxHamming` popcount(xor) —
    * the verify step fused into the expansion, so a bucket never
    * materializes its full quadratic pair set, just the survivors.
    * Ascending-id order, same contract as [[sortedPairs]].
    */
  def hammingPairs(ids: ArrayData, hs: ArrayData, maxHamming: Int): ArrayData = {
    val n = ids.numElements()
    require(n <= 65535,
      s"pair expansion of a $n-element bucket overflows (cap the bucket upstream)")
    val id = ids.toLongArray()
    val h = hs.toLongArray()
    val idx = (0 until n).toArray.map(Integer.valueOf)
    java.util.Arrays.sort(idx, (x: Integer, y: Integer) =>
      java.lang.Long.compare(id(x), id(y)))
    val out = new java.util.ArrayList[AnyRef]()
    var i = 0
    while (i < n) {
      val pi = idx(i)
      var j = i + 1
      while (j < n) {
        val pj = idx(j)
        val d = java.lang.Long.bitCount(h(pi) ^ h(pj))
        if (d <= maxHamming)
          out.add(new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            Array[Any](id(pi), id(pj), d.toLong)))
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Morton (Z-order) bit interleave of k pre-normalized codes: bit b
    * of value j lands at position b·k + j, so sorting by the result
    * clusters rows that are close in EVERY dimension — the multi-
    * column data-skipping layout (Z-ordering; public technique, cf.
    * Morton '66). Codes must already fit `bitsPer` bits.
    */
  def interleaveBits(vals: ArrayData, bitsPer: Int): Long = {
    val k = vals.numElements()
    var z = 0L
    var j = 0
    while (j < k) {
      val v = vals.getLong(j)
      var b = 0
      while (b < bitsPer) {
        z |= ((v >>> b) & 1L) << (b * k + j)
        b += 1
      }
      j += 1
    }
    z
  }

  // ---- vector kernel ------------------------------------------------

  /** L2-normalize a double array (null for zero-norm inputs): after
    * normalization cosine reduces to a plain dot product, the standard
    * ANN preprocessing step.
    */
  def l2normalize(a: ArrayData): ArrayData = {
    val n = a.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); ss += x * x; i += 1 }
    if (ss <= 0) return null
    val norm = math.sqrt(ss)
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = a.getDouble(i) / norm; i += 1 }
    new GenericArrayData(out)
  }

  /** Null-safe cosine over two double arrays: left-fold sums in array
    * order (same accumulation order as the zip_with/aggregate form),
    * null when either norm is zero or lengths differ.
    */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val sa = math.sqrt(na)
    val sb = math.sqrt(nb)
    if (sa > 0 && sb > 0) dot / (sa * sb) else null
  }

  // ---- media kernels (deterministic codec stand-ins) ----------------

  /** Deterministic feature extraction from a binary payload: fold bytes
    * into `dim` buckets (per-bucket rolling hash mod 1000003) scaled to
    * [0, 1) — the stand-in for a real media decoder (no codecs in this
    * environment). The StaticInvoke shape keeps extraction inside
    * WholeStageCodegen with the payload column prunable — exactly what
    * a JVM-side codec call would want too; only a JNI/ONNX boundary
    * that needs batched handoff justifies falling back to
    * mapPartitions.
    */
  def mediaFeatures(payload: Array[Byte], dim: Int): ArrayData = {
    require(dim > 0, s"feature dim must be positive, got $dim")
    val acc = new Array[Long](dim)
    var i = 0
    while (i < payload.length) {
      val d = i % dim
      acc(d) = (acc(d) * 31 + (payload(i) & 0xff)) % 1000003L
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat / 1000003.0f; j += 1 }
    new GenericArrayData(out)
  }

  /** 60-bit gradient perceptual hash of a byte payload — the 1-D
    * analogue of image dHash (difference hash; public algorithm):
    * partition the payload into 61 equal cells (integer boundaries
    * `⌊i·len/61⌋`), and set bit i when cell i+1's mean exceeds cell
    * i's — compared as the exact integer cross-multiplication
    * `s₁·w₀ > s₀·w₁`, so no float enters and the oracle replays the
    * identical arithmetic. Near-identical payloads (the decoder stub
    * is deterministic) differ in few bits; bucket on 15-bit bands for
    * candidate pairs, exactly like simhash. 60 bits keeps every
    * intermediate positive in signed 64-bit math on both engines.
    */
  def dhash60(payload: Array[Byte]): Long = {
    val len = payload.length
    val cells = 61
    val s = new Array[Long](cells)
    val w = new Array[Long](cells)
    var i = 0
    while (i < cells) {
      val lo = (i.toLong * len / cells).toInt
      val hi = ((i + 1).toLong * len / cells).toInt
      var acc = 0L
      var p = lo
      while (p < hi) { acc += payload(p) & 0xff; p += 1 }
      s(i) = acc
      w(i) = (hi - lo).toLong
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 60) {
      if (s(b + 1) * w(b) > s(b) * w(b + 1)) h |= 1L << b
      b += 1
    }
    h
  }

  /** Average-pool windows of `factor` payload bytes with integer floor
    * means — the deterministic resample stand-in behind
    * Multimodal.resize. ceil(len/factor) windows; empty payloads give
    * an empty array.
    */
  def poolBytes(payload: Array[Byte], factor: Int): ArrayData = {
    require(factor > 0, s"pooling factor must be positive, got $factor")
    val n = (payload.length + factor - 1) / factor
    val out = new Array[Long](n)
    var w = 0
    while (w < n) {
      val start = w * factor
      val end = math.min(start + factor, payload.length)
      // Long accumulator: an Int sum wraps once factor × 255 passes
      // Int.MaxValue (~8.4M-byte windows) — silent garbage, not an error
      var s = 0L
      var i = start
      while (i < end) { s += payload(i) & 0xff; i += 1 }
      out(w) = s / (end - start)
      w += 1
    }
    new GenericArrayData(out)
  }

  // ---- Column wrappers ----------------------------------------------

  // ---- phrase blocklist automaton (token-level Aho–Corasick) --------

  /** Token-level Aho–Corasick automaton over a phrase list: one pass
    * over a document's tokens finds EVERY occurrence of every phrase
    * (overlaps included, multiple phrases ending on the same token
    * included) in O(tokens + matches) — independent of the list size,
    * where the compositional window-join form costs
    * O(windows × list). Built once per DISTINCT phrase list and
    * cached process-wide (the list arrives as a literal, so every
    * task on the executor reuses one automaton). Duplicate list
    * entries collapse, matching the compositional form's
    * array-membership semantics.
    */
  private final class PhraseAutomaton(phraseArr: Array[Array[String]]) {
    private val phrases = phraseArr.map(_.toSeq).distinct.map(_.toArray)
    val nPhrases: Int = phrases.length
    // original list position -> distinct phrase id (duplicates collapse
    // in the trie; per-ORIGINAL-index reports re-expand through this)
    private val origIds: Array[Int] = {
      val idx = phrases.zipWithIndex.map { case (p, i) => (p.toSeq, i) }.toMap
      phraseArr.map(p => idx(p.toSeq))
    }
    private val children =
      scala.collection.mutable.ArrayBuffer(newNode())
    private val ownEnds =
      scala.collection.mutable.ArrayBuffer[List[Int]](Nil)
    private def newNode() = new java.util.HashMap[String, Integer]()
    // trie
    phrases.zipWithIndex.foreach { case (p, id) =>
      var node = 0
      p.foreach { tok =>
        val c = children(node).get(tok)
        node = if (c != null) c.intValue()
        else {
          children += newNode()
          ownEnds += Nil
          children(node).put(tok, children.size - 1)
          children.size - 1
        }
      }
      ownEnds(node) = id :: ownEnds(node)
    }
    // BFS failure links; outputs(v) = own phrase-endings + fail chain's
    private val fail = new Array[Int](children.size)
    private val outputs = new Array[Array[Int]](children.size)
    outputs(0) = ownEnds(0).toArray
    locally {
      val queue = new java.util.ArrayDeque[Integer]()
      children(0).forEach { (_, v) =>
        fail(v) = 0
        outputs(v) = (ownEnds(v) ++ outputs(0)).toArray
        queue.add(v): Unit
      }
      while (!queue.isEmpty) {
        val u = queue.poll().intValue()
        children(u).forEach { (tok, v) =>
          fail(v) = step(fail(u), tok)
          outputs(v) = (ownEnds(v) ++ outputs(fail(v)).toList).toArray
          queue.add(v): Unit
        }
      }
    }
    private def step(start: Int, tok: String): Int = {
      var n = start
      while (true) {
        val c = children(n).get(tok)
        if (c != null) return c.intValue()
        if (n == 0) return 0
        n = fail(n)
      }
      0
    }
    /** Per-phrase occurrence counts in ORIGINAL list order (overlaps
      * counted, duplicates in the list report their shared count) —
      * one pass, same match semantics as [[scan]].
      */
    def scanPer(toks: Array[String]): Array[Long] = {
      val per = new Array[Long](nPhrases)
      var node = 0
      var i = 0
      while (i < toks.length) {
        node = step(node, toks(i))
        val out = outputs(node)
        var j = 0
        while (j < out.length) { per(out(j)) += 1L; j += 1 }
        i += 1
      }
      origIds.map(per)
    }
    /** (total occurrences, distinct phrases present) in one pass. */
    def scan(toks: Array[String]): (Long, Long) = {
      var node = 0
      var total = 0L
      var distinct = 0L
      val seen = new Array[Boolean](nPhrases)
      var i = 0
      while (i < toks.length) {
        node = step(node, toks(i))
        val out = outputs(node)
        total += out.length
        var j = 0
        while (j < out.length) {
          val id = out(j)
          if (!seen(id)) { seen(id) = true; distinct += 1L }
          j += 1
        }
        i += 1
      }
      (total, distinct)
    }
  }

  private val phraseAutomata =
    new java.util.concurrent.ConcurrentHashMap[String, PhraseAutomaton]()

  /** [total_hits, phrases_hit] of the '\n'-packed phrase list in
    * `text` — bit-identical to [[graft.ops.TextClean.phraseHits]]'s
    * compositional window-membership form (PipelineSpec pins the
    * parity), so the DuckDB n-gram oracle verifies this kernel too.
    */
  def phraseScan(text: UTF8String, packed: UTF8String): ArrayData = {
    val a = phraseAutomata.computeIfAbsent(packed.toString,
      p => new PhraseAutomaton(p.split("\n", -1).map(_.split(" ", -1))))
    val (total, distinct) = a.scan(tokenize(text))
    new GenericArrayData(Array(total, distinct))
  }

  /** Per-phrase occurrence counts of the '\n'-packed list in `text`,
    * in ORIGINAL list order — the [[phraseScan]] automaton reporting a
    * count per entry instead of two totals, so per-phrase rollups
    * ([[graft.ops.TextClean.phraseCounts]]) run the compiled
    * O(tokens + matches) pass instead of materializing and
    * membership-testing every token window.
    */
  def phraseScanPer(text: UTF8String, packed: UTF8String): ArrayData = {
    val a = phraseAutomata.computeIfAbsent(packed.toString,
      p => new PhraseAutomaton(p.split("\n", -1).map(_.split(" ", -1))))
    new GenericArrayData(a.scanPer(tokenize(text)))
  }

  /** Viterbi segmentation for the unigram-LM tokenizer trainer
    * ([[graft.ops.NgramLm.unigramTrain]]): DP over codepoint positions
    * choosing, among segmentations of `word` built from the supplied
    * candidate pieces, the one with (1) fewest pieces, then
    * (2) greatest total piece count, then (3) lexicographically least
    * piece sequence (binary UTF-8 order — both engines' default
    * collation). Integer-exact throughout: no log-probabilities, so
    * the winner is the same on any engine (the quantized-LM
    * discipline), and the DuckDB oracle replays the identical DP as
    * unrolled per-position CTEs.
    *
    * `packed(k)` = 1-based codepoint start × 8 + piece length (≤ 7);
    * `cnts(k)` = that piece's current count. Edges are the word's OWN
    * candidate substrings (≤ len × maxPiece of them), so the kernel is
    * O(len × maxPiece) per word with no global state — pure map-side.
    * Throws if some prefix is uncoverable: the trainer keeps every
    * single character in the vocabulary precisely so this cannot
    * happen.
    */
  def unigramDp(word: UTF8String, packed: ArrayData, cnts: ArrayData): ArrayData = {
    val s = word.toString
    // codepoint index -> UTF-16 offset: substring parity with both
    // engines' CHARACTER-based substring on non-BMP input
    val L = s.codePointCount(0, s.length)
    val off = new Array[Int](L + 1)
    var ci = 0
    var ui = 0
    while (ci < L) { off(ci) = ui; ui = s.offsetByCodePoints(ui, 1); ci += 1 }
    off(L) = s.length
    val nE = packed.numElements()
    // bucket candidate edges by END position (intrusive linked lists)
    val headByEnd = Array.fill(L + 1)(-1)
    val nextEdge = new Array[Int](nE)
    var k = 0
    while (k < nE) {
      val p = packed.getLong(k)
      val start = (p >> 3).toInt
      val plen = (p & 7L).toInt
      val end = start + plen - 1
      if (start >= 1 && plen >= 1 && end <= L) {
        nextEdge(k) = headByEnd(end); headByEnd(end) = k
      } else nextEdge(k) = -2 // out-of-range candidate: unreachable
      k += 1
    }
    val bestNp = Array.fill(L + 1)(Int.MaxValue)
    val bestSc = new Array[Long](L + 1)
    val bestPath = new Array[Array[UTF8String]](L + 1)
    bestNp(0) = 0
    bestPath(0) = Array.empty
    var i = 1
    while (i <= L) {
      var e = headByEnd(i)
      while (e >= 0) {
        val p = packed.getLong(e)
        val start = (p >> 3).toInt
        val plen = (p & 7L).toInt
        val j = start - 1
        if (bestNp(j) != Int.MaxValue) {
          val np = bestNp(j) + 1
          val sc = bestSc(j) + cnts.getLong(e)
          var piece: UTF8String = null
          var take = np < bestNp(i) || (np == bestNp(i) && sc > bestSc(i))
          if (!take && np == bestNp(i) && sc == bestSc(i)) {
            // exact tie on (pieces, count): whole-path lexicographic
            // tie-break, element-wise binary UTF-8 (paths same length)
            piece = UTF8String.fromString(s.substring(off(j), off(j + plen)))
            val inc = bestPath(i)
            var t = 0
            var cmp = 0
            while (cmp == 0 && t < np) {
              val c = if (t < np - 1) bestPath(j)(t) else piece
              cmp = c.compareTo(inc(t)); t += 1
            }
            take = cmp < 0
          }
          if (take) {
            if (piece == null)
              piece = UTF8String.fromString(s.substring(off(j), off(j + plen)))
            bestNp(i) = np
            bestSc(i) = sc
            bestPath(i) = bestPath(j) :+ piece
          }
        }
        e = nextEdge(e)
      }
      if (bestNp(i) == Int.MaxValue)
        throw new IllegalStateException(
          s"unigramDp: no candidate piece covers position $i of '$s' — " +
            "the trainer must keep every single character in the vocabulary")
      i += 1
    }
    new GenericArrayData(bestPath(L).asInstanceOf[Array[Any]])
  }

  private def expr(c: Column) = exprBridge.expression(c)

  /** [total_hits, phrases_hit] of a phrase list — one compiled
    * Aho–Corasick pass, O(tokens + matches) whatever the list size.
    */
  def phraseScanOf(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "empty blocklist")
    require(phrases.forall(p => p.trim.nonEmpty && !p.contains("\n")),
      "phrases must be non-blank and newline-free")
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "phraseScan",
      Seq(expr(text),
        expr(org.apache.spark.sql.functions.lit(phrases.mkString("\n")))),
      Seq(StringType, StringType)))
  }

  /** Per-phrase occurrence counts in original list order — one
    * compiled Aho–Corasick pass (see [[phraseScanPer]]).
    */
  def phraseScanPerOf(text: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "empty blocklist")
    require(phrases.forall(p => p.trim.nonEmpty && !p.contains("\n")),
      "phrases must be non-blank and newline-free")
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false),
      "phraseScanPer",
      Seq(expr(text),
        expr(org.apache.spark.sql.functions.lit(phrases.mkString("\n")))),
      Seq(StringType, StringType)))
  }

  /** Unigram-LM Viterbi segmentation of a word from its candidate
    * piece edges (see [[unigramDp]]).
    */
  def unigramDpOf(w: Column, packed: Column, cnts: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(StringType, containsNull = false),
      "unigramDp",
      Seq(expr(w), expr(packed), expr(cnts)),
      Seq(StringType, ArrayType(LongType), ArrayType(LongType))))

  /** MinHash signature straight from text — compiled single pass. */
  def minhashSigOf(text: Column, numHashes: Int, shingleWords: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "minhashSig",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(numHashes)),
        expr(org.apache.spark.sql.functions.lit(shingleWords))),
      Seq(StringType, IntegerType, IntegerType)))

  /** Per-doc character n-gram counts straight from text (see
    * [[charGramCounts]]).
    */
  def charGramCountsOf(text: Column, n: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("gram", StringType, nullable = false),
        StructField("c", LongType, nullable = false))), containsNull = false),
      "charGramCounts",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(n))),
      Seq(StringType, IntegerType)))

  /** Fused hybrid-retrieval feature rows straight from text (see
    * [[hybridFeatures]]).
    */
  def hybridFeaturesOf(text: Column, shingleWords: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("g", LongType, nullable = true),
        StructField("w", StringType, nullable = true))), containsNull = false),
      "hybridFeatures",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(shingleWords))),
      Seq(StringType, IntegerType)))

  /** Two-pointer intersection count of sorted distinct long arrays
    * (see [[sortedIntersectCount]]).
    */
  def sortedIntersectCountOf(a: Column, b: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, LongType, "sortedIntersectCount",
      Seq(expr(a), expr(b)),
      Seq(ArrayType(LongType), ArrayType(LongType))))

  def shingleHashes60Of(text: Column, shingleWords: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "shingleHashes60",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(shingleWords))),
      Seq(StringType, IntegerType)))

  def wordShinglesOf(text: Column, shingleWords: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(StringType, containsNull = false), "wordShingles",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(shingleWords))),
      Seq(StringType, IntegerType)))

  def windowMd5sOf(toks: Column, k: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(BinaryType, containsNull = false), "windowMd5s",
      Seq(expr(toks), expr(org.apache.spark.sql.functions.lit(k))),
      Seq(ArrayType(StringType), IntegerType)))

  /** Winnowed (pos, fp) selections straight from text — compiled
    * single pass (see [[winnowSelect]]).
    */
  def winnowSelectOf(text: Column, shingleWords: Int, window: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("pos", LongType, nullable = false),
        StructField("fp", LongType, nullable = false))), containsNull = false),
      "winnowSelect",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(shingleWords)),
        expr(org.apache.spark.sql.functions.lit(window))),
      Seq(StringType, IntegerType, IntegerType)))

  /** Content-defined chunk spans straight from text (see [[cdcChunks]]). */
  def cdcChunksOf(text: Column, gramTokens: Int, mask: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("start", LongType, nullable = false),
        StructField("ntok", LongType, nullable = false),
        StructField("h", LongType, nullable = false))), containsNull = false),
      "cdcChunks",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(gramTokens)),
        expr(org.apache.spark.sql.functions.lit(mask))),
      Seq(StringType, IntegerType, IntegerType)))

  /** Distinct winnowed fingerprint hashes straight from text. */
  def winnowFpsOf(text: Column, shingleWords: Int, window: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "winnowFps",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(shingleWords)),
        expr(org.apache.spark.sql.functions.lit(window))),
      Seq(StringType, IntegerType, IntegerType)))

  /** Top-M ranked character n-grams straight from text (see
    * [[topCharGrams]]).
    */
  def topCharGramsOf(text: Column, n: Int, topM: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("gram", StringType, nullable = false),
        StructField("drank", LongType, nullable = false))),
        containsNull = false),
      "topCharGrams",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(n)),
        expr(org.apache.spark.sql.functions.lit(topM))),
      Seq(StringType, IntegerType, IntegerType)))

  /** Per-n repetition statistics straight from text (see
    * [[repetitionStats]]); one struct per requested n ≤ #tokens.
    */
  def repetitionStatsOf(text: Column, ns: Seq[Int]): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("n", LongType, nullable = false),
        StructField("n_slots", LongType, nullable = false),
        StructField("n_distinct", LongType, nullable = false),
        StructField("top_gram", StringType, nullable = false),
        StructField("top_occ", LongType, nullable = false),
        StructField("top_chars", LongType, nullable = false),
        StructField("dup_chars", LongType, nullable = false))),
        containsNull = false),
      "repetitionStats",
      Seq(expr(text), expr(org.apache.spark.sql.functions.lit(ns.toArray))),
      Seq(StringType, ArrayType(IntegerType))))

  def simhash60Of(text: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, LongType, "simhash60", Seq(expr(text)), Seq(StringType)))

  def fingerprintOf(text: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, LongType, "fingerprint", Seq(expr(text)), Seq(StringType)))

  /** i<j pairs packed `a << 32 | b` (ids must fit 32 bits). */
  def sortedPairKeysOf(ids: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false),
      "sortedPairKeys", Seq(expr(ids)), Seq(ArrayType(LongType))))

  /** i<j string pairs in input (caller-sorted) order. */
  def stringPairsOf(toks: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("a", StringType, nullable = false),
        StructField("b", StringType, nullable = false))), containsNull = false),
      "stringPairs", Seq(expr(toks)), Seq(ArrayType(StringType))))

  /** i<j id pairs of a bucket, ascending-id order. */
  def sortedPairsOf(ids: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))), containsNull = false),
      "sortedPairs", Seq(expr(ids)), Seq(ArrayType(LongType))))

  /** i<j id pairs with aligned per-id set sizes, ascending-id order. */
  def sortedPairsWithSizesOf(ids: Column, ns: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("na", IntegerType, nullable = false),
        StructField("b", LongType, nullable = false),
        StructField("nb", IntegerType, nullable = false))), containsNull = false),
      "sortedPairsWithSizes", Seq(expr(ids), expr(ns)),
      Seq(ArrayType(LongType), ArrayType(IntegerType))))

  /** L2-normalized copy of a vector; null for zero-norm inputs. */
  def l2normalizeOf(a: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(DoubleType, containsNull = false), "l2normalize",
      Seq(expr(a.cast("array<double>"))), Seq(ArrayType(DoubleType)),
      returnNullable = true))

  /** Media feature vector straight from a binary payload column. */
  /** Byte-class histogram (buckets longs) of a binary payload column. */
  def byteHistogramOf(payload: Column, buckets: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "byteHistogram",
      Seq(expr(payload), expr(org.apache.spark.sql.functions.lit(buckets))),
      Seq(BinaryType, IntegerType)))

  def mediaFeaturesOf(payload: Column, dim: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(FloatType, containsNull = false), "mediaFeatures",
      Seq(expr(payload), expr(org.apache.spark.sql.functions.lit(dim))),
      Seq(BinaryType, IntegerType)))

  /** 60-bit gradient perceptual hash of a binary payload column. */
  def dhash60Of(payload: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, LongType, "dhash60", Seq(expr(payload)), Seq(BinaryType)))

  /** Morton interleave of pre-normalized long codes. */
  def interleaveBitsOf(vals: Column, bitsPer: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, LongType, "interleaveBits",
      Seq(expr(vals), expr(org.apache.spark.sql.functions.lit(bitsPer))),
      Seq(ArrayType(LongType), IntegerType)))

  /** Hamming-filtered ascending-id i<j pairs from aligned (ids, hashes)
    * arrays: structs (a, b, hamming ≤ maxHamming).
    */
  def hammingPairsOf(ids: Column, hs: Column, maxHamming: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass,
      ArrayType(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false),
        StructField("hamming", LongType, nullable = false))),
        containsNull = false),
      "hammingPairs",
      Seq(expr(ids), expr(hs),
        expr(org.apache.spark.sql.functions.lit(maxHamming))),
      Seq(ArrayType(LongType), ArrayType(LongType), IntegerType)))

  /** Average-pooled (floor-mean) windows of a binary payload column. */
  def poolBytesOf(payload: Column, factor: Int): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, ArrayType(LongType, containsNull = false), "poolBytes",
      Seq(expr(payload), expr(org.apache.spark.sql.functions.lit(factor))),
      Seq(BinaryType, IntegerType)))

  /** Null-safe cosine; inputs cast to array<double> (exact widening)
    * so one kernel serves float and double embeddings.
    */
  def cosineOf(a: Column, b: Column): Column =
    exprBridge.column(StaticInvoke(
      Kernels.getClass, DoubleType, "cosine",
      Seq(expr(a.cast("array<double>")), expr(b.cast("array<double>")),
      ), Seq(ArrayType(DoubleType), ArrayType(DoubleType)),
      returnNullable = true))
}
