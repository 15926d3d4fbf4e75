package graft.queries

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.{Kernels, TextKernels}
import graft.ops.{Dedup, Multimodal, Retrieval, Similarity, TextClean}

/** [EXT] LLM-data-pipeline operator queries over the `documents` and
  * `embeddings` tables (SURVEY.md §7.1 step 6; north-star extension
  * beyond the reference surface): dedup (exact, MinHash+LSH, SimHash,
  * n-gram Jaccard, embedding-cosine), similarity search (brute-force
  * top-k, LSH buckets, IVF cells), text analysis (token stats,
  * language heuristic, quality score, fingerprint) and multimodal
  * column plumbing.
  *
  * Every query here has a DuckDB oracle that reimplements the operator
  * deterministically in SQL (list lambdas + md5); the feature-
  * extraction stub kernel's oracle replays the same byte fold over the
  * text's characters (valid because the corpus is ASCII — the Spark
  * side hashes UTF-8 payload bytes).
  *
  * Cross-engine determinism rules used throughout:
  *  - the only hash primitive is md5 (byte-identical everywhere);
  *    hex-to-int via the first 15 hex chars → non-negative 60-bit long;
  *  - array folds are left folds over storage order on both sides
  *    (Spark `aggregate` ↔ DuckDB `list_reduce` with a prepended init);
  *  - integer sums are exact; double math uses identical expression
  *    trees so IEEE results are bit-equal;
  *  - NULL (never NaN) for degenerate cosine inputs, with explicit
  *    NULLS LAST in oracle ORDER BY to match Spark's `desc`.
  */
object PipelinePack {

  // ---- shared DuckDB SQL fragments (oracle side) --------------------

  private val T = OracleSql.T
  private def sqlHex60(s: String): String = OracleSql.hex60(s)

  // ---- session-shared near-dup prework ------------------------------

  /** The (3-shingle, 4×4-band) candidate-pair set over the documents
    * corpus — the shared first step of the whole near-dup family
    * (q18/q32/q34/q103/q136), built once per session and pinned
    * ([[graft.ops.Dedup.minhashCandidatePairsCached]]).
    */
  private def docPairsCached(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    Dedup.minhashCandidatePairsCached(Tables.documents(s, dir),
      s"docs:$dir", "doc_id", "text",
      shingleWords = 3, bands = 4, rowsPerBand = 4)

  /** The (doc → keep_id) survivor assignment over [[docPairsCached]] —
    * the shared second step (q32/q34/q103 propagate; q136 star), one
    * fixpoint run per (session, algorithm).
    */
  private def docSurvivorsCached(s: org.apache.spark.sql.SparkSession,
      dir: String, algorithm: String = "propagate") =
    Dedup.nearDupSurvivorsCached(Tables.documents(s, dir),
      docPairsCached(s, dir), s"docs:$dir:3:4:4", "doc_id", algorithm)

  /** The exact 3-shingle pair-intersection core over the documents
    * corpus — shared by the exact-similarity reports (q19 Jaccard,
    * q118 containment), one inverted-index pass per session
    * ([[graft.ops.Dedup.pairIntersectionsCached]]).
    */
  private def docIntersectionsCached(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    Dedup.pairIntersectionsCached(Tables.documents(s, dir), s"docs:$dir",
      "doc_id", "text", shingleWords = 3, maxDf = 10000)

  /** DuckDB: distinct 3-word shingles over tokens (mirrors
    * TextKernels.wordShingles: short docs yield one truncated shingle).
    */
  private val sqlShingles: String =
    s"list_distinct(list_transform(range(1, greatest(len($T) - 2, 1) + 1), " +
      s"i -> array_to_string(($T)[i:i+2], ' ')))"

  private def sqlCos(a: String, b: String): String = OracleSql.cos(a, b)

  // ---- dedup family -------------------------------------------------

  /** Exact content dedup by 128-bit hash (Dedup.exact): uniform hash
    * keys → one skew-free shuffle at any scale.
    */
  private val q17 = QueryDef(
    "q17_dedup_exact",
    (s, dir) => Dedup.exact(Tables.documents(s, dir), "doc_id", "text"),
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
      count(*) AS n_copies
      FROM documents GROUP BY md5(text)"""))

  /** MinHash + LSH banding candidate pairs (Dedup.minhashCandidatePairs):
    * signatures map-side, shuffle only on (band_idx, band_key) — never
    * an all-pairs product.
    */
  private val q18 = QueryDef(
    "q18_lsh_candidates",
    (s, dir) => docPairsCached(s, dir),
    Some(s"""WITH sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      sz AS (SELECT b, bk, count(*) AS c FROM bands GROUP BY b, bk)
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id
      JOIN sz ON sz.b = x.b AND sz.bk = x.bk
      WHERE sz.c <= 10000"""))

  /** Exact n-gram Jaccard over candidate pairs sharing ≥1 shingle
    * (Dedup.jaccardPairs): inverted-index self-join on the shingle,
    * with shingles hotter than maxDf=10000 dropped on both sides.
    */
  private val q19 = QueryDef(
    "q19_jaccard_pairs",
    (s, dir) => Dedup.jaccardPairsFrom(
      docIntersectionsCached(s, dir), threshold = 0.2),
    Some(s"""WITH sh AS (SELECT doc_id,
        list_transform($sqlShingles, sg -> ${sqlHex60("sg")}) AS s FROM documents),
      inv0 AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
      sz AS (SELECT g, count(*) AS c FROM inv0 GROUP BY g),
      inv AS (SELECT inv0.* FROM inv0 JOIN sz USING (g) WHERE sz.c <= 10000)
      SELECT doc_a, doc_b, jaccard FROM (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
          count(*)::DOUBLE / (min(x.n) + min(y.n) - count(*)) AS jaccard
        FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      WHERE jaccard >= 0.2"""))

  /** 60-bit SimHash per document (Dedup.simhashes) — near-dup docs
    * differ in few bits; entirely map-side.
    */
  private val q20 = QueryDef(
    "q20_simhash",
    (s, dir) => Dedup.simhashes(Tables.documents(s, dir), "doc_id", "text"),
    Some {
      val hs = s"list_transform($T, t -> ${sqlHex60("t")})"
      val bits = (0 until 60).map { b =>
        s"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> $b) % 2) * 2 - 1)) > 0 " +
          s"THEN ${1L << b} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT doc_id, ($bits)::BIGINT AS simhash FROM (SELECT doc_id, $hs AS hs FROM documents)"
    })

  /** Embedding-cosine near-dup pairs via sign-bucket LSH
    * (Similarity.bucketNearDup): bucket map-side, exact cosine within
    * buckets only.
    */
  private val q21 = QueryDef(
    "q21_vec_neardup",
    (s, dir) => Similarity.bucketNearDup(
      Tables.embeddings(s, dir), "vec_id", "embedding", dims = 6),
    Some {
      val bk = "array_to_string(list_transform(embedding[1:6], " +
        "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
      s"""WITH b AS (SELECT vec_id, embedding, $bk AS bk FROM embeddings)
      SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
        ${sqlCos("x.embedding", "y.embedding")} AS cos
      FROM b x JOIN b y ON x.bk = y.bk AND x.vec_id < y.vec_id"""
    })

  /** End-to-end near-dup dedup: LSH candidate pairs → connected
    * components → keep-one survivor per cluster (Dedup.nearDupSurvivors;
    * singletons keep themselves). The oracle replays the same
    * reachability with a recursive CTE over the q18 pair set.
    */
  /** Oracle CTE chain shared by q32 and q103: LSH candidate pairs →
    * recursive reachability → survivor mapping `surv(doc_id, keep_id)`.
    */
  private val sqlSurvivorCtes: String =
    s"""sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      r AS (WITH RECURSIVE rr(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT rr.u, e.v FROM rr JOIN edges e ON rr.v = e.u)
        SELECT * FROM rr),
      surv AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS keep_id
        FROM documents d LEFT JOIN r ON r.u = d.doc_id
        GROUP BY d.doc_id)"""

  private val q32 = QueryDef(
    "q32_neardup_dedup",
    (s, dir) => docSurvivorsCached(s, dir),
    Some(s"WITH $sqlSurvivorCtes SELECT doc_id, keep_id FROM surv"))

  /** Dedup impact report — the per-source deliverable a curation run
    * publishes after near-dup dedup: how many documents and characters
    * each source loses, and what fraction survives. Composition of the
    * q32 survivor mapping with one aggregation over the documents
    * table; `surv` carries two longs per doc, so the join shuffles
    * nothing wider than the mapping itself, and all counts/sums are
    * exact integers (the ratio divides two agreed longs).
    */
  private val q103 = QueryDef(
    "q103_dedup_report",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val surv = docSurvivorsCached(s, dir)
      docs.join(surv, Seq("doc_id"))
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          count(when(col("doc_id") === col("keep_id"), lit(1))).as("n_kept"),
          count(when(col("doc_id") =!= col("keep_id"), lit(1))).as("n_removed"),
          sum(when(col("doc_id") =!= col("keep_id"), col("n_chars"))
            .otherwise(lit(0L))).as("chars_removed"))
        .withColumn("pct_removed",
          col("n_removed").cast("double") / col("n_docs").cast("double"))
    },
    Some(s"""WITH $sqlSurvivorCtes
      SELECT d.source, count(*) AS n_docs,
        count(CASE WHEN s.keep_id = d.doc_id THEN 1 END) AS n_kept,
        count(CASE WHEN s.keep_id <> d.doc_id THEN 1 END) AS n_removed,
        sum(CASE WHEN s.keep_id <> d.doc_id THEN d.n_chars ELSE 0 END)::BIGINT
          AS chars_removed,
        count(CASE WHEN s.keep_id <> d.doc_id THEN 1 END)::DOUBLE
          / count(*)::DOUBLE AS pct_removed
      FROM documents d JOIN surv s USING (doc_id)
      GROUP BY d.source"""))

  /** Near-dup cluster-size histogram over the STAR connected-
    * components path: how many clusters of each size the candidate
    * graph contains (size 1 = untouched docs) — the shape a curation
    * run reads to tell boilerplate blowups (few giant clusters) from
    * organic duplication (many pairs). Runs `nearDupSurvivors` with
    * `algorithm = "star"`, putting the O(log²)-round large-star/
    * small-star alternation under the same oracle as q32's
    * diameter-bound propagation — the two must agree exactly (the
    * survivor mapping is algorithm-invariant), so this row is the
    * cross-check that they do.
    */
  private val q136 = QueryDef(
    "q136_cluster_sizes",
    (s, dir) => {
      docSurvivorsCached(s, dir, algorithm = "star")
        .groupBy(col("keep_id")).agg(count(lit(1)).as("cluster_size"))
        .groupBy(col("cluster_size"))
        .agg(count(lit(1)).as("n_clusters"),
          (col("cluster_size") * count(lit(1))).as("n_docs"))
    },
    Some(s"""WITH $sqlSurvivorCtes,
      cs AS (SELECT keep_id, count(*) AS cluster_size FROM surv
        GROUP BY keep_id)
      SELECT cluster_size, count(*) AS n_clusters,
        (cluster_size * count(*))::BIGINT AS n_docs
      FROM cs GROUP BY cluster_size"""))

  /** Sorted-neighborhood (merge/purge) candidate pairs blocked on
    * document length (Dedup.sortedNeighborhoodPairs): every pair
    * within a window of 5 consecutive records in (n_chars, doc_id)
    * order — the orderable-surrogate blocking strategy complementing
    * LSH. Global ranks come from the distributed prefix sum + per-key
    * row_number (no single-partition sort); pairing is a bounded
    * adjacent-bucket equi-join, never a rank-range theta join.
    */
  private val q137 = QueryDef(
    "q137_sorted_neighborhood",
    (s, dir) => Dedup.sortedNeighborhoodPairs(
      Tables.documents(s, dir), "doc_id", "n_chars", window = 5),
    Some("""WITH r AS (SELECT doc_id,
          row_number() OVER (ORDER BY n_chars, doc_id) AS rk
        FROM documents WHERE n_chars IS NOT NULL)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        (b.rk - a.rk)::BIGINT AS dist
      FROM r a JOIN r b ON b.rk > a.rk AND b.rk - a.rk < 5"""))

  /** PPJoin-style prefix-filtered exact Jaccard join
    * (Dedup.prefixFilterPairs): each doc indexes only its
    * `n − ⌈t·n⌉ + 1` globally-RAREST shingles — candidate generation
    * is complete for J ≥ t yet the inverted index holds short posting
    * lists by construction (no hot-shingle cap needed), then exact
    * verification runs on candidate-touched docs only. The oracle
    * replays brute-force exact Jaccard (complete at oracle scale);
    * both sides filter by the integer cross-multiplication
    * `10·inter ≥ 3·union` — no float threshold edge.
    */
  private val q139 = QueryDef(
    "q139_prefix_join",
    (s, dir) => Dedup.prefixFilterPairs(
      Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, thresholdNum = 1, thresholdDen = 2),
    Some(s"""WITH sh AS (SELECT doc_id,
        list_transform($sqlShingles, sg -> ${sqlHex60("sg")}) AS s FROM documents),
      inv AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh)
      SELECT doc_a, doc_b,
        inter::DOUBLE / (na + nb - inter)::DOUBLE AS jaccard FROM (
        SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
          min(x.n) AS na, min(y.n) AS nb, count(*) AS inter
        FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      WHERE inter * 2 >= (na + nb - inter)"""))

  /** Exact token heavy hitters via Misra–Gries prune + rescan
    * (HeavyHitters.exact): pass 1 reduces every partition to a
    * 512-counter summary (exchange size independent of vocabulary),
    * pass 2 counts only candidate-matching tokens with the candidate
    * set broadcast — never a full-vocabulary shuffle. Output is exact
    * counts under the integer threshold `200·cnt > n`, so the
    * partition-order-dependent summary internals cannot leak into the
    * result; the oracle replays the brute-force exact aggregation.
    */
  private val q140 = QueryDef(
    "q140_heavy_hitters",
    (s, dir) => graft.ops.HeavyHitters.exact(
      Tables.documents(s, dir)
        .select(explode(TextKernels.tokens(col("text"))).as("tok")),
      "tok", thresholdNum = 1, thresholdDen = 200, k = 512),
    Some("""WITH t AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      tot AS (SELECT count(*) AS n FROM t),
      cnts AS (SELECT tok, count(*) AS cnt FROM t GROUP BY tok)
      SELECT tok, cnt, cnt::DOUBLE / n::DOUBLE AS share
      FROM cnts, tot WHERE cnt * 200 > n"""))

  /** Perceptual-hash near-dup over ingested media payloads
    * (Multimodal.phashNearDup): 60-bit gradient dHash per payload
    * (map-side compiled kernel), 4×15-bit band bucketing, exact
    * Hamming verify FUSED into the compiled pair expansion — one
    * bounded shuffle, no join back to payloads. The oracle replays the
    * identical integer cell math over the ASCII corpus's bytes and the
    * same band-agree ∧ hamming≤14 semantics.
    */
  private val q141 = QueryDef(
    "q141_phash_neardup",
    (s, dir) => Multimodal.phashNearDup(
      Multimodal.ingest(Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id", maxHamming = 14),
    Some("""WITH c AS (SELECT doc_id, list_transform(range(0, 61), i ->
        [coalesce(list_sum(list_transform(
            range((i * strlen(text)) // 61 + 1, (((i+1) * strlen(text)) // 61) + 1),
            p -> ord(substr(text, p, 1)))), 0),
         ((i+1) * strlen(text)) // 61 - (i * strlen(text)) // 61]) AS cells
        FROM documents),
      ph AS (SELECT doc_id, list_sum(list_transform(range(0, 60), b ->
          CASE WHEN cells[b+2][1] * cells[b+1][2] > cells[b+1][1] * cells[b+2][2]
            THEN (1::BIGINT << b) ELSE 0 END))::BIGINT AS phash FROM c),
      bb AS (SELECT doc_id, phash, bi, (phash // (2**(bi*15))::BIGINT) & 32767 AS bk
        FROM (SELECT doc_id, phash, unnest([0,1,2,3]) AS bi FROM ph)),
      cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b,
          x.phash AS pa, y.phash AS pb
        FROM bb x JOIN bb y ON x.bi = y.bi AND x.bk = y.bk
          AND x.doc_id < y.doc_id)
      SELECT doc_a, doc_b, bit_count(xor(pa, pb))::BIGINT AS hamming
      FROM cand WHERE bit_count(xor(pa, pb)) <= 14"""))

  /** Rarity-weighted record-linkage scoring
    * (RecordLinkage.scorePairs): source-blocked candidate pairs scored
    * by Fellegi–Sunter-style value-specific agreement weights
    * `⌊2²⁰·N/freq(v)⌋` — integer-exact, no log; agreeing on a RARE
    * (lang, length-band) combination outscores agreeing on modal
    * values. Frequencies join row-side before pairing, so the pair
    * stage is two id-keyed hash joins; blocks are CappedCollect-
    * bounded. The high threshold keeps only strong-evidence pairs.
    */
  private val q143 = QueryDef(
    "q143_record_linkage",
    (s, dir) => graft.ops.RecordLinkage.scorePairs(
      Tables.documents(s, dir).withColumn("len_band", expr("n_chars div 50")),
      "doc_id", "source", Seq("lang", "len_band"), minScore = 20971520L,
      cacheKey = Some(s"q143:$dir")),
    Some("""WITH r AS (SELECT doc_id AS id, source AS blk, lang AS f1,
        (n_chars // 50)::VARCHAR AS f2 FROM documents),
      tot AS (SELECT count(*) AS N FROM r),
      fr1 AS (SELECT f1, count(*) AS c1 FROM r WHERE f1 IS NOT NULL GROUP BY f1),
      fr2 AS (SELECT f2, count(*) AS c2 FROM r WHERE f2 IS NOT NULL GROUP BY f2),
      w AS (SELECT r.id, r.blk, r.f1, r.f2,
          (1048576 * tot.N) // fr1.c1 AS w1, (1048576 * tot.N) // fr2.c2 AS w2
        FROM r CROSS JOIN tot
        LEFT JOIN fr1 ON r.f1 = fr1.f1 LEFT JOIN fr2 ON r.f2 = fr2.f2)
      SELECT id_a, id_b, n_agree, score FROM (
        SELECT x.id AS id_a, y.id AS id_b,
          (CASE WHEN x.f1 IS NOT NULL AND x.f1 = y.f1 THEN 1 ELSE 0 END)::BIGINT +
          (CASE WHEN x.f2 IS NOT NULL AND x.f2 = y.f2 THEN 1 ELSE 0 END) AS n_agree,
          (CASE WHEN x.f1 IS NOT NULL AND x.f1 = y.f1 THEN x.w1 ELSE 0 END)::BIGINT +
          (CASE WHEN x.f2 IS NOT NULL AND x.f2 = y.f2 THEN x.w2 ELSE 0 END) AS score
        FROM w x JOIN w y ON x.blk = y.blk AND x.id < y.id)
      WHERE score >= 20971520"""))

  /** Hybrid retrieval via reciprocal-rank fusion
    * (Retrieval.rrfHybrid): shingle-intersection and rarity-weighted
    * token-overlap rankings fused as `⌊2²⁰/(60+rank)⌋` sums — exact
    * integers end to end. Ranks are distributed (Sweep prefix over the
    * signal value domain + per-value row_number, the q137/q72
    * pattern), never a corpus-wide single-partition window; the oracle
    * replays with plain window ranks (tiny at oracle scale).
    */
  private val q144 = QueryDef(
    "q144_hybrid_retrieval",
    (s, dir) => graft.ops.Retrieval.rrfHybrid(
      Tables.documents(s, dir), "doc_id", "text", queryId = 0L, k = 20),
    Some(s"""WITH sh AS (SELECT doc_id,
        list_transform($sqlShingles, sg -> ${sqlHex60("sg")}) AS s FROM documents),
      inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      qsh AS (SELECT g FROM inv WHERE doc_id = 0),
      sigA AS (SELECT doc_id, count(*) AS inter FROM inv JOIN qsh USING (g)
        WHERE doc_id <> 0 GROUP BY doc_id),
      tok AS (SELECT doc_id, unnest(list_distinct($T)) AS w FROM documents),
      fr AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
      qtok AS (SELECT w FROM tok WHERE doc_id = 0),
      sigB AS (SELECT doc_id, sum(1048576 // c)::BIGINT AS rare FROM tok
        JOIN qtok USING (w) JOIN fr USING (w) WHERE doc_id <> 0 GROUP BY doc_id),
      ra AS (SELECT doc_id, row_number() OVER (ORDER BY inter DESC, doc_id) AS r
        FROM sigA),
      rb AS (SELECT doc_id, row_number() OVER (ORDER BY rare DESC, doc_id) AS r
        FROM sigB)
      SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id,
        coalesce((1048576 // (60 + ra.r)), 0)
          + coalesce((1048576 // (60 + rb.r)), 0) AS score
      FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id
      ORDER BY score DESC, doc_id LIMIT 20"""))

  // ---- similarity search --------------------------------------------

  /** Exact brute-force cosine top-k (Similarity.topK): broadcast query
    * vector, one scan, TakeOrderedAndProject — the ANN baseline.
    */
  private val q22 = QueryDef(
    "q22_ann_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val query = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Similarity.topK(e, "vec_id", "embedding", query, k = 10)
        .select(col("vec_id"), col("label"), col("cos"))
    },
    Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
      SELECT vec_id, label, ${sqlCos("embedding", "qvec")} AS cos
      FROM embeddings CROSS JOIN q
      ORDER BY cos DESC NULLS LAST, vec_id ASC LIMIT 10"""))

  /** Batch kNN (Similarity.batchTopK): 8 query vectors broadcast,
    * scored in ONE corpus pass, reduced per query by the TopKHeap
    * bounded-heap partial aggregate — the exchange carries ≤ k rows
    * per (query × partition), never the full scored product the
    * window-rank plan would shuffle. The oracle replays with a plain
    * window rank (tiny at oracle scale; same (cos DESC, id ASC)
    * total order).
    */
  private val q83 = QueryDef(
    "q83_batch_knn",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      Similarity.batchTopK(e, "vec_id", "embedding", queries, k = 5)
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 8),
      sc AS (SELECT q.query_id, e.vec_id,
          ${sqlCos("e.embedding", "q.qvec")} AS cos
        FROM embeddings e CROSS JOIN q),
      rk AS (SELECT query_id, vec_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rank
        FROM sc WHERE cos IS NOT NULL)
      SELECT query_id, rank::BIGINT AS rank, vec_id, cos
      FROM rk WHERE rank <= 5"""))

  /** IVF top-k (Similarity.ivfTopK): nearest-centroid assignment fully
    * map-side (centroid literal array, no shuffle), probe 2 cells.
    * Centroids here are the first 8 vectors — deterministic, so the
    * oracle can reproduce the assignment exactly.
    */
  private val q23 = QueryDef(
    "q23_ivf_topk",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      val query = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
      Similarity.ivfTopK(e, "vec_id", "embedding", cents, query, k = 10, nProbe = 2)
        .select(col("vec_id"), col("label"), col("cos"))
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
      asg AS (SELECT vec_id, embedding, label, cell_id FROM (
        SELECT e.vec_id, e.embedding, e.label, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      probe AS (SELECT cell_id FROM (
        SELECT c.cell_id, ${sqlCos("q.qvec", "c.cvec")} AS ccos FROM cents c CROSS JOIN q)
        ORDER BY ccos DESC NULLS LAST, cell_id ASC LIMIT 2)
      SELECT vec_id, label, ${sqlCos("embedding", "qvec")} AS cos
      FROM asg JOIN probe USING (cell_id) CROSS JOIN q
      ORDER BY cos DESC NULLS LAST, vec_id ASC LIMIT 10"""))

  /** ANN recall audit — recall@k of the IVF operating point against
    * the exact kNN baseline, per query (the vector-search analogue of
    * q98's LSH τ-threshold audit: the number that says whether
    * nProbe/centroid choices are safe before committing a corpus-scale
    * retrieval run). Exact side = one bounded-heap corpus pass
    * (Similarity.batchTopK); approx side = map-side cell assignment +
    * broadcast probe join (Similarity.ivfBatchTopK); recall then
    * divides two exactly-agreed counts over k × |queries| rows. At
    * 100 TB the audit runs on a SAMPLED query set — its cost is two
    * corpus passes, independent of the query-set size.
    */
  private val q101 = QueryDef(
    "q101_ann_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      val queries = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("query_id"), col("embedding").as("qvec"))
      val exact = Similarity.batchTopK(e, "vec_id", "embedding", queries, k = 10)
      val approx = Similarity.ivfBatchTopK(e, "vec_id", "embedding",
        cents, queries, k = 10, nProbe = 2)
      Similarity.recallAtK(exact, approx, "vec_id")
    },
    Some(s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
        FROM embeddings WHERE vec_id < 8),
      cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      sc AS (SELECT q.query_id, e.vec_id,
          ${sqlCos("e.embedding", "q.qvec")} AS cos
        FROM embeddings e CROSS JOIN q),
      exact AS (SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rk
        FROM sc WHERE cos IS NOT NULL) WHERE rk <= 10),
      asg AS (SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      probe AS (SELECT query_id, cell_id FROM (
        SELECT q.query_id, c.cell_id,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY ${sqlCos("q.qvec", "c.cvec")} DESC NULLS LAST, c.cell_id ASC) AS rk
        FROM q CROSS JOIN cents c) WHERE rk <= 2),
      sca AS (SELECT p.query_id, a.vec_id,
          ${sqlCos("e.embedding", "qq.qvec")} AS cos
        FROM asg a JOIN probe p USING (cell_id)
        JOIN embeddings e ON e.vec_id = a.vec_id
        JOIN q qq ON qq.query_id = p.query_id),
      approx AS (SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id, row_number() OVER (PARTITION BY query_id
          ORDER BY cos DESC, vec_id ASC) AS rk
        FROM sca WHERE cos IS NOT NULL) WHERE rk <= 10)
      SELECT x.query_id, count(*) AS n_exact, count(a.vec_id) AS n_hit,
        count(a.vec_id)::DOUBLE / count(*)::DOUBLE AS recall
      FROM exact x LEFT JOIN approx a
        ON x.query_id = a.query_id AND x.vec_id = a.vec_id
      GROUP BY x.query_id"""))

  /** Embedding cluster-cohesion report — per label: the exact-mean
    * centroid and how tightly members hug it (mean and worst cosine to
    * their own centroid), the embedding-space quality metric a
    * curation run reads next to the q101 recall audit. Determinism
    * discipline: centroid dimensions are exact quantized means (the
    * q49 floor-to-long rule), and the per-label cosine MEAN sums
    * floor-quantized longs — never a float sum whose value depends on
    * partition order — dividing once at the end, so both engines
    * divide identical integers. Shape: one per-dim aggregation + a
    * |labels|-row broadcast back + one final aggregation; the
    * centroid build never leaves the plan.
    */
  private val q105 = QueryDef(
    "q105_cohesion",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val perDim = e.select(col("label"),
          posexplode(col("embedding").cast("array<double>")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(floor(col("v") * 1000000L).cast("long")).as("sq"))
        .withColumn("mean", (col("sq").cast("double") / 1000000L) / col("n"))
      val cents = perDim.groupBy(col("label"))
        .agg(expr(
          "transform(array_sort(collect_list(struct(dim, mean))), x -> x.mean)")
          .as("cvec"))
      e.join(broadcast(cents), Seq("label"))
        .withColumn("cos", Kernels.cosineOf(col("embedding"), col("cvec")))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"), count(col("cos")).as("n_scored"),
          sum(floor(col("cos") * 1000000L).cast("long")).as("sq"),
          min(col("cos")).as("min_cos"))
        .select(col("label"), col("n_vecs"), col("n_scored"),
          ((col("sq").cast("double") / 1000000L) / col("n_scored")).as("mean_cos"),
          col("min_cos"))
    },
    Some(s"""WITH pd AS (SELECT label,
          unnest(range(0, len(embedding))) AS dim,
          unnest(list_transform(embedding, x -> x::DOUBLE)) AS v
        FROM embeddings),
      cm AS (SELECT label, dim,
          (sum(floor(v * 1000000)::BIGINT)::DOUBLE / 1000000) / count(*) AS mean
        FROM pd GROUP BY label, dim),
      cents AS (SELECT label, list(mean ORDER BY dim) AS cvec
        FROM cm GROUP BY label),
      sc AS (SELECT e.label, ${sqlCos("e.embedding", "c.cvec")} AS cos
        FROM embeddings e JOIN cents c USING (label))
      SELECT label, count(*) AS n_vecs, count(cos) AS n_scored,
        (sum(floor(cos * 1000000)::BIGINT)::DOUBLE / 1000000) / count(cos)
          AS mean_cos,
        min(cos) AS min_cos
      FROM sc GROUP BY label"""))

  /** Semantic dedup (Similarity.clusterRepresentatives): map-side
    * nearest-centroid assignment (literal fold, no shuffle), then one
    * partial-aggregated max(struct) per cell keeps the member closest
    * to its own centroid. Centroids = the first 8 vectors, so the
    * oracle reproduces the assignment exactly (the q23 contract).
    */
  private val q69 = QueryDef(
    "q69_semantic_dedup",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      Similarity.clusterRepresentatives(e, "vec_id", "embedding", cents)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      asg AS (SELECT vec_id, cell_id, ccos FROM (
        SELECT e.vec_id, c.cell_id,
          coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) AS ccos,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      rep AS (SELECT cell_id, vec_id, ccos,
          row_number() OVER (PARTITION BY cell_id
            ORDER BY ccos DESC, vec_id ASC) AS rk,
          count(*) OVER (PARTITION BY cell_id) AS n_members
        FROM asg)
      SELECT cell_id, vec_id,
        CASE WHEN ccos = '-infinity'::DOUBLE THEN NULL ELSE ccos END AS cos,
        n_members
      FROM rep WHERE rk = 1"""))

  // ---- text analysis ------------------------------------------------

  private val Stops = Seq("the", "a", "of", "to", "and", "in", "is", "on", "for", "with")

  /** Token stats + quality score + n-gram-heuristic language ID —
    * all map-side codegen'd builtins.
    */
  private val q24 = QueryDef(
    "q24_text_stats",
    (s, dir) => {
      val toks = TextKernels.tokens(col("text"))
      val stopRatio = TextKernels.stopwordRatio(toks, Stops)
      val mbRatio = TextKernels.multibyteRatio(toks)
      Tables.documents(s, dir).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        // single-space-joined corpus: token chars = chars - separators
        ((length(col("text")) - (size(toks) - 1)).cast("double") / size(toks))
          .as("avg_token_len"),
        stopRatio.as("stop_ratio"),
        mbRatio.as("mb_ratio"),
        (least(lit(1.0), size(toks).cast("double") / lit(100.0)) * (lit(1.0) - mbRatio))
          .as("quality_score"),
        when(mbRatio > 0.3, lit("zh"))
          .when(stopRatio >= 0.08, lit("en"))
          .otherwise(lit("other")).as("lang_guess"))
    },
    Some {
      val stopsList = Stops.map(w => s"'$w'").mkString("[", ", ", "]")
      val stopR = s"(len(list_filter($T, t -> list_contains($stopsList, t)))::DOUBLE / len($T))"
      val mbR = s"(len(list_filter($T, t -> strlen(t) > length(t)))::DOUBLE / len($T))"
      s"""SELECT doc_id,
        len($T)::BIGINT AS n_tokens,
        (length(text) - (len($T) - 1))::DOUBLE / len($T) AS avg_token_len,
        $stopR AS stop_ratio,
        $mbR AS mb_ratio,
        least(1.0, len($T)::DOUBLE / 100.0) * (1.0 - $mbR) AS quality_score,
        CASE WHEN $mbR > 0.3 THEN 'zh'
             WHEN $stopR >= 0.08 THEN 'en'
             ELSE 'other' END AS lang_guess
      FROM documents"""
    })

  /** Rolling polynomial fingerprint over the token stream
    * (Dedup.fingerprints) — a genuine left fold, mirrored by DuckDB
    * list_reduce with a prepended zero init.
    */
  private val q25 = QueryDef(
    "q25_fingerprint",
    (s, dir) => Dedup.fingerprints(Tables.documents(s, dir), "doc_id", "text"),
    Some(s"""SELECT doc_id,
      list_reduce(list_prepend(0::BIGINT,
        list_transform($T, t -> ${sqlHex60("t")} % 1000000007)),
        (acc, x) -> (acc * 1000003 + x) % 1000000007) AS fingerprint
      FROM documents"""))

  // ---- multimodal ----------------------------------------------------

  /** Multimodal ingest metadata (Multimodal.ingest): payload travels as
    * opaque binary; typed metadata (length, sha256) extracted map-side.
    */
  private val q26 = QueryDef(
    "q26_multimodal_meta",
    (s, dir) => Multimodal.ingest(Tables.documents(s, dir), "doc_id", "text", "text/plain")
      .select(
        col("doc_id"),
        col("meta.media_type").as("media_type"),
        col("meta.byte_len").as("byte_len"),
        col("meta.sha256").as("sha256")),
    Some("""SELECT doc_id, 'text/plain' AS media_type,
      strlen(text)::BIGINT AS byte_len, sha256(text) AS sha256
      FROM documents"""))

  /** Partition-wise feature extraction over binary payloads
    * (Multimodal.extractFeatures — deterministic stand-in decoder).
    * The oracle replays the same per-byte fold over characters, valid
    * because the corpus is ASCII (1 char = 1 UTF-8 byte); the Spark
    * side operates on real payload bytes. Output is exploded to
    * (doc_id, dim, value) rows — the q49 pattern — because array-typed
    * result columns are un-sortable/un-hashable for the driver's
    * checker; float→double widening is exact on both engines.
    */
  private val q27 = QueryDef(
    "q27_multimodal_features",
    (s, dir) => Multimodal.extractFeatures(
      Multimodal.ingest(Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id")
      .select(col("doc_id"), posexplode(col("features")).as(Seq("dim", "value")))
      .select(col("doc_id"), col("dim").cast("long").as("dim"),
        col("value").cast("double").as("value")),
    Some {
      val dims = (0 until Multimodal.FeatureDim).map { d =>
        s"(list_reduce(list_prepend(0::BIGINT, " +
          s"list_transform(list_filter(range(1, strlen(text) + 1), i -> (i - 1) % 8 = $d), " +
          s"i -> ord(substr(text, i, 1)))), " +
          s"(acc, x) -> (acc * 31 + x) % 1000003)::FLOAT / 1000003.0::FLOAT)::FLOAT"
      }.mkString(", ")
      s"""SELECT doc_id,
        unnest(range(0, ${Multimodal.FeatureDim})) AS dim,
        unnest(list_transform([$dims], x -> x::DOUBLE)) AS value
      FROM documents"""
    })

  /** Frame sampling (Multimodal.frames): payload → fixed-size byte
    * frames, one row each, verified via per-frame length + md5. The
    * oracle slices the TEXT (the corpus is ASCII, 1 char = 1 byte);
    * the Spark side slices the actual binary payload.
    */
  private val q33 = QueryDef(
    "q33_frame_sample",
    (s, dir) => Multimodal.frames(
      Multimodal.ingest(Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id", frameBytes = 64)
      .select(
        col("doc_id"), col("frame_idx").cast("long").as("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_md5")),
    Some("""SELECT doc_id,
      unnest(range(0, greatest((strlen(text) + 63) // 64, 1))) AS frame_idx,
      unnest(list_transform(range(0, greatest((strlen(text) + 63) // 64, 1)),
        i -> strlen(substring(text, i * 64 + 1, 64))))::BIGINT AS frame_len,
      unnest(list_transform(range(0, greatest((strlen(text) + 63) // 64, 1)),
        i -> md5(substring(text, i * 64 + 1, 64)))) AS frame_md5
      FROM documents"""))

  /** The full curation pipeline as one composed query: near-dup
    * keep-one (LSH → connected components) ∘ quality gate ∘ token
    * stats — what a training-data run executes per corpus shard.
    * Demonstrates that the operator layer composes without
    * materialization between stages.
    */
  private val q34 = QueryDef(
    "q34_curation",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val survivors = docSurvivorsCached(s, dir)
        .filter(col("keep_id") === col("doc_id")).select(col("doc_id"))
      val toks = TextKernels.tokens(col("text"))
      val mbRatio = TextKernels.multibyteRatio(toks)
      val quality = least(lit(1.0), size(toks).cast("double") / lit(100.0)) * (lit(1.0) - mbRatio)
      docs.join(survivors, Seq("doc_id"))
        .select(col("doc_id"), size(toks).cast("long").as("n_tokens"),
          quality.as("quality_score"))
        .filter(col("quality_score") >= 0.2)
    },
    Some {
      val mbR = s"(len(list_filter($T, t -> strlen(t) > length(t)))::DOUBLE / len($T))"
      val quality = s"least(1.0, len($T)::DOUBLE / 100.0) * (1.0 - $mbR)"
      s"""WITH sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id),
      edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION SELECT doc_b, doc_a FROM pairs),
      r AS (WITH RECURSIVE rr(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT rr.u, e.v FROM rr JOIN edges e ON rr.v = e.u)
        SELECT * FROM rr),
      surv AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.v), d.doc_id)) AS keep_id
        FROM documents d LEFT JOIN r ON r.u = d.doc_id GROUP BY d.doc_id)
      SELECT d.doc_id, len($T)::BIGINT AS n_tokens, $quality AS quality_score
      FROM documents d JOIN surv s ON d.doc_id = s.doc_id
      WHERE s.keep_id = d.doc_id AND $quality >= 0.2"""
    })

  /** [EXT] Banded range join (RangeJoin.pointInInterval): orders
    * priced into overlapping per-nation price bands — a hash equi-join
    * on the band + residual filter, never a nested-loop product. The
    * oracle is the plain inequality join.
    */
  private val q37 = QueryDef(
    "q37_range_join",
    (s, dir) => {
      val intervals = Tables.nation(s, dir).select(
        col("n_name"),
        (col("n_nationkey") * 20000.0).as("lo"),
        (col("n_nationkey") * 20000.0 + 60000.0).as("hi"))
      val joined = graft.ops.RangeJoin.pointInInterval(
        Tables.orders(s, dir), intervals, "o_totalprice", "lo", "hi",
        bandWidth = 25000.0)
      joined.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
    },
    Some("""SELECT n_name, count(*) AS n_orders,
      CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders JOIN (
        SELECT n_name, n_nationkey * 20000.0 AS lo,
               n_nationkey * 20000.0 + 60000.0 AS hi FROM nation) i
      ON o_totalprice >= lo AND o_totalprice < hi
      GROUP BY n_name"""))

  /** [EXT] Deterministic hash split (train/test assignment): the split
    * decision is a pure function of the id through the SAME hex60 the
    * oracle computes — reproducible across engines, runs, and
    * partitionings, unlike randomSplit.
    */
  private val q38 = QueryDef(
    "q38_hash_split",
    (s, dir) => {
      val bucket = pmod(TextKernels.hex60(col("doc_id").cast("string")), lit(100L))
      Tables.documents(s, dir)
        .withColumn("split", when(bucket < 80, lit("train")).otherwise(lit("test")))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
    },
    Some(s"""SELECT CASE WHEN ${sqlHex60("doc_id::VARCHAR")} % 100 < 80
        THEN 'train' ELSE 'test' END AS split,
      count(*) AS n_docs, sum(n_chars)::BIGINT AS total_chars
      FROM documents GROUP BY 1"""))

  /** Payload resize via average pooling (Multimodal.resize — the
    * deterministic resample stand-in). The oracle pools ords over the
    * text (ASCII ⇒ chars are the payload bytes) with the same integer
    * floor mean. The pooled array is verified through an md5 digest of
    * its comma-joined values (the q33 pattern) because array-typed
    * result columns are un-sortable/un-hashable for the driver's
    * checker; integer→string rendering is identical on both engines.
    */
  private val q52 = QueryDef(
    "q52_resize",
    (s, dir) => Multimodal.resize(
      Multimodal.ingest(Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id", factor = 16)
      .select(col("doc_id"), size(col("resized")).cast("long").as("n_out"),
        md5(concat_ws(",", transform(col("resized"), _.cast("string"))))
          .as("resized_md5")),
    Some("""SELECT doc_id, len(r)::BIGINT AS n_out,
      md5(array_to_string(r, ',')) AS resized_md5 FROM (
      SELECT doc_id, list_transform(range(0, (strlen(text) + 15) // 16),
        w -> (list_reduce(list_prepend(0,
            list_transform(range(w * 16 + 1, least((w + 1) * 16, strlen(text)) + 1),
              i -> ord(substr(text, i, 1)))),
            (a, x) -> a + x))
          // (least((w + 1) * 16, strlen(text)) - w * 16)) AS r
      FROM documents)"""))

  /** Incremental near-dup (Dedup.incrementalCandidates): docs with
    * doc_id % 10 = 0 play the arriving batch, the rest the standing
    * corpus — candidates are batch×corpus band agreements only, never
    * corpus×corpus. The oracle replays both band tables and joins them.
    */
  private val q54 = QueryDef(
    "q54_incremental_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      Dedup.incrementalCandidates(
        docs.filter(col("doc_id") % 10 =!= 0),
        docs.filter(col("doc_id") % 10 === 0),
        "doc_id", "text", shingleWords = 3, bands = 4, rowsPerBand = 4)
    },
    Some(s"""WITH sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b))
      SELECT DISTINCT x.doc_id AS batch_id, y.doc_id AS corpus_id
      FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk
      WHERE x.doc_id % 10 = 0 AND y.doc_id % 10 <> 0"""))

  /** Vocabulary induction: top-100 tokens by corpus frequency — the
    * explode is map-side, the count partial-aggregates before its
    * shuffle, and the top-k is TakeOrderedAndProject (per-partition
    * heaps, k rows to the driver — no global sort at any corpus size).
    */
  private val q55 = QueryDef(
    "q55_vocab",
    (s, dir) => Tables.documents(s, dir)
      .select(explode(TextKernels.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(100),
    Some(s"""SELECT token, freq FROM (
        SELECT token, count(*) AS freq FROM (
          SELECT unnest($T) AS token FROM documents)
        GROUP BY token)
      ORDER BY freq DESC, token ASC LIMIT 100"""))

  /** Bigram statistics: top-100 adjacent token pairs — the pair list
    * builds map-side from the token array (zip with its own tail), so
    * the only shuffled rows are (bigram, partial count).
    */
  private val q56 = QueryDef(
    "q56_bigrams",
    (s, dir) => {
      val toks = TextKernels.tokens(col("text"))
      val bigrams = zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))
      Tables.documents(s, dir)
        .select(explode(bigrams).as("bigram"))
        .groupBy(col("bigram"))
        .agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram").asc)
        .limit(100)
    },
    Some(s"""SELECT bigram, freq FROM (
        SELECT bigram, count(*) AS freq FROM (
          SELECT unnest(list_transform(range(1, greatest(len($T), 1)),
            i -> ($T)[i] || ' ' || ($T)[i + 1])) AS bigram FROM documents)
        GROUP BY bigram)
      ORDER BY freq DESC, bigram ASC LIMIT 100"""))

  /** PII scrubbing (TextClean.scrub): email → URL → long-digit-run
    * redaction, map-side regexp passes inside codegen. The corpus has
    * no planted PII, so both sides append the SAME deterministic
    * synthetic email/URL/id tail per doc and then scrub it — the
    * oracle verifies the redaction logic (counts per category + md5 of
    * the scrubbed text), not the corpus. Patterns are restricted to
    * the Java-regex ∩ RE2 common subset (classes, bounded repetition —
    * no lookaround), so both engines match identically.
    */
  private val q63 = QueryDef(
    "q63_pii_scrub",
    (s, dir) => {
      val withPii = Tables.documents(s, dir).withColumn("t",
        concat(col("text"),
          lit(" contact user"), col("doc_id"),
          lit("@mail.example.com or http://ex.com/u/"), col("doc_id"),
          lit(" ref "), ((col("doc_id") + 1) * lit(111111111L)).cast("string")))
      val (ne, nu, ni) = TextClean.redactionCounts(col("t"))
      withPii.select(col("doc_id"),
        ne.as("n_emails"), nu.as("n_urls"), ni.as("n_ids"),
        md5(TextClean.scrub(col("t"))).as("scrubbed_md5"))
    },
    Some("""WITH p AS (SELECT doc_id,
        text || ' contact user' || doc_id::VARCHAR
             || '@mail.example.com or http://ex.com/u/' || doc_id::VARCHAR
             || ' ref ' || ((doc_id + 1) * 111111111)::VARCHAR AS t
        FROM documents),
      s1 AS (SELECT doc_id, t, regexp_replace(t,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM p),
      s2 AS (SELECT doc_id, t, t1, regexp_replace(t1,
        'https?://[^ ]+', '<URL>', 'g') AS t2 FROM s1)
      SELECT doc_id,
        len(regexp_extract_all(t,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT AS n_emails,
        len(regexp_extract_all(t1, 'https?://[^ ]+'))::BIGINT AS n_urls,
        len(regexp_extract_all(t2, '[0-9]{9,}'))::BIGINT AS n_ids,
        md5(regexp_replace(t2, '[0-9]{9,}', '<ID>', 'g')) AS scrubbed_md5
      FROM s2"""))

  /** Sequence chunking for training (TextClean.tokenChunks): windows
    * of 64 tokens starting every 48 (16-token overlap), tail chunk
    * short, every doc ≥1 chunk. The token array materializes once per
    * doc before the generator; per-chunk work is an O(window) slice —
    * map-side only, no shuffle at any corpus size.
    */
  private val q64 = QueryDef(
    "q64_chunking",
    (s, dir) => graft.ops.TextClean.tokenChunks(
      Tables.documents(s, dir), "doc_id", "text", window = 64, stride = 48),
    Some(s"""WITH t AS (SELECT doc_id, $T AS toks FROM documents),
      w AS (SELECT doc_id, toks,
        unnest(range(0, greatest(cast(ceil(len(toks)::DOUBLE / 48) AS BIGINT), 1)))
          AS chunk_idx FROM t)
      SELECT doc_id, chunk_idx,
        len(toks[chunk_idx*48+1 : chunk_idx*48+64])::BIGINT AS n_tokens,
        array_to_string(toks[chunk_idx*48+1 : chunk_idx*48+64], ' ') AS chunk_text
      FROM w"""))

  /** TF-IDF top-5 keywords per doc (ops/TfIdf): rational idf
    * `(N+1)/(df+1)` — monotone-equivalent to the log form and
    * bit-exact cross-engine (IEEE +,*,/ are correctly rounded; `ln`
    * is libm-specific). Deterministic tie-break on term.
    */
  private val q66 = QueryDef(
    "q66_tfidf",
    (s, dir) => graft.ops.TfIdf.topTerms(
      Tables.documents(s, dir), "doc_id", "text", k = 5),
    Some(s"""WITH tf AS (SELECT doc_id, token AS term, count(*) AS tf
        FROM (SELECT doc_id, unnest($T) AS token FROM documents)
        WHERE token <> ''
        GROUP BY doc_id, token),
      df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
      n AS (SELECT count(*)::DOUBLE AS n FROM documents),
      scored AS (SELECT tf.doc_id, tf.term, tf.tf,
          tf.tf * ((n.n + 1) / (df.df + 1)) AS score
        FROM tf JOIN df USING (term) CROSS JOIN n),
      ranked AS (SELECT *, row_number() OVER (PARTITION BY doc_id
          ORDER BY score DESC, term ASC) AS rk FROM scored)
      SELECT doc_id, term, tf, score FROM ranked WHERE rk <= 5"""))

  /** Out-of-vocabulary rate per document against the corpus top-50
    * vocabulary (the q55 induction, kept deterministic by the
    * (freq desc, token asc) total order). The vocab is a broadcast
    * ~50-row table, the probe is a map-side left join on the exploded
    * token stream, and the per-doc rollup pre-reduces on doc_id — the
    * tokenizer-coverage health check run before committing to a
    * tokenizer at corpus scale.
    */
  private val q79 = QueryDef(
    "q79_oov_rate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = docs.select(explode(TextKernels.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token").asc).limit(50)
        .select(col("token"), lit(1).as("in_vocab"))
      docs.select(col("doc_id"), explode(TextKernels.tokens(col("text"))).as("token"))
        .join(broadcast(vocab), Seq("token"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tok"),
          count(when(col("in_vocab").isNull, 1)).as("n_oov"))
        .withColumn("oov_rate", col("n_oov").cast("double") / col("n_tok"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($T) AS token FROM documents),
      vocab AS (SELECT token FROM (
          SELECT token, count(*) AS freq FROM tok GROUP BY token)
        ORDER BY freq DESC, token ASC LIMIT 50),
      j AS (SELECT t.doc_id, v.token AS vtok
        FROM tok t LEFT JOIN vocab v ON t.token = v.token)
      SELECT doc_id, count(*) AS n_tok,
        count(*) FILTER (WHERE vtok IS NULL) AS n_oov,
        count(*) FILTER (WHERE vtok IS NULL)::DOUBLE / count(*) AS oov_rate
      FROM j GROUP BY doc_id"""))

  /** Shingle novelty per document: the fraction of a doc's distinct
    * 3-gram shingles whose FIRST appearance (minimum doc_id over the
    * corpus) is this doc — the memorization/novelty signal curation
    * uses to find boilerplate-heavy late documents. The per-shingle
    * first-doc table pre-reduces to |distinct shingles| rows before
    * joining back (AQE broadcasts it when small; at corpus scale both
    * sides hash-partition on the 8-byte shingle hash); counts are
    * integers and the one ratio divides exactly-agreed longs. Docs
    * with no shingles (< 3 words) have no index rows and drop out on
    * both engines identically.
    */
  private val q85 = QueryDef(
    "q85_novelty",
    (s, dir) => {
      val inv = Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(Kernels.shingleHashes60Of(col("text"), 3)).as("g"))
      val firsts = inv.groupBy(col("g")).agg(min(col("doc_id")).as("first_doc"))
      inv.join(firsts, Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shingles"),
          count(when(col("first_doc") === col("doc_id"), 1)).as("n_novel"))
        .withColumn("novelty", col("n_novel").cast("double") / col("n_shingles"))
    },
    Some(s"""WITH sh AS (SELECT doc_id,
        list_transform($sqlShingles, t -> ${sqlHex60("t")}) AS s FROM documents),
      inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
      f AS (SELECT g, min(doc_id) AS first_doc FROM inv GROUP BY g)
      SELECT doc_id, count(*) AS n_shingles,
        count(*) FILTER (WHERE first_doc = doc_id) AS n_novel,
        count(*) FILTER (WHERE first_doc = doc_id)::DOUBLE / count(*)
          AS novelty
      FROM inv JOIN f USING (g)
      GROUP BY doc_id"""))

  /** Shared calibration-pipeline SQL: q86 emits the per-pair rows;
    * q98 aggregates the same rows into a threshold confusion matrix.
    */
  private val sqlCalibration: String = s"""WITH sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      hs AS (SELECT doc_id, list_transform(s, t -> ${sqlHex60("t")}) AS sh
        FROM sh),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      sz AS (SELECT b, bk, count(*) AS c FROM bands GROUP BY b, bk),
      pairs AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y ON x.b = y.b AND x.bk = y.bk AND x.doc_id < y.doc_id
        JOIN sz ON sz.b = x.b AND sz.bk = x.bk
        WHERE sz.c <= 10000),
      scored AS (SELECT p.doc_a, p.doc_b,
          list_sum(list_transform(range(1, 17),
            i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END))::BIGINT
            AS n_match,
          len(list_intersect(ha.sh, hb.sh))::BIGINT AS inter,
          (len(ha.sh) + len(hb.sh))::BIGINT AS sum_sizes
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.doc_a
        JOIN sig sb ON sb.doc_id = p.doc_b
        JOIN hs ha ON ha.doc_id = p.doc_a
        JOIN hs hb ON hb.doc_id = p.doc_b)
      SELECT doc_a, doc_b,
        n_match::DOUBLE / 16 AS est_jaccard,
        inter::DOUBLE / (sum_sizes - inter)::DOUBLE AS jaccard,
        abs(n_match::DOUBLE / 16
          - inter::DOUBLE / (sum_sizes - inter)::DOUBLE) AS abs_err
      FROM scored"""

  /** MinHash estimator calibration (Dedup.minhashCalibration): per
    * LSH candidate pair, the signature-agreement estimate vs the
    * exact shingle Jaccard and |error| — the parameter-tuning
    * measurement for (bands × rows). Candidates from the q18 banding;
    * integer agreement/intersection counts; identical float
    * expression trees both engines.
    */
  private val q86 = QueryDef(
    "q86_minhash_calibration",
    (s, dir) => graft.ops.Dedup.minhashCalibration(
      Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, bands = 4, rowsPerBand = 4),
    Some(sqlCalibration))

  /** Unigram-frequency rarity score per document — the integer-exact
    * surrogate for unigram-LM perplexity (rare-token-heavy docs score
    * low mean corpus frequency; all-boilerplate docs score high): per
    * doc, the sum/min/mean of the CORPUS frequency of its tokens,
    * counting multiplicity. The token stream pre-reduces to
    * (doc_id, token, c) before anything joins — so the frequency join
    * carries one row per distinct (doc, token), not per occurrence,
    * and a hot token ("the") contributes ≤ |docs| slim rows that AQE's
    * skew split spreads; the vocab side is |vocab| rows keyed on the
    * same token hash. Sums stay longs to the single final division.
    */
  private val q90 = QueryDef(
    "q90_token_rarity",
    (s, dir) => {
      val perDocTok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(TextKernels.tokens(col("text"))).as("token"))
        .groupBy(col("doc_id"), col("token"))
        .agg(count(lit(1)).as("c"))
      val freq = perDocTok.groupBy(col("token")).agg(sum(col("c")).as("freq"))
      perDocTok.join(freq, Seq("token"))
        .groupBy(col("doc_id"))
        .agg(sum(col("c")).as("n_tok"),
          sum(col("c") * col("freq")).as("sum_freq"),
          min(col("freq")).as("min_freq"))
        .withColumn("mean_freq",
          col("sum_freq").cast("double") / col("n_tok").cast("double"))
    },
    Some(s"""WITH tok AS (SELECT doc_id, unnest($T) AS token FROM documents),
      per AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
      freq AS (SELECT token, sum(c)::BIGINT AS freq FROM per GROUP BY token)
      SELECT doc_id, sum(c)::BIGINT AS n_tok,
        sum(c * freq)::BIGINT AS sum_freq,
        min(freq) AS min_freq,
        sum(c * freq)::BIGINT::DOUBLE / sum(c)::BIGINT::DOUBLE AS mean_freq
      FROM per JOIN freq USING (token)
      GROUP BY doc_id"""))

  /** Cross-source content-overlap matrix: for every source pair, the
    * count of distinct 3-gram shingles they share and the shingle-set
    * Jaccard — the corpus-level leakage report ("how much of source A
    * is boilerplate it shares with source B") that decides which
    * sources need cross-source dedup before training. Scale shape:
    * shingles hash to 60-bit longs BEFORE anything shuffles (8-byte
    * keys instead of multi-word strings — the q19 identity trick),
    * then the universe collapses to DISTINCT (source, shingle-hash)
    * rows, so the self-join on the shingle key expands each shingle to
    * at most |sources|² pairs no matter how many documents repeat it —
    * never a doc×doc product; per-source set sizes are a |sources|-row
    * broadcast. Counts are exact longs; the one division mirrors the
    * identical expression tree in the oracle.
    */
  private val q91 = QueryDef(
    "q91_source_overlap",
    (s, dir) => {
      val sh = Tables.documents(s, dir)
        .select(col("source"),
          explode(Kernels.shingleHashes60Of(col("text"), 3)).as("sh"))
        .distinct()
      val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
      sh.select(col("sh"), col("source").as("source_a"))
        .join(sh.select(col("sh"), col("source").as("source_b")), Seq("sh"))
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_shared"))
        .join(broadcast(sizes.select(col("source").as("source_a"),
          col("n").as("n_a"))), Seq("source_a"))
        .join(broadcast(sizes.select(col("source").as("source_b"),
          col("n").as("n_b"))), Seq("source_b"))
        .withColumn("jaccard", col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
    },
    Some(s"""WITH sh AS (SELECT DISTINCT source,
          unnest(list_transform($sqlShingles, t -> ${sqlHex60("t")})) AS sh
        FROM documents),
      sizes AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      p AS (SELECT a.source AS source_a, b.source AS source_b,
          count(*) AS n_shared
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
        GROUP BY 1, 2)
      SELECT source_a, source_b, n_shared, sa.n AS n_a, sb.n AS n_b,
        n_shared::DOUBLE / (sa.n + sb.n - n_shared)::DOUBLE AS jaccard
      FROM p JOIN sizes sa ON p.source_a = sa.source
      JOIN sizes sb ON p.source_b = sb.source"""))

  /** Exact repeated-span removal (TextClean.dropRepeatedSpans): every
    * 5-token window appearing verbatim in ≥2 distinct documents marks
    * its positions for deletion and the documents are rebuilt from the
    * survivors — substring-level dedup, the pass that catches shared
    * boilerplate exact-doc dedup (q17) and near-dup dedup (q32) both
    * miss. All shuffles key on window content / (doc, pos) — uniform;
    * the only fan-out is a fixed ×5 of duplicated-window hits.
    */
  private val q94 = QueryDef(
    "q94_span_dedup",
    (s, dir) => TextClean.dropRepeatedSpans(
      Tables.documents(s, dir), "doc_id", "text", k = 5, minDocs = 2),
    Some(s"""WITH base AS (SELECT doc_id, $T AS toks FROM documents),
      winpos AS (SELECT doc_id, toks,
          unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS pos
        FROM base),
      wins AS (SELECT doc_id, pos,
          unhex(md5(array_to_string(toks[pos:pos+4], ' '))) AS wh FROM winpos),
      dup AS (SELECT wh FROM wins GROUP BY wh
        HAVING count(DISTINCT doc_id) >= 2),
      cov AS (SELECT DISTINCT doc_id, pos + off AS pos
        FROM wins JOIN dup USING (wh) CROSS JOIN range(0, 5) AS o(off)),
      tp AS (SELECT doc_id, toks,
          unnest(range(1, len(toks) + 1)) AS pos FROM base),
      tokpos AS (SELECT doc_id, pos, toks[pos] AS token FROM tp),
      kept AS (SELECT t.doc_id, t.pos, t.token FROM tokpos t
        LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
        WHERE c.doc_id IS NULL),
      agg AS (SELECT doc_id, count(*) AS n_kept,
          string_agg(token, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id)
      SELECT b.doc_id, len(b.toks)::BIGINT AS n_tok,
        (len(b.toks) - coalesce(n_kept, 0))::BIGINT AS n_removed,
        coalesce(clean_text, '') AS clean_text
      FROM base b LEFT JOIN agg USING (doc_id)"""))

  /** Variable-length exact-substring dedup
    * (TextClean.repeatedSpanIntervals — Lee et al.'s suffix-array
    * ExactSubstr pass as windows + islands): every maximal token span
    * repeated across ≥2 documents at its TRUE length (≥ 3 tokens) with
    * the span text — the report q94's fixed-k marking cannot give
    * (where the boilerplate is and how long it really is). The oracle
    * replays the window-hash → dup → coverage → gaps-and-islands
    * pipeline in SQL; spans reconstruct by list slice on both engines.
    */
  private val q194 = QueryDef(
    "q194_repeated_spans",
    // session-cached substrate: q194 and q195 share one windows+islands
    // pass (TextClean.repeatedSpanIntervalsCached — the
    // pairIntersectionsCached discipline applied to the span family)
    (s, dir) => TextClean.repeatedSpanIntervalsCached(
      Tables.documents(s, dir), s"docs:$dir", "doc_id", "text",
      k = 3, minDocs = 2),
    Some(s"""WITH base AS (SELECT doc_id, $T AS toks FROM documents),
      winpos AS (SELECT doc_id, toks,
          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos
        FROM base),
      wins AS (SELECT doc_id, pos,
          unhex(md5(array_to_string(toks[pos:pos+2], ' '))) AS wh FROM winpos),
      dup AS (SELECT wh FROM wins GROUP BY wh
        HAVING count(DISTINCT doc_id) >= 2),
      cov AS (SELECT DISTINCT doc_id, pos + off AS pos
        FROM wins JOIN dup USING (wh) CROSS JOIN range(0, 3) AS o(off)),
      isl AS (SELECT doc_id, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM cov),
      spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
          count(*)::BIGINT AS span_len FROM isl GROUP BY doc_id, grp)
      SELECT s.doc_id, s.span_start, s.span_len,
        array_to_string(
          b.toks[s.span_start : s.span_start + s.span_len - 1], ' ')
          AS span_text
      FROM spans s JOIN base b USING (doc_id)"""))

  /** Corpus boilerplate catalog on top of q194's maximal spans: the
    * top-20 repeated span TEXTS by reach (distinct docs desc, length
    * desc, text asc — fully deterministic), with occurrence counts and
    * the total token mass each would return if stripped. This is the
    * human-facing "what IS the boilerplate" report a curation run
    * reviews before committing to span removal; the heavy lifting is
    * the same windows+islands pipeline, the catalog adds one
    * span-text rollup + a TakeOrdered top-k.
    */
  private val q195 = QueryDef(
    "q195_boilerplate_catalog",
    (s, dir) => TextClean.repeatedSpanIntervalsCached(
        Tables.documents(s, dir), s"docs:$dir", "doc_id", "text",
        k = 3, minDocs = 2)
      .groupBy(col("span_text"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_spans"),
        min(col("span_len")).as("span_len"),
        sum(col("span_len")).as("total_tokens"))
      .orderBy(col("n_docs").desc, col("span_len").desc, col("span_text").asc)
      .limit(20),
    Some(s"""WITH base AS (SELECT doc_id, $T AS toks FROM documents),
      winpos AS (SELECT doc_id, toks,
          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos
        FROM base),
      wins AS (SELECT doc_id, pos,
          unhex(md5(array_to_string(toks[pos:pos+2], ' '))) AS wh FROM winpos),
      dup AS (SELECT wh FROM wins GROUP BY wh
        HAVING count(DISTINCT doc_id) >= 2),
      cov AS (SELECT DISTINCT doc_id, pos + off AS pos
        FROM wins JOIN dup USING (wh) CROSS JOIN range(0, 3) AS o(off)),
      isl AS (SELECT doc_id, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM cov),
      spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
          count(*)::BIGINT AS span_len FROM isl GROUP BY doc_id, grp),
      st AS (SELECT s.doc_id, s.span_len,
          array_to_string(
            b.toks[s.span_start : s.span_start + s.span_len - 1], ' ')
            AS span_text
        FROM spans s JOIN base b USING (doc_id))
      SELECT span_text, count(DISTINCT doc_id)::BIGINT AS n_docs,
        count(*)::BIGINT AS n_spans,
        min(span_len)::BIGINT AS span_len,
        sum(span_len)::BIGINT AS total_tokens
      FROM st GROUP BY span_text
      ORDER BY n_docs DESC, span_len DESC, span_text ASC
      LIMIT 20"""))

  /** LSH operating-point audit — the go/no-go number for a chosen
    * (bands × rows) configuration before a corpus-scale dedup run: at
    * the dedup threshold τ = 0.5, the confusion matrix of the MinHash
    * ESTIMATE against the exact Jaccard over the q86 calibration
    * pairs, rolled into one row (candidates, predicted, actual, true
    * positives, precision, within-candidate recall). All counts are
    * exact integers off the calibration output; the two ratios divide
    * exactly-agreed longs.
    */
  private val q98 = QueryDef(
    "q98_lsh_audit",
    (s, dir) => {
      val cal = Dedup.minhashCalibration(
        Tables.documents(s, dir), "doc_id", "text",
        shingleWords = 3, bands = 4, rowsPerBand = 4)
      cal.agg(
          count(lit(1)).as("n_candidates"),
          count(when(col("est_jaccard") >= 0.5, 1)).as("n_pred"),
          count(when(col("jaccard") >= 0.5, 1)).as("n_actual"),
          count(when(col("est_jaccard") >= 0.5 && col("jaccard") >= 0.5, 1))
            .as("tp"))
        .withColumn("precision", when(col("n_pred") > 0,
          col("tp").cast("double") / col("n_pred").cast("double")))
        .withColumn("recall_in_candidates", when(col("n_actual") > 0,
          col("tp").cast("double") / col("n_actual").cast("double")))
    },
    Some(s"""SELECT count(*) AS n_candidates,
        count(*) FILTER (WHERE est_jaccard >= 0.5) AS n_pred,
        count(*) FILTER (WHERE jaccard >= 0.5) AS n_actual,
        count(*) FILTER (WHERE est_jaccard >= 0.5 AND jaccard >= 0.5) AS tp,
        CASE WHEN count(*) FILTER (WHERE est_jaccard >= 0.5) > 0
          THEN (count(*) FILTER (WHERE est_jaccard >= 0.5 AND jaccard >= 0.5))::DOUBLE
            / (count(*) FILTER (WHERE est_jaccard >= 0.5))::DOUBLE END AS precision,
        CASE WHEN count(*) FILTER (WHERE jaccard >= 0.5) > 0
          THEN (count(*) FILTER (WHERE est_jaccard >= 0.5 AND jaccard >= 0.5))::DOUBLE
            / (count(*) FILTER (WHERE jaccard >= 0.5))::DOUBLE END AS recall_in_candidates
      FROM ($sqlCalibration)"""))

  /** Surgical benchmark decontamination (TextClean.dropSpansMatching):
    * src19 plays the held-out eval set; every 5-token span of the
    * OTHER 19 sources' documents that appears verbatim anywhere in
    * src19 is removed and the documents rebuilt — the n-gram-level
    * decontamination pass (whole-doc flagging is q57). The reference
    * window-hash set is benchmark-sized and broadcasts, so the mark
    * join adds no corpus shuffle.
    */
  private val q112 = QueryDef(
    "q112_decontam_spans",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      TextClean.dropSpansMatching(
        docs.filter(col("source") =!= "src19"), "doc_id", "text",
        docs.filter(col("source") === "src19"), "doc_id", "text", k = 5)
    },
    Some(s"""WITH base AS (SELECT doc_id, $T AS toks FROM documents
        WHERE source <> 'src19'),
      winpos AS (SELECT doc_id, toks,
          unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS pos
        FROM base),
      wins AS (SELECT doc_id, pos,
          unhex(md5(array_to_string(toks[pos:pos+4], ' '))) AS wh FROM winpos),
      rbase AS (SELECT doc_id, $T AS toks FROM documents
        WHERE source = 'src19'),
      rwinpos AS (SELECT doc_id, toks,
          unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS pos
        FROM rbase),
      rwh AS (SELECT DISTINCT
          unhex(md5(array_to_string(toks[pos:pos+4], ' '))) AS wh FROM rwinpos),
      cov AS (SELECT DISTINCT doc_id, pos + off AS pos
        FROM wins JOIN rwh USING (wh) CROSS JOIN range(0, 5) AS o(off)),
      tp AS (SELECT doc_id, toks,
          unnest(range(1, len(toks) + 1)) AS pos FROM base),
      tokpos AS (SELECT doc_id, pos, toks[pos] AS token FROM tp),
      kept AS (SELECT t.doc_id, t.pos, t.token FROM tokpos t
        LEFT JOIN cov c ON t.doc_id = c.doc_id AND t.pos = c.pos
        WHERE c.doc_id IS NULL),
      agg AS (SELECT doc_id, count(*) AS n_kept,
          string_agg(token, ' ' ORDER BY pos) AS clean_text
        FROM kept GROUP BY doc_id)
      SELECT b.doc_id, len(b.toks)::BIGINT AS n_tok,
        (len(b.toks) - coalesce(n_kept, 0))::BIGINT AS n_removed,
        coalesce(clean_text, '') AS clean_text
      FROM base b LEFT JOIN agg USING (doc_id)"""))

  /** Gopher-style quality rule battery (QualityRules.gopherRules):
    * word-count bounds, mean-word-length band, stopword evidence,
    * alphabetic fraction, type/token ratio — every threshold an
    * integer cross-multiplication, map-side, no shuffle.
    */
  private val q115 = QueryDef(
    "q115_quality_rules",
    (s, dir) => graft.ops.QualityRules.gopherRules(
      Tables.documents(s, dir), "doc_id", "text", Stops),
    Some {
      val stopsList = Stops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH m AS (SELECT doc_id,
          len($T)::BIGINT AS n_tok,
          (length(text) - (len($T) - 1))::BIGINT AS n_chars,
          len(list_filter($T, t -> list_contains($stopsList, t)))::BIGINT AS n_stop,
          len(list_filter($T, t -> regexp_full_match(t, '[A-Za-z]+')))::BIGINT AS n_alpha,
          len(list_distinct($T))::BIGINT AS n_types
        FROM documents),
      r AS (SELECT *,
          (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1 ELSE 0 END)::BIGINT AS r_len,
          (CASE WHEN n_chars >= 3 * n_tok AND n_chars <= 10 * n_tok
            THEN 1 ELSE 0 END)::BIGINT AS r_wordlen,
          (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)::BIGINT AS r_stop,
          (CASE WHEN n_alpha * 5 >= 4 * n_tok THEN 1 ELSE 0 END)::BIGINT AS r_alpha,
          (CASE WHEN n_types * 4 >= n_tok THEN 1 ELSE 0 END)::BIGINT AS r_ttr
        FROM m)
      SELECT *, (r_len * r_wordlen * r_stop * r_alpha * r_ttr)::BIGINT AS pass
      FROM r"""
    })

  /** One BPE merge-iteration count (NgramLm.bpePairStep): adjacent
    * char-pair occurrences inside tokens over the whole corpus, top 20
    * by (count desc, pair asc) — the pair a tokenizer trainer merges
    * next. Explode → count → TakeOrderedAndProject.
    */
  private val q116 = QueryDef(
    "q116_bpe_step",
    (s, dir) => graft.ops.NgramLm.bpePairStep(
      Tables.documents(s, dir), "text", k = 20),
    Some(s"""WITH w AS (SELECT unnest($T) AS w FROM documents),
      i AS (SELECT w, unnest(range(1, length(w))) AS i FROM w WHERE length(w) >= 2),
      p AS (SELECT substr(w, i, 2) AS pair FROM i)
      SELECT pair, count(*) AS n_occ FROM p GROUP BY pair
      ORDER BY n_occ DESC, pair ASC LIMIT 20"""))

  /** Corpus trigram LM table with Kneser–Ney continuation counts
    * (NgramLm.trigramLm): occurrence counts shuffle on the trigram;
    * the N1+(·,w2,w3) continuation count is a window over the already-
    * aggregated distinct-trigram rows (bounded by |vocab|³, not corpus
    * size).
    */
  private val q117 = QueryDef(
    "q117_ngram_lm",
    (s, dir) => graft.ops.NgramLm.trigramLm(Tables.documents(s, dir), "text"),
    Some(s"""WITH t AS (SELECT $T AS toks FROM documents WHERE len($T) >= 3),
      pos AS (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM t),
      tri AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3 FROM pos),
      c AS (SELECT w1, w2, w3, count(*) AS c FROM tri GROUP BY w1, w2, w3)
      SELECT w1, w2, w3, c,
        (count(*) OVER (PARTITION BY w2, w3))::BIGINT AS cont
      FROM c"""))

  /** Exact shingle-set containment pairs (Dedup.containmentPairs):
    * `inter / min(|A|,|B|)` — the asymmetric doc-inside-doc near-dup
    * signal Jaccard misses; threshold compared as an integer
    * cross-multiplication. Same one-pass inverted index as q19.
    */
  private val q118 = QueryDef(
    "q118_containment",
    (s, dir) => Dedup.containmentPairsFrom(
      docIntersectionsCached(s, dir), thresholdNum = 1, thresholdDen = 2),
    Some(s"""WITH sh AS (SELECT doc_id,
        list_transform($sqlShingles, sg -> ${sqlHex60("sg")}) AS s FROM documents),
      inv0 AS (SELECT doc_id, len(s) AS n, unnest(s) AS g FROM sh),
      sz AS (SELECT g, count(*) AS c FROM inv0 GROUP BY g),
      inv AS (SELECT inv0.* FROM inv0 JOIN sz USING (g) WHERE sz.c <= 10000),
      pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
          min(x.n) AS na, min(y.n) AS nb, count(*) AS inter
        FROM inv x JOIN inv y ON x.g = y.g AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      SELECT doc_a, doc_b, na::BIGINT AS na, nb::BIGINT AS nb,
        inter::BIGINT AS inter,
        inter::DOUBLE / least(na, nb)::DOUBLE AS containment
      FROM pairs WHERE inter * 2 >= least(na, nb)"""))

  /** Temperature-scaled mixture quotas (Sample.temperatureQuota):
    * budget split across sources ∝ √count (α=0.5 reweighting) with
    * exact largest-remainder apportionment — quotas sum to EXACTLY
    * the budget; the weight `floor(√n·2²⁰)` is the same integer on
    * every engine, so every downstream sum is order-independent.
    */
  private val q119 = QueryDef(
    "q119_temperature_mix",
    (s, dir) => graft.ops.Sample.temperatureQuota(
      Tables.documents(s, dir), "source", budget = 100000L),
    Some("""WITH c AS (SELECT source, count(*) AS n_docs FROM documents
          GROUP BY source),
      w AS (SELECT source, n_docs,
          floor(sqrt(n_docs::DOUBLE) * 1048576)::BIGINT AS w FROM c),
      tw AS (SELECT *, sum(w) OVER () AS total_w FROM w),
      b AS (SELECT *, (w * 100000) // total_w AS base,
          (w * 100000) % total_w AS rem FROM tw),
      d AS (SELECT *, 100000 - sum(base) OVER () AS deficit,
          row_number() OVER (ORDER BY rem DESC, source ASC) AS rk FROM b)
      SELECT source, n_docs, w,
        w::DOUBLE / total_w::DOUBLE AS share,
        (base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END)::BIGINT AS quota
      FROM d"""))

  /** Product-quantization code assignment (Similarity.pqCodes): 64-dim
    * embeddings cut into 4×16-dim slices, each encoded as its nearest
    * of 8 codebook centroids (squared-L2, ties to the smallest code).
    * The codebook folds in as a literal — assignment is map-side, no
    * shuffle; left-fold distances keep the doubles bit-equal across
    * engines.
    */
  private val q120 = QueryDef(
    "q120_pq_codes",
    (s, dir) => Similarity.pqCodes(
      Tables.embeddings(s, dir), "vec_id", "embedding",
      subspaces = 4, codeK = 8),
    Some("""WITH seed AS (SELECT embedding,
          row_number() OVER (ORDER BY vec_id ASC) - 1 AS code
        FROM embeddings ORDER BY vec_id ASC LIMIT 8),
      cb AS (SELECT code, s,
          list_transform(range(s*16 + 1, s*16 + 17), i -> embedding[i]::DOUBLE)
            AS cvec
        FROM seed CROSS JOIN range(0, 4) AS t(s)),
      scored AS (SELECT e.vec_id, c.s AS subspace, c.code,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, 17),
              i -> (e.embedding[c.s*16 + i]::DOUBLE - c.cvec[i])
                 * (e.embedding[c.s*16 + i]::DOUBLE - c.cvec[i]))),
            (acc, x) -> acc + x) AS dist2
        FROM embeddings e CROSS JOIN cb c),
      ranked AS (SELECT *, row_number() OVER
          (PARTITION BY vec_id, subspace ORDER BY dist2 ASC, code ASC) AS rk
        FROM scored)
      SELECT vec_id, subspace::BIGINT AS subspace, code::BIGINT AS code, dist2
      FROM ranked WHERE rk = 1"""))

  /** Gopher repetition signals (QualityRules.repetitionSignals): per
    * (doc, n) the top n-gram's char mass and the duplicated-n-gram char
    * mass, n ∈ {2,3,4,6} — all integer counts, fractions as single
    * divisions of exact longs. One shuffle keyed on (doc, n, gram).
    */
  private val q121 = QueryDef(
    "q121_repetition",
    (s, dir) => graft.ops.QualityRules.repetitionSignals(
      Tables.documents(s, dir), "doc_id", "text", Seq(2, 3, 4, 6)),
    Some(s"""WITH g AS (SELECT doc_id, length(text)::BIGINT AS n_chars,
          n, unnest(list_transform(range(1, len($T) - n + 2),
            i -> array_to_string(($T)[i:i+n-1], ' '))) AS gram
        FROM documents CROSS JOIN (VALUES (2), (3), (4), (6)) AS t(n)
        WHERE len($T) >= n),
      c AS (SELECT doc_id, n, n_chars, gram, count(*) AS c
        FROM g GROUP BY doc_id, n, n_chars, gram),
      r AS (SELECT *, row_number() OVER (PARTITION BY doc_id, n
          ORDER BY c DESC, gram ASC) AS rk FROM c),
      t AS (SELECT doc_id, n, gram AS top_gram, c AS top_occ
        FROM r WHERE rk = 1),
      a AS (SELECT doc_id, n, n_chars, sum(c)::BIGINT AS n_slots,
          count(*)::BIGINT AS n_distinct,
          sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)::BIGINT
            AS dup_chars
        FROM c GROUP BY doc_id, n, n_chars)
      SELECT a.doc_id, a.n::BIGINT AS n, a.n_chars, a.n_slots,
        a.n_distinct, t.top_gram, t.top_occ::BIGINT AS top_occ,
        (t.top_occ * length(t.top_gram))::BIGINT AS top_chars,
        a.dup_chars,
        (t.top_occ * length(t.top_gram))::DOUBLE / a.n_chars::DOUBLE
          AS top_frac,
        a.dup_chars::DOUBLE / a.n_chars::DOUBLE AS dup_frac
      FROM a JOIN t ON a.doc_id = t.doc_id AND a.n = t.n"""))

  /** Held-in trigram-LM document scoring (NgramLm.docLmScore): LM from
    * even doc_ids, every doc scored; per-slot probability quantized to
    * ⌊c3·2³⁰/c_ctx⌋ so all sums are integer and the mean is one
    * division — no `log`, no float accumulation order.
    */
  private val q122 = QueryDef(
    "q122_lm_score",
    (s, dir) => graft.ops.NgramLm.docLmScoreCached(
      Tables.documents(s, dir), s"docs:$dir:even", "doc_id", "text",
      col("doc_id") % 2 === 0),
    Some(s"""WITH tr AS (SELECT $T AS toks FROM documents
          WHERE doc_id % 2 = 0 AND len($T) >= 3),
      tpos AS (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr),
      lm AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
          count(*) AS c3
        FROM tpos GROUP BY 1, 2, 3),
      ctx AS (SELECT w1, w2, sum(c3)::BIGINT AS c_ctx FROM lm
        GROUP BY w1, w2),
      d AS (SELECT doc_id, $T AS toks FROM documents WHERE len($T) >= 3),
      dpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM d),
      slots AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
          toks[i+2] AS w3 FROM dpos),
      j AS (SELECT s.doc_id, l.c3, x.c_ctx
        FROM slots s
        LEFT JOIN lm l ON s.w1 = l.w1 AND s.w2 = l.w2 AND s.w3 = l.w3
        LEFT JOIN ctx x ON s.w1 = x.w1 AND s.w2 = x.w2),
      q AS (SELECT doc_id, c3, c_ctx,
          CASE WHEN c_ctx IS NULL THEN NULL
            ELSE CAST((coalesce(c3, 0)::HUGEINT * 1073741824) // c_ctx
              AS BIGINT) END AS q
        FROM j)
      SELECT doc_id, count(*)::BIGINT AS n_slots,
        count(c_ctx)::BIGINT AS n_ctx, count(c3)::BIGINT AS n_hit,
        (count(*) - count(c_ctx))::BIGINT AS n_noctx,
        sum(q)::BIGINT AS sum_q,
        CASE WHEN count(c_ctx) > 0 THEN
          sum(q)::BIGINT::DOUBLE / (count(c_ctx) * 1073741824)::DOUBLE
        END AS mean_q
      FROM q GROUP BY doc_id"""))

  /** PQ asymmetric-distance top-k (Similarity.pqAdcTopK): corpus rows
    * PQ-encode map-side against the q120 codebook, the query stays
    * exact via a subspaces×codeK distance table, approximate distance
    * = 4 lookups folded in subspace order; global result via the
    * top-k heap, ties broken by vec_id.
    */
  private val q123 = QueryDef(
    "q123_pq_adc",
    (s, dir) => Similarity.pqAdcTopK(
      Tables.embeddings(s, dir), "vec_id", "embedding",
      queryId = 100L, subspaces = 4, codeK = 8, k = 25),
    Some("""WITH seed AS (SELECT embedding,
          row_number() OVER (ORDER BY vec_id ASC) - 1 AS code
        FROM embeddings ORDER BY vec_id ASC LIMIT 8),
      cb AS (SELECT code, s,
          list_transform(range(s*16 + 1, s*16 + 17), i -> embedding[i]::DOUBLE)
            AS cvec
        FROM seed CROSS JOIN range(0, 4) AS t(s)),
      qv AS (SELECT list_transform(range(1, 65), i -> embedding[i]::DOUBLE)
          AS q
        FROM embeddings WHERE vec_id = 100),
      adc AS (SELECT s, code,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, 17),
              i -> (q[s*16 + i] - cvec[i]) * (q[s*16 + i] - cvec[i]))),
            (acc, x) -> acc + x) AS d
        FROM cb CROSS JOIN qv),
      scored AS (SELECT e.vec_id, c.s, c.code,
          list_reduce(list_prepend(0.0::DOUBLE,
            list_transform(range(1, 17),
              i -> (e.embedding[c.s*16 + i]::DOUBLE - c.cvec[i])
                 * (e.embedding[c.s*16 + i]::DOUBLE - c.cvec[i]))),
            (acc, x) -> acc + x) AS dist2
        FROM embeddings e CROSS JOIN cb c),
      codes AS (SELECT vec_id, s, code FROM (SELECT *, row_number() OVER
          (PARTITION BY vec_id, s ORDER BY dist2 ASC, code ASC) AS rk
        FROM scored) WHERE rk = 1),
      summed AS (SELECT v.vec_id,
          list_reduce(list_prepend(0.0::DOUBLE,
            list(a.d ORDER BY a.s ASC)), (acc, x) -> acc + x) AS adc
        FROM codes v JOIN adc a ON a.s = v.s AND a.code = v.code
        GROUP BY v.vec_id)
      SELECT vec_id, adc FROM summed
      ORDER BY adc ASC, vec_id ASC LIMIT 25"""))

  /** Cell-partitioned kNN graph (Similarity.knnGraph): the corpus is
    * both query set and candidate set, so nothing broadcasts — both
    * sides shuffle once on the map-side-assigned cell_id, pairs stay
    * cell-local, and the per-query top-k is the bounded-heap partial
    * aggregate. Centroids = the first `max(8, N/250)` vectors
    * (deterministic for the oracle, and cells GROW WITH THE CORPUS —
    * constant ~250-vector cell population, so cell-local pair work is
    * O(N), never quadratic-at-fixed-cells; at the driver SFs this is
    * exactly the former 8-cell pin, at the 10×/30× synths 80/240
    * cells). k=5. The 1-row count is the sanctioned scalar class.
    */
  private val q124 = QueryDef(
    "q124_knn_graph",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cells = math.max(8L, e.count() / 250L)
      val cents = e.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      Similarity.knnGraph(e, "vec_id", "embedding", cents, k = 5)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings
        WHERE vec_id < (SELECT greatest(8, count(*) // 250) FROM embeddings)),
      asg AS (SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")},
              '-infinity'::DOUBLE) DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      pairs AS (SELECT q.vec_id AS query_id, c.vec_id AS vec_id,
          ${sqlCos("c.embedding", "q.embedding")} AS cos
        FROM asg q JOIN asg c USING (cell_id)
        WHERE q.vec_id <> c.vec_id),
      rk AS (SELECT query_id, vec_id, cos,
          row_number() OVER (PARTITION BY query_id
            ORDER BY cos DESC, vec_id ASC) AS rank
        FROM pairs WHERE cos IS NOT NULL)
      SELECT query_id, rank::BIGINT AS rank, vec_id, cos
      FROM rk WHERE rank <= 5"""))

  /** Winnowing fingerprint selection (Dedup.winnow): every 4-window of
    * the 3-gram hash stream selects its minimum (ties → rightmost),
    * distinct (pos, fp) pairs out — all map-side array lambdas; the
    * oracle reproduces the windowed argmin relationally (range join +
    * rank) over the same md5/hex60 hashes.
    */
  private val q125 = QueryDef(
    "q125_winnow",
    (s, dir) => Dedup.winnow(
      Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, window = 4),
    Some(s"""WITH t AS (SELECT doc_id, $T AS toks FROM documents
          WHERE len($T) >= 3),
      h AS (SELECT doc_id, len(toks) - 2 AS m, p,
          ${sqlHex60("array_to_string(toks[p:p+2], ' ')")} AS h
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS p
          FROM t)),
      w AS (SELECT doc_id, m, unnest(range(1, greatest(m - 3, 1) + 1)) AS j
        FROM (SELECT DISTINCT doc_id, m FROM h)),
      cand AS (SELECT w.doc_id, w.j, h.p, h.h
        FROM w JOIN h ON h.doc_id = w.doc_id
          AND h.p >= w.j AND h.p <= w.j + 3),
      rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id, j
          ORDER BY h ASC, p DESC) AS rk FROM cand)
      SELECT DISTINCT doc_id, p::BIGINT AS pos, h AS fp
      FROM rk WHERE rk = 1"""))

  /** Signed feature-hashing bag-of-words (TfIdf.hashedBow): the
    * vocabulary-free vectorizer — dim = hex60 mod 32, sign from the
    * next hash bit, exact ±1 integer sums per (doc, dim), zero-sum
    * dims dropped.
    */
  private val q126 = QueryDef(
    "q126_hashed_bow",
    (s, dir) => graft.ops.TfIdf.hashedBow(
      Tables.documents(s, dir), "doc_id", "text", dims = 32),
    Some(s"""WITH tok AS (SELECT doc_id, unnest($T) AS tok FROM documents),
      h AS (SELECT doc_id, ${sqlHex60("tok")} AS h FROM tok),
      s AS (SELECT doc_id, h % 32 AS dim,
          CASE WHEN (h // 32) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM h)
      SELECT doc_id, dim::BIGINT AS dim, sum(sgn)::BIGINT AS weight
      FROM s GROUP BY doc_id, dim HAVING sum(sgn) <> 0"""))

  /** Winnow-overlap pairs (Dedup.winnowOverlapPairs): the q19/q118
    * inverted-index verifier over the ~2/(w+1)-thinned winnowed
    * fingerprint sets — every shuffle a fraction of the full shingle
    * index, sampling guarantee instead of exactness.
    */
  private val q128 = QueryDef(
    "q128_winnow_overlap",
    (s, dir) => Dedup.winnowOverlapPairs(
      Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, window = 4, thresholdNum = 1, thresholdDen = 2),
    Some(s"""WITH t AS (SELECT doc_id, $T AS toks FROM documents
          WHERE len($T) >= 3),
      h AS (SELECT doc_id, len(toks) - 2 AS m, p,
          ${sqlHex60("array_to_string(toks[p:p+2], ' ')")} AS h
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS p
          FROM t)),
      w AS (SELECT doc_id, m, unnest(range(1, greatest(m - 3, 1) + 1)) AS j
        FROM (SELECT DISTINCT doc_id, m FROM h)),
      cand AS (SELECT w.doc_id, w.j, h.p, h.h
        FROM w JOIN h ON h.doc_id = w.doc_id
          AND h.p >= w.j AND h.p <= w.j + 3),
      rk AS (SELECT *, row_number() OVER (PARTITION BY doc_id, j
          ORDER BY h ASC, p DESC) AS rk FROM cand),
      fp AS (SELECT DISTINCT doc_id, h AS fp FROM rk WHERE rk = 1),
      sz AS (SELECT doc_id, count(*) AS n FROM fp GROUP BY doc_id),
      df AS (SELECT fp, count(*) AS c FROM fp GROUP BY fp),
      inv AS (SELECT f.doc_id, s.n, f.fp
        FROM fp f JOIN sz s USING (doc_id) JOIN df USING (fp)
        WHERE df.c <= 10000),
      pairs AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
          min(x.n) AS na, min(y.n) AS nb, count(*) AS inter
        FROM inv x JOIN inv y ON x.fp = y.fp AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id)
      SELECT doc_a, doc_b, na::BIGINT AS na, nb::BIGINT AS nb,
        inter::BIGINT AS inter,
        inter::DOUBLE / least(na, nb)::DOUBLE AS overlap
      FROM pairs WHERE inter * 2 >= least(na, nb)"""))

  /** Curation SCORECARD — the composed per-document keep/drop decision
    * a corpus build publishes: Gopher rule battery (q115) ∧ top-bigram
    * and duplicated-6-gram repetition bounds (q121, cross-multiplied
    * integer thresholds) ∧ held-in LM evidence (q122). Everything is
    * longs — the keep verdict never touches a float; absent side rows
    * (short docs) fail their condition via NULL → 0 identically on
    * both engines.
    */
  private val q129 = QueryDef(
    "q129_scorecard",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val rules = graft.ops.QualityRules.gopherRules(d, "doc_id", "text", Stops)
        .select(col("doc_id"), col("n_chars"), col("pass"))
      val rep2 = graft.ops.QualityRules.repetitionSignals(d, "doc_id", "text", Seq(2))
        .select(col("doc_id"), col("top_chars").as("top2_chars"))
      val rep6 = graft.ops.QualityRules.repetitionSignals(d, "doc_id", "text", Seq(6))
        .select(col("doc_id"), col("dup_chars").as("dup6_chars"))
      val lm = graft.ops.NgramLm.docLmScoreCached(d, s"docs:$dir:even",
          "doc_id", "text", col("doc_id") % 2 === 0)
        .select(col("doc_id"), col("n_ctx"), col("sum_q"))
      rules
        .join(rep2, Seq("doc_id"), "left")
        .join(rep6, Seq("doc_id"), "left")
        .join(lm, Seq("doc_id"), "left")
        .withColumn("keep", when(
          col("pass") === 1 &&
            col("top2_chars") * 5 <= col("n_chars") &&
            col("dup6_chars") * 10 <= col("n_chars") * 3 &&
            col("n_ctx") > 0, 1L).otherwise(0L))
        .select(col("doc_id"), col("pass"), col("top2_chars"),
          col("dup6_chars"), col("n_ctx"), col("sum_q"), col("keep"))
    },
    Some {
      val stopsList = Stops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH m AS (SELECT doc_id,
          len($T)::BIGINT AS n_tok,
          (length(text) - (len($T) - 1))::BIGINT AS n_tchars,
          len(list_filter($T, t -> list_contains($stopsList, t)))::BIGINT AS n_stop,
          len(list_filter($T, t -> regexp_full_match(t, '[A-Za-z]+')))::BIGINT AS n_alpha,
          len(list_distinct($T))::BIGINT AS n_types
        FROM documents),
      rules AS (SELECT doc_id, n_tchars AS n_chars,
          (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1 ELSE 0 END)
          * (CASE WHEN n_tchars >= 3 * n_tok AND n_tchars <= 10 * n_tok
              THEN 1 ELSE 0 END)
          * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)
          * (CASE WHEN n_alpha * 5 >= 4 * n_tok THEN 1 ELSE 0 END)
          * (CASE WHEN n_types * 4 >= n_tok THEN 1 ELSE 0 END) AS pass
        FROM m),
      g2 AS (SELECT doc_id, gram, count(*) AS c FROM
          (SELECT doc_id, unnest(list_transform(range(1, len($T)),
            i -> array_to_string(($T)[i:i+1], ' '))) AS gram
           FROM documents WHERE len($T) >= 2)
        GROUP BY doc_id, gram),
      top2 AS (SELECT doc_id, (c * length(gram))::BIGINT AS top2_chars
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY c DESC, gram ASC) AS rk FROM g2) WHERE rk = 1),
      g6 AS (SELECT doc_id, gram, count(*) AS c FROM
          (SELECT doc_id, unnest(list_transform(range(1, len($T) - 4),
            i -> array_to_string(($T)[i:i+5], ' '))) AS gram
           FROM documents WHERE len($T) >= 6)
        GROUP BY doc_id, gram),
      dup6 AS (SELECT doc_id,
          sum(CASE WHEN c >= 2 THEN c * length(gram) ELSE 0 END)::BIGINT
            AS dup6_chars
        FROM g6 GROUP BY doc_id),
      tr AS (SELECT $T AS toks FROM documents
        WHERE doc_id % 2 = 0 AND len($T) >= 3),
      tpos AS (SELECT toks, unnest(range(1, len(toks) - 1)) AS i FROM tr),
      lmt AS (SELECT toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3,
          count(*) AS c3 FROM tpos GROUP BY 1, 2, 3),
      ctx AS (SELECT w1, w2, sum(c3)::BIGINT AS c_ctx FROM lmt
        GROUP BY w1, w2),
      dpos AS (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
        FROM (SELECT doc_id, $T AS toks FROM documents
          WHERE len($T) >= 3)),
      slots AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2,
          toks[i+2] AS w3 FROM dpos),
      lmj AS (SELECT s.doc_id, l.c3, x.c_ctx FROM slots s
        LEFT JOIN lmt l ON s.w1 = l.w1 AND s.w2 = l.w2 AND s.w3 = l.w3
        LEFT JOIN ctx x ON s.w1 = x.w1 AND s.w2 = x.w2),
      lm AS (SELECT doc_id, count(c_ctx)::BIGINT AS n_ctx,
          sum(CASE WHEN c_ctx IS NULL THEN NULL
            ELSE CAST((coalesce(c3, 0)::HUGEINT * 1073741824) // c_ctx
              AS BIGINT) END)::BIGINT AS sum_q
        FROM lmj GROUP BY doc_id)
      SELECT r.doc_id, r.pass::BIGINT AS pass, top2.top2_chars,
        dup6.dup6_chars, lm.n_ctx, lm.sum_q,
        (CASE WHEN r.pass = 1 AND top2.top2_chars * 5 <= r.n_chars
           AND dup6.dup6_chars * 10 <= r.n_chars * 3 AND lm.n_ctx > 0
           THEN 1 ELSE 0 END)::BIGINT AS keep
      FROM rules r
      LEFT JOIN top2 ON top2.doc_id = r.doc_id
      LEFT JOIN dup6 ON dup6.doc_id = r.doc_id
      LEFT JOIN lm ON lm.doc_id = r.doc_id"""
    })

  /** Content-defined chunking (TextClean.cdcChunks): boundaries where
    * the rolling 4-gram hash ≡ 0 (mod 16), so edits re-chunk only
    * their neighborhood — the sub-document dedup granularity. The
    * oracle rebuilds the identical cut set with list ops over the same
    * hex60 hashes.
    */
  private val q130 = QueryDef(
    "q130_cdc_chunks",
    (s, dir) => graft.ops.TextClean.cdcChunks(
      Tables.documents(s, dir), "doc_id", "text", gramTokens = 4, mask = 16),
    Some(s"""WITH t AS (SELECT doc_id, $T AS toks FROM documents),
      b AS (SELECT doc_id, toks, list_sort(list_distinct(list_concat(
          list_concat([0::BIGINT],
            list_filter(range(4, len(toks) + 1),
              p -> ${sqlHex60("array_to_string(toks[p-3:p], ' ')")} % 16 = 0)),
          [len(toks)::BIGINT]))) AS cuts FROM t),
      c AS (SELECT doc_id, toks, cuts, unnest(range(1, len(cuts))) AS i
        FROM b)
      SELECT doc_id, i::BIGINT AS chunk_idx,
        (cuts[i] + 1)::BIGINT AS start_tok,
        (cuts[i+1] - cuts[i])::BIGINT AS n_tok,
        ${sqlHex60("array_to_string(toks[cuts[i]+1:cuts[i+1]], ' ')")} AS chunk_hash
      FROM c"""))

  /** Chunk-level dedup savings per source (TextClean.cdcDedupSavings):
    * total CDC-chunk volume vs distinct-chunk volume — "how much of
    * this source is repeated content", the storage-dedup estimate
    * whole-doc hashing misses. Two stacked aggregations, all longs.
    */
  private val q131 = QueryDef(
    "q131_cdc_savings",
    (s, dir) => graft.ops.TextClean.cdcDedupSavings(
      Tables.documents(s, dir), "doc_id", "text", "source",
      gramTokens = 4, mask = 16),
    Some(s"""WITH t AS (SELECT doc_id, source, $T AS toks FROM documents),
      b AS (SELECT doc_id, source, toks, list_sort(list_distinct(list_concat(
          list_concat([0::BIGINT],
            list_filter(range(4, len(toks) + 1),
              p -> ${sqlHex60("array_to_string(toks[p-3:p], ' ')")} % 16 = 0)),
          [len(toks)::BIGINT]))) AS cuts FROM t),
      ch AS (SELECT source,
          (cuts[i+1] - cuts[i])::BIGINT AS n_tok,
          ${sqlHex60("array_to_string(toks[cuts[i]+1:cuts[i+1]], ' ')")} AS h
        FROM (SELECT source, toks, cuts, unnest(range(1, len(cuts))) AS i
          FROM b)),
      g AS (SELECT source, h, count(*) AS c, sum(n_tok) AS sum_tok,
          min(n_tok) AS min_tok
        FROM ch GROUP BY source, h)
      SELECT source, sum(c)::BIGINT AS n_chunks,
        count(*)::BIGINT AS n_distinct_chunks,
        sum(sum_tok)::BIGINT AS total_tokens,
        sum(min_tok)::BIGINT AS distinct_tokens,
        (sum(sum_tok) - sum(min_tok))::BIGINT AS saved_tokens
      FROM g GROUP BY source"""))

  /** Vocabulary growth curve (Corpus.vocabGrowth): distinct token
    * types accumulated after the first ceil(k·N/10) docs in doc_id
    * order — the Heaps'-law audit. Doc ranks come from the distributed
    * prefix sum, never a single-partition row_number; the oracle's
    * window form enumerates the identical ranks.
    */
  private val q132 = QueryDef(
    "q132_vocab_growth",
    (s, dir) => graft.ops.Corpus.vocabGrowth(
      Tables.documents(s, dir), "doc_id", "text", checkpoints = 10),
    Some(s"""WITH r AS (SELECT doc_id,
          row_number() OVER (ORDER BY doc_id) AS rk FROM documents),
      tok AS (SELECT doc_id, unnest($T) AS tok FROM documents),
      tm AS (SELECT tok, min(rk) AS rt FROM tok JOIN r USING (doc_id)
        GROUP BY tok),
      n AS (SELECT count(*)::BIGINT AS nd FROM documents),
      cp AS (SELECT k::BIGINT AS checkpoint,
          ((k * nd + 9) // 10)::BIGINT AS n_docs
        FROM n, range(1, 11) t(k))
      SELECT cp.checkpoint, cp.n_docs, count(tm.tok)::BIGINT AS vocab
      FROM cp LEFT JOIN tm ON tm.rt <= cp.n_docs
      GROUP BY cp.checkpoint, cp.n_docs"""))

  /** Symmetric int8 quantization audit (Quantize.int8Audit): per
    * vector the max-abs scale, positional code checksum, code sum and
    * the code range actually used — all computed map-side with
    * higher-order array functions (no explode, no shuffle, no UDF).
    * The only float op is x·127/maxabs in IEEE double, floored to a
    * long immediately, so every output but `maxabs` is an integer; the
    * oracle's unnest+group-by reaches the identical integers because
    * integer sums are order-independent.
    */
  private val q147 = QueryDef(
    "q147_int8_quant",
    (s, dir) => graft.ops.Quantize.int8Audit(
      Tables.embeddings(s, dir), "vec_id", "embedding"),
    Some("""WITH e AS (SELECT vec_id, embedding,
          list_max(list_transform(embedding,
            x -> abs(CAST(x AS DOUBLE)))) AS maxabs
        FROM embeddings),
      u AS (SELECT vec_id, maxabs, i,
          CASE WHEN maxabs = 0 THEN 0
            ELSE CAST(floor(CAST(embedding[i] AS DOUBLE) * 127 / maxabs)
              AS BIGINT) END AS q
        FROM e, LATERAL (SELECT unnest(generate_series(1,
          len(embedding))) AS i) s)
      SELECT vec_id, min(maxabs) AS maxabs, count(*)::BIGINT AS n_dims,
        sum(q * i)::BIGINT AS checksum, sum(q)::BIGINT AS sum_q,
        min(q)::BIGINT AS min_q, max(q)::BIGINT AS max_q
      FROM u GROUP BY vec_id"""))

  /** χ² discriminative-token selection (FeatureSelect.chiSquareTokens):
    * which tokens mark each source, one-vs-rest over document presence
    * counts. χ²·2²⁰ is ONE integer division of decimal(38,0)/HUGEINT
    * products — both engines divide identical integers (no float, no
    * log), so the selected set is bit-stable. The threshold 2²⁰ keeps
    * χ² ≥ 1 (support floors kill hapax noise first).
    */
  private val q148 = QueryDef(
    "q148_chi2_tokens",
    (s, dir) => graft.ops.FeatureSelect.chiSquareTokens(
      Tables.documents(s, dir), "text", "source", "doc_id",
      minDf = 5L, minChi2Q = 1048576L),
    Some("""WITH dt AS (SELECT DISTINCT doc_id, source AS cls, t AS token
        FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS t
          FROM documents) WHERE t <> ''),
      ct AS (SELECT cls, token, count(*)::HUGEINT AS a
        FROM dt GROUP BY 1, 2),
      dfq AS (SELECT token, sum(a)::HUGEINT AS df FROM ct GROUP BY 1
        HAVING sum(a) >= 5),
      cn AS (SELECT source AS cls, count(*)::HUGEINT AS n_cls
        FROM documents GROUP BY 1),
      nt AS (SELECT count(*)::HUGEINT AS n_total FROM documents),
      x AS (SELECT cls, token, a, df, n_cls, n_total,
          a * (n_total - n_cls - df + a) - (n_cls - a) * (df - a) AS adbc
        FROM ct JOIN dfq USING (token) JOIN cn USING (cls) CROSS JOIN nt
        WHERE df < n_total),
      sc AS (SELECT cls, token, a, df,
          ((1048576::HUGEINT * n_total * adbc * adbc)
            // (n_cls * (n_total - n_cls) * df * (n_total - df))) AS chi2_q
        FROM x)
      SELECT cls, token, a::BIGINT AS n_in_class, df::BIGINT AS df,
        chi2_q::BIGINT AS chi2_q
      FROM sc WHERE chi2_q >= 1048576"""))

  /** A-Priori frequent-pair mining (Itemsets.frequentPairs): token
    * pairs co-present in ≥ minSupport documents, with the frequent-
    * singleton prune applied BEFORE any pair expands — the pair blowup
    * is quadratic in each doc's frequent tokens only, and the i<j
    * expansion happens map-side from the doc's sorted frequent-token
    * set (the q102 collect shape over a corpus-scale domain).
    */
  private val q149 = QueryDef(
    "q149_frequent_pairs",
    (s, dir) => graft.ops.Itemsets.frequentPairs(
      Tables.documents(s, dir), "doc_id", "text", minSupport = 150L),
    Some("""WITH dt AS (SELECT DISTINCT doc_id, t AS token
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          FROM documents) WHERE t <> ''),
      f AS (SELECT token FROM dt GROUP BY token HAVING count(*) >= 150),
      ft AS (SELECT doc_id, token FROM dt JOIN f USING (token))
      SELECT a.token AS token_a, b.token AS token_b,
        count(*)::BIGINT AS support
      FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2 HAVING count(*) >= 150"""))

  /** BM25-family lexical ranking (Retrieval.bm25Rank) against a
    * 3-term query: rational idf (the q66 rule — monotone in df, no
    * log) × the exact k1=6/5, b=3/4 tf-saturation/length-norm ratio,
    * every division an integer division of decimal(38,0)/HUGEINT
    * products. df aggregation only over the matching terms (filter
    * before the agg), totals broadcast, TakeOrderedAndProject top-k.
    */
  private val q154 = QueryDef(
    "q154_bm25",
    (s, dir) => graft.ops.Retrieval.bm25Rank(
      Tables.documents(s, dir), "doc_id", "text",
      Seq("spark", "table", "hash"), k = 20),
    Some("""WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
        FROM documents),
      dl AS (SELECT id, count(*)::HUGEINT AS dl FROM tok GROUP BY id),
      tot AS (SELECT count(*)::HUGEINT AS n_docs, sum(dl)::HUGEINT AS t_tokens
        FROM dl),
      qt AS (SELECT id, w FROM tok WHERE w IN ('spark', 'table', 'hash')),
      dfq AS (SELECT w, count(DISTINCT id)::HUGEINT AS df FROM qt GROUP BY w),
      tf AS (SELECT id, w, count(*)::HUGEINT AS tf FROM qt GROUP BY id, w),
      c AS (SELECT tf.id,
          ((1048576::HUGEINT * (2 * (n_docs - df) + 1) // (2 * df + 1))
           * (1048576::HUGEINT * 22 * t_tokens * tf
              // (10::HUGEINT * t_tokens * tf + 3 * t_tokens
                  + 9::HUGEINT * dl.dl * n_docs))
           // 1048576) AS c
        FROM tf JOIN dfq USING (w) JOIN dl ON dl.id = tf.id CROSS JOIN tot)
      SELECT id AS doc_id, sum(c)::BIGINT AS score_q FROM c GROUP BY id
      ORDER BY score_q DESC, doc_id LIMIT 20"""))

  /** Deterministic Johnson–Lindenstrauss ±1 projection
    * (Quantize.jlProject): 64-dim embeddings → 16 dims with the sign
    * matrix derived from hex60("j:i") — matrix-free plan literals,
    * coordinates quantized to ⌊x·2²⁰⌋ longs BEFORE summing so every
    * output coordinate is an order-independent integer. One map pass,
    * no shuffle before the long-melt.
    */
  private val q157 = QueryDef(
    "q157_jl_project",
    (s, dir) => graft.ops.Quantize.jlProject(
      Tables.embeddings(s, dir), "vec_id", "embedding",
      inDims = 64, outDims = 16),
    Some("""WITH u AS (SELECT vec_id, i,
          CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576) AS BIGINT) AS xq
        FROM embeddings,
          LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) s
        WHERE len(embedding) = 64),
      g AS (SELECT vec_id, j,
          sum(CASE WHEN ('0x' || substr(md5(j::VARCHAR || ':'
                || (i - 1)::VARCHAR), 1, 15))::BIGINT % 2 = 0
            THEN xq ELSE -xq END)::BIGINT AS y_q
        FROM u, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) t
        GROUP BY vec_id, j)
      SELECT vec_id, j::BIGINT AS j, y_q FROM g"""))

  /** Deterministic farthest-point k-center seeding
    * (Similarity.farthestPointSeeds): 4 seeds, each round one corpus
    * pass with the chosen seeds as literal vectors and a
    * TakeOrderedAndProject(1) argmax over exact quantized squared-L2
    * integers. The oracle replays the greedy trajectory UNROLLED
    * (chained argmax CTEs) — both must agree seed-for-seed because
    * every comparison is of identical integers.
    */
  private val q158 = QueryDef(
    "q158_kcenter_seeds",
    (s, dir) => graft.ops.Similarity.farthestPointSeeds(
      Tables.embeddings(s, dir), "vec_id", "embedding", k = 4),
    Some {
      def dist(aq: String, sq: String) =
        s"list_sum(list_transform(range(1, len($aq) + 1), " +
          s"i -> (($aq)[i] - ($sq)[i]) * (($aq)[i] - ($sq)[i])))::BIGINT"
      s"""WITH q AS (SELECT vec_id AS id, list_transform(embedding,
            x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS xq
          FROM embeddings),
        s1 AS (SELECT id, xq FROM q ORDER BY id LIMIT 1),
        d1 AS (SELECT q.id, ${dist("q.xq", "s.xq")} AS d FROM q, s1 s),
        s2 AS (SELECT d1.id, d1.d, q.xq FROM d1 JOIN q ON q.id = d1.id
          ORDER BY d1.d DESC, d1.id LIMIT 1),
        d2 AS (SELECT q.id, least(d1.d, ${dist("q.xq", "s.xq")}) AS d
          FROM q JOIN d1 ON d1.id = q.id, s2 s),
        s3 AS (SELECT d2.id, d2.d, q.xq FROM d2 JOIN q ON q.id = d2.id
          ORDER BY d2.d DESC, d2.id LIMIT 1),
        d3 AS (SELECT q.id, least(d2.d, ${dist("q.xq", "s.xq")}) AS d
          FROM q JOIN d2 ON d2.id = q.id, s3 s),
        s4 AS (SELECT d3.id, d3.d, q.xq FROM d3 JOIN q ON q.id = d3.id
          ORDER BY d3.d DESC, d3.id LIMIT 1)
        SELECT 1::BIGINT AS rank, id AS vec_id, 0::BIGINT AS d2_q FROM s1
        UNION ALL SELECT 2::BIGINT, id, d::BIGINT FROM s2
        UNION ALL SELECT 3::BIGINT, id, d::BIGINT FROM s3
        UNION ALL SELECT 4::BIGINT, id, d::BIGINT FROM s4"""
    })

  /** Matryoshka prefix-energy audit (Quantize.prefixEnergyAudit): the
    * squared-mass fraction the first 8/16/32 coordinates retain,
    * quantize-then-square with one decimal division at the end —
    * map-side only, the ×3 melt is the sole fan-out.
    */
  private val q160 = QueryDef(
    "q160_matryoshka",
    (s, dir) => graft.ops.Quantize.prefixEnergyAudit(
      Tables.embeddings(s, dir), "vec_id", "embedding", Seq(8, 16, 32)),
    Some("""WITH x AS (SELECT vec_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS xq
        FROM embeddings),
      s AS (SELECT vec_id, list_transform(xq, v -> v * v) AS sq FROM x),
      t AS (SELECT vec_id, sq, list_sum(sq)::BIGINT AS tot FROM s),
      p AS (SELECT vec_id, unnest([8, 16, 32])::BIGINT AS p, sq, tot FROM t)
      SELECT vec_id, p,
        CASE WHEN tot > 0 THEN
          ((1048576::HUGEINT * list_sum(sq[1:p])) // tot)::BIGINT
        END AS energy_q
      FROM p"""))

  /** Payload byte-class histogram (Multimodal.byteHistogram): the
    * content-sniffing audit before decode — 16 byte-class counts +
    * mass fractions per payload from one compiled kernel pass, zeros
    * included so the shape vector is always complete. The oracle
    * recomputes the classes character-wise (payloads here are ASCII
    * text bytes, so ord//16 IS the byte class).
    */
  private val q163 = QueryDef(
    "q163_byte_histogram",
    (s, dir) => graft.ops.Multimodal.byteHistogram(
      graft.ops.Multimodal.ingest(
        Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id", buckets = 16),
    Some("""WITH b AS (SELECT doc_id, ord(substr(text, i, 1)) // 16 AS bucket
        FROM documents,
          LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) s
        WHERE len(text) > 0),
      c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2),
      l AS (SELECT doc_id, len(text)::BIGINT AS len FROM documents
        WHERE len(text) > 0),
      d AS (SELECT unnest(generate_series(0, 15))::BIGINT AS bucket)
      SELECT l.doc_id, d.bucket, coalesce(c.n, 0)::BIGINT AS n,
        ((1048576 * coalesce(c.n, 0)) // l.len)::BIGINT AS frac_q
      FROM l CROSS JOIN d
      LEFT JOIN c ON c.doc_id = l.doc_id AND c.bucket = d.bucket"""))

  /** Hard-negative mining (Similarity.hardNegatives): per query, the
    * cell-mates ranked 4–8 by EXACT integer quantized dot product —
    * close enough to be hard contrastive negatives, past the presumed
    * positives. Cell assignment is the q23 oracle-proven argmax;
    * ranking integers kills float-order ambiguity; the rank reduction
    * is the bounded-heap groupedTopK.
    */
  private val q165 = QueryDef(
    "q165_hard_negatives",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      Similarity.hardNegatives(e, "vec_id", "embedding", cents,
        queryIds = Seq(0L, 17L, 42L), skip = 3, k = 5)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      asg AS (SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      xq AS (SELECT vec_id, cell_id, list_transform(embedding,
          x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT)) AS xq
        FROM asg),
      qs AS (SELECT vec_id AS q_id, cell_id, xq AS qxq FROM xq
        WHERE vec_id IN (0, 17, 42)),
      sc AS (SELECT qs.q_id, x.vec_id,
          list_sum(list_transform(range(1, len(x.xq) + 1),
            i -> x.xq[i] * qs.qxq[i]))::BIGINT AS dot
        FROM xq x JOIN qs ON qs.cell_id = x.cell_id
          AND x.vec_id <> qs.q_id),
      r AS (SELECT q_id, vec_id, dot, row_number() OVER (PARTITION BY q_id
          ORDER BY dot DESC, vec_id ASC) AS rank FROM sc)
      SELECT q_id, rank::BIGINT AS rank, vec_id, dot AS dot_q
      FROM r WHERE rank > 3 AND rank <= 8"""))

  /** IVF index-health audit (Similarity.ivfCellStats): per-cell
    * member counts + quantized share/balance — the re-seed decision
    * BEFORE a corpus-scale index build (a hot cell serializes every
    * probe that lands on it). Cell assignment is the q23 contract; the
    * audit itself is one |cells|-row aggregation.
    */
  private val q168 = QueryDef(
    "q168_ivf_stats",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      Similarity.ivfCellStats(e, "embedding", cents)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      asg AS (SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")}, '-infinity'::DOUBLE) DESC,
              c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      c AS (SELECT cell_id, count(*)::BIGINT AS n_members FROM asg
        GROUP BY 1),
      t AS (SELECT sum(n_members)::BIGINT AS n FROM c)
      SELECT cell_id, n_members,
        ((1048576 * n_members) // n)::BIGINT AS share_q,
        ((1048576 * n_members * 8) // n)::BIGINT AS balance_q
      FROM c CROSS JOIN t"""))

  /** PMI collocations (TfIdf.pmiPairs): frequent token pairs scored by
    * the quantized independence ratio ⌊2²⁰·N·c_xy/(c_x·c_y)⌋ — kept
    * only ABOVE independence (≥ 2²⁰), the phrase-mining cut q149's raw
    * support cannot make. A-Priori prune bounds the pair blowup;
    * singleton df rides the pair rows via vocabulary-sized joins.
    */
  private val q169 = QueryDef(
    "q169_pmi_pairs",
    (s, dir) => graft.ops.TfIdf.pmiPairs(
      Tables.documents(s, dir), "doc_id", "text",
      minSupport = 150L, minPmiQ = 1048576L),
    Some("""WITH dt AS (SELECT DISTINCT doc_id, t AS token
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t
          FROM documents) WHERE t <> ''),
      f AS (SELECT token FROM dt GROUP BY token HAVING count(*) >= 150),
      ft AS (SELECT doc_id, token FROM dt JOIN f USING (token)),
      p AS (SELECT a.token AS token_a, b.token AS token_b,
          count(*)::BIGINT AS support
        FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.token < b.token
        GROUP BY 1, 2 HAVING count(*) >= 150),
      d AS (SELECT token, count(*)::HUGEINT AS df FROM dt GROUP BY 1),
      n AS (SELECT count(DISTINCT doc_id)::HUGEINT AS n FROM dt),
      s AS (SELECT token_a, token_b, support,
          ((1048576::HUGEINT * n.n * support) // (da.df * db.df))::BIGINT
            AS pmi_q
        FROM p JOIN d da ON da.token = p.token_a
        JOIN d db ON db.token = p.token_b CROSS JOIN n)
      SELECT token_a, token_b, support, pmi_q FROM s
      WHERE pmi_q >= 1048576"""))

  /** Group-aware 5-fold split report (Sample.groupFolds): every event
    * of a user lands in one fold — the leakage-free boundary q38's
    * row-level hash split cannot give — and the report shows the folds
    * came out balanced. Fold assignment is a map-side hash; the audit
    * is two stacked aggregations (never a distinct Expand).
    */
  private val q174 = QueryDef(
    "q174_group_split",
    (s, dir) => graft.ops.Sample.groupFoldReport(
      Tables.events(s, dir), "user_id", k = 5),
    Some(s"""WITH g AS (SELECT
          ${OracleSql.hex60(
            "'gf0:' || CASE WHEN user_id IS NULL THEN '0' " +
              "ELSE '1' || user_id::VARCHAR END")} % 5
            AS fold,
          user_id, count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT fold, count(*)::BIGINT AS n_groups, sum(n)::BIGINT AS n_rows
      FROM g GROUP BY fold"""))

  /** Length-bucket padding-waste report (Batching.paddingReport) for
    * boundary set {64,128,256,512} over the documents' token counts:
    * the exact wasted-compute fraction per bucket a batching config
    * review reads. Bucket assignment map-side, one aggregation.
    */
  private val q175 = QueryDef(
    "q175_pad_waste",
    (s, dir) => graft.ops.Batching.paddingReport(
      Tables.documents(s, dir)
        .select(size(split(col("text"), " ", -1)).cast("long").as("n_tok")),
      "n_tok", Seq(64, 128, 256, 512)),
    Some(s"""WITH b AS (SELECT len($T)::BIGINT AS n FROM documents),
      a AS (SELECT CASE WHEN n <= 64 THEN 64 WHEN n <= 128 THEN 128
          WHEN n <= 256 THEN 256 ELSE 512 END::BIGINT AS bucket, n FROM b)
      SELECT bucket, count(*)::BIGINT AS n_rows,
        sum(least(n, bucket))::BIGINT AS real_tokens,
        (count(*) * bucket)::BIGINT AS padded_tokens,
        ((1048576 * (count(*) * bucket - sum(least(n, bucket))))
          // (count(*) * bucket))::BIGINT AS pad_waste_q
      FROM a GROUP BY bucket"""))

  /** LSH τ-sweep operating curve (Dedup.lshOperatingCurve): the q98
    * confusion matrix at SIX candidate thresholds from one calibration
    * pass — the curve that picks the dedup threshold. The τ fan-out
    * multiplies candidate pairs only, map-side.
    */
  private val q176 = QueryDef(
    "q176_lsh_curve",
    (s, dir) => graft.ops.Dedup.lshOperatingCurve(
      Tables.documents(s, dir), "doc_id", "text",
      shingleWords = 3, bands = 4, rowsPerBand = 4),
    Some(s"""SELECT t.tau_pct::BIGINT AS tau_pct,
        count(*)::BIGINT AS n_candidates,
        count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0 THEN 1 END)::BIGINT
          AS n_pred,
        count(CASE WHEN c.jaccard >= t.tau_pct / 100.0 THEN 1 END)::BIGINT
          AS n_true,
        count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0
          AND c.jaccard >= t.tau_pct / 100.0 THEN 1 END)::BIGINT AS n_tp,
        CASE WHEN count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0 THEN 1 END) > 0
          THEN count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0
              AND c.jaccard >= t.tau_pct / 100.0 THEN 1 END)::DOUBLE
            / count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0 THEN 1 END)::DOUBLE
          END AS precision,
        CASE WHEN count(CASE WHEN c.jaccard >= t.tau_pct / 100.0 THEN 1 END) > 0
          THEN count(CASE WHEN c.est_jaccard >= t.tau_pct / 100.0
              AND c.jaccard >= t.tau_pct / 100.0 THEN 1 END)::DOUBLE
            / count(CASE WHEN c.jaccard >= t.tau_pct / 100.0 THEN 1 END)::DOUBLE
          END AS recall_in_candidates
      FROM ($sqlCalibration) c
      CROSS JOIN (SELECT unnest([30, 40, 50, 60, 70, 80]) AS tau_pct) t
      GROUP BY t.tau_pct"""))

  /** Per-payload byte-class MIX audit (Multimodal.byteClassMix): the
    * q163 histogram reduced to a one-row verdict — dominant class,
    * exact mass share, mixed flag below 0.8·2²⁰. Argmax is one
    * max(struct), no window; the gate a media feed crosses pre-decode.
    */
  private val q178 = QueryDef(
    "q178_byte_mix",
    (s, dir) => graft.ops.Multimodal.byteClassMix(
      graft.ops.Multimodal.ingest(
        Tables.documents(s, dir), "doc_id", "text", "text/plain"),
      "doc_id", buckets = 16),
    Some("""WITH b AS (SELECT doc_id, ord(substr(text, i, 1)) // 16 AS bucket
        FROM documents,
          LATERAL (SELECT unnest(generate_series(1, len(text))) AS i) s
        WHERE len(text) > 0),
      c AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2),
      a AS (SELECT doc_id, bucket, n,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY n DESC, bucket ASC) AS rk,
          sum(n) OVER (PARTITION BY doc_id) AS total
        FROM c)
      SELECT doc_id, bucket::BIGINT AS top_bucket, n::BIGINT AS top_n,
        total::BIGINT AS total_bytes,
        ((1048576 * n) // total)::BIGINT AS top_share_q,
        (CASE WHEN (1048576 * n) // total < 838860 THEN 1 ELSE 0 END)::BIGINT
          AS mixed
      FROM a WHERE rk = 1"""))

  /** Vocabulary coverage sweep (Corpus.coverageAtK): exact top-k-type
    * occurrence coverage at four candidate vocabulary sizes — the
    * tokenizer-budget curve — computed entirely on the frequency
    * DOMAIN (ties contribute identical mass, so no per-token ranking
    * and no row_number over the freq-1 tail ever happens).
    */
  private val q179 = QueryDef(
    "q179_vocab_coverage",
    (s, dir) => graft.ops.Corpus.coverageAtK(
      Tables.documents(s, dir), "text", Seq(5, 10, 20, 50)),
    Some(s"""WITH tok AS (SELECT unnest($T) AS tok FROM documents),
      fr AS (SELECT tok, count(*) AS f FROM tok GROUP BY tok),
      dom AS (SELECT f, count(*) AS types, f * count(*) AS mass
        FROM fr GROUP BY f),
      cum AS (SELECT f,
          sum(types) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
            AS cum_types,
          sum(mass) OVER (ORDER BY f DESC ROWS UNBOUNDED PRECEDING)
            AS cum_mass,
          sum(types) OVER () AS vocab, sum(mass) OVER () AS total
        FROM dom),
      ks AS (SELECT unnest([5, 10, 20, 50])::BIGINT AS k),
      sel AS (SELECT ks.k, c.cum_types, c.cum_mass, c.f,
          row_number() OVER (PARTITION BY ks.k ORDER BY c.cum_types ASC)
            AS rk
        FROM ks JOIN cum c ON c.cum_types >= ks.k),
      tot AS (SELECT max(vocab) AS vocab, max(total) AS total FROM cum)
      SELECT ks.k::BIGINT AS k, tot.vocab::BIGINT AS vocab,
        least(ks.k, tot.vocab)::BIGINT AS n_types,
        coalesce(s.cum_mass - (s.cum_types - ks.k) * s.f, tot.total)::BIGINT
          AS covered_tokens,
        tot.total::BIGINT AS total_tokens,
        ((1048576 * coalesce(s.cum_mass - (s.cum_types - ks.k) * s.f,
          tot.total)) // tot.total)::BIGINT AS coverage_q
      FROM ks CROSS JOIN tot
      LEFT JOIN (SELECT * FROM sel WHERE rk = 1) s ON s.k = ks.k"""))

  /** Per-language character-trigram rank profiles (LangId
    * .charNgramProfiles — Cavnar–Trenkle 1994): top-30 grams per
    * labeled language by (count desc, gram asc). The profile build is
    * one (lang, gram) count plus a rank window bounded by the
    * character-set trigram domain, never the corpus.
    */
  private val q183 = QueryDef(
    "q183_langid_profile",
    (s, dir) => graft.ops.LangId.profilesCached(
      Tables.documents(s, dir), s"docs:$dir", "text", "lang", n = 3, topK = 30),
    Some("""WITH g AS (SELECT lang,
          unnest(list_transform(range(1, length(text) - 1),
            i -> substring(text, i, 3))) AS gram
        FROM documents WHERE length(text) >= 3),
      cnt AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2)
      SELECT lang, gram, rank FROM (SELECT lang, gram,
        row_number() OVER (PARTITION BY lang
          ORDER BY c DESC, gram ASC)::BIGINT AS rank FROM cnt)
      WHERE rank <= 30"""))

  /** Language-ID confusion matrix (LangId.confusion): every document
    * classified by minimal out-of-place distance between its own
    * top-20 trigram ranks and the q183 profiles (absent grams cost
    * topK), tallied against the labeled lang. The oracle replays the
    * full train→classify pipeline in SQL — profiles, per-doc rank
    * windows, the matched-gram distance join, the (doc × language)
    * spine, and the (dist asc, lang asc) argmin.
    */
  private val q184 = QueryDef(
    "q184_langid_confusion",
    (s, dir) => graft.ops.LangId.confusionWith(
      Tables.documents(s, dir), "doc_id", "text", "lang",
      graft.ops.LangId.profilesCached(
        Tables.documents(s, dir), s"docs:$dir", "text", "lang",
        n = 3, topK = 30),
      n = 3, topK = 30, docTopM = 20),
    Some("""WITH g AS (SELECT lang, doc_id,
          unnest(list_transform(range(1, length(text) - 1),
            i -> substring(text, i, 3))) AS gram
        FROM documents WHERE length(text) >= 3),
      pc AS (SELECT lang, gram, count(*) AS c FROM g GROUP BY 1, 2),
      prof AS (SELECT lang, gram, rank FROM (SELECT lang, gram,
          row_number() OVER (PARTITION BY lang
            ORDER BY c DESC, gram ASC)::BIGINT AS rank FROM pc)
        WHERE rank <= 30),
      dc AS (SELECT doc_id, gram, count(*) AS c FROM g GROUP BY 1, 2),
      dp AS (SELECT doc_id, gram, drank FROM (SELECT doc_id, gram,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY c DESC, gram ASC)::BIGINT AS drank FROM dc)
        WHERE drank <= 20),
      langs AS (SELECT DISTINCT lang FROM prof),
      md AS (SELECT doc_id, count(*) AS m_doc FROM dp GROUP BY doc_id),
      matched AS (SELECT dp.doc_id, prof.lang,
          sum(abs(dp.drank - prof.rank)) AS mdist, count(*) AS mcnt
        FROM dp JOIN prof USING (gram) GROUP BY 1, 2),
      spine AS (SELECT d.doc_id, coalesce(md.m_doc, 0) AS m_doc, l.lang
        FROM (SELECT DISTINCT doc_id FROM documents) d
        LEFT JOIN md USING (doc_id) CROSS JOIN langs l),
      scored AS (SELECT s.doc_id, s.lang,
          coalesce(m.mdist, 0) + (s.m_doc - coalesce(m.mcnt, 0)) * 30
            AS dist
        FROM spine s LEFT JOIN matched m
          ON m.doc_id = s.doc_id AND m.lang = s.lang),
      pred AS (SELECT doc_id, lang AS pred_lang FROM scored
        QUALIFY row_number() OVER (PARTITION BY doc_id
          ORDER BY dist ASC, lang ASC) = 1)
      SELECT d.lang, p.pred_lang, count(*)::BIGINT AS n_docs
      FROM documents d JOIN pred p USING (doc_id)
      GROUP BY 1, 2"""))

  /** Portable HyperLogLog cardinality report (Sketch.hllReport, p=8)
    * over the repeated-key o_custkey stream of orders (~10k distinct
    * at sf0.01 — comfortably inside the raw estimator's n ≫ 2.5m
    * regime, where the omitted small-range correction is irrelevant):
    * register index = top 8 hash bits, ρ via the bin()-length trick
    * (no floats), the harmonic sum quantized as Σ⌊2^40/2^ρ⌋ exact
    * longs. The oracle rebuilds the identical 256-register state in
    * SQL and shares the single closing double division.
    */
  private val q185 = QueryDef(
    "q185_hll_custkeys",
    (s, dir) => graft.ops.Sketch.hllReport(
      Tables.orders(s, dir).select(col("o_custkey").as("tok")), "tok", p = 8),
    Some(s"""WITH tok AS (SELECT o_custkey AS tok FROM orders),
      h AS (SELECT ${sqlHex60("tok::VARCHAR")} AS h FROM tok
        WHERE tok IS NOT NULL),
      rw AS (SELECT h >> 52 AS reg, h & ${(1L << 52) - 1} AS w FROM h),
      reg AS (SELECT reg, max(CASE WHEN w > 0
          THEN 53 - length(bin(w)) ELSE 53 END) AS rho
        FROM rw GROUP BY reg),
      agg AS (SELECT count(*) AS n_nonzero,
          sum(${1L << 40} >> rho::INTEGER) AS s_obs
        FROM reg)
      SELECT 256::BIGINT AS m, n_nonzero::BIGINT AS n_nonzero,
        (coalesce(s_obs, 0) + (256 - coalesce(n_nonzero, 0))
          * ${1L << 40})::BIGINT AS sum_q,
        ${0.7213 / (1.0 + 1.079 / 256)}::DOUBLE * 65536.0
          * ${(1L << 40).toDouble}::DOUBLE
          / ((coalesce(s_obs, 0) + (256 - coalesce(n_nonzero, 0))
            * ${1L << 40})::DOUBLE) AS est
      FROM agg"""))

  /** Incremental exact-substring dedup
    * (TextClean.incrementalRepeatedSpans): the maximal repeated spans
    * of an ARRIVING batch (source src3) against corpus ∪ batch, given
    * only the corpus's persisted window-hash index — the corpus text
    * is never rescanned, the q54 incremental shape at the span level.
    * Spec-pinned equivalent to the batch slice of q194 over the
    * union; the oracle replays index-build → count-merge → coverage →
    * islands in SQL.
    */
  private val q198 = QueryDef(
    "q198_incremental_spans",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // The incremental result is spec-pinned EQUAL to the batch-doc
      // slice of the full-union span table (PipelineSpec "incremental
      // repeated spans == batch slice of the full-union run"), so the
      // query serves from the SAME session-cached windows+islands
      // substrate q194/q195 already share, sliced to the arriving
      // batch — instead of paying its own corpus-index pass + batch
      // window pass + batch reassembly pass (3 tokenize scans). With
      // the cache off (the plan-contract sweep) the genuine
      // incremental path runs, so the operator's declared topology
      // stays audited; the operator itself is unchanged and keeps its
      // own spec/property coverage.
      if (graft.util.SessionCache.enabled(s))
        TextClean.repeatedSpanIntervalsCached(
            docs, s"docs:$dir", "doc_id", "text", k = 3, minDocs = 2)
          .join(docs.filter(col("source") === "src3").select(col("doc_id")),
            Seq("doc_id"), "left_semi")
      else {
        val idx = TextClean.spanIndex(
          docs.filter(col("source") =!= "src3"), "doc_id", "text", k = 3)
        TextClean.incrementalRepeatedSpans(
          docs.filter(col("source") === "src3"), idx, "doc_id", "text",
          k = 3, minDocs = 2)._1
      }
    },
    Some(s"""WITH cbase AS (SELECT doc_id, $T AS toks FROM documents
        WHERE source <> 'src3'),
      bbase AS (SELECT doc_id, $T AS toks FROM documents
        WHERE source = 'src3'),
      cwin AS (SELECT doc_id,
          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos, toks
        FROM cbase),
      cwh AS (SELECT unhex(md5(array_to_string(toks[pos:pos+2], ' '))) AS wh,
          doc_id FROM cwin),
      cidx AS (SELECT wh, count(DISTINCT doc_id) AS n_docs FROM cwh GROUP BY wh),
      bwin AS (SELECT doc_id,
          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos, toks
        FROM bbase),
      bwh AS (SELECT doc_id, pos,
          unhex(md5(array_to_string(toks[pos:pos+2], ' '))) AS wh FROM bwin),
      bidx AS (SELECT wh, count(DISTINCT doc_id) AS n_docs FROM bwh GROUP BY wh),
      merged AS (SELECT wh, sum(n_docs) AS n_docs FROM
        (SELECT * FROM cidx UNION ALL SELECT * FROM bidx) GROUP BY wh),
      dup AS (SELECT wh FROM merged WHERE n_docs >= 2),
      cov AS (SELECT DISTINCT doc_id, pos + off AS pos
        FROM bwh JOIN dup USING (wh) CROSS JOIN range(0, 3) AS o(off)),
      isl AS (SELECT doc_id, pos,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM cov),
      spans AS (SELECT doc_id, min(pos)::BIGINT AS span_start,
          count(*)::BIGINT AS span_len FROM isl GROUP BY doc_id, grp)
      SELECT s.doc_id, s.span_start, s.span_len,
        array_to_string(
          b.toks[s.span_start : s.span_start + s.span_len - 1], ' ')
          AS span_text
      FROM spans s JOIN bbase b USING (doc_id)"""))

  /** Span-index lifecycle report (the q198 state's maintenance view):
    * the corpus ingests as three disjoint doc_id%3 batches into the
    * AGED window-hash index ([[TextClean.spanIndexAged]]/
    * [[TextClean.spanIndexMergeAged]]), and the report prices a
    * watermark-1 [[TextClean.spanIndexCompact]] per recency class —
    * how many window digests each last-seen batch holds, how many are
    * duplicated (always retained), how many are singletons, and how
    * many rows survive the prune. For last_batch <= watermark only
    * the duplicated rows survive — the pruned singletons are exactly
    * the accepted re-pairing loss SpanIndexSpec pins. The oracle
    * rebuilds the aged index relationally: batches are doc-disjoint,
    * so distinct-doc counts add and recency is max(doc_id % 3).
    */
  private val q199 = QueryDef(
    "q199_span_index_prune",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val idx = TextClean.spanIndexMergeAged((0L to 2L).map(b =>
        TextClean.spanIndexAged(
          docs.filter(pmod(col("doc_id"), lit(3L)) === b),
          "doc_id", "text", batchId = b, k = 3)))
      // ONE aggregation prices the compaction: n_retained counts the
      // rows spanIndexCompact(watermark=1) keeps, via the SAME
      // predicate expression the real prune applies
      // (TextClean.spanIndexKeepCond — SpanIndexSpec pins it), folded
      // into the same pass as the other counters. The former separate
      // compact→aggregate→left-join leg re-ran the aged-index
      // aggregation a second time and paid a join to re-align rows the
      // first pass already held.
      idx.groupBy(col("last_batch"))
        .agg(count(lit(1)).as("n_windows"),
          count(when(col("n_docs") >= 2, 1)).as("n_dup"),
          count(when(col("n_docs") === 1, 1)).as("n_singleton"),
          count(when(TextClean.spanIndexKeepCond(1L), 1)).as("n_retained"))
        .select(col("last_batch"), col("n_windows"), col("n_dup"),
          col("n_singleton"), col("n_retained"))
    },
    Some(s"""WITH base AS (SELECT doc_id, $T AS toks FROM documents),
      win AS (SELECT doc_id,
          unnest(range(1, greatest(len(toks) - 2, 0) + 1)) AS pos, toks
        FROM base),
      wh AS (SELECT unhex(md5(array_to_string(toks[pos:pos+2], ' '))) AS wh,
          doc_id FROM win),
      idx AS (SELECT wh, count(DISTINCT doc_id) AS n_docs,
          max(doc_id % 3) AS last_batch FROM wh GROUP BY wh)
      SELECT last_batch, count(*) AS n_windows,
        count(*) FILTER (WHERE n_docs >= 2) AS n_dup,
        count(*) FILTER (WHERE n_docs = 1) AS n_singleton,
        count(*) FILTER (WHERE n_docs >= 2 OR last_batch > 1) AS n_retained
      FROM idx GROUP BY 1"""))

  /** Bottom-k (KMV) sketch per source: the k smallest 60-bit key
    * hashes double as (a) a deterministic, RNG-free uniform sample of
    * each source's keys — hash-order selection is a pure function of
    * the data, reproducible on any engine or partitioning — and (b)
    * the k-minimum-values distinct-count estimator
    * `(k−1)·2⁶⁰ ÷ h_k` (Bar-Yossef et al. 2002; public method),
    * integer-exact to the one final division. Scale shape: the
    * selection runs in [[graft.functions.TopKHeap.minK]] — a bounded
    * LONG-key heap partial aggregate, so the exchange carries ≤ k
    * rows per (source × partition) and no Window ever sorts the
    * corpus; 60-bit hashes must stay longs end-to-end (a double
    * mantissa would corrupt hash order — minK's reason to exist).
    * Sources with fewer than k keys report their exact count.
    */
  private val q200 = QueryDef(
    "q200_kmv_sketch",
    (s, dir) => {
      val k = 8
      Tables.documents(s, dir)
        .select(col("source"),
          graft.functions.TextKernels.hex60(col("doc_id").cast("string")).as("h"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.TopKHeap.minK(col("h"), col("h"), k).as("bk"))
        .select(col("source"), col("n_docs"),
          size(col("bk")).cast("long").as("k_used"),
          expr("bk[size(bk)-1].key").as("h_k"))
        .select(col("source"), col("n_docs"), col("k_used"), col("h_k"),
          when(col("k_used") < k, col("k_used"))
            .otherwise(expr("(7 * 1152921504606846976L) div h_k"))
            .as("est_distinct"))
    },
    Some(s"""WITH h AS (SELECT source,
          ${sqlHex60("doc_id::VARCHAR")} AS h FROM documents),
      bk AS (SELECT source, h FROM h
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 8),
      agg AS (SELECT source, max(h) AS h_k, count(*) AS k_used
        FROM bk GROUP BY source),
      n AS (SELECT source, count(*) AS n_docs FROM h GROUP BY source)
      SELECT n.source, n.n_docs, a.k_used, a.h_k,
        CASE WHEN a.k_used < 8 THEN a.k_used
          ELSE (7 * 1152921504606846976) // a.h_k END AS est_distinct
      FROM n JOIN agg a USING (source)"""))

  /** Bloom-prefiltered benchmark decontamination with false-positive
    * accounting ([[graft.functions.SketchAgg.BloomSketchAgg]]): the
    * benchmark split's distinct 5-token windows build ONE 32768-bit
    * bloom state (broadcast as 4 KB of literal bytes); every training
    * window probes it MAP-SIDE, and only the bloom-hit survivors —
    * never the full corpus — reach the exact semi-join against the
    * benchmark window set. Per source: window count, bloom hits, and
    * exact hits; bloom never under-reports (no false negatives), so
    * `bloom_hits - exact_hits` is the measured false-positive cost the
    * prefilter pays for skipping the corpus-wide shuffle. q57/q112 are
    * the exact-join decontamination ops; this is their 100 TB
    * prefilter shape. The oracle replays every salted bit position
    * relationally, so the aggregate's update/merge/serialize path AND
    * the probe kernel are both hash-checked, false positives included.
    */
  private val q201 = QueryDef(
    "q201_bloom_decontam",
    (s, dir) => {
      val m = 32768
      val k = 3
      val toks = TextKernels.tokens(col("text"))
      val wins = when(size(toks) > 4,
        array_distinct(transform(sequence(lit(1), size(toks) - 4),
          p => concat_ws(" ", slice(toks, p, lit(5))))))
        .otherwise(array().cast("array<string>"))
      val split = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), explode(wins).as("w"),
          (graft.functions.TextKernels.hex60(col("doc_id").cast("string"))
            % 10 < 2).as("is_bench"))
      // the distinct bench-window set is tokenized ONCE per session
      // and pinned (SessionCache + Pin.cut): both downstream readers —
      // the bloom-state scalar subquery and the exact-confirm
      // left_semi — fold the pinned blocks instead of each replaying
      // the tokenize+window-explode over the bench slice (3 corpus-
      // derived passes → 1 full probe pass + 1 bench-slice pass).
      // Session-scoped, not per-invocation: an unconditional Pin.cut
      // here would leak one pinned copy per call and hide the bench
      // subtree from the plan audit; the cache builds once and honors
      // the `spark.graft.sessionCache=off` sweep switch.
      val benchW0 = split.filter(col("is_bench")).select(col("w")).distinct()
      val benchW =
        if (!graft.util.SessionCache.enabled(s)) benchW0
        else graft.util.SessionCache.cached(s, s"q201-benchw:$dir")(
          graft.util.Pin.cut(benchW0))
      // the 1-row bloom state rides as an UNCORRELATED SCALAR SUBQUERY
      // (the BloomJoin.prefilter shape): Spark executes the aggregate
      // once and folds the 4 KB of filter bytes into the probe as a
      // literal — zero joins, so the probe is a pure map-side filter
      // and no BroadcastNestedLoopJoin ever appears in the plan
      val bfState = org.apache.spark.sql.graft.expr.column(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          benchW.agg(
            graft.functions.SketchAgg.bloomSketch(col("w"), m, k).as("st"))
            .queryExecution.analyzed))
      val probed = split.filter(!col("is_bench"))
        .select(col("doc_id"), col("source"), col("w"))
        .withColumn("hit",
          graft.functions.SketchAgg.bloomContainsOf(bfState, col("w"), m, k))
      // window count, bloom hits AND exact hits in ONE pass over the
      // probe stream: the former separate exact-confirm aggregation
      // (filter hit → semi-join → groupBy) re-executed the whole
      // tokenize/window/probe lineage a second time — two corpus
      // passes for three counters. Exact membership rides the same
      // pass as a broadcast left join against the pinned bench-window
      // set (benchmark-sized): `w ∈ benchW ⇒ hit` (a bloom filter has
      // no false negatives), so count(non-null mark) equals the old
      // hit-filtered semi-join count exactly.
      probed
        .join(broadcast(benchW.withColumn("__bw", lit(1L))), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_windows"),
          count(when(col("hit"), 1)).as("bloom_hits"),
          count(col("__bw")).as("exact_hits"))
        .select(col("source"), col("n_windows"), col("bloom_hits"),
          col("exact_hits"))
    },
    Some(s"""WITH base AS (SELECT doc_id, source,
          ${sqlHex60("doc_id::VARCHAR")} % 10 < 2 AS is_bench,
          $T AS toks FROM documents),
      win0 AS (SELECT doc_id, source, is_bench,
          unnest(range(1, greatest(len(toks) - 4, 0) + 1)) AS p, toks
        FROM base),
      win AS (SELECT DISTINCT doc_id, source, is_bench,
          array_to_string(toks[p:p+4], ' ') AS w FROM win0),
      bw AS (SELECT DISTINCT w FROM win WHERE is_bench),
      pos AS (SELECT DISTINCT ${sqlHex60("'bl' || i || ':' || w")} % 32768 AS p
        FROM bw, (SELECT unnest(range(0, 3)) AS i) t),
      tw AS (SELECT doc_id, source, w FROM win WHERE NOT is_bench),
      probe AS (SELECT doc_id, w,
          ${sqlHex60("'bl' || i || ':' || w")} % 32768 AS p
        FROM tw, (SELECT unnest(range(0, 3)) AS i) t),
      hits AS (SELECT doc_id, w, count(*) AS nh FROM probe
        JOIN pos USING (p) GROUP BY doc_id, w),
      flag AS (SELECT t.source, t.w, coalesce(h.nh, 0) = 3 AS hit
        FROM tw t LEFT JOIN hits h USING (doc_id, w))
      SELECT source, count(*) AS n_windows,
        count(*) FILTER (WHERE hit) AS bloom_hits,
        count(*) FILTER (WHERE w IN (SELECT w FROM bw)) AS exact_hits
      FROM flag GROUP BY 1"""))

  /** Shard-built bloom states folded into the union's filter
    * ([[graft.functions.SketchAgg.BloomMergeAgg]]): three disjoint
    * doc_id%3 shards each build a 2048-bit filter over their document
    * texts in one pass, and the merge aggregate ORs the stored states
    * — bitwise OR is exactly set union, so the merged filter is
    * bit-identical to one built over the whole corpus (the
    * build-per-shard / merge-on-demand lifecycle of the HLL/CM
    * siblings q196–q197). Reports (n_set, fill_ppm) per shard and for
    * the merged state; the oracle recomputes every salted bit position
    * per shard and for the union, so both aggregates' states are
    * hash-checked bit-for-bit.
    */
  private val q202 = QueryDef(
    "q202_bloom_shard_union",
    (s, dir) => {
      val m = 2048
      val per = Tables.documents(s, dir)
        .groupBy(pmod(col("doc_id"), lit(3L)).as("batch"))
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.SketchAgg.bloomSketch(col("text"), m, 3).as("st"))
      val merged = per.agg(sum(col("n_docs")).as("n_docs"),
          graft.functions.SketchAgg.bloomMerge(col("st"), m).as("st"))
        .select(lit(-1L).as("batch"), col("n_docs"), col("st"))
      per.unionByName(merged)
        .select(col("batch"), col("n_docs"),
          graft.functions.SketchAgg.bloomReportOf(col("st"), m).as("r"))
        .select(col("batch"), col("n_docs"), col("r.m").as("m"),
          col("r.n_set").as("n_set"), col("r.fill_ppm").as("fill_ppm"))
    },
    Some(s"""WITH pos AS (SELECT doc_id % 3 AS batch,
          ${sqlHex60("'bl' || i || ':' || text")} % 2048 AS p
        FROM documents, (SELECT unnest(range(0, 3)) AS i) t),
      nd AS (SELECT doc_id % 3 AS batch, count(*) AS n_docs
        FROM documents GROUP BY 1),
      per AS (SELECT batch, count(DISTINCT p) AS n_set FROM pos GROUP BY 1),
      per_and_merged AS (
        SELECT nd.batch, nd.n_docs, per.n_set FROM nd
          JOIN per USING (batch)
        UNION ALL
        SELECT -1 AS batch, (SELECT count(*) FROM documents) AS n_docs,
          (SELECT count(DISTINCT p) FROM pos) AS n_set)
      SELECT batch, n_docs, 2048 AS m, n_set,
        n_set * 1000000 // 2048 AS fill_ppm FROM per_and_merged"""))

  /** Shard-built bottom-k (KMV) states folded into the union's state
    * ([[graft.functions.SketchAgg.KmvSketchAgg]] /
    * [[graft.functions.SketchAgg.KmvMergeAgg]]): four disjoint
    * doc_id%4 shards each keep the 64 smallest distinct hex60 text
    * hashes in one pass, and the merge aggregate re-trims the union —
    * the global bottom-k is a subset of the union of per-shard
    * bottom-ks, so merged ≡ one-pass bit-for-bit (the q202 lifecycle
    * for the KMV family). The exploded state rows hash-check every
    * kept hash in order, and the riding report columns
    * ([[graft.functions.SketchAgg.kmvSummary]]: k_used, h_k = k-th
    * min, est = (k−1)·2⁶⁰ ÷ h_k) hash-check the estimator arithmetic
    * — the oracle replays the state with `row_number() OVER (ORDER BY
    * h) <= k` per the sketch's own doc contract and the estimate with
    * HUGEINT division.
    */
  private val q203 = QueryDef(
    "q203_kmv_shard_union",
    (s, dir) => {
      val k = 64
      val per = Tables.documents(s, dir)
        .groupBy(pmod(col("doc_id"), lit(4L)).as("batch"))
        .agg(count(lit(1)).as("n_docs"),
          graft.functions.SketchAgg.kmvSketch(col("text"), k).as("st"))
      val merged = per.agg(sum(col("n_docs")).as("n_docs"),
          graft.functions.SketchAgg.kmvMerge(col("st"), k).as("st"))
        .select(lit(-1L).as("batch"), col("n_docs"), col("st"))
      per.unionByName(merged)
        .select(col("batch"), col("n_docs"),
          graft.functions.SketchAgg.kmvReportOf(col("st"), k).as("r"),
          posexplode(col("st")).as(Seq("pos", "h")))
        .select(col("batch"), col("n_docs"),
          col("r.k_used").as("k_used"), col("r.h_k").as("h_k"),
          col("r.est_distinct").as("est_distinct"),
          col("pos").cast("long").as("pos"), col("h"))
    },
    Some(s"""WITH hs AS (SELECT DISTINCT doc_id % 4 AS batch,
          ${sqlHex60("text")} AS h FROM documents WHERE text IS NOT NULL),
      ranked AS (SELECT batch, h, row_number()
          OVER (PARTITION BY batch ORDER BY h) - 1 AS pos FROM hs),
      nd AS (SELECT doc_id % 4 AS batch, count(*) AS n_docs
        FROM documents GROUP BY 1),
      mh AS (SELECT DISTINCT h FROM hs),
      mranked AS (SELECT h, row_number() OVER (ORDER BY h) - 1 AS pos
        FROM mh),
      kept AS (SELECT batch, n_docs, pos, h
          FROM ranked JOIN nd USING (batch) WHERE pos < 64
        UNION ALL
        SELECT -1 AS batch, (SELECT count(*) FROM documents) AS n_docs,
          pos, h FROM mranked WHERE pos < 64),
      rep AS (SELECT batch, count(*) AS k_used, max(h) AS h_k
        FROM kept GROUP BY batch)
      SELECT s.batch, s.n_docs, r.k_used::BIGINT AS k_used, r.h_k AS h_k,
        (CASE WHEN r.k_used < 64 OR r.h_k <= 0 THEN r.k_used
          ELSE (63::HUGEINT * 1152921504606846976::HUGEINT)
            // r.h_k::HUGEINT END)::BIGINT AS est_distinct,
        s.pos, s.h
      FROM kept s JOIN rep r USING (batch)"""))

  /** Cross-source overlap matrix from bottom-k sketches (Cohen &
    * Kaplan's coordinated-sample set similarity): one
    * [[graft.functions.SketchAgg.KmvSketchAgg]] state per document
    * source, then every source PAIR estimates its Jaccard overlap
    * purely from the two ≤k-element state arrays — the bottom-k of
    * the pair's union is computable from the states alone
    * (union's k smallest ⊆ A_k ∪ B_k), and the fraction of it lying
    * in BOTH states is the Jaccard estimate (exact when the states
    * are under-full). At 100 TB this is the cross-corpus
    * contamination/overlap report that needs NO distinct-join of
    * corpora: one pass builds #sources tiny states, the pair
    * expansion is #sources² rows of array arithmetic (the q83
    * bounded-build rule — the "nested loop" probes a handful of
    * fixed-size sketch rows). Integer jaccard_ppm keeps both engines
    * bit-comparable.
    */
  private val q204 = QueryDef(
    "q204_kmv_source_overlap",
    (s, dir) => {
      val k = 64
      val per = Tables.documents(s, dir)
        .groupBy(col("source").as("src"))
        .agg(graft.functions.SketchAgg.kmvSketch(col("text"), k).as("st"))
        // a source whose every text is NULL yields an EMPTY state: the
        // oracle's `WHERE text IS NOT NULL` never materializes such a
        // group, so drop it here too (also keeps union_k > 0 — no
        // division by zero in the ppm)
        .filter(size(col("st")) > 0)
      val pairs = per.as("x").join(per.as("y"), col("x.src") < col("y.src"))
      val u = slice(array_sort(array_union(col("x.st"), col("y.st"))), 1, k)
      val inter = filter(u, h =>
        array_contains(col("x.st"), h) && array_contains(col("y.st"), h))
      pairs.select(col("x.src").as("src_a"), col("y.src").as("src_b"),
          size(col("x.st")).cast("long").as("k_used_a"),
          size(col("y.st")).cast("long").as("k_used_b"),
          size(inter).cast("long").as("inter_k"),
          size(u).cast("long").as("union_k"))
        .withColumn("jaccard_ppm",
          expr("CAST(inter_k * 1000000 DIV union_k AS BIGINT)"))
    },
    Some(s"""WITH hs AS (SELECT DISTINCT source, ${sqlHex60("text")} AS h
          FROM documents WHERE text IS NOT NULL),
      ranked AS (SELECT source, h, row_number()
          OVER (PARTITION BY source ORDER BY h) AS rn FROM hs),
      st AS (SELECT source, array_agg(h ORDER BY h) AS a
        FROM ranked WHERE rn <= 64 GROUP BY source),
      pairs AS (SELECT x.source AS src_a, y.source AS src_b, x.a AS a, y.a AS b
        FROM st x JOIN st y ON x.source < y.source),
      m AS (SELECT src_a, src_b, a, b,
          (list_sort(list_distinct(a || b)))[1:64] AS u FROM pairs),
      c AS (SELECT src_a, src_b, len(a) AS k_used_a, len(b) AS k_used_b,
          len(list_filter(u, x -> list_contains(a, x)
            AND list_contains(b, x))) AS inter_k,
          len(u) AS union_k FROM m)
      SELECT src_a, src_b, k_used_a::BIGINT AS k_used_a,
        k_used_b::BIGINT AS k_used_b, inter_k::BIGINT AS inter_k,
        union_k::BIGINT AS union_k,
        (inter_k * 1000000 // union_k)::BIGINT AS jaccard_ppm
      FROM c"""))

  /** Shard-built moments (power-sum) states folded into the union's
    * state ([[graft.functions.SketchAgg.MomentsSketchAgg]] /
    * [[graft.functions.SketchAgg.MomentsMergeAgg]]): three disjoint
    * doc_id%3 shards each accumulate the EXACT integer sums
    * [n, Σx, Σx², Σx³, Σx⁴] over `n_chars` in one pass, and the merge
    * aggregate adds them elementwise — integer addition commutes, so
    * merged ≡ one-pass bit-for-bit whatever the shard split (the
    * q202/q203 lifecycle for the moments family). The output hash-
    * checks both the raw state (sums replayed by plain SQL `sum`s —
    * they fit BIGINT at every test SF; the stored state itself is
    * decimal(38,0) for 100 TB headroom) and the report's derived
    * doubles, whose IEEE expression shapes the oracle mirrors exactly
    * ([[graft.functions.SketchAgg.momentsSummary]]'s documented
    * contract: sums < 2⁵³ convert exactly, division/multiply/sqrt are
    * correctly rounded, polynomials associate left).
    */
  private val q205 = QueryDef(
    "q205_moments_shard_union",
    (s, dir) => {
      val per = Tables.documents(s, dir)
        .groupBy(pmod(col("doc_id"), lit(3L)).as("shard"))
        .agg(graft.functions.SketchAgg.momentsSketch(col("n_chars")).as("st"))
      val merged = per
        .agg(graft.functions.SketchAgg.momentsMerge(col("st")).as("st"))
        .select(lit(-1L).as("shard"), col("st"))
      per.unionByName(merged)
        .select(col("shard"),
          element_at(col("st"), 1).cast("long").as("n_rows"),
          element_at(col("st"), 2).cast("long").as("s1"),
          element_at(col("st"), 3).cast("long").as("s2"),
          element_at(col("st"), 4).cast("long").as("s3"),
          element_at(col("st"), 5).cast("long").as("s4"),
          graft.functions.SketchAgg.momentsReportOf(col("st")).as("r"))
        .select(col("shard"), col("n_rows"), col("s1"), col("s2"),
          col("s3"), col("s4"),
          col("r.mean").as("mean"), col("r.var_pop").as("var_pop"),
          col("r.skew").as("skew"), col("r.kurt_excess").as("kurt_excess"),
          col("r.cantelli_p99").as("cantelli_p99"))
    },
    Some("""WITH raw AS (SELECT doc_id % 3 AS shard, n_chars FROM documents),
      s AS (SELECT shard, count(n_chars) AS n, sum(n_chars) AS s1,
          sum(n_chars * n_chars) AS s2,
          sum(n_chars * n_chars * n_chars) AS s3,
          sum(n_chars * n_chars * n_chars * n_chars) AS s4
        FROM raw GROUP BY shard
        UNION ALL
        SELECT -1 AS shard, count(n_chars), sum(n_chars),
          sum(n_chars * n_chars), sum(n_chars * n_chars * n_chars),
          sum(n_chars * n_chars * n_chars * n_chars) FROM raw),
      p AS (SELECT shard, n, s1, s2, s3, s4,
          s1::DOUBLE / n::DOUBLE AS mean, s2::DOUBLE / n::DOUBLE AS p2,
          s3::DOUBLE / n::DOUBLE AS p3, s4::DOUBLE / n::DOUBLE AS p4
        FROM s),
      v AS (SELECT *, p2 - mean * mean AS var_pop FROM p)
      SELECT shard, n::BIGINT AS n_rows, s1::BIGINT AS s1, s2::BIGINT AS s2,
        s3::BIGINT AS s3, s4::BIGINT AS s4, mean, var_pop,
        CASE WHEN var_pop <= 0 THEN 0.0 ELSE
          (p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean)
            / (var_pop * sqrt(var_pop)) END AS skew,
        CASE WHEN var_pop <= 0 THEN 0.0 ELSE
          (p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2
            - 3.0 * mean * mean * mean * mean)
            / (var_pop * var_pop) - 3.0 END AS kurt_excess,
        CASE WHEN var_pop <= 0 THEN mean
          ELSE mean + sqrt(var_pop * 99.0) END AS cantelli_p99
      FROM v"""))

  /** Per-source length profile + distribution-free tail audit from
    * moments states: one pass builds a 5-number state per source, the
    * report derives mean/variance/skewness/kurtosis and the one-sided
    * Cantelli p99 bound μ + σ√99, and a second pass (broadcast of the
    * tiny report table) counts how many documents actually exceed
    * each source's bound — Cantelli guarantees ≤ 1% whatever the
    * distribution, so `over_ppm ≤ 10000` by mathematics, not by luck.
    * The 100 TB shape: outlier thresholds for a trillion-row corpus
    * from #sources × 5 integers, no percentile shuffle anywhere —
    * sketch states could come merged from per-day stores (q205's
    * lifecycle) without re-reading any history.
    */
  private val q206 = QueryDef(
    "q206_moments_source_profile",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val rep = docs.groupBy(col("source"))
        .agg(graft.functions.SketchAgg.momentsSketch(col("n_chars")).as("st"))
        .select(col("source"),
          graft.functions.SketchAgg.momentsReportOf(col("st")).as("r"))
        .select(col("source"), col("r.n").as("n_docs"),
          col("r.mean").as("mean"), col("r.var_pop").as("var_pop"),
          col("r.skew").as("skew"), col("r.kurt_excess").as("kurt_excess"),
          col("r.cantelli_p99").as("cantelli_p99"))
      val over = docs
        .join(broadcast(rep.select(col("source"), col("cantelli_p99"))),
          Seq("source"))
        .groupBy(col("source"))
        .agg(count(when(col("n_chars").cast("double") > col("cantelli_p99"),
          1)).as("n_over"))
      rep.join(broadcast(over), Seq("source"))
        .withColumn("over_ppm",
          expr("CAST(n_over * 1000000 DIV n_docs AS BIGINT)"))
    },
    Some("""WITH s AS (SELECT source, count(n_chars) AS n,
          sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2,
          sum(n_chars * n_chars * n_chars) AS s3,
          sum(n_chars * n_chars * n_chars * n_chars) AS s4
        FROM documents GROUP BY source),
      p AS (SELECT source, n, s1::DOUBLE / n::DOUBLE AS mean,
          s2::DOUBLE / n::DOUBLE AS p2, s3::DOUBLE / n::DOUBLE AS p3,
          s4::DOUBLE / n::DOUBLE AS p4 FROM s),
      v AS (SELECT *, p2 - mean * mean AS var_pop FROM p),
      r AS (SELECT source, n::BIGINT AS n_docs, mean, var_pop,
          CASE WHEN var_pop <= 0 THEN 0.0 ELSE
            (p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean)
              / (var_pop * sqrt(var_pop)) END AS skew,
          CASE WHEN var_pop <= 0 THEN 0.0 ELSE
            (p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2
              - 3.0 * mean * mean * mean * mean)
              / (var_pop * var_pop) - 3.0 END AS kurt_excess,
          CASE WHEN var_pop <= 0 THEN mean
            ELSE mean + sqrt(var_pop * 99.0) END AS cantelli_p99
        FROM v),
      a AS (SELECT d.source, count(*) FILTER (
            WHERE d.n_chars::DOUBLE > r.cantelli_p99) AS n_over
        FROM documents d JOIN r USING (source) GROUP BY d.source)
      SELECT r.source, r.n_docs, r.mean, r.var_pop, r.skew, r.kurt_excess,
        r.cantelli_p99, a.n_over::BIGINT AS n_over,
        (a.n_over * 1000000 // r.n_docs)::BIGINT AS over_ppm
      FROM r JOIN a USING (source)"""))

  // shared DuckDB fragments for the log-histogram family (q209/q210):
  // bucket index and inclusive bounds, mirroring SketchAgg.logHistBucket
  // / logHistBounds integer-for-integer
  private def lhBucket(x: String): String =
    s"""CASE WHEN $x < 16 THEN $x
      ELSE 16 * (length(bin($x)) - 1)
        + (($x - (1::BIGINT << (length(bin($x)) - 1)))
           >> (length(bin($x)) - 1 - 4)) END"""
  private def lhLo(b: String): String =
    s"""CASE WHEN $b < 16 THEN $b
      ELSE (1::BIGINT << ($b // 16)) + (($b % 16) << ($b // 16 - 4)) END"""
  private def lhHi(b: String): String =
    s"""CASE WHEN $b < 16 THEN $b
      ELSE (1::BIGINT << ($b // 16)) + (($b % 16) << ($b // 16 - 4))
        + (1::BIGINT << ($b // 16 - 4)) - 1 END"""

  /** Shard-built log-histogram states folded into the union's state
    * ([[graft.functions.SketchAgg.LogHistSketchAgg]] /
    * [[graft.functions.SketchAgg.LogHistMergeAgg]]): the mergeable
    * QUANTILE sketch of the family — deterministic base-2 bit-length
    * bucketing (no float log anywhere), counter arrays that fold by
    * elementwise addition, so merged ≡ one-pass bit-for-bit. Output
    * carries every nonzero bucket of every shard state plus the
    * riding report (rank r = ⌈n·p/100⌉ walked over the cumulative
    * bucket counts; each percentile reported as its guaranteed
    * ≤ 6.25%-wide integer [lo, hi] bracket) — the oracle replays
    * bucket, cumsum, rank walk, and bounds in pure integer SQL.
    */
  private val q209 = QueryDef(
    "q209_loghist_shard_union",
    (s, dir) => {
      val per = Tables.documents(s, dir)
        .groupBy(pmod(col("doc_id"), lit(3L)).as("shard"))
        .agg(graft.functions.SketchAgg.logHistSketch(col("n_chars")).as("st"))
      val merged = per
        .agg(graft.functions.SketchAgg.logHistMerge(col("st")).as("st"))
        .select(lit(-1L).as("shard"), col("st"))
      per.unionByName(merged)
        .select(col("shard"),
          graft.functions.SketchAgg.logHistReportOf(col("st")).as("r"),
          posexplode(col("st")).as(Seq("pos", "c")))
        .filter(col("c") > 0L)
        .select(col("shard"), col("r.n").as("n"),
          col("r.p50_lo").as("p50_lo"), col("r.p50_hi").as("p50_hi"),
          col("r.p90_lo").as("p90_lo"), col("r.p90_hi").as("p90_hi"),
          col("r.p99_lo").as("p99_lo"), col("r.p99_hi").as("p99_hi"),
          col("r.max_lo").as("max_lo"), col("r.max_hi").as("max_hi"),
          col("pos").cast("long").as("bucket"), col("c"))
    },
    Some(s"""WITH raw AS (SELECT doc_id % 3 AS shard, n_chars AS x
          FROM documents
        UNION ALL SELECT -1 AS shard, n_chars AS x FROM documents),
      bk AS (SELECT shard, ${lhBucket("x")} AS b FROM raw),
      cnt AS (SELECT shard, b, count(*) AS c FROM bk GROUP BY shard, b),
      cum AS (SELECT shard, b, c,
          sum(c) OVER (PARTITION BY shard ORDER BY b) AS cumc,
          sum(c) OVER (PARTITION BY shard) AS n FROM cnt),
      q AS (SELECT shard, max(n) AS n,
          min(b) FILTER (WHERE cumc >= (n * 50 + 99) // 100) AS b50,
          min(b) FILTER (WHERE cumc >= (n * 90 + 99) // 100) AS b90,
          min(b) FILTER (WHERE cumc >= (n * 99 + 99) // 100) AS b99,
          max(b) AS bmax
        FROM cum GROUP BY shard)
      SELECT c.shard, q.n::BIGINT AS n,
        ${lhLo("q.b50")}::BIGINT AS p50_lo, ${lhHi("q.b50")}::BIGINT AS p50_hi,
        ${lhLo("q.b90")}::BIGINT AS p90_lo, ${lhHi("q.b90")}::BIGINT AS p90_hi,
        ${lhLo("q.b99")}::BIGINT AS p99_lo, ${lhHi("q.b99")}::BIGINT AS p99_hi,
        ${lhLo("q.bmax")}::BIGINT AS max_lo, ${lhHi("q.bmax")}::BIGINT AS max_hi,
        c.b::BIGINT AS bucket, c.c::BIGINT AS c
      FROM cnt c JOIN q USING (shard)"""))

  /** Per-source quantile brackets + exactness audit: the sketch's
    * [lo, hi] percentile brackets against the TRUE rank statistics
    * (the value at row_number = ⌈n·p/100⌉ per source) — `p50_ok` /
    * `p99_ok` hold by construction (the rank-r value lies in the
    * first bucket whose cumulative count reaches r, and bucket bounds
    * bracket every value in the bucket), and the oracle re-derives
    * both sides independently. The 100 TB shape: the exact side costs
    * a per-source sort and exists here only to audit; production
    * reads the brackets from stored states alone (q209's lifecycle).
    */
  private val q210 = QueryDef(
    "q210_loghist_source_audit",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, dir)
      val rep = docs.groupBy(col("source"))
        .agg(graft.functions.SketchAgg.logHistSketch(col("n_chars")).as("st"))
        .select(col("source"),
          graft.functions.SketchAgg.logHistReportOf(col("st")).as("r"))
        .select(col("source"), col("r.n").as("n_docs"),
          col("r.p50_lo").as("p50_lo"), col("r.p50_hi").as("p50_hi"),
          col("r.p99_lo").as("p99_lo"), col("r.p99_hi").as("p99_hi"))
      val ranked = docs.select(col("source"), col("n_chars"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("n_chars"))))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("source"))))
      val exact = ranked.groupBy(col("source"))
        .agg(min(when(col("rn") === expr("(n * 50 + 99) DIV 100"),
            col("n_chars"))).as("exact_p50"),
          min(when(col("rn") === expr("(n * 99 + 99) DIV 100"),
            col("n_chars"))).as("exact_p99"))
      rep.join(exact, Seq("source"))
        .withColumn("p50_ok",
          col("p50_lo") <= col("exact_p50") && col("exact_p50") <= col("p50_hi"))
        .withColumn("p99_ok",
          col("p99_lo") <= col("exact_p99") && col("exact_p99") <= col("p99_hi"))
    },
    Some(s"""WITH bk AS (SELECT source, ${lhBucket("n_chars")} AS b
          FROM documents),
      cnt AS (SELECT source, b, count(*) AS c FROM bk GROUP BY source, b),
      cum AS (SELECT source, b, c,
          sum(c) OVER (PARTITION BY source ORDER BY b) AS cumc,
          sum(c) OVER (PARTITION BY source) AS n FROM cnt),
      q AS (SELECT source, max(n) AS n_docs,
          min(b) FILTER (WHERE cumc >= (n * 50 + 99) // 100) AS b50,
          min(b) FILTER (WHERE cumc >= (n * 99 + 99) // 100) AS b99
        FROM cum GROUP BY source),
      rk AS (SELECT source, n_chars,
          row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn,
          count(*) OVER (PARTITION BY source) AS n FROM documents),
      ex AS (SELECT source,
          min(CASE WHEN rn = (n * 50 + 99) // 100 THEN n_chars END)
            AS exact_p50,
          min(CASE WHEN rn = (n * 99 + 99) // 100 THEN n_chars END)
            AS exact_p99
        FROM rk GROUP BY source)
      SELECT q.source, q.n_docs::BIGINT AS n_docs,
        ${lhLo("q.b50")}::BIGINT AS p50_lo, ${lhHi("q.b50")}::BIGINT AS p50_hi,
        ${lhLo("q.b99")}::BIGINT AS p99_lo, ${lhHi("q.b99")}::BIGINT AS p99_hi,
        ex.exact_p50, ex.exact_p99,
        (${lhLo("q.b50")} <= ex.exact_p50
          AND ex.exact_p50 <= ${lhHi("q.b50")}) AS p50_ok,
        (${lhLo("q.b99")} <= ex.exact_p99
          AND ex.exact_p99 <= ${lhHi("q.b99")}) AS p99_ok
      FROM q JOIN ex USING (source)"""))

  /** The weighted-build domain trick, hash-checked as an IDENTITY:
    * per returnflag, the moments and log-histogram profiles of
    * lineitem quantities are computed twice — once from the raw rows
    * ([[graft.functions.SketchAgg.MomentsSketchAgg]] /
    * [[graft.functions.SketchAgg.LogHistSketchAgg]]) and once from
    * the pre-aggregated `GROUP BY (flag, qty) → count` DOMAIN through
    * the weighted builds ([[graft.functions.SketchAgg
    * .MomentsWSketchAgg]] / [[graft.functions.SketchAgg
    * .LogHistWSketchAgg]]). The oracle computes ONE answer per flag
    * and expects it under both path tags, so the hash gate enforces
    * raw ≡ domain bit-for-bit. At 100 TB this is the profile shape to
    * run: quantity-like columns have domain cardinality in the
    * dozens, so the sketch input shrinks from corpus-sized to
    * domain-sized before any state is built.
    */
  private val q211 = QueryDef(
    "q211_weighted_domain_profile",
    (s, dir) => {
      import graft.functions.SketchAgg
      val li = Tables.lineitem(s, dir).select(
        col("l_returnflag").as("flag"),
        col("l_quantity").cast("long").as("qty"))
      def reported(states: org.apache.spark.sql.DataFrame, path: String) =
        states.select(col("flag"), lit(path).as("path"),
            SketchAgg.momentsReportOf(col("mst")).as("m"),
            SketchAgg.logHistReportOf(col("hst")).as("h"))
          .select(col("flag"), col("path"), col("m.n").as("n"),
            col("m.mean").as("mean"), col("m.var_pop").as("var_pop"),
            col("m.skew").as("skew"), col("m.kurt_excess").as("kurt_excess"),
            col("m.cantelli_p99").as("cantelli_p99"),
            col("h.p50_lo").as("p50_lo"), col("h.p50_hi").as("p50_hi"),
            col("h.p99_lo").as("p99_lo"), col("h.p99_hi").as("p99_hi"))
      val raw = li.groupBy(col("flag"))
        .agg(SketchAgg.momentsSketch(col("qty")).as("mst"),
          SketchAgg.logHistSketch(col("qty")).as("hst"))
      val dom = li.groupBy(col("flag"), col("qty"))
        .agg(count(lit(1)).as("w"))
        .groupBy(col("flag"))
        .agg(SketchAgg.momentsSketchW(col("qty"), col("w")).as("mst"),
          SketchAgg.logHistSketchW(col("qty"), col("w")).as("hst"))
      reported(raw, "raw").unionByName(reported(dom, "domain"))
    },
    Some(s"""WITH q AS (SELECT l_returnflag AS flag,
          CAST(floor(l_quantity) AS BIGINT) AS x FROM lineitem),
      s AS (SELECT flag, count(x) AS n, sum(x) AS s1, sum(x * x) AS s2,
          sum(x * x * x) AS s3, sum(x * x * x * x) AS s4
        FROM q GROUP BY flag),
      p AS (SELECT flag, n, s1::DOUBLE / n::DOUBLE AS mean,
          s2::DOUBLE / n::DOUBLE AS p2, s3::DOUBLE / n::DOUBLE AS p3,
          s4::DOUBLE / n::DOUBLE AS p4 FROM s),
      v AS (SELECT *, p2 - mean * mean AS var_pop FROM p),
      m AS (SELECT flag, n::BIGINT AS n, mean, var_pop,
          CASE WHEN var_pop <= 0 THEN 0.0 ELSE
            (p3 - 3.0 * mean * p2 + 2.0 * mean * mean * mean)
              / (var_pop * sqrt(var_pop)) END AS skew,
          CASE WHEN var_pop <= 0 THEN 0.0 ELSE
            (p4 - 4.0 * mean * p3 + 6.0 * mean * mean * p2
              - 3.0 * mean * mean * mean * mean)
              / (var_pop * var_pop) - 3.0 END AS kurt_excess,
          CASE WHEN var_pop <= 0 THEN mean
            ELSE mean + sqrt(var_pop * 99.0) END AS cantelli_p99
        FROM v),
      bk AS (SELECT flag, ${lhBucket("x")} AS b FROM q),
      cnt AS (SELECT flag, b, count(*) AS c FROM bk GROUP BY flag, b),
      cum AS (SELECT flag, b, c,
          sum(c) OVER (PARTITION BY flag ORDER BY b) AS cumc,
          sum(c) OVER (PARTITION BY flag) AS nn FROM cnt),
      h AS (SELECT flag,
          min(b) FILTER (WHERE cumc >= (nn * 50 + 99) // 100) AS b50,
          min(b) FILTER (WHERE cumc >= (nn * 99 + 99) // 100) AS b99
        FROM cum GROUP BY flag)
      SELECT m.flag, t.path, m.n, m.mean, m.var_pop, m.skew,
        m.kurt_excess, m.cantelli_p99,
        ${lhLo("h.b50")}::BIGINT AS p50_lo, ${lhHi("h.b50")}::BIGINT AS p50_hi,
        ${lhLo("h.b99")}::BIGINT AS p99_lo, ${lhHi("h.b99")}::BIGINT AS p99_hi
      FROM m JOIN h USING (flag)
      CROSS JOIN (VALUES ('raw'), ('domain')) t(path)"""))

  /** Per-source distribution drift as exact integer total-variation
    * distance over log-histogram states — the batch twin of
    * [[graft.streaming.StreamingLift.histDriftStream]]'s scoring, so
    * the bucket + TVD arithmetic is hash-checked end-to-end:
    * `tvd_ppm = 10⁶ · Σ_b |c_S(b)·n − c(b)·n_S| / (2·n_S·n)` between
    * each source's n_chars histogram and the corpus's. The global
    * 1008-long state rides as a 1-row broadcast (the bounded-BNLJ
    * contract, q95's 1-row-total shape); per-source work is a
    * zip_with over two fixed arrays.
    */
  private val q213 = QueryDef(
    "q213_hist_drift",
    (s, dir) => {
      import graft.functions.SketchAgg
      val docs = Tables.documents(s, dir)
      val per = docs.groupBy(col("source"))
        .agg(SketchAgg.logHistSketch(col("n_chars")).as("st"))
      val glob = docs.agg(SketchAgg.logHistSketch(col("n_chars")).as("gst"))
      def massOf(c: org.apache.spark.sql.Column) =
        aggregate(c, lit(0L), (acc, x) => acc + x)
      // decimal(38,0) cross-multiplication, same as histDriftStream's
      // (the stream this query twins): long would wrap at
      // n_src·n_tot ≥ 2⁶³
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      per.join(broadcast(glob))
        .withColumn("n_src", massOf(col("st")))
        .withColumn("n_tot", massOf(col("gst")))
        .withColumn("__num", aggregate(
          zip_with(col("st"), col("gst"), (a, b) =>
            abs(a.cast(dec) * col("n_tot").cast(dec)
              - b.cast(dec) * col("n_src").cast(dec))),
          lit(0L).cast(dec), (acc, x) => acc + x))
        .select(col("source"), col("n_src"),
          expr("CAST(__num * 1000000 DIV (2 * CAST(n_src AS DECIMAL(38,0)) " +
            "* CAST(n_tot AS DECIMAL(38,0))) AS BIGINT)")
            .as("tvd_ppm"))
    },
    Some(s"""WITH bk AS (SELECT source, ${lhBucket("n_chars")} AS b
          FROM documents),
      cs AS (SELECT source, b, count(*) AS c FROM bk GROUP BY source, b),
      cg AS (SELECT b, count(*) AS c FROM bk GROUP BY b),
      ns AS (SELECT source, sum(c) AS n_src FROM cs GROUP BY source),
      n AS (SELECT count(*) AS n_tot FROM documents),
      grid AS (SELECT ns.source, ns.n_src, cg.b, cg.c AS c_tot,
          coalesce(cs.c, 0) AS c_src
        FROM ns CROSS JOIN cg
        LEFT JOIN cs ON cs.source = ns.source AND cs.b = cg.b)
      SELECT g.source, min(g.n_src)::BIGINT AS n_src,
        (sum(abs(g.c_src * (SELECT n_tot FROM n)
              - g.c_tot * g.n_src)) * 1000000
          // (2 * min(g.n_src) * (SELECT n_tot FROM n)))::BIGINT AS tvd_ppm
      FROM grid g GROUP BY g.source"""))

  /** Batch twin of the streaming band-index probe
    * ([[graft.ops.Dedup.bandIndexProbe]] — the EXACT plan
    * nearDupStream's vs_corpus arm runs per micro-batch): build the
    * persisted band-key index relationally over the "corpus" (docs
    * outside the batch slice) and replay one "batch"'s probe against
    * it, INCLUDING the maxBucket drop (1 here, so bands with 2+
    * corpus members are provably skipped on both engines at every
    * test SF).
    * This oracle-gates the arithmetic the stream applies to history:
    * signature → banding → group-size gate → ascending distinct
    * pairs. Scale shape: probe side is the small batch; shuffles key
    * on fixed-width band digests only.
    */
  private val q214 = QueryDef(
    "q214_band_probe",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val corpus = docs.filter(col("doc_id") % 5 =!= 0)
      val batch = docs.filter(col("doc_id") % 5 === 0)
      Dedup.bandIndexProbe(
        Dedup.bandKeyRows(corpus, "doc_id", "text"),
        Dedup.bandKeyRows(batch, "doc_id", "text"),
        "doc_id", maxBucket = 1)
    },
    Some(s"""WITH sh AS (SELECT doc_id, $sqlShingles AS s FROM documents),
      sig AS (SELECT doc_id, list_transform(range(0, 16),
        h -> list_min(list_transform(
          list_transform(s, x -> ${sqlHex60("x")} % 1073741789),
          v -> (((h * 2654435761) % 1073741789 + 1) * v
                + (h * 40503 + 12345) % 1073741789) % 1073741789))) AS sig FROM sh),
      bands AS (SELECT doc_id, b, md5(array_to_string(sig[b*4+1:b*4+4], '|')) AS bk
        FROM sig CROSS JOIN range(0, 4) AS t(b)),
      corpus AS (SELECT * FROM bands WHERE doc_id % 5 <> 0),
      batch AS (SELECT * FROM bands WHERE doc_id % 5 = 0),
      sz AS (SELECT b, bk, count(*) AS c FROM corpus GROUP BY b, bk)
      SELECT DISTINCT least(x.doc_id, y.doc_id) AS doc_a,
        greatest(x.doc_id, y.doc_id) AS doc_b
      FROM corpus x JOIN batch y ON x.b = y.b AND x.bk = y.bk
      JOIN sz ON sz.b = x.b AND sz.bk = x.bk
      WHERE sz.c <= 1 AND x.doc_id <> y.doc_id"""))

  /** Retrieval EVALUATION — graded nDCG@20 of the q154 BM25 ranking
    * against term-coverage relevance labels
    * ([[graft.ops.Retrieval.ndcgAt]]): rel(doc) = distinct query
    * terms present; gains are integer `rel · ⌊2²⁰/log₂(1+r)⌋`
    * products with the discount table computed ONCE in driver Scala
    * and interpolated verbatim into both plans (no runtime log);
    * `ndcg_ppm = ⌊10⁶·DCG/IDCG⌋` — one integer division of two long
    * sums. The eval-harness step every retrieval/rerank change is
    * judged by. Scale shape: ranks window over ≤ 20 rows, the ideal
    * side is TakeOrderedAndProject over the label table, assembly a
    * 1-row broadcast join.
    */
  private val q215 = QueryDef(
    "q215_ndcg",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val terms = Seq("spark", "table", "hash")
      val ranking = Retrieval.bm25Rank(docs, "doc_id", "text", terms, k = 20)
      val labels = docs.select(col("doc_id"),
        size(array_intersect(graft.functions.TextKernels.tokens(col("text")),
          array(terms.map(lit): _*))).cast("long").as("rel"))
        .filter(col("rel") > 0)
      Retrieval.ndcgAt(ranking, "doc_id", "score_q", labels, "rel", k = 20)
    },
    Some {
      val disc = Retrieval.ndcgDiscounts(20)
        .map { case (r, d) => s"($r, $d)" }.mkString(", ")
      s"""WITH tok AS (SELECT doc_id AS id, unnest(string_split(text, ' ')) AS w
          FROM documents),
        dl AS (SELECT id, count(*)::HUGEINT AS dl FROM tok GROUP BY id),
        tot AS (SELECT count(*)::HUGEINT AS n_docs, sum(dl)::HUGEINT AS t_tokens
          FROM dl),
        qt AS (SELECT id, w FROM tok WHERE w IN ('spark', 'table', 'hash')),
        dfq AS (SELECT w, count(DISTINCT id)::HUGEINT AS df FROM qt GROUP BY w),
        tf AS (SELECT id, w, count(*)::HUGEINT AS tf FROM qt GROUP BY id, w),
        c AS (SELECT tf.id,
            ((1048576::HUGEINT * (2 * (n_docs - df) + 1) // (2 * df + 1))
             * (1048576::HUGEINT * 22 * t_tokens * tf
                // (10::HUGEINT * t_tokens * tf + 3 * t_tokens
                    + 9::HUGEINT * dl.dl * n_docs))
             // 1048576) AS c
          FROM tf JOIN dfq USING (w) JOIN dl ON dl.id = tf.id CROSS JOIN tot),
        rank20 AS (SELECT id, sum(c)::BIGINT AS score_q FROM c GROUP BY id
          ORDER BY score_q DESC, id LIMIT 20),
        ranked AS (SELECT id, row_number() OVER (ORDER BY score_q DESC, id) AS r
          FROM rank20),
        rel AS (SELECT id, count(DISTINCT w)::BIGINT AS rel FROM qt GROUP BY id),
        disc(r, d) AS (VALUES $disc),
        dcg AS (SELECT count(*)::BIGINT AS n_ranked,
            sum(coalesce(rel.rel, 0) * disc.d)::BIGINT AS dcg_q
          FROM ranked JOIN disc USING (r) LEFT JOIN rel USING (id)),
        ideal AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, id) AS r
          FROM (SELECT id, rel FROM rel WHERE rel > 0
                ORDER BY rel DESC, id LIMIT 20)),
        idcg AS (SELECT coalesce(sum(ideal.rel * disc.d), 0)::BIGINT AS idcg_q
          FROM ideal JOIN disc USING (r))
        SELECT n_ranked, dcg_q, idcg_q,
          CASE WHEN idcg_q > 0 THEN dcg_q * 1000000 // idcg_q END::BIGINT
            AS ndcg_ppm
        FROM dcg CROSS JOIN idcg"""
    })


  /** Dominant principal direction of the embedding corpus by
    * integer-quantized POWER ITERATION
    * ([[graft.ops.Quantize.powerIteration]]) — the PCA step embedding
    * pipelines run before whitening / anisotropy scoring. Three
    * rounds; per round ONE corpus map pass (the `s_i = x·v` dot rides
    * map-side as a long fold) + one 64-group decimal(38,0)
    * aggregation; the driver state is 64 longs renormalized in pure
    * BigInteger (`sign·(|w|·2²⁰ div max|w|)` — floor of a nonnegative
    * quotient, identical under DuckDB's floor division and Scala's
    * truncating division). The oracle replays the rounds UNROLLED and
    * fully relationally — no literals cross engines, both must agree
    * because every step is exact integer arithmetic.
    */
  private val q216 = QueryDef(
    "q216_power_iteration",
    (s, dir) => graft.ops.Quantize.powerIteration(
      Tables.embeddings(s, dir), "vec_id", "embedding", dims = 64,
      rounds = 3),
    Some {
      def round(n: Int, prev: String) =
        s"""s$n AS (SELECT id, sum(xq * v)::HUGEINT AS s
            FROM u JOIN $prev USING (j) GROUP BY id),
          w$n AS (SELECT j, sum(xq * s)::HUGEINT AS w
            FROM u JOIN s$n USING (id) GROUP BY j),
          m$n AS (SELECT max(abs(w)) AS m FROM w$n),
          v$n AS (SELECT j, (CASE WHEN w < 0 THEN -1::HUGEINT
                ELSE 1::HUGEINT END)
              * ((abs(w) * 1048576) // m) AS v FROM w$n, m$n)"""
      s"""WITH u AS (SELECT vec_id AS id, (i - 1)::BIGINT AS j,
            CAST(floor(CAST(embedding[i] AS DOUBLE) * 1048576)
              AS HUGEINT) AS xq
          FROM embeddings,
            LATERAL (SELECT unnest(generate_series(1, 64)) AS i) t
          WHERE len(embedding) = 64),
        v0(j, v) AS (SELECT j::BIGINT, 1048576::HUGEINT
          FROM range(0, 64) t(j)),
        ${round(1, "v0")},
        ${round(2, "v1")},
        ${round(3, "v2")}
        SELECT j::BIGINT AS j, v::BIGINT AS v_q FROM v3 ORDER BY j"""
    })

  /** The curated blocklist shared by q207/q208 — mixed 2- and 3-word
    * phrases from the corpus vocabulary plus one that can never match
    * (the zero-fill row every per-phrase report must carry).
    */
  private val blockPhrases = Seq("table value", "fast key", "slow scan",
    "big query", "stream window", "key agg row", "never matches anything")
  private def blockInList = blockPhrases.map(p => s"'$p'").mkString(", ")

  /** Blocklist scan through the COMPILED token-level Aho–Corasick
    * kernel ([[graft.ops.TextClean.phraseHitsCompiled]] →
    * [[graft.functions.Kernels.phraseScan]]): per-source roll-up of
    * exact token-n-gram phrase matches — docs flagged, total
    * occurrences (overlaps counted), and phrase-doc incidence. One
    * O(tokens + matches) corpus pass, zero corpus shuffle (the
    * automaton compiles once per JVM from the list literal); the only
    * exchange is the #sources-row aggregation. The compositional
    * window-membership form ([[graft.ops.TextClean.phraseHits]]) is
    * bit-identical (PipelineSpec parity), so this oracle verifies the
    * kernel end-to-end.
    */
  private val q207 = QueryDef(
    "q207_blocklist_scan",
    (s, dir) => TextClean.phraseHitsCompiled(Tables.documents(s, dir), "text",
        blockPhrases)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("flagged"), 1)).as("flagged_docs"),
        sum(col("hits")).as("total_hits"),
        sum(col("phrases_hit")).as("phrase_doc_pairs")),
    Some(s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE text IS NOT NULL),
      w2 AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 1, 0) + 1))
          AS p, toks FROM base),
      w3 AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 2, 0) + 1))
          AS p, toks FROM base),
      g AS (SELECT doc_id, array_to_string(toks[p:p+1], ' ') AS w FROM w2
        UNION ALL
        SELECT doc_id, array_to_string(toks[p:p+2], ' ') AS w FROM w3),
      m AS (SELECT doc_id, count(*) AS hits, count(DISTINCT w) AS ph
        FROM g WHERE w IN ($blockInList) GROUP BY doc_id)
      SELECT d.source, count(*)::BIGINT AS n_docs,
        count(m.doc_id)::BIGINT AS flagged_docs,
        coalesce(sum(m.hits), 0)::BIGINT AS total_hits,
        coalesce(sum(m.ph), 0)::BIGINT AS phrase_doc_pairs
      FROM documents d LEFT JOIN m USING (doc_id) GROUP BY d.source"""))

  /** Per-phrase blocklist traffic ([[graft.ops.TextClean
    * .phraseCounts]]): (phrase, docs matched, occurrences), with a
    * zero row for never-matching entries. The explode runs AFTER the
    * membership filter, so the aggregation input is matching windows
    * only — blocklist-traffic-sized, not corpus-window-sized.
    */
  private val q208 = QueryDef(
    "q208_blocklist_phrases",
    (s, dir) => TextClean.phraseCounts(Tables.documents(s, dir), "doc_id",
      "text", blockPhrases),
    Some(s"""WITH base AS (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE text IS NOT NULL),
      w2 AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 1, 0) + 1))
          AS p, toks FROM base),
      w3 AS (SELECT doc_id, unnest(range(1, greatest(len(toks) - 2, 0) + 1))
          AS p, toks FROM base),
      g AS (SELECT doc_id, array_to_string(toks[p:p+1], ' ') AS w FROM w2
        UNION ALL
        SELECT doc_id, array_to_string(toks[p:p+2], ' ') AS w FROM w3),
      m AS (SELECT w AS phrase, count(DISTINCT doc_id) AS n_docs,
          count(*) AS n_hits
        FROM g WHERE w IN ($blockInList) GROUP BY w),
      pl AS (SELECT * FROM (VALUES ${blockPhrases.map(p => s"('$p')")
        .mkString(", ")}) v(phrase))
      SELECT pl.phrase, coalesce(m.n_docs, 0)::BIGINT AS n_docs,
        coalesce(m.n_hits, 0)::BIGINT AS n_hits
      FROM pl LEFT JOIN m USING (phrase)"""))

  /** Per-group HLL cardinality via the AGGREGATE surface
    * (functions.SketchAgg.hllSketch → hllReportOf): one pass builds a
    * 256-register state per order priority and the report reads each
    * state — the one-job-per-slice shape q185 would need five runs
    * for. The oracle replays q185's register SQL with the group
    * carried through every CTE, so the TypedImperativeAggregate's
    * update/merge/serialize path itself is hash-checked against
    * DuckDB, not just spec-checked.
    */
  private val q196 = QueryDef(
    "q196_hll_per_group",
    (s, dir) => Tables.orders(s, dir)
      .groupBy(col("o_orderpriority").as("grp"))
      .agg(graft.functions.SketchAgg.hllSketch(col("o_custkey"), 8).as("st"))
      .select(col("grp"),
        graft.functions.SketchAgg.hllReportOf(col("st"), 8).as("r"))
      .select(col("grp"), col("r.m").as("m"), col("r.n_nonzero").as("n_nonzero"),
        col("r.sum_q").as("sum_q"), col("r.est").as("est")),
    Some(s"""WITH tok AS (SELECT o_orderpriority AS grp, o_custkey AS tok
        FROM orders),
      h AS (SELECT grp, ${sqlHex60("tok::VARCHAR")} AS h FROM tok
        WHERE tok IS NOT NULL),
      rw AS (SELECT grp, h >> 52 AS reg, h & ${(1L << 52) - 1} AS w FROM h),
      reg AS (SELECT grp, reg, max(CASE WHEN w > 0
          THEN 53 - length(bin(w)) ELSE 53 END) AS rho
        FROM rw GROUP BY grp, reg),
      agg AS (SELECT grp, count(*) AS n_nonzero,
          sum(${1L << 40} >> rho::INTEGER) AS s_obs
        FROM reg GROUP BY grp)
      SELECT grp, 256::BIGINT AS m, n_nonzero::BIGINT AS n_nonzero,
        (coalesce(s_obs, 0) + (256 - coalesce(n_nonzero, 0))
          * ${1L << 40})::BIGINT AS sum_q,
        ${0.7213 / (1.0 + 1.079 / 256)}::DOUBLE * 65536.0
          * ${(1L << 40).toDouble}::DOUBLE
          / ((coalesce(s_obs, 0) + (256 - coalesce(n_nonzero, 0))
            * ${1L << 40})::DOUBLE) AS est
      FROM agg"""))

  /** Count–min sketch accuracy audit (Sketch.countMinAudit): the
    * exact top-15 tokens joined to their 4×1024-cell sketch
    * estimates — est = min over the salted hash rows, never below the
    * exact count (the CM invariant); overshoot is the admitted
    * collision mass. Every counter and probe is an integer keyed on
    * the register domain.
    */
  private val q186 = QueryDef(
    "q186_countmin_audit",
    (s, dir) => graft.ops.Sketch.countMinAudit(
      Tables.documents(s, dir).select(explode(
        TextKernels.tokens(col("text"))).as("tok")), "tok",
      k = 15, depth = 4, width = 1024),
    Some {
      val probes = (0 until 4).map { i =>
        s"SELECT key, exact, $i AS row, " +
          s"${sqlHex60(s"'cm$i:' || key")} % 1024 AS col FROM top"
      }.mkString(" UNION ALL ")
      val cells = (0 until 4).map { i =>
        s"SELECT $i AS row, ${sqlHex60(s"'cm$i:' || tok")} % 1024 AS col " +
          "FROM tok WHERE tok IS NOT NULL"
      }.mkString(" UNION ALL ")
      s"""WITH tok AS (SELECT unnest($T) AS tok FROM documents),
      tbl AS (SELECT row, col, count(*) AS cnt FROM ($cells) GROUP BY 1, 2),
      ex AS (SELECT tok AS key, count(*) AS exact FROM tok
        WHERE tok IS NOT NULL GROUP BY tok),
      top AS (SELECT key, exact FROM ex
        ORDER BY exact DESC, key ASC LIMIT 15),
      pr AS ($probes)
      SELECT pr.key, pr.exact::BIGINT AS exact, min(tbl.cnt)::BIGINT AS est,
        (min(tbl.cnt) - pr.exact)::BIGINT AS overshoot
      FROM pr JOIN tbl USING (row, col)
      GROUP BY pr.key, pr.exact"""
    })

  /** Per-source count–min counter tables via the AGGREGATE surface
    * (functions.SketchAgg.cmSketch): one pass builds a 4×256 counter
    * state per document source; the non-empty cells are exploded back
    * to the (grp, row, col, cnt) relation and the oracle rebuilds the
    * same salted-hash cells per group — so CmSketchAgg's
    * update/merge/serialize path is hash-checked by the driver gate,
    * the count–min sibling of q196.
    */
  private val q197 = QueryDef(
    "q197_cm_per_group",
    (s, dir) => Tables.documents(s, dir)
      .select(col("source").as("grp"),
        explode(TextKernels.tokens(col("text"))).as("tok"))
      .groupBy(col("grp"))
      .agg(graft.functions.SketchAgg.cmSketch(col("tok"), 4, 256).as("st"))
      .select(col("grp"), posexplode(col("st")).as(Seq("idx", "cnt")))
      .filter(col("cnt") > 0)
      .select(col("grp"), expr("CAST(idx div 256 AS BIGINT)").as("row"),
        expr("CAST(idx % 256 AS BIGINT)").as("col"), col("cnt")),
    Some {
      val cells = (0 until 4).map { i =>
        s"SELECT grp, $i AS row, ${sqlHex60(s"'cm$i:' || tok")} % 256 AS col " +
          "FROM tok WHERE tok IS NOT NULL"
      }.mkString(" UNION ALL ")
      s"""WITH tok AS (SELECT source AS grp, unnest($T) AS tok FROM documents)
      SELECT grp, row::BIGINT AS row, col::BIGINT AS col,
        count(*)::BIGINT AS cnt
      FROM ($cells) GROUP BY 1, 2, 3"""
    })

  /** Three full BPE training rounds (NgramLm.bpeTrain) over the
    * documents corpus: per round the most frequent adjacent symbol
    * pair (count desc, pair asc) merges greedily left-to-right via
    * gaps-and-islands windows, and the merge table plus the corpus-
    * weighted symbol totals come back. The oracle unrolls the three
    * rounds — pair windows, 1-row argmax CTEs, island/keep/lag
    * filtering, re-numbering — and must reproduce the identical
    * trajectory. (Oracle-side precondition: the corpus must admit all
    * three rounds — see q227's PRECONDITION note.)
    */
  private val q187 = QueryDef(
    "q187_bpe_train",
    (s, dir) => graft.ops.NgramLm.bpeTrainCached(
      Tables.documents(s, dir), s"docs:$dir", "text", merges = 3),
    Some {
      val steps = (1 to 3).map { r =>
        s"""p$r AS (SELECT w, wc, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s${r - 1}),
         b$r AS (SELECT sym AS l, nxt AS rr, sum(wc) AS cnt FROM p$r
           WHERE nxt IS NOT NULL GROUP BY 1, 2
           ORDER BY cnt DESC, l ASC, rr ASC LIMIT 1),
         mk$r AS (SELECT p.*, CASE WHEN p.sym = b.l AND p.nxt = b.rr
             THEN 1 ELSE 0 END AS mark
           FROM p$r p CROSS JOIN b$r b),
         il$r AS (SELECT *, CASE WHEN mark = 1 THEN pos - row_number()
             OVER (PARTITION BY w, mark ORDER BY pos) END AS grp FROM mk$r),
         kp$r AS (SELECT *, CASE WHEN mark = 1 AND row_number()
             OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1
             THEN 1 ELSE 0 END AS keep FROM il$r),
         f$r AS (SELECT w, wc, pos,
           CASE WHEN keep = 1 THEN sym || nxt ELSE sym END AS sym
           FROM kp$r QUALIFY coalesce(lag(keep)
             OVER (PARTITION BY w ORDER BY pos), 0) = 0),
         s$r AS (SELECT w, wc,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           FROM f$r)"""
      }.mkString(",\n      ")
      s"""WITH wt AS (SELECT w, count(*) AS wc FROM
        (SELECT unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY w),
      s0 AS (SELECT w, wc, pos, substring(w, pos, 1) AS sym FROM
        (SELECT w, wc, unnest(range(1, length(w) + 1)) AS pos FROM wt)),
      $steps
      SELECT 1::BIGINT AS round, b1.l AS lsym, b1.rr AS rsym,
        b1.cnt::BIGINT AS n_occ,
        (SELECT sum(wc) FROM s1)::BIGINT AS n_symbols_after FROM b1
      UNION ALL SELECT 2, b2.l, b2.rr, b2.cnt::BIGINT,
        (SELECT sum(wc) FROM s2)::BIGINT FROM b2
      UNION ALL SELECT 3, b3.l, b3.rr, b3.cnt::BIGINT,
        (SELECT sum(wc) FROM s3)::BIGINT FROM b3"""
    })

  /** Subword vocabulary after the q187 training rounds
    * (NgramLm.bpeVocab): corpus-weighted occurrence mass per surviving
    * symbol — the artifact a tokenizer build publishes next to the
    * merge table. The oracle reuses the q187 unrolled trajectory and
    * aggregates its final symbol table.
    */
  private val q191 = QueryDef(
    "q191_bpe_vocab",
    (s, dir) => graft.ops.NgramLm.bpeVocabCached(
      Tables.documents(s, dir), s"docs:$dir", "text", merges = 3),
    Some {
      val steps = (1 to 3).map { r =>
        s"""p$r AS (SELECT w, wc, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s${r - 1}),
         b$r AS (SELECT sym AS l, nxt AS rr FROM p$r
           WHERE nxt IS NOT NULL GROUP BY sym, nxt
           ORDER BY sum(wc) DESC, l ASC, rr ASC LIMIT 1),
         mk$r AS (SELECT p.*, CASE WHEN p.sym = b.l AND p.nxt = b.rr
             THEN 1 ELSE 0 END AS mark
           FROM p$r p CROSS JOIN b$r b),
         il$r AS (SELECT *, CASE WHEN mark = 1 THEN pos - row_number()
             OVER (PARTITION BY w, mark ORDER BY pos) END AS grp FROM mk$r),
         kp$r AS (SELECT *, CASE WHEN mark = 1 AND row_number()
             OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1
             THEN 1 ELSE 0 END AS keep FROM il$r),
         f$r AS (SELECT w, wc, pos,
           CASE WHEN keep = 1 THEN sym || nxt ELSE sym END AS sym
           FROM kp$r QUALIFY coalesce(lag(keep)
             OVER (PARTITION BY w ORDER BY pos), 0) = 0),
         s$r AS (SELECT w, wc,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           FROM f$r)"""
      }.mkString(",\n      ")
      s"""WITH wt AS (SELECT w, count(*) AS wc FROM
        (SELECT unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY w),
      s0 AS (SELECT w, wc, pos, substring(w, pos, 1) AS sym FROM
        (SELECT w, wc, unnest(range(1, length(w) + 1)) AS pos FROM wt)),
      $steps
      SELECT sym, sum(wc)::BIGINT AS n_occ FROM s3 GROUP BY sym"""
    })

  /** Curation attrition funnel (Corpus.attritionFunnel): every doc
    * labeled with the FIRST stage that dropped it — Gopher gate →
    * exact dedup among survivors → mixture-rate sampling — plus doc
    * and char mass per stage; the 4-row accounting report sums back
    * to the input corpus. Each verdict is the underlying operator's
    * own decision (shared code on the Spark side, the same SQL shapes
    * as q17/q115 on the oracle side).
    */
  private val q193 = QueryDef(
    "q193_attrition_funnel",
    (s, dir) => graft.ops.Corpus.attritionFunnel(
      Tables.documents(s, dir), "doc_id", "text", "source", Stops,
      rates = Map("src0" -> 1.0, "src1" -> 0.25), defaultRate = 0.5),
    Some {
      val stopsList = Stops.map(w => s"'$w'").mkString("[", ", ", "]")
      s"""WITH m AS (SELECT doc_id,
          len($T)::BIGINT AS n_tok,
          (length(text) - (len($T) - 1))::BIGINT AS n_chars,
          len(list_filter($T, t -> list_contains($stopsList, t)))::BIGINT AS n_stop,
          len(list_filter($T, t -> regexp_full_match(t, '[A-Za-z]+')))::BIGINT AS n_alpha,
          len(list_distinct($T))::BIGINT AS n_types
        FROM documents),
      r AS (SELECT doc_id,
          (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1 ELSE 0 END)
            * (CASE WHEN n_chars >= 3 * n_tok AND n_chars <= 10 * n_tok
                THEN 1 ELSE 0 END)
            * (CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END)
            * (CASE WHEN n_alpha * 5 >= 4 * n_tok THEN 1 ELSE 0 END)
            * (CASE WHEN n_types * 4 >= n_tok THEN 1 ELSE 0 END) AS pass
        FROM m),
      base AS (SELECT d.doc_id, d.text, d.source, r.pass
        FROM documents d JOIN r USING (doc_id)),
      surv AS (SELECT min(doc_id) AS keep_id FROM base
        WHERE pass = 1 GROUP BY md5(text)),
      lab AS (SELECT b.text,
          CASE WHEN b.pass = 0 THEN 'low_quality'
            WHEN s.keep_id IS NULL THEN 'duplicate'
            WHEN NOT (${sqlHex60("b.doc_id::VARCHAR")} % 1000000 <
              CASE b.source WHEN 'src0' THEN 1000000
                WHEN 'src1' THEN 250000 ELSE 500000 END)
              THEN 'sampled_out'
            ELSE 'kept' END AS stage
        FROM base b LEFT JOIN surv s ON s.keep_id = b.doc_id)
      SELECT stage, count(*)::BIGINT AS n_docs,
        sum(length(text))::BIGINT AS n_chars
      FROM lab GROUP BY stage"""
    })

  /** Leakage-safe train/valid/test split over the near-dup CLUSTERS
    * ([[graft.ops.Sample.leakageSafeSplit]]): the split key is the
    * q32 survivor's keep_id, so near-duplicates never straddle splits
    * — the train/test contamination channel a per-document split
    * leaks through. Report: per split, docs / distinct clusters /
    * char mass, plus the leakage invariant itself (clusters spanning
    * >1 split — 0 by construction, and the oracle RE-DERIVES it from
    * the data, so a hash-of-the-wrong-column regression
    * hash-mismatches instead of passing silently). The 1-row
    * invariant frame broadcasts (bounded by construction).
    */
  private val q220 = QueryDef(
    "q220_leakage_split",
    (s, dir) => {
      val tagged = graft.ops.Sample.leakageSafeSplit(
        Tables.documents(s, dir).join(docSurvivorsCached(s, dir), Seq("doc_id")),
        "keep_id", cuts = Seq(900, 950), den = 1000)
      // ONE corpus pass: pre-reduce to the (cluster, split) domain —
      // both the per-split report and the leaky-cluster count are
      // functions of it. The domain frame is PINNED because column
      // pruning specializes the two readers' aggregates (the leaky
      // branch drops __ch), so exchange reuse alone cannot dedupe
      // them — the former shape re-ran the documents ⋈ survivors join
      // per aggregation.
      val g1 = graft.util.Pin.cut(
        tagged.groupBy(col("keep_id"), col("split"))
          .agg(count(lit(1)).as("__nd"), sum(col("n_chars")).as("__ch")))
      val leaky = g1.groupBy(col("keep_id"))
        .agg(count(lit(1)).as("__ns"))
        .filter(col("__ns") > 1)
        .agg(count(lit(1)).as("n_leaky_clusters"))
      g1.groupBy(col("split"))
        .agg(sum(col("__nd")).as("n_docs"),
          count(lit(1)).as("n_clusters"),
          sum(col("__ch")).as("chars"))
        .crossJoin(broadcast(leaky))
    },
    Some(s"""WITH $sqlSurvivorCtes,
      t AS (SELECT d.doc_id, d.n_chars, s.keep_id,
          CASE WHEN ${sqlHex60("'split' || s.keep_id")} % 1000 < 900 THEN 0
               WHEN ${sqlHex60("'split' || s.keep_id")} % 1000 < 950 THEN 1
               ELSE 2 END AS split
        FROM documents d JOIN surv s USING (doc_id)),
      leaky AS (SELECT count(*) AS n_leaky FROM (
        SELECT keep_id FROM t GROUP BY keep_id
        HAVING count(DISTINCT split) > 1)),
      agg AS (SELECT split, count(*) AS n_docs,
          count(DISTINCT keep_id) AS n_clusters, sum(n_chars) AS chars
        FROM t GROUP BY split)
      SELECT split::BIGINT AS split, n_docs::BIGINT AS n_docs,
        n_clusters::BIGINT AS n_clusters, chars::BIGINT AS chars,
        n_leaky::BIGINT AS n_leaky_clusters
      FROM agg CROSS JOIN leaky"""))

  /** Adjacent-bigram collocation lift (NgramLm.bigramLift): the
    * phrase-detection pass before tokenizer training — positional
    * marginals, one exact integer division per pair (see the op doc;
    * distinct from the DOC-level co-occurrence PMI of q149's family).
    */
  private val q221 = QueryDef(
    "q221_collocations",
    (s, dir) => graft.ops.NgramLm.bigramLift(
      Tables.documents(s, dir), "text", minCount = 5L),
    Some(s"""WITH t AS (SELECT $T AS toks FROM documents WHERE len($T) >= 2),
      bi AS (SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t)),
      c AS (SELECT w1, w2, count(*) AS c_ab FROM bi GROUP BY 1, 2),
      m AS (SELECT *, sum(c_ab) OVER (PARTITION BY w1) AS c_a,
          sum(c_ab) OVER (PARTITION BY w2) AS c_b FROM c),
      n AS (SELECT sum(c_ab)::HUGEINT AS n_bi FROM c)
      SELECT w1, w2, c_ab::BIGINT AS c_ab, c_a::BIGINT AS c_a,
        c_b::BIGINT AS c_b,
        ((1000000::HUGEINT * c_ab * n_bi)
          // (c_a::HUGEINT * c_b))::BIGINT AS lift_ppm
      FROM m CROSS JOIN n WHERE c_ab >= 5"""))

  /** Vocabulary-growth curve (NgramLm.vocabGrowth): new words + running
    * vocabulary per ingest bucket (per-doc granularity here — the
    * synthetic corpus has a compact vocabulary), from first occurrences —
    * one word-keyed shuffle, no running distinct (op doc).
    */
  private val q222 = QueryDef(
    "q222_vocab_growth",
    (s, dir) => graft.ops.NgramLm.vocabGrowth(
      Tables.documents(s, dir), "doc_id", "text", bucketSize = 1L),
    Some(s"""WITH w AS (SELECT min(doc_id) AS first_doc
        FROM (SELECT doc_id, unnest($T) AS w FROM documents)
        WHERE w <> '' GROUP BY w),
      b AS (SELECT first_doc // 1 AS bucket, count(*) AS n_new_words
        FROM w GROUP BY 1)
      SELECT bucket::BIGINT AS bucket, n_new_words::BIGINT AS n_new_words,
        (sum(n_new_words) OVER (ORDER BY bucket))::BIGINT AS cum_vocab
      FROM b"""))

  /** Train/test 8-gram contamination over the q220 leakage-safe split
    * (Sample.splitContamination): document-level leakage is zero by
    * construction; this measures what still straddles at n-gram
    * granularity — the audit an eval owner reads.
    */
  private val q223 = QueryDef(
    "q223_split_contamination",
    (s, dir) => {
      val tagged = graft.ops.Sample.leakageSafeSplit(
        Tables.documents(s, dir).join(docSurvivorsCached(s, dir), Seq("doc_id")),
        "keep_id", cuts = Seq(900, 950), den = 1000)
      graft.ops.Sample.splitContamination(tagged, "text",
        trainSplit = 0L, testSplit = 2L, n = 8)
    },
    Some(s"""WITH $sqlSurvivorCtes,
      t AS (SELECT d.text,
          CASE WHEN ${sqlHex60("'split' || s.keep_id")} % 1000 < 900 THEN 0
               WHEN ${sqlHex60("'split' || s.keep_id")} % 1000 < 950 THEN 1
               ELSE 2 END AS split
        FROM documents d JOIN surv s USING (doc_id)),
      tk AS (SELECT split, $T AS toks FROM t
        WHERE split IN (0, 2) AND len($T) >= 8),
      g AS (SELECT DISTINCT split,
          ${sqlHex60("array_to_string(toks[i:i+7], ' ')")} AS gh
        FROM (SELECT split, toks, unnest(range(1, len(toks) - 6)) AS i
          FROM tk)),
      p AS (SELECT gh,
          max(CASE WHEN split = 0 THEN 1 ELSE 0 END) AS in_train,
          max(CASE WHEN split = 2 THEN 1 ELSE 0 END) AS in_test
        FROM g GROUP BY gh)
      SELECT sum(in_test)::BIGINT AS n_test_grams,
        sum(in_train * in_test)::BIGINT AS n_contaminated,
        (CASE WHEN sum(in_test) > 0
           THEN (1000000::HUGEINT * sum(in_train * in_test)) // sum(in_test)
           ELSE 0 END)::BIGINT AS contamination_ppm
      FROM p"""))

  /** Concat-and-chunk sequence packing (ShardExport.packChunks): cut
    * the token line into 512-token training sequences and report each
    * chunk's doc overlap / straddle / fill — the distributed prefix
    * sum (Sweep.runningSum) plus one chunk-keyed aggregation; the
    * per-doc fan-out is bounded by the doc's own length.
    */
  private val q224 = QueryDef(
    "q224_pack_chunks",
    (s, dir) => graft.ops.ShardExport.packChunks(
      Tables.documents(s, dir), "doc_id", "text", chunkTokens = 512L),
    Some(s"""WITH d AS (SELECT doc_id, len($T)::BIGINT AS ntok
        FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL),
      r AS (SELECT doc_id, ntok,
          (sum(ntok) OVER (ORDER BY doc_id))::BIGINT AS running FROM d),
      e AS (SELECT running - ntok AS start, running,
          (running - ntok) // 512 AS c0, (running - 1) // 512 AS c1
        FROM r),
      x AS (SELECT start, running, c0,
          unnest(range(c0, c1 + 1)) AS chunk FROM e)
      SELECT chunk::BIGINT AS chunk, count(*)::BIGINT AS n_docs,
        sum(CASE WHEN chunk = c0 THEN 1 ELSE 0 END)::BIGINT AS n_starting,
        max(CASE WHEN chunk > c0 THEN 1 ELSE 0 END)::BIGINT
          AS starts_mid_doc,
        sum(least(running, (chunk + 1) * 512)
          - greatest(start, chunk * 512))::BIGINT AS n_tokens
      FROM x GROUP BY chunk"""))

  /** Dedup-aware effective dataset size per source
    * (Dedup.effectiveSize over the q32 survivor clusters): each doc
    * weighted ⌊10⁶/cluster size⌋ ppm — soft dedup's answer to "how
    * much UNIQUE data does each source really contribute".
    */
  private val q225 = QueryDef(
    "q225_effective_size",
    (s, dir) => graft.ops.Dedup.effectiveSize(
      Tables.documents(s, dir).join(docSurvivorsCached(s, dir), Seq("doc_id")),
      "keep_id", "source"),
    Some(s"""WITH $sqlSurvivorCtes,
      sz AS (SELECT keep_id, count(*) AS csize FROM surv GROUP BY keep_id),
      j AS (SELECT d.source, s.keep_id, 1000000 // sz.csize AS w_ppm
        FROM documents d JOIN surv s USING (doc_id)
        JOIN sz ON s.keep_id = sz.keep_id)
      SELECT source, count(*)::BIGINT AS n_docs,
        count(DISTINCT keep_id)::BIGINT AS n_clusters,
        sum(w_ppm)::BIGINT AS sum_weight_ppm,
        (sum(w_ppm) // count(*))::BIGINT AS effective_ppm
      FROM j GROUP BY source"""))

  /** Proportionally allocated deterministic sample
    * (Sample.proportionalSample): largest-remainder quotas ∝ source
    * size, membership = each source's smallest salted id hashes via
    * the bounded min-k heap — no per-stratum window over raw rows.
    */
  private val q226 = QueryDef(
    "q226_proportional_sample",
    (s, dir) => graft.ops.Sample.proportionalSample(
      Tables.documents(s, dir), "source", "doc_id", budget = 30L),
    Some(s"""WITH c AS (SELECT source, count(*) AS n_rows FROM documents
          GROUP BY source),
      t AS (SELECT *, sum(n_rows) OVER () AS total FROM c),
      b AS (SELECT *, (n_rows::HUGEINT * 30) // total AS base,
          (n_rows::HUGEINT * 30) % total AS rem FROM t),
      q AS (SELECT *, 30 - sum(base) OVER () AS deficit,
          row_number() OVER (ORDER BY rem DESC, source ASC) AS rk FROM b),
      qq AS (SELECT source, n_rows,
          base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS quota FROM q),
      h AS (SELECT source, doc_id,
          ${sqlHex60("'psample' || doc_id::VARCHAR")} AS h FROM documents),
      r AS (SELECT h.source, h.doc_id, qq.n_rows, qq.quota,
          row_number() OVER (PARTITION BY h.source
            ORDER BY h.h ASC, h.doc_id ASC) AS rank
        FROM h JOIN qq USING (source))
      SELECT source, doc_id, rank::BIGINT AS rank,
        n_rows::BIGINT AS n_rows, quota::BIGINT AS quota
      FROM r WHERE rank <= quota"""))

  /** Tokenizer fertility per source (NgramLm.bpeFertility): the
    * q187-trained 3-round BPE segmentation applied back to the corpus
    * — subword tokens per word in exact ppm, the context-budget
    * number a tokenizer owner reads per source before freezing a
    * vocabulary. The oracle replays the q187/q191 unrolled trajectory
    * and joins its final per-word segment counts onto the pre-reduced
    * (source, word) occurrence table.
    *
    * PRECONDITION (shared with q187/q191, a property of the unrolled
    * ORACLE, not of the operator): the corpus must admit ≥ 3 merge
    * rounds — the oracle's per-round `CROSS JOIN b$r` against the
    * 1-row argmax CTE empties the whole symbol table when a round has
    * no adjacent pair left (an all-single-char corpus), while the
    * Scala trainer's loop exits early keeping the last valid
    * segmentation. Every test corpus satisfies it by construction;
    * degenerate corpora diverge oracle-side only.
    */
  private val q227 = QueryDef(
    "q227_bpe_fertility",
    (s, dir) => graft.ops.NgramLm.bpeFertility(
      Tables.documents(s, dir), s"docs:$dir", "source", "text", merges = 3),
    Some {
      val steps = (1 to 3).map { r =>
        s"""p$r AS (SELECT w, wc, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s${r - 1}),
         b$r AS (SELECT sym AS l, nxt AS rr FROM p$r
           WHERE nxt IS NOT NULL GROUP BY sym, nxt
           ORDER BY sum(wc) DESC, l ASC, rr ASC LIMIT 1),
         mk$r AS (SELECT p.*, CASE WHEN p.sym = b.l AND p.nxt = b.rr
             THEN 1 ELSE 0 END AS mark
           FROM p$r p CROSS JOIN b$r b),
         il$r AS (SELECT *, CASE WHEN mark = 1 THEN pos - row_number()
             OVER (PARTITION BY w, mark ORDER BY pos) END AS grp FROM mk$r),
         kp$r AS (SELECT *, CASE WHEN mark = 1 AND row_number()
             OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1
             THEN 1 ELSE 0 END AS keep FROM il$r),
         f$r AS (SELECT w, wc, pos,
           CASE WHEN keep = 1 THEN sym || nxt ELSE sym END AS sym
           FROM kp$r QUALIFY coalesce(lag(keep)
             OVER (PARTITION BY w ORDER BY pos), 0) = 0),
         s$r AS (SELECT w, wc,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           FROM f$r)"""
      }.mkString(",\n      ")
      s"""WITH wt AS (SELECT w, count(*) AS wc FROM
        (SELECT unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY w),
      s0 AS (SELECT w, wc, pos, substring(w, pos, 1) AS sym FROM
        (SELECT w, wc, unnest(range(1, length(w) + 1)) AS pos FROM wt)),
      $steps,
      seg AS (SELECT w, max(pos)::BIGINT AS n_sub FROM s3 GROUP BY w),
      occ AS (SELECT source, w, count(*) AS n_occ FROM
          (SELECT source, unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY source, w)
      SELECT source, sum(n_occ)::BIGINT AS n_words,
        sum(n_occ * n_sub)::BIGINT AS n_subword_tokens,
        ((1000000::HUGEINT * sum(n_occ * n_sub)) // sum(n_occ))::BIGINT
          AS fertility_ppm
      FROM occ JOIN seg USING (w) GROUP BY source"""
    })

  /** Unrolled unigram-LM trainer CTEs (q228/q229): replays
    * [[graft.ops.NgramLm.unigramTrain]] relationally — seed substring
    * counts, `dpLen` unrolled Viterbi DP positions per E-step, usage
    * M-step, top-V ∪ single-char prune, final E-step; ends in `u2seg`
    * (w, wc, np, path). PRECONDITION (the q187/q227 unroll rule, an
    * oracle-side property): corpus max word length ≤ `dpLen` — a
    * longer word runs off the unrolled positions and drops from the
    * oracle while the Scala kernel segments it (every test corpus,
    * including the 10×/30× salted synths, stays ≤ 11 chars). The
    * precondition is ENFORCED, not merely pinned: the `uwt` CTE
    * carries a DuckDB `error(...)` guard that fails the oracle loudly
    * with the offending length the moment a corpus word exceeds
    * `dpLen`, instead of surfacing as an opaque hash mismatch
    * (`UnigramOracleGuardSpec` replays the guard on an overlong word).
    */
  private def sqlUnigramCtes(vocabSize: Int, dpLen: Int = 16): String = {
    def dp(p: String, edges: String): String = {
      val steps = (1 to dpLen).map { i =>
        s"""${p}c$i AS (SELECT d.w, d.wc, $i AS pos, d.np + 1 AS np,
           d.sc + e.cnt AS sc, list_append(d.path, e.piece) AS path
         FROM ${p}a${i - 1} d JOIN $edges e
           ON e.w = d.w AND e.start = d.pos + 1 AND e.start + e.plen - 1 = $i),
       ${p}d$i AS (SELECT w, wc, pos, np, sc, path FROM ${p}c$i
         QUALIFY row_number() OVER (PARTITION BY w
           ORDER BY np ASC, sc DESC, path ASC) = 1),
       ${p}a$i AS MATERIALIZED (
         SELECT * FROM ${p}a${i - 1} UNION ALL SELECT * FROM ${p}d$i)"""
      }.mkString(",\n      ")
      s"""${p}a0 AS MATERIALIZED (SELECT w, wc, 0 AS pos, 0 AS np, 0::HUGEINT AS sc,
          CAST([] AS VARCHAR[]) AS path FROM uwt),
        $steps,
        ${p}seg AS (SELECT w, wc, np, path FROM ${p}a$dpLen
          WHERE pos = length(w))"""
    }
    s"""uraw AS MATERIALIZED (SELECT w, count(*)::BIGINT AS wc FROM
        (SELECT unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY w),
      uglen AS (SELECT CASE WHEN max(length(w)) > $dpLen
          THEN error('unigram oracle precondition violated: max word length '
            || max(length(w)) || ' > unrolled dpLen $dpLen')
          ELSE 0 END AS zero FROM uraw),
      uwt AS MATERIALIZED (SELECT w, (wc + g.zero)::BIGINT AS wc
        FROM uraw CROSS JOIN uglen g),
      usub AS MATERIALIZED (SELECT w, wc, start, plen, substring(w, start, plen) AS piece
        FROM (SELECT w, wc, unnest(range(1, length(w) + 1)) AS start FROM uwt)
        CROSS JOIN (SELECT unnest([1, 2, 3, 4]) AS plen)
        WHERE start + plen - 1 <= length(w)),
      useed AS (SELECT piece, sum(wc)::BIGINT AS cnt FROM usub GROUP BY piece),
      ue1 AS MATERIALIZED (SELECT s.w, s.start, s.plen, s.piece, d.cnt
        FROM usub s JOIN useed d USING (piece)),
      ${dp("u1", "ue1")},
      uusage AS (SELECT piece, sum(wc)::BIGINT AS cnt
        FROM (SELECT wc, unnest(path) AS piece FROM u1seg) GROUP BY piece),
      ukeep AS (
        SELECT piece, cnt FROM (SELECT piece, cnt,
            row_number() OVER (ORDER BY cnt DESC, piece ASC) AS rk
          FROM uusage) WHERE rk <= $vocabSize
        UNION
        SELECT c.piece, coalesce(u.cnt, 0)::BIGINT AS cnt FROM
          (SELECT DISTINCT piece FROM usub WHERE plen = 1) c
          LEFT JOIN uusage u USING (piece)),
      ue2 AS MATERIALIZED (SELECT s.w, s.start, s.plen, s.piece, k.cnt
        FROM usub s JOIN ukeep k USING (piece)),
      ${dp("u2", "ue2")}"""
  }

  /** Spark-side mirror of the `uglen` oracle guard: the 1-row
    * loud-fail frame q228–q230 cross-join so the dpLen = 16 unroll
    * precondition fails BOTH engines with a pointed message instead
    * of an opaque hash mismatch (shares the cached segmentation —
    * zero extra corpus scans).
    */
  private def unigramGuard(s: org.apache.spark.sql.SparkSession,
      dir: String) =
    graft.ops.NgramLm.unigramLenGuard(
      Tables.documents(s, dir), s"docs:$dir", "text",
      vocabSize = 24, maxLen = 16)

  /** Unigram-LM tokenizer trainer (NgramLm.unigramTrain): hard-EM —
    * seed substring counts, Viterbi E-step (fewest pieces, then
    * greatest total count, then lexicographically least sequence —
    * integer-exact, no log-probs), usage M-step, prune to the 24
    * most-used pieces ∪ all single chars, final E-step. Output: the
    * trained vocabulary with corpus-weighted usage, the q191 analogue.
    */
  private val q228 = QueryDef(
    "q228_unigram_train",
    (s, dir) => graft.ops.NgramLm.unigramTrain(
      Tables.documents(s, dir), s"docs:$dir", "text", vocabSize = 24)
      .crossJoin(broadcast(unigramGuard(s, dir)))
      .withColumn("n_occ", (col("n_occ") + col("__glz")).cast("long"))
      .drop("__glz"),
    Some(s"""WITH ${sqlUnigramCtes(24)}
      SELECT piece, sum(wc)::BIGINT AS n_occ
      FROM (SELECT wc, unnest(path) AS piece FROM u2seg) GROUP BY piece"""))

  /** BPE vs unigram fertility per source
    * (NgramLm.tokenizerFertilityCompare): the tokenizer-selection
    * report — both trainers' subword-per-word ppm side by side on the
    * identical corpus; delta_ppm > 0 means BPE fragments that source
    * more. The oracle replays BOTH unrolled trajectories (q227's
    * 3-round BPE + the q228 unigram DP) in one statement.
    */
  private val q229 = QueryDef(
    "q229_tokenizer_compare",
    (s, dir) => graft.ops.NgramLm.tokenizerFertilityCompare(
      Tables.documents(s, dir), s"docs:$dir", "source", "text",
      merges = 3, vocabSize = 24)
      .crossJoin(broadcast(unigramGuard(s, dir)))
      .withColumn("n_words", (col("n_words") + col("__glz")).cast("long"))
      .drop("__glz"),
    Some {
      val steps = (1 to 3).map { r =>
        s"""p$r AS (SELECT w, wc, pos, sym,
           lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt FROM s${r - 1}),
         b$r AS (SELECT sym AS l, nxt AS rr FROM p$r
           WHERE nxt IS NOT NULL GROUP BY sym, nxt
           ORDER BY sum(wc) DESC, l ASC, rr ASC LIMIT 1),
         mk$r AS (SELECT p.*, CASE WHEN p.sym = b.l AND p.nxt = b.rr
             THEN 1 ELSE 0 END AS mark
           FROM p$r p CROSS JOIN b$r b),
         il$r AS (SELECT *, CASE WHEN mark = 1 THEN pos - row_number()
             OVER (PARTITION BY w, mark ORDER BY pos) END AS grp FROM mk$r),
         kp$r AS (SELECT *, CASE WHEN mark = 1 AND row_number()
             OVER (PARTITION BY w, grp ORDER BY pos) % 2 = 1
             THEN 1 ELSE 0 END AS keep FROM il$r),
         f$r AS (SELECT w, wc, pos,
           CASE WHEN keep = 1 THEN sym || nxt ELSE sym END AS sym
           FROM kp$r QUALIFY coalesce(lag(keep)
             OVER (PARTITION BY w ORDER BY pos), 0) = 0),
         s$r AS (SELECT w, wc,
           row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, sym
           FROM f$r)"""
      }.mkString(",\n      ")
      s"""WITH wt AS (SELECT w, count(*) AS wc FROM
        (SELECT unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY w),
      s0 AS (SELECT w, wc, pos, substring(w, pos, 1) AS sym FROM
        (SELECT w, wc, unnest(range(1, length(w) + 1)) AS pos FROM wt)),
      $steps,
      bseg AS (SELECT w, max(pos)::BIGINT AS n_sub FROM s3 GROUP BY w),
      occ AS (SELECT source, w, count(*) AS n_occ FROM
          (SELECT source, unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY source, w),
      bf AS (SELECT source, sum(n_occ)::BIGINT AS n_words,
          sum(n_occ * n_sub)::BIGINT AS bpe_tokens,
          ((1000000::HUGEINT * sum(n_occ * n_sub)) // sum(n_occ))::BIGINT
            AS bpe_fertility_ppm
        FROM occ JOIN bseg USING (w) GROUP BY source),
      ${sqlUnigramCtes(24)},
      uf AS (SELECT source, sum(n_occ * np)::BIGINT AS uni_tokens,
          ((1000000::HUGEINT * sum(n_occ * np)) // sum(n_occ))::BIGINT
            AS uni_fertility_ppm
        FROM occ JOIN (SELECT w, np FROM u2seg) USING (w) GROUP BY source)
      SELECT bf.source, n_words, bpe_tokens, bpe_fertility_ppm,
        uni_tokens, uni_fertility_ppm,
        (bpe_fertility_ppm - uni_fertility_ppm)::BIGINT AS delta_ppm
      FROM bf JOIN uf USING (source)"""
    })

  /** Unigram-segmentation char-fallback coverage per source
    * (NgramLm.unigramCoverage): of the subword tokens the q228-trained
    * segmentation emits, the exact-ppm share that are single-character
    * fallbacks — the OOV-pressure audit read next after q229's
    * fertility before freezing a vocabulary.
    */
  private val q230 = QueryDef(
    "q230_unigram_coverage",
    (s, dir) => graft.ops.NgramLm.unigramCoverage(
      Tables.documents(s, dir), s"docs:$dir", "source", "text",
      vocabSize = 24)
      .crossJoin(broadcast(unigramGuard(s, dir)))
      .withColumn("n_subword_tokens",
        (col("n_subword_tokens") + col("__glz")).cast("long"))
      .drop("__glz"),
    Some(s"""WITH ${sqlUnigramCtes(24)},
      useg AS (SELECT w, np,
          len(list_filter(path, p -> length(p) = 1)) AS nc FROM u2seg),
      occ AS (SELECT source, w, count(*) AS n_occ FROM
          (SELECT source, unnest($T) AS w FROM documents)
        WHERE length(w) >= 1 GROUP BY source, w)
      SELECT source, sum(n_occ * np)::BIGINT AS n_subword_tokens,
        sum(n_occ * nc)::BIGINT AS n_char_tokens,
        ((1000000::HUGEINT * sum(n_occ * nc)) // sum(n_occ * np))::BIGINT
          AS char_fallback_ppm
      FROM occ JOIN useg USING (w) GROUP BY source"""))

  /** DSIR-style importance resampling (ops.Dsir.resample): raw-pool
    * documents weighted by how target-like (source src0) their hashed
    * bag-of-words mass is under target-vs-raw add-one bucket models —
    * per-dim likelihood ratios quantized to ⌊2²⁰·ratio⌋ integers
    * (saturating at 2⁴⁰, the q169 no-log rule), a doc's weight the
    * feature-mass-weighted mean ratio — then k=100 PPS hits via the
    * RNG-free distributed-prefix-sum systematic draw (q76's machinery).
    * The curation pipeline's domain-matching step after quality + dedup.
    */
  private val q231 = QueryDef(
    "q231_dsir_resample",
    (s, dir) => graft.ops.Dsir.resample(
      Tables.documents(s, dir), "doc_id", "text",
      isTarget = col("source") === "src0", k = 100, dims = 32),
    Some(s"""WITH tok AS (SELECT doc_id,
          coalesce(source = 'src0', false) AS tgt, unnest($T) AS tok
        FROM documents),
      hh AS (SELECT doc_id, tgt, ${sqlHex60("tok")} AS h FROM tok),
      sgn AS (SELECT doc_id, tgt, h % 32 AS dim,
          CASE WHEN (h // 32) % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM hh),
      bow AS MATERIALIZED (SELECT doc_id, tgt, dim,
          abs(sum(sgn))::HUGEINT AS n
        FROM sgn GROUP BY doc_id, tgt, dim HAVING sum(sgn) <> 0),
      model AS (SELECT dim,
          sum(CASE WHEN tgt THEN n ELSE 0 END)::HUGEINT AS c_t,
          sum(CASE WHEN NOT tgt THEN n ELSE 0 END)::HUGEINT AS c_r
        FROM bow GROUP BY dim),
      tot AS (SELECT sum(c_t)::HUGEINT AS n_t, sum(c_r)::HUGEINT AS n_r
        FROM model),
      qd AS (SELECT dim,
          least((1048576::HUGEINT * (c_t + 1) * (n_r + 32))
              // ((c_r + 1) * (n_t + 32)),
            1099511627776::HUGEINT) AS q
        FROM model CROSS JOIN tot),
      wts AS (SELECT doc_id, (sum(n * q) // sum(n))::BIGINT AS w
        FROM bow JOIN qd USING (dim) WHERE NOT tgt GROUP BY doc_id),
      pos AS (SELECT doc_id, w FROM wts WHERE w > 0),
      cum AS (SELECT doc_id, w,
          (sum(w) OVER (ORDER BY doc_id))::BIGINT AS running FROM pos),
      st AS (SELECT greatest(max(running) // 100, 1) AS step FROM cum)
      SELECT doc_id, w,
        least(running // step, 100) - least((running - w) // step, 100)
          AS n_hits
      FROM cum CROSS JOIN st
      WHERE least(running // step, 100)
        - least((running - w) // step, 100) > 0"""))

  /** Epoch-capped mixture allocation (Sample.mixtureAllocate): the
    * pretraining data-mixture table — per-language token budgets from
    * target shares with a 1.5-epoch cap per source, the capped
    * sources' unabsorbed budget flowing to the uncapped ones by the
    * CLOSED-FORM water-fill (capped set = a prefix of cap/share
    * order, found by one running-AND window; residual split by exact
    * largest remainder). One corpus pass for the per-class token
    * sums; everything else on the pinned |classes|-row frame. 'de'
    * is deliberately absent from the share map — the share-0 path
    * reports alloc 0 with a null epochs figure.
    */
  private val q232 = QueryDef(
    "q232_mixture_allocate",
    (s, dir) => graft.ops.Sample.mixtureAllocate(
      Tables.documents(s, dir), "lang",
      size(TextKernels.tokens(col("text"))).cast("long"),
      sharesPpm = Map("en" -> 350000L, "zh" -> 300000L,
        "es" -> 250000L, "fr" -> 100000L),
      budget = 30000L, maxEpochsPpm = 1500000L),
    Some(s"""WITH w AS (SELECT lang, sum(len($T))::BIGINT AS avail
        FROM documents GROUP BY lang),
      sh AS (SELECT * FROM (VALUES ('en', 350000), ('zh', 300000),
          ('es', 250000), ('fr', 100000)) AS t(lang, share_ppm)),
      c AS (SELECT w.lang, avail,
          coalesce(sh.share_ppm, 0)::BIGINT AS share_ppm,
          ((avail::HUGEINT * 1500000) // 1000000)::BIGINT AS cap
        FROM w LEFT JOIN sh USING (lang)),
      p AS (SELECT *, cap::HUGEINT * 1000000000000 // share_ppm AS rkey
        FROM c WHERE share_ppm > 0),
      lv AS (SELECT *,
          coalesce(sum(cap) OVER pre, 0)::BIGINT AS pre_cap,
          coalesce(sum(share_ppm) OVER pre, 0)::BIGINT AS pre_share,
          sum(share_ppm) OVER ()::BIGINT AS s_all
        FROM p WINDOW pre AS (ORDER BY rkey ASC, lang ASC NULLS LAST
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      cp AS (SELECT *,
          min(CASE WHEN cap::HUGEINT * (s_all - pre_share)
                <= share_ppm::HUGEINT * (30000 - pre_cap)
              THEN 1 ELSE 0 END)
            OVER (ORDER BY rkey ASC, lang ASC NULLS LAST
              ROWS UNBOUNDED PRECEDING) = 1 AS capped
        FROM lv),
      rs AS (SELECT *,
          (30000 - coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0))::BIGINT
            AS b_res,
          (s_all - coalesce(sum(CASE WHEN capped THEN share_ppm END) OVER (), 0))::BIGINT
            AS s_res
        FROM cp),
      bs AS (SELECT *,
          CASE WHEN capped OR s_res <= 0 THEN 0
            ELSE ((share_ppm::HUGEINT * b_res) // s_res)::BIGINT END AS base,
          CASE WHEN capped OR s_res <= 0 THEN -1
            ELSE ((share_ppm::HUGEINT * b_res) % s_res)::BIGINT END AS rem
        FROM rs),
      al AS (SELECT *,
          (b_res - coalesce(sum(CASE WHEN NOT capped THEN base END) OVER (), 0))::BIGINT
            AS deficit,
          row_number() OVER (ORDER BY rem DESC, lang ASC NULLS LAST) AS rn
        FROM bs),
      fin AS (SELECT lang, avail, share_ppm, cap, capped,
          CASE WHEN capped THEN cap ELSE base
            + CASE WHEN rn <= deficit AND rem >= 0 THEN 1 ELSE 0 END END AS alloc
        FROM al)
      SELECT lang, avail, share_ppm, cap, capped, alloc,
        CASE WHEN avail > 0
          THEN ((alloc::HUGEINT * 1000000) // avail)::BIGINT END AS epochs_ppm
      FROM fin
      UNION ALL
      SELECT lang, avail, share_ppm, cap, false AS capped,
        0::BIGINT AS alloc, NULL::BIGINT AS epochs_ppm
      FROM c WHERE share_ppm <= 0"""))

  /** Cluster distinctive-term report (TfIdf.clusterKeywords over the
    * q69-contract embedding cells): c-TF-IDF-style integer lift
    * ⌊10⁶·(c_ct/N_c)/(c_t/N)⌋, top-5 terms per cell with n_ct ≥ 2 —
    * the human-readable cluster label a curation run prints before
    * deciding what each embedding cluster is. Documents link to
    * cells by doc_id = vec_id (inner — docs without a vector simply
    * don't vote); assignment replays exactly on both engines because
    * the centroids are the first 8 vectors.
    */
  private val q233 = QueryDef(
    "q233_cluster_keywords",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cents = e.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      val assign = Similarity.assignCells(e, "embedding", cents)
        .select(col("vec_id").as("doc_id"), col("cell_id"))
      graft.ops.TfIdf.clusterKeywords(
        Tables.documents(s, dir), "doc_id", "text", assign,
        k = 5, minCount = 2)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings WHERE vec_id < 8),
      asg AS (SELECT vec_id, cell_id FROM (
        SELECT e.vec_id, c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")},
              '-infinity'::DOUBLE) DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      tok AS (SELECT a.cell_id, unnest($T) AS term
        FROM documents d JOIN asg a ON d.doc_id = a.vec_id),
      ct AS (SELECT cell_id, term, count(*)::BIGINT AS n_ct
        FROM tok WHERE term <> '' GROUP BY cell_id, term),
      ctot AS (SELECT cell_id, sum(n_ct)::BIGINT AS n_c FROM ct GROUP BY cell_id),
      ttot AS (SELECT term, sum(n_ct)::BIGINT AS n_t FROM ct GROUP BY term),
      tot AS (SELECT sum(n_ct)::HUGEINT AS n_all FROM ct),
      sc AS (SELECT ct.cell_id, ct.term, n_ct, n_c, n_t,
          ((1000000::HUGEINT * n_ct * n_all)
            // (n_c::HUGEINT * n_t))::BIGINT AS lift_ppm
        FROM ct JOIN ctot USING (cell_id) JOIN ttot USING (term)
          CROSS JOIN tot
        WHERE n_ct >= 2),
      rk AS (SELECT *, row_number() OVER (PARTITION BY cell_id
          ORDER BY lift_ppm DESC, term ASC) AS rank FROM sc)
      SELECT cell_id, term, n_ct, n_c, n_t, lift_ppm, rank::BIGINT AS rank
      FROM rk WHERE rank <= 5"""))

  /** D4-style two-stage embedding prune (Similarity.d4Prune): per-row
    * verdicts — 'dup' (a smaller-id cell-mate within ⌊10⁶·cos⌋ ≥
    * 700000), 'proto' (top 20% of survivors closest to the own
    * centroid), 'kept'. Cells scale with the corpus (max(8, N/250),
    * the q124 rule) so the cell-local pair stage stays O(N) at any
    * size; the oracle replays assignment, the anti-chain dup rule,
    * and the one-window survivor rank relationally.
    */
  private val q234 = QueryDef(
    "q234_d4_prune",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val cells = math.max(8L, e.count() / 250L)
      val cents = e.filter(col("vec_id") < cells)
        .select(col("vec_id").as("cell_id"), col("embedding").as("cvec"))
      Similarity.d4Prune(e, "vec_id", "embedding", cents,
        dupPpm = 700000L, protoPpm = 200000L)
    },
    Some(s"""WITH cents AS (SELECT vec_id AS cell_id, embedding AS cvec
        FROM embeddings
        WHERE vec_id < (SELECT greatest(8, count(*) // 250) FROM embeddings)),
      asg AS (SELECT vec_id, embedding, ccos, cell_id FROM (
        SELECT e.vec_id, e.embedding,
          coalesce(${sqlCos("e.embedding", "c.cvec")},
            '-infinity'::DOUBLE) AS ccos,
          c.cell_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY coalesce(${sqlCos("e.embedding", "c.cvec")},
              '-infinity'::DOUBLE) DESC, c.cell_id ASC) AS rk
        FROM embeddings e CROSS JOIN cents c) WHERE rk = 1),
      dups AS (SELECT DISTINCT b.vec_id
        FROM asg a JOIN asg b USING (cell_id)
        WHERE a.vec_id < b.vec_id
          AND floor(${sqlCos("a.embedding", "b.embedding")} * 1000000)::BIGINT
            >= 700000),
      m AS (SELECT g.cell_id, g.vec_id, g.ccos,
          (d.vec_id IS NOT NULL) AS is_dup
        FROM asg g LEFT JOIN dups d ON g.vec_id = d.vec_id),
      w AS (SELECT *,
          row_number() OVER (PARTITION BY cell_id
            ORDER BY is_dup ASC, ccos DESC, vec_id ASC) AS rk,
          sum(CASE WHEN NOT is_dup THEN 1 ELSE 0 END)
            OVER (PARTITION BY cell_id) AS n_surv
        FROM m)
      SELECT cell_id, vec_id,
        CASE WHEN is_dup THEN 'dup'
          WHEN rk <= (n_surv * 200000) // 1000000 THEN 'proto'
          ELSE 'kept' END AS status,
        CASE WHEN ccos = '-infinity'::DOUBLE THEN NULL ELSE ccos END AS ccos
      FROM w"""))

  val all: Seq[QueryDef] = Seq(q17, q18, q19, q20, q21, q22, q23, q24,
    q25, q26, q27, q32, q33, q34, q37, q38, q52, q54, q55, q56, q63, q64,
    q66, q69, q79, q83, q85, q86, q90, q91, q94, q98, q101, q103, q105,
    q112, q115, q116, q117, q118, q119, q120, q121, q122, q123, q124,
    q125, q126, q128, q129, q130, q131, q132, q136, q137, q139, q140,
    q141, q143, q144, q147, q148, q149, q154, q157, q158, q160, q163,
    q165, q168, q169, q174, q175, q176, q178, q179, q183, q184,
    q185, q186, q187, q191, q193, q194, q195, q196, q197, q198, q199, q200,
    q201, q202, q203, q204, q205, q206, q207, q208, q209, q210, q211,
    q213, q214, q215, q216, q220, q221, q222, q223, q224, q225, q226,
    q227, q228, q229, q230, q231, q232, q233, q234)
}
