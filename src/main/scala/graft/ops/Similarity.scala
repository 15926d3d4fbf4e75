package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorKernels._

/** [EXT] Similarity search over an `array<float>` embedding column.
  *
  * Scale notes (100 TB):
  *  - `topK` broadcasts the single query vector and scans once — the
  *    global top-k is planned as TakeOrderedAndProject (per-partition
  *    heap + driver merge of k rows), no full sort, no shuffle of data.
  *  - `bucketNearDup` is the LSH scale path: sign-bucket vectors
  *    map-side, shuffle only on the bucket key, verify cosine exactly
  *    within buckets. Bucket width (`dims`) trades recall for bucket
  *    size; never an all-pairs crossJoin.
  *  - `ivfTopK` coarse-quantizes every row to its nearest centroid
  *    entirely map-side (centroids are folded into the plan as a
  *    literal array — the IVF contract is that the centroid set is
  *    small), so cell assignment adds NO shuffle and no per-row window.
  *
  * NaN discipline: a zero-norm vector would make cosine() 0/0 = NaN,
  * and NaN sorts ABOVE every real value in Spark's descending order —
  * degenerate vectors would win every top-k. All rankings here compute
  * cosine as `safeCosine`, which nulls out zero-norm rows; Spark sorts
  * NULL last on `desc`, DuckDB matches with `NULLS LAST`.
  */
object Similarity {

  /** Cosine, null (not NaN) when either side has zero norm — the
    * compiled kernel (graft.functions.Kernels.cosine), bit-identical
    * to the zip_with/aggregate Column form but one codegen'd loop.
    */
  private def safeCosine(a: Column, b: Column): Column =
    graft.functions.Kernels.cosineOf(a, b)

  /** Exact brute-force cosine top-k against one query vector (the
    * baseline every ANN variant is measured against).
    *
    * @param query single-row DataFrame with an array column named `qvec`
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, query: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(query))
      .withColumn("cos", safeCosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
      .drop("qvec")

  /** Exact cosine top-k for a BATCH of query vectors — the production
    * kNN shape (one query at a time re-scans the corpus per query;
    * real retrieval scores a query set in one pass).
    *
    * Shape at scale: the query set broadcasts (small-set contract),
    * every corpus row scores all queries map-side, and the per-query
    * reduction is [[graft.functions.TopKHeap]] — a bounded min-heap
    * partial aggregate, so the one shuffle carries at most
    * k × |queries| rows PER PARTITION (not |corpus| × |queries| rows,
    * which is what a window `row_number` plan would exchange). The
    * result explodes to (query_id, rank, id, cos) rows, rank 1..k by
    * (cos DESC, id ASC) — deterministic under any partitioning.
    *
    * @param queries DataFrame(query_id: long, qvec: array) — small,
    *                broadcast whole
    */
  def batchTopK(df: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, k: Int): DataFrame = {
    val scored = df.crossJoin(broadcast(queries))
      .select(col("query_id"),
        safeCosine(col(vecCol), col("qvec")).as("cos"),
        col(idCol).cast("long").as("__id"))
    heapReduce(scored, idCol, k)
  }

  /** The shared per-query bounded-heap reduction ([[TopK.groupedTopK]]
    * grouped on query_id, with the score column named `cos`).
    */
  private def heapReduce(scored: DataFrame, idCol: String, k: Int): DataFrame =
    TopK.groupedTopK(scored, Seq("query_id"), "cos", "__id", k)
      .select(col("query_id"), col("rank"),
        col("__id").as(idCol), col("score").as("cos"))

  /** LSH-bucketed near-duplicate pairs: vectors agreeing on the first
    * `dims` sign bits, with their exact cosine.
    */
  def bucketNearDup(df: DataFrame, idCol: String, vecCol: String, dims: Int = 12): DataFrame = {
    val b = df.select(col(idCol), col(vecCol), signBucket(col(vecCol), dims).as("bk"))
    b.as("x")
      .join(b.as("y"), col("x.bk") === col("y.bk") && col(s"x.$idCol") < col(s"y.$idCol"))
      .select(
        col(s"x.$idCol").as("vec_a"),
        col(s"y.$idCol").as("vec_b"),
        safeCosine(col(s"x.$vecCol"), col(s"y.$vecCol")).as("cos"))
  }

  /** IVF-style top-k: assign every vector to its nearest centroid
    * map-side, then search only the query's `nProbe` nearest cells.
    *
    * The centroid set is collected to the driver once and folded into
    * the plan as an `array<struct<cell_id,cvec>>` literal — the same
    * smallness contract a broadcast join would assume, but with zero
    * shuffle and zero per-row window: each row computes its argmax
    * cell inside WholeStageCodegen via `array_max` over a
    * `struct(ccos, -cell_id)` (struct ordering = field order, so ties
    * go to the smallest cell_id).
    *
    * @param centroids DataFrame(cell_id: long, cvec: array<float/double>)
    * @param query     single-row DataFrame with an array column `qvec`
    */
  /** Adds `cell_id`: each row's nearest centroid by cosine, computed
    * entirely map-side (centroids fold into the plan as a literal
    * array — the small-set contract of IVF/k-means), ties to the
    * smallest cell_id. No shuffle, no per-row window.
    *
    * @param centroids DataFrame(cell_id: long, cvec: array<float/double>)
    */
  def assignCells(df: DataFrame, vecCol: String, centroids: DataFrame): DataFrame =
    df.withColumn("cell_id", -bestCell(vecCol, centroids).getField("neg"))

  /** The map-side argmax core shared by [[assignCells]] and
    * [[clusterRepresentatives]]: a `struct(ccos, -cell_id)` maximum
    * over the literal centroid array (struct ordering = field order,
    * so ties go to the smallest cell_id; zero-norm cosines coalesce to
    * -Infinity, below every real cosine).
    */
  private def bestCell(vecCol: String, centroids: DataFrame): Column = {
    val cents = centroids.select(col("cell_id").cast("long"), col("cvec")).collect()
    val cellArr = array(cents.map { r =>
      struct(
        lit(r.getLong(0)).as("cell_id"),
        array(r.getSeq[Any](1).map(v => lit(v).cast("double")): _*).as("cvec"))
    }: _*)
    array_max(transform(cellArr, c =>
      struct(
        coalesce(safeCosine(col(vecCol), c.getField("cvec")), lit(Double.NegativeInfinity)).as("ccos"),
        (-c.getField("cell_id")).as("neg"))))
  }

  /** [EXT] Semantic dedup representative selection: one surviving row
    * per semantic cluster — every vector is assigned its nearest
    * centroid map-side (same literal-fold argmax as [[assignCells]]),
    * and the member most similar to its own centroid survives (ties to
    * the smallest id). The keep-closest-to-centroid policy is the
    * cluster-level analogue of MinHash dedup's keep-one-per-bucket.
    *
    * Shape at scale: the groupBy carries only (cell_id, cos, id) — 3
    * scalars, never the vectors — and a `max(struct(...))` aggregate
    * is partial map-side, so even with k ≪ partitions (each cell a hot
    * key) every partition pre-reduces to ≤ k rows before the shuffle.
    *
    * Output: (cell_id, idCol, cos, n_members); cos is null for a
    * zero-norm representative (only possible when the whole cell is
    * degenerate).
    */
  def clusterRepresentatives(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val best = bestCell(vecCol, centroids)
    df.select(col(idCol), best.getField("ccos").as("ccos"),
        (-best.getField("neg")).as("cell_id"))
      .groupBy(col("cell_id"))
      .agg(
        max(struct(col("ccos"), (-col(idCol)).cast("long").as("neg"))).as("b"),
        count(lit(1)).as("n_members"))
      .select(col("cell_id"), (-col("b.neg")).as(idCol),
        when(col("b.ccos") === lit(Double.NegativeInfinity), lit(null).cast("double"))
          .otherwise(col("b.ccos")).as("cos"),
        col("n_members"))
  }

  /** One Lloyd (k-means) iteration: assign map-side, then recompute
    * per-cell per-dimension means — the clustering step a curation
    * pipeline runs to bucket a corpus by topic.
    *
    * Shape: assignment adds no shuffle (literal centroids); the only
    * shuffle is the (cell_id, dim) mean aggregation, partial map-side.
    * Sums are exact: values floor-quantize to `scale`-scaled longs
    * (order-insensitive integer addition across any partitioning), and
    * the mean divides once at the end — so the step is deterministic
    * and engine-portable, unlike a float sum whose value depends on
    * partition order.
    *
    * Output: (cell_id, dim, n_members, mean) — the new centroid matrix
    * in per-dimension rows.
    */
  def kmeansStep(
      df: DataFrame, vecCol: String, centroids: DataFrame,
      scale: Long = 1000000L): DataFrame =
    assignCells(df, vecCol, centroids)
      .select(col("cell_id"),
        posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "v")))
      .groupBy(col("cell_id"), col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n_members"),
        sum(floor(col("v") * scale).cast("long")).as("sum_q"))
      .withColumn("mean", (col("sum_q").cast("double") / scale) / col("n_members"))
      .drop("sum_q")

  /** Full Lloyd's k-means to `iters` iterations (or until assignments
    * stop changing): repeated [[kmeansStep]] with the tiny (k × dims)
    * centroid matrix collected to the driver between rounds — the one
    * sanctioned driver materialization (same smallness contract as the
    * IVF centroid fold). Data-side work per iteration is one map-side
    * assignment + one aggregation; the corpus never re-shuffles on a
    * changing key.
    *
    * Returns (centroids, assignments): the final per-dimension centroid
    * rows and each row's cell.
    */
  def kmeans(
      df: DataFrame, idCol: String, vecCol: String,
      initialCentroids: DataFrame, iters: Int = 10,
      scale: Long = 1000000L): (DataFrame, DataFrame) = {
    var cents = initialCentroids.select(col("cell_id").cast("long"),
        col("cvec").cast("array<double>").as("cvec"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1))
    val spark = df.sparkSession
    import spark.implicits._
    var done = false
    var i = 0
    while (i < iters && !done) {
      val centsDf = cents.toSeq.toDF("cell_id", "cvec")
      val next = kmeansStep(df, vecCol, centsDf, scale)
        .collect()
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getLong(1)).map(_.getDouble(3)).toSeq
        }
        .toArray.sortBy(_._1)
      done = next.toSeq == cents.toSeq
      cents = next
      i += 1
    }
    val centsDf = cents.toSeq.toDF("cell_id", "cvec")
    val perDim = centsDf.select(col("cell_id"),
      posexplode(col("cvec")).as(Seq("dim", "mean")))
      .select(col("cell_id"), col("dim").cast("long").as("dim"), col("mean"))
    (perDim, assignCells(df, vecCol, centsDf).select(col(idCol), col("cell_id")))
  }

  /** IVF top-k for a BATCH of query vectors — the production eval
    * shape (a recall audit or retrieval job scores a whole query set
    * in one corpus pass, not one re-scan per query).
    *
    * Shape at scale: corpus rows get their cell entirely map-side
    * ([[assignCells]] literal fold); each query picks its `nProbe`
    * nearest cells with a window over the queries × centroids product
    * (both sides are driver-small by the IVF contract — the window
    * never sees corpus rows); the corpus then joins the BROADCAST
    * (query, cell) probe table, so each row is scored only against
    * the queries probing its cell; the per-query reduction is the
    * [[graft.functions.TopKHeap]] bounded-heap partial aggregate —
    * the one shuffle carries ≤ k × |queries| rows per partition.
    *
    * Output matches [[batchTopK]]: (query_id, rank, id, cos), rank
    * 1..k by (cos DESC, id ASC); zero-norm rows are excluded (heap
    * skips null scores).
    *
    * @param queries DataFrame(query_id: long, qvec: array) — small,
    *                broadcast whole
    */
  def ivfBatchTopK(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queries: DataFrame, k: Int, nProbe: Int = 1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val probe = queries.crossJoin(broadcast(centroids))
      .withColumn("ccos", safeCosine(col("qvec"), col("cvec")))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("ccos").desc_nulls_last, col("cell_id").asc)))
      .filter(col("rk") <= nProbe)
      .select(col("query_id"), col("qvec"), col("cell_id").cast("long").as("cell_id"))
    val scored = assignCells(df, vecCol, centroids)
      .join(broadcast(probe), Seq("cell_id"))
      .select(col("query_id"),
        safeCosine(col(vecCol), col("qvec")).as("cos"),
        col(idCol).cast("long").as("__id"))
    heapReduce(scored, idCol, k)
  }

  /** Cell-partitioned kNN GRAPH — every vector's k nearest neighbors
    * among the vectors sharing its IVF cell (the SemDeDup / semantic-
    * clustering prep step: the graph's edges feed connected-components
    * or community detection downstream).
    *
    * This is the one ANN shape where the query side CANNOT broadcast —
    * the queries ARE the corpus. Both sides get their cell map-side
    * (literal centroid fold, no shuffle), then co-partition with ONE
    * shuffle each on `cell_id`; pairing is cell-local (never a corpus
    * crossJoin), and the per-query reduction is the bounded-heap
    * partial aggregate, so the final shuffle carries ≤ k rows per
    * query per partition. A hot cell costs |cell|² pairs — pick the
    * centroid count so cells stay bounded (AQE skew-join splits the
    * residual; at 100 TB, k-means the centroids first so cells are
    * balanced by construction).
    *
    * Output: (query_id, rank, idCol, cos) — rank 1..k by (cos DESC,
    * id ASC) within the query's cell, self-pairs excluded, zero-norm
    * candidates skipped (null cos).
    */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, k: Int): DataFrame = {
    val assigned = assignCells(df, vecCol, centroids)
      .select(col("cell_id"), col(idCol).cast("long").as("__id"),
        col(vecCol).as("__v"))
    val qside = assigned.select(col("cell_id"), col("__id").as("query_id"),
      col("__v").as("qvec"))
    val scored = qside.join(assigned, Seq("cell_id"))
      .filter(col("query_id") =!= col("__id"))
      .select(col("query_id"),
        safeCosine(col("__v"), col("qvec")).as("cos"),
        col("__id"))
    heapReduce(scored, idCol, k)
  }

  /** Recall@k of an approximate kNN result against the exact baseline:
    * per query, the fraction of the exact top-k the approximate index
    * retrieved — the acceptance metric for any ANN operating point
    * (the vector-side analogue of the LSH τ-threshold audit). Both
    * inputs are (query_id, id, ...) frames of ≤ k rows per query
    * ([[batchTopK]] / [[ivfBatchTopK]] output), so the join and
    * aggregate touch k × |queries| rows — nothing corpus-sized.
    * Recall divides two exactly-agreed counts, so it is
    * engine-portable.
    */
  def recallAtK(exact: DataFrame, approx: DataFrame, idCol: String): DataFrame =
    exact.select(col("query_id"), col(idCol))
      .join(approx.select(col("query_id"), col(idCol), col(idCol).as("__hit")),
        Seq("query_id", idCol), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_exact"), count(col("__hit")).as("n_hit"))
      .withColumn("recall",
        col("n_hit").cast("double") / col("n_exact").cast("double"))

  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, query: DataFrame, k: Int, nProbe: Int = 1): DataFrame = {
    val assigned = assignCells(df, vecCol, centroids)
    val probeCells = query
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", safeCosine(col("qvec"), col("cvec")))
      .orderBy(col("ccos").desc_nulls_last, col("cell_id").asc)
      .limit(nProbe)
      .select(col("cell_id").cast("long").as("cell_id"))
    assigned
      .join(broadcast(probeCells), Seq("cell_id"))
      .crossJoin(broadcast(query))
      .withColumn("cos", safeCosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc_nulls_last, col(idCol).asc)
      .limit(k)
      .drop("qvec")
  }

  /** Product-quantization code assignment — the memory-bound half of
    * IVF-PQ ANN at 100 TB: each vector is cut into `subspaces` equal
    * slices and every slice is encoded as the id of its nearest
    * codebook centroid (squared-L2, ties to the smallest code), so a
    * D-float vector compresses to `subspaces` small ints and distance
    * evaluation becomes table lookups.
    *
    * The codebook is taken from the `codeK` LOWEST-id vectors' own
    * slices (the deterministic sample-init the k-means seeding here
    * already uses; refine with [[kmeansStep]] per subspace if desired)
    * and folds into the plan as a LITERAL — `codeK × dims` doubles
    * through the driver, the same small-matrix contract as
    * [[kmeans]] — so assignment is entirely map-side: no shuffle, no
    * join, scan-stage pipelined.
    *
    * Cross-engine exactness: slice distances are left folds over the
    * subspace dims in storage order (float→double widening is exact),
    * so the argmin compares bit-identical doubles on any engine.
    *
    * Output: (idCol, subspace, code, dist2) — one row per vector per
    * subspace; `dist2` is the exact squared quantization error of the
    * chosen code.
    */
  def pqCodes(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int = 4, codeK: Int = 8): DataFrame = {
    val cb = seedCodebook(df, idCol, vecCol, subspaces, codeK)
    val sub = cb(0)(0).length
    // literal codebook: per subspace, codeK centroids of `sub` doubles
    val codebook = array(cb.map { centroids =>
      array(centroids.zipWithIndex.map { case (cvec, ci) =>
        struct(
          lit(ci.toLong).as("code"),
          array(cvec.map(lit): _*).as("cvec"))
      }: _*)
    }: _*)
    df.select(col(idCol), col(vecCol).as("__v"))
      .withColumn("__cb", codebook)
      .select(col(idCol), posexplode(col("__cb")).as(Seq("subspace", "cands")),
        col("__v"))
      .withColumn("slice", slice(col("__v"), col("subspace") * sub + 1, lit(sub)))
      // argmin via struct-min: (dist2 asc, code asc)
      .withColumn("best", array_min(transform(col("cands"), c =>
        struct(
          aggregate(
            zip_with(col("slice"), c.getField("cvec"),
              (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (acc, x) => acc + x).as("dist2"),
          c.getField("code").as("code")))))
      .select(col(idCol), col("subspace").cast("long").as("subspace"),
        col("best.code").as("code"), col("best.dist2").as("dist2"))
  }

  /** PQ asymmetric-distance (ADC) top-k — the search half of IVF-PQ:
    * the query is NOT quantized; instead a `subspaces × codeK` table of
    * exact query-slice↔centroid distances is precomputed once, every
    * corpus vector is PQ-encoded map-side (same codebook contract as
    * [[pqCodes]]), and its approximate distance is `subspaces` table
    * lookups summed in subspace order. At 100 TB this is the shape that
    * matters: the scan stage does tiny integer argmins + `subspaces`
    * adds per row (no dims-wide query math), and the only cross-
    * partition traffic is the TakeOrderedAndProject top-k heap merge —
    * no shuffle, no join.
    *
    * Cross-engine exactness: the ADC table is built with the identical
    * left-fold expression shape the in-plan encoder uses (driver-side
    * here, `list_reduce` in the oracle — same IEEE op order), and the
    * final distance folds the per-subspace lookups in subspace order,
    * so every double compares bit-identical. Ties at the k boundary
    * break by id ascending — a total order.
    *
    * Output: (idCol, adc) — the k approximate-nearest rows by
    * (adc asc, id asc); `adc` is the approximate squared L2 distance.
    */
  def pqAdcTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, subspaces: Int = 4, codeK: Int = 8, k: Int = 10): DataFrame = {
    val cb = seedCodebook(df, idCol, vecCol, subspaces, codeK)
    val sub = cb(0)(0).length
    val qrows = df.filter(col(idCol).cast("long") === queryId)
      .select(col(vecCol)).limit(1).collect()
    require(qrows.nonEmpty, s"query id $queryId not found")
    val q = qrows.head.getSeq[Any](0).map(toDouble).toArray
    require(q.length == sub * subspaces,
      s"query dims ${q.length} != codebook dims ${sub * subspaces}")
    // ADC table [s][code]: left fold over dims in storage order — the
    // same ((0+t1)+t2)+… tree as the oracle's list_reduce
    val adcTab: Array[Array[Double]] = Array.tabulate(subspaces) { s =>
      cb(s).map { cvec =>
        var acc = 0.0
        var i = 0
        while (i < sub) {
          val d = q(s * sub + i) - cvec(i)
          acc = acc + d * d
          i += 1
        }
        acc
      }
    }
    // per-subspace encoder, statically unrolled: no explode, one
    // map-side expression per subspace
    val codeCols = (0 until subspaces).map { s =>
      val sl = slice(col("__v"), s * sub + 1, sub)
      array_min(array(cb(s).zipWithIndex.map { case (cvec, ci) =>
        struct(
          aggregate(
            zip_with(sl, array(cvec.map(lit): _*),
              (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
            lit(0.0), (acc, x) => acc + x).as("dist2"),
          lit(ci).as("code"))
      }: _*)).getField("code")
    }
    val adc = (0 until subspaces).foldLeft(lit(0.0)) { (acc, s) =>
      acc + element_at(array(adcTab(s).map(lit): _*), codeCols(s) + 1)
    }
    df.select(col(idCol), col(vecCol).as("__v"))
      .select(col(idCol), adc.as("adc"))
      .orderBy(col("adc").asc, col(idCol).asc)
      .limit(k)
  }

  private def toDouble(v: Any): Double = v match {
    case f: java.lang.Float => f.toDouble
    case d: java.lang.Double => d
    case n: java.lang.Number => n.doubleValue()
  }

  /** Shared deterministic PQ codebook: the `codeK` lowest-id vectors'
    * own slices (the sample-init contract [[pqCodes]] documents),
    * collected once — `[subspace][code][dim]` doubles.
    */
  /** Deterministic farthest-point (k-center / greedy 2-approximation —
    * Gonzalez 1985; also the deterministic skeleton of k-means++
    * seeding; public algorithms) seed selection: start from the
    * smallest id, then `k−1` times pick the vector FARTHEST (max
    * min-distance) from the chosen set, ties to the smallest id.
    * RNG-free, so the seed set is a pure function of the corpus.
    *
    * Integer-exact: coordinates quantize to `⌊x·2²⁰⌋` longs and every
    * distance is the exact squared-L2 sum of their differences —
    * argmax compares identical integers on any engine/partitioning
    * (no float-accumulation drift; ~2·dims·2⁴⁸ stays far inside a
    * long for unit-scale embeddings).
    *
    * Scale shape per round: the chosen seeds are a LITERAL k×dims
    * matrix (the kmeans/IVF smallness contract), so min-distance is
    * map-side and the argmax is TakeOrderedAndProject(1) — one
    * corpus pass per seed, k rows total ever reaching the driver.
    *
    * Output: (rank 1..k, idCol, d2_q) — d2_q the min squared distance
    * to the earlier seeds at selection time (0 for rank 1), i.e. the
    * k-center radius curve.
    */
  def farthestPointSeeds(df: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    val spark = df.sparkSession
    val q = df.select(col(idCol).cast("long").as("__id"),
      expr(s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
        .as("__xq"))
    def d2To(seed: Seq[Long]): org.apache.spark.sql.Column = {
      val sLit = seed.mkString("array(", "L, ", "L)")
      expr(s"aggregate(zip_with(__xq, $sLit, (a, b) -> (a - b) * (a - b)), 0L, (a, b) -> a + b)")
    }
    // each round's head() carries the winner's vector out with it, so
    // the loop never re-scans for a seed's coordinates
    val first = q.orderBy(col("__id").asc).limit(1).head()
    var seeds = Vector((first.getLong(0), 0L, first.getSeq[Long](1)))
    for (_ <- 2 to k) {
      val dmin = seeds.map(s => d2To(s._3)).reduce(least(_, _))
      val next = q.select(col("__id"), dmin.as("__d"), col("__xq"))
        .orderBy(col("__d").desc, col("__id").asc).limit(1).head()
      seeds = seeds :+ ((next.getLong(0), next.getLong(1), next.getSeq[Long](2)))
    }
    import spark.implicits._
    seeds.zipWithIndex
      .map { case ((id, d, _), i) => (i + 1L, id, d) }
      .toDF("rank", idCol, "d2_q")
  }

  /** Hard-negative mining for contrastive training (the in-batch /
    * ANN-negative recipe behind DPR and friends — Karpukhin et al.
    * EMNLP'20; public technique): for each query vector, rank its OWN
    * IVF cell's members by similarity, presume the top `skip` are
    * positives/duplicates, and emit the next `k` — similar enough to
    * be hard, not so similar they're the answer.
    *
    * Determinism: candidate similarity is the EXACT integer dot
    * product of ⌊x·2²⁰⌋-quantized coordinates (a long sum —
    * order-independent, no float-ordering ambiguity in the rank), and
    * cell assignment is the oracle-proven [[assignCells]] map-side
    * argmax. Candidate generation never leaves the cell: the join key
    * is (cell), the per-query candidate set is cell-sized, and the
    * rank reduction is the bounded-heap [[TopK.groupedTopK]] — the
    * exchange carries ≤ skip+k rows per (query × partition).
    *
    * Output: (q_id, rank ∈ (skip, skip+k], vec_id, dot_q).
    */
  def hardNegatives(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, queryIds: Seq[Long], skip: Int, k: Int): DataFrame = {
    require(skip >= 0 && k >= 1, s"bad skip/k: $skip/$k")
    require(queryIds.nonEmpty, "need at least one query id")
    val xq = expr(
      s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
    val asg = assignCells(df, vecCol, centroids)
      .select(col(idCol).cast("long").as("__id"), col("cell_id"), xq.as("__xq"))
    val qs = asg.filter(col("__id").isin(queryIds: _*))
      .select(col("__id").as("q_id"), col("cell_id"), col("__xq").as("__qxq"))
    val scored = asg.join(broadcast(qs), Seq("cell_id"))
      .filter(col("__id") =!= col("q_id"))
      .select(col("q_id"), col("__id"),
        expr("aggregate(zip_with(__xq, __qxq, (a, b) -> a * b), 0L, (a, b) -> a + b)")
          .as("__dot"))
    TopK.groupedTopK(scored, Seq("q_id"), "__dot", "__id", skip + k)
      .filter(col("rank") > skip)
      .select(col("q_id"), col("rank"), col("__id").as(idCol),
        col("score").cast("long").as("dot_q"))
  }

  /** IVF index-health audit: per-cell member counts plus the balance
    * statistics that decide whether the centroid set needs re-seeding
    * BEFORE a corpus-scale index build — the share of the corpus in
    * the largest cell (hot cells serialize probes) and the quantized
    * imbalance ⌊2²⁰·n_cell·k/N⌋ (1·2²⁰ = perfectly balanced).
    *
    * One map-side assignment pass + one |cells|-row aggregation + a
    * 1-row total broadcast. Output: (cell_id, n_members, share_q,
    * balance_q) for every cell that owns at least one vector.
    */
  def ivfCellStats(df: DataFrame, vecCol: String,
      centroids: DataFrame): DataFrame = {
    val k = centroids.count()
    val cells = assignCells(df, vecCol, centroids)
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_members"))
    val total = cells.agg(sum(col("n_members")).as("__n"))
    cells.crossJoin(broadcast(total))
      .select(col("cell_id"), col("n_members"),
        expr("(1048576 * n_members) div __n").as("share_q"),
        expr(s"(1048576 * n_members * $k) div __n").as("balance_q"))
  }

  private def seedCodebook(df: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, codeK: Int): Array[Array[Array[Double]]] = {
    require(subspaces > 0 && codeK > 0,
      s"need positive subspaces/codeK: $subspaces/$codeK")
    val seed = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"))
      .orderBy(col("__id").asc).limit(codeK).collect()
    require(seed.nonEmpty, "PQ needs a non-empty corpus")
    val dims = seed.head.getSeq[Any](1).length
    require(dims % subspaces == 0,
      s"dims $dims not divisible into $subspaces subspaces")
    val sub = dims / subspaces
    Array.tabulate(subspaces) { s =>
      seed.map(r => r.getSeq[Any](1).slice(s * sub, (s + 1) * sub)
        .map(toDouble).toArray)
    }
  }

  /** D4-style two-stage embedding prune (the published
    * SemDeDup-then-prototype recipe — Abbas et al. 2023 drop
    * near-duplicates inside embedding clusters, Tirumala et al. 2023
    * additionally drop the most PROTOTYPICAL cluster members, the
    * templated near-boilerplate closest to the centroid): every vector
    * gets a per-row verdict instead of silently disappearing, so the
    * curation run can audit exactly why each document left the pool.
    *
    * Stage 1 (dup): inside its cell, a vector is a duplicate iff some
    * SMALLER-id cell-mate has ⌊10⁶·cos⌋ ≥ `dupPpm` — the one-pass
    * anti-chain rule (the earlier doc survives regardless of its own
    * verdict), deterministic under any partitioning.
    * Stage 2 (proto): among stage-1 survivors, the
    * ⌊protoPpm·n_surv/10⁶⌋ members MOST similar to their own centroid
    * (ties to the smallest id) are dropped as prototypes.
    *
    * Shape at scale: both sides take their cell map-side (literal
    * centroid fold, zero shuffle), the pair stage co-partitions on
    * `cell_id` exactly like [[knnGraph]] — cell-local pairs, never a
    * corpus crossJoin; size the centroid count with the corpus
    * (cells ∝ N keeps |cell|² bounded, the q124 rule). The verdict
    * join is one id-keyed semi/left join against the ≤ corpus-sized
    * dup-id set, and the proto rank is ONE window pass (dups sort
    * after survivors inside their cell, so the survivor rank needs no
    * second scan or union).
    *
    * Output: (cell_id, idCol, status ∈ kept|dup|proto, ccos) — ccos
    * the cosine to the own centroid, null for a zero-norm vector.
    */
  def d4Prune(df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, dupPpm: Long, protoPpm: Long): DataFrame = {
    require(protoPpm >= 0 && protoPpm <= 1000000L,
      s"protoPpm is ppm in [0, 1e6]: $protoPpm")
    val best = bestCell(vecCol, centroids)
    val a = df.select(col(idCol).cast("long").as("__id"), col(vecCol).as("__v"),
      best.getField("ccos").as("ccos"), (-best.getField("neg")).as("cell_id"))
    val b = df.select(col(idCol).cast("long").as("__bid"),
      col(vecCol).as("__bv"), (-best.getField("neg")).as("cell_id"))
    val dups = a.select(col("cell_id"), col("__id"), col("__v"))
      .join(b, Seq("cell_id"))
      .filter(col("__id") < col("__bid"))
      .filter(floor(safeCosine(col("__v"), col("__bv")) * 1000000L)
        .cast("long") >= dupPpm)
      .select(col("__bid").as("__dup")).distinct()
    val marked = a.drop("__v")
      .join(dups, col("__id") === col("__dup"), "left")
      .withColumn("is_dup", col("__dup").isNotNull)
    val w = Window.partitionBy(col("cell_id"))
      .orderBy(col("is_dup").asc, col("ccos").desc, col("__id").asc)
    val cell = Window.partitionBy(col("cell_id"))
    marked
      .withColumn("rk", row_number().over(w))
      .withColumn("n_surv",
        sum(when(!col("is_dup"), 1L).otherwise(0L)).over(cell))
      .withColumn("status", when(col("is_dup"), lit("dup"))
        .when(col("rk") <= expr(s"(n_surv * ${protoPpm}L) div 1000000L"),
          lit("proto"))
        .otherwise(lit("kept")))
      .select(col("cell_id"), col("__id").as(idCol), col("status"),
        when(col("ccos") === lit(Double.NegativeInfinity),
          lit(null).cast("double")).otherwise(col("ccos")).as("ccos"))
  }
}
