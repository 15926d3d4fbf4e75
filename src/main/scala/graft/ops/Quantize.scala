package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Embedding compression audits — the int8 quantization pass a
  * large-scale retrieval/training pipeline runs before shipping vectors
  * to an ANN index or an accelerator (4× smaller than float32, the
  * standard symmetric max-abs scheme used by FAISS `SQ8` and
  * quantization-aware serving stacks; public technique).
  *
  * Everything is a per-row map over the vector column — higher-order
  * array functions (`aggregate`/`transform`), no explode, no shuffle,
  * no UDF — so the audit rides the scan inside WholeStageCodegen and
  * column pruning still reaches parquet. At 100 TB this is the shape
  * you want: the quantization itself adds zero exchanges.
  *
  * Cross-engine exactness: the only float math is `x · 127 / maxabs`
  * in IEEE double (bit-identical on any engine evaluating the same
  * expression tree), immediately floored to a long — every output
  * except `maxabs` is an integer, and integer sums are
  * order-independent under any partitioning.
  */
object Quantize {

  /** Symmetric max-abs int8 quantization audit: per vector, the scale
    * (`maxabs`), dimension count, positional checksum Σ (i+1)·qᵢ
    * (pins the full code sequence, order included), code sum, and the
    * code range actually used — the saturation/coverage report that
    * decides whether int8 is safe for a given embedding space.
    *
    * qᵢ = ⌊xᵢ·127/maxabs⌋ (all-zero vectors quantize to all-zero
    * codes). Codes live in [−127, 127]; a `max_q` far below 127 on
    * many vectors means the space under-uses the int8 range and wants
    * per-block scales instead.
    */
  def int8Audit(embs: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol)
    embs
      .select(col(idCol).cast("long").as(idCol), v.as("__v"))
      .withColumn("maxabs", expr(
        "aggregate(__v, CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, abs(CAST(x AS DOUBLE))))"))
      .withColumn("__q", expr(
        """CASE WHEN maxabs = 0.0D THEN transform(__v, x -> 0L)
           ELSE transform(__v, x -> CAST(floor(CAST(x AS DOUBLE) * 127.0D / maxabs) AS BIGINT))
           END"""))
      .select(col(idCol), col("maxabs"),
        expr("CAST(size(__q) AS BIGINT)").as("n_dims"),
        expr("aggregate(zip_with(__q, sequence(1L, CAST(size(__q) AS BIGINT)), (q, i) -> q * i), 0L, (a, b) -> a + b)")
          .as("checksum"),
        expr("aggregate(__q, 0L, (a, b) -> a + b)").as("sum_q"),
        expr("CAST(array_min(__q) AS BIGINT)").as("min_q"),
        expr("CAST(array_max(__q) AS BIGINT)").as("max_q"))
  }

  /** Johnson–Lindenstrauss random ±1 projection (Achlioptas, JCSS'03 —
    * database-friendly random projections; public technique): project
    * `inDims`-dim embeddings to `outDims` dims with a DETERMINISTIC
    * sign matrix s(j,i) = ±1 derived from the hex60 hash of "j:i" —
    * matrix-free (the signs are plan literals, nothing is stored or
    * broadcast), reproducible on any engine that can evaluate the same
    * hash.
    *
    * Integer-exact: coordinates quantize map-side to
    * `xq = ⌊x·2²⁰⌋` BEFORE any sum, so each output coordinate
    * `y_j = Σᵢ s(j,i)·xqᵢ` is a long sum — order-independent, no
    * float-accumulation drift. The whole projection is one map pass
    * (higher-order functions over the vector column, no explode, no
    * shuffle); the output long-melt is the only fan-out (×outDims of
    * the vector table, each row 3 longs).
    *
    * Output: (idCol, j ∈ [0, outDims), y_q) — feed into the kNN/LSH
    * ops to run them in the reduced space.
    */
  def jlProject(embs: DataFrame, idCol: String, vecCol: String,
      inDims: Int, outDims: Int): DataFrame = {
    require(inDims > 0 && outDims > 0, s"bad dims: $inDims -> $outDims")
    val xq = expr(
      s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))")
    val ys = (0 until outDims).map { j =>
      val signs = (0 until inDims).map { i =>
        if ((graft.functions.Kernels.hex60String(s"$j:$i") & 1L) == 0L) 1L else -1L
      }
      val sLit = signs.mkString("array(", "L, ", "L)")
      expr(s"aggregate(zip_with(__xq, $sLit, (a, b) -> a * b), 0L, (a, b) -> a + b)")
    }
    embs
      .select(col(idCol).cast("long").as(idCol), xq.as("__xq"))
      .filter(size(col("__xq")) === inDims)
      .select(col(idCol), posexplode(array(ys: _*)).as(Seq("j", "y_q")))
      .select(col(idCol), col("j").cast("long").as("j"), col("y_q"))
  }

  /** Matryoshka prefix-energy audit (Kusupati et al., NeurIPS'22 —
    * Matryoshka representation learning; public technique): for each
    * candidate truncation length p, the fraction of a vector's squared
    * mass its first p coordinates retain,
    * `⌊2²⁰·Σ_{i≤p} xq_i² / Σ xq_i²⌋` over `xq = ⌊x·2²⁰⌋` — exactly
    * cos²(full, zero-padded truncation), the number that decides
    * whether serving can truncate stored embeddings to p dims.
    *
    * Integer-exact (quantize-then-square, one division at the end) and
    * entirely map-side: higher-order array slices riding the scan, a
    * ×|prefixes| row melt as the only fan-out, no shuffle. Zero-mass
    * vectors report null (the ratio is undefined).
    *
    * Output: (idCol, p, energy_q).
    */

  /** Dominant principal direction by INTEGER-QUANTIZED power
    * iteration — the PCA step embedding pipelines run before
    * whitening/ABS scoring, kept cross-engine exact: coordinates
    * quantize to `⌊x·2²⁰⌋` longs once; each round computes
    * `s_i = Σ_j xq_ij·v_j` map-side (long — bounded by dims·2⁴⁴),
    * folds `w_j = Σ_i xq_ij·s_i` as decimal(38,0) in ONE dims-group
    * aggregation, and renormalizes on the driver with pure BigInteger
    * arithmetic: `v'_j = sign(w_j)·(|w_j|·2²⁰ div max|w|)` — floor of
    * a non-negative quotient, so DuckDB's floor division and Scala's
    * truncating division agree bit-for-bit and the oracle can replay
    * the rounds UNROLLED with no literals.
    *
    * Scale shape: per round one corpus map pass + one aggregation
    * with `dims` groups; the driver state is `dims` longs (the q146
    * pagerank discipline — the loop variable is a literal vector,
    * never a collected table). Start vector is all-2²⁰ (deterministic;
    * callers whose data is exactly orthogonal to it would see m = 0 —
    * refused loudly, not divided by).
    *
    * Output: (j, v_q) — the quantized direction, `max|v_q| = 2²⁰`.
    */
  def powerIteration(embs: DataFrame, idCol: String, vecCol: String,
      dims: Int, rounds: Int = 3): DataFrame = {
    require(dims >= 1, s"need dims >= 1: $dims")
    require(rounds >= 1 && rounds <= 8, s"need 1 <= rounds <= 8: $rounds")
    val dec = "decimal(38,0)"
    val base = embs.filter(size(col(vecCol)) === dims)
      .select(transform(col(vecCol), x =>
        floor(x.cast("double") * lit(1048576L)).cast("long")).as("xq"))
    var v: Array[java.math.BigInteger] =
      Array.fill(dims)(java.math.BigInteger.valueOf(1048576L))
    for (_ <- 1 to rounds) {
      val vLit = array(v.map(b => lit(b.longValueExact())): _*)
      val w = base
        .withColumn("s", aggregate(
          zip_with(col("xq"), vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x))
        .select(posexplode(col("xq")).as(Seq("j", "x")), col("s"))
        .groupBy(col("j"))
        .agg(sum(expr(s"CAST(x AS $dec) * CAST(s AS $dec)")).as("w"))
        .collect().map(r => r.getInt(0) ->
          r.getDecimal(1).toBigInteger).toMap
      val m = (0 until dims).map(j =>
        w.getOrElse(j, java.math.BigInteger.ZERO).abs).max
      require(m.signum > 0,
        "power iteration degenerated: every component of A'Av is zero " +
          "(empty input, or data exactly orthogonal to the start vector)")
      v = (0 until dims).map { j =>
        val wj = w.getOrElse(j, java.math.BigInteger.ZERO)
        val q = wj.abs.multiply(java.math.BigInteger.valueOf(1048576L))
          .divide(m)
        if (wj.signum < 0) q.negate else q
      }.toArray
    }
    val spark = embs.sparkSession
    import spark.implicits._
    v.zipWithIndex
      .map { case (b, j) => (j.toLong, b.longValueExact()) }.toSeq
      .toDF("j", "v_q")
  }

  def prefixEnergyAudit(embs: DataFrame, idCol: String, vecCol: String,
      prefixes: Seq[Int]): DataFrame = {
    require(prefixes.nonEmpty && prefixes.forall(_ >= 1),
      s"need positive prefixes: $prefixes")
    val rows = prefixes.map { p =>
      // 2²⁰·Σxq² can pass 2⁶³ — the scaled numerator multiplies as
      // decimal(38,0); the division result is back under 2²⁰
      expr(s"""struct(CAST($p AS BIGINT) AS p,
        CASE WHEN __tot > 0L THEN CAST(
          (CAST(1048576 AS DECIMAL(38,0))
             * aggregate(slice(__sq, 1, $p), 0L, (a, b) -> a + b))
            div __tot AS BIGINT) END AS energy_q)""")
    }
    embs
      .select(col(idCol).cast("long").as(idCol), expr(
        s"""transform($vecCol, x ->
             CAST(floor(CAST(x AS DOUBLE) * 1048576.0D) AS BIGINT))""")
        .as("__x"))
      .withColumn("__sq", expr("transform(__x, v -> v * v)"))
      .withColumn("__tot", expr("aggregate(__sq, 0L, (a, b) -> a + b)"))
      .select(col(idCol), explode(array(rows: _*)).as("r"))
      .select(col(idCol), col("r.p").as("p"), col("r.energy_q").as("energy_q"))
  }
}
