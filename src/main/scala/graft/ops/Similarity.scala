package graft.ops

import org.apache.spark.sql.DataFrame
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
  *  - an IVF variant is `Similarity.ivfTopK` — coarse-quantize to the
  *    nearest centroid map-side, then search only the probe cell.
  */
object Similarity {

  /** Exact brute-force cosine top-k against one query vector (the
    * baseline every ANN variant is measured against).
    *
    * @param query single-row DataFrame with an array column named `qvec`
    */
  def topK(df: DataFrame, idCol: String, vecCol: String, query: DataFrame, k: Int): DataFrame =
    df.crossJoin(broadcast(query))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)

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
        cosine(col(s"x.$vecCol"), col(s"y.$vecCol")).as("cos"))
  }

  /** IVF-style top-k: assign every vector to its nearest centroid
    * map-side (broadcast centroids), then search only the query's cell.
    * Centroids are caller-provided (e.g. a sampled k-means or a label
    * partition) — a single-row `query` is probed against `nProbe`
    * nearest cells.
    *
    * @param centroids DataFrame(cell_id, cvec: array<float/double>)
    */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, query: DataFrame, k: Int, nProbe: Int = 1): DataFrame = {
    // nearest-cell assignment: argmax cosine over broadcast centroids,
    // computed map-side per row (no shuffle).
    def assign(in: DataFrame, vec: String): DataFrame =
      in.crossJoin(broadcast(centroids))
        .withColumn("ccos", cosine(col(vec), col("cvec")))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col(idCol)).orderBy(col("ccos").desc, col("cell_id").asc)))
        .filter(col("rk") === 1)
        .drop("ccos", "rk", "cvec")

    val assigned = assign(df, vecCol)
    val probeCells = query
      .crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("qvec"), col("cvec")))
      .orderBy(col("ccos").desc, col("cell_id").asc)
      .limit(nProbe)
      .select(col("cell_id"))
    assigned
      .join(broadcast(probeCells), Seq("cell_id"))
      .crossJoin(broadcast(query))
      .withColumn("cos", cosine(col(vecCol), col("qvec")))
      .orderBy(col("cos").desc, col(idCol).asc)
      .limit(k)
  }
}
