package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level embedding kernels for [EXT] similarity search over
  * `array<float>` embedding columns.
  *
  * Floating-point reproducibility: every reduction is a LEFT FOLD over
  * the array in storage order (`aggregate` after an element-wise
  * `zip_with`), never a cross-row SQL aggregate — so the result is
  * bit-identical for any partitioning and matches a sequential oracle
  * (DuckDB `list_reduce`) exactly. Floats are cast to double BEFORE any
  * arithmetic.
  */
object VectorKernels {

  /** Dot product of two equal-length float/double array columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; assumes non-zero vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Sign-pattern LSH bucket over the first `dims` components: vectors
    * in the same bucket agree on `dims` hyperplane signs (the axis-
    * aligned special case of random-hyperplane LSH — deterministic, so
    * oracle-reproducible). Candidate pairs come from a groupBy/join on
    * the bucket, never an all-pairs product.
    */
  def signBucket(a: Column, dims: Int): Column =
    concat_ws("",
      transform(slice(a, 1, dims), x => when(x >= 0, lit("1")).otherwise(lit("0"))))
}
