package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator query: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle over
  * the same parquet tables. Column names MUST match between the two —
  * the driver's compare sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def toQueryMap(qs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap
  def toOracleMap(qs: Seq[QueryDef]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
