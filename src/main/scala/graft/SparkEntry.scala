package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every operator claimed in SURVEY.md §2 has an entry in `queries`;
  * the SQL-expressible ones also appear in `oracleSql` for the
  * driver's DuckDB hash-compare (column names are kept identical on
  * both sides — the compare sorts columns by name before hashing).
  */
object SparkEntry {
  private def packs: Seq[QueryDef] = Relational.all ++ PipelinePack.all ++ AnalyticsPack.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryDef.toQueryMap(packs)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryDef.toOracleMap(packs)
}
