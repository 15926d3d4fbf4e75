package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Row/column sanitization (SURVEY.md §2.2 P4/P5, §2.7 F3) — the
  * reference's `sanitizeString` (`redshift.js:71-104`) and value
  * normalizations (`snowflake.js:479-524`) as codegen'd built-in
  * expressions, no UDFs.
  */
object Sanitize {

  /** Zero-date → NULL (`redshift.js:101`, `snowflake.js:481-483`). */
  def zeroDateToNull(c: Column): Column =
    when(c === lit("0000-00-00 00:00:00") || c === lit("0000-00-00"), lit(null).cast(StringType))
      .otherwise(c)

  /** NUL strip + control-char scrub + byte-budget truncation
    * (`redshift.js:88-98`: invalid bytes replaced, 65535-byte cap).
    * Truncation is character-based via substring after scrubbing —
    * byte-exact truncation of multi-byte tails is endpoint-specific
    * and documented as a divergence.
    */
  def sanitizeString(c: Column, maxChars: Int = 65535): Column =
    substring(regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", ""), 1, maxChars)

  /** Boolean → 0/1 (`snowflake.js:505-516`). */
  def boolToInt(c: Column): Column = c.cast("boolean").cast("int")

  /** Reserved-word column renames applied at the sink — the Redshift
    * `badMappings` (`redshift.js:63-69,189-207`).
    */
  val ReservedRenames: Map[String, String] = Map(
    "authorization" -> "authorization_",
    "tag" -> "tag_",
    "system" -> "system_")

  def renameReserved(df: DataFrame): DataFrame =
    ReservedRenames.foldLeft(df) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }

  /** Whole-row sanitize: every string column scrubbed + zero-dates
    * nulled (the Redshift insert path, `redshift.js:222-276`).
    */
  def sanitizeRows(df: DataFrame, maxChars: Int = 65535): DataFrame =
    df.schema.fields.filter(_.dataType == StringType).foldLeft(df) { (d, f) =>
      d.withColumn(f.name, zeroDateToNull(sanitizeString(col(f.name), maxChars)))
    }
}
