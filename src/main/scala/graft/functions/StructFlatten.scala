package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** Recursive flatten of nested struct columns into dotted-path
  * top-level columns — the reference's `objectFlatten`
  * (/root/reference/lib/utils.js:133-156, golden
  * test/lib/utils.js:60-86): {a: 1, b: {c: 2}} → {"a": 1, "b.c": 2}.
  *
  * Divergence from the reference, by type-system design: arrays stay
  * array-valued columns (a DataFrame column has ONE static type, so
  * the reference's per-row `prop[i]` expansion of dynamic arrays does
  * not map; `explode`/`posexplode` is the Spark idiom when element
  * rows are wanted). Pure projection — no shuffle, prunes to exactly
  * the referenced leaves.
  */
object StructFlatten {

  /** Dotted leaf paths of a schema, in field order. */
  def leafPaths(schema: StructType, prefix: Seq[String] = Nil): Seq[(Seq[String], DataType)] =
    schema.fields.toSeq.flatMap { f =>
      f.dataType match {
        case s: StructType => leafPaths(s, prefix :+ f.name)
        case dt            => Seq((prefix :+ f.name, dt))
      }
    }

  def flatten(df: DataFrame): DataFrame = {
    val cols: Seq[Column] = leafPaths(df.schema).map { case (p, _) =>
      col(p.map(n => s"`$n`").mkString(".")).as(p.mkString("."))
    }
    df.select(cols: _*)
  }
}
