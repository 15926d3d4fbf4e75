package graft.types

import org.apache.spark.sql.types._

/** The reference's dynamic type system (SURVEY.md §1.2–1.3) as a pure
  * promotion lattice over Spark types.
  *
  * Reference behavior being modeled (empujar, cited file:line):
  *  - per-value inference bool/int/float/datetime/short-string/long-string
  *    (`lib/connections/mysql.js:395-469`, `lib/utils.js:45-56`)
  *  - all-null column → placeholder `varchar(0)` = [[GraftType.Unknown]],
  *    promoted once real data arrives (`mysql.js:35-38,277-358`)
  *  - int column promoted to float on first float (`mysql.js:412-414`)
  *  - varchar(N) widened to TEXT when a value exceeds N
  *    (`mysql.js:336-350`); default N=255 (`mysql.js:23-25`)
  *
  * Everything here is pure Scala over `StructType` — it runs on the
  * driver against schemas only, never against data, so it is
  * scale-independent by construction.
  */
sealed trait GraftType {
  def toSpark: DataType = this match {
    case GraftType.Unknown      => NullType
    case GraftType.Bool         => BooleanType
    case GraftType.Int          => LongType
    case GraftType.Float        => DoubleType
    case GraftType.DateTime     => TimestampType
    case GraftType.Varchar(_)   => StringType
    case GraftType.Text         => StringType
    case GraftType.Dec(p, s)    => DecimalType(p, s)
  }
}

object GraftType {
  case object Unknown extends GraftType               // empujar varchar(0)
  case object Bool extends GraftType
  case object Int extends GraftType                   // JS int → bigint
  case object Float extends GraftType
  case object DateTime extends GraftType
  final case class Varchar(n: Int) extends GraftType  // short string
  case object Text extends GraftType                  // long string
  final case class Dec(p: Int, s: Int) extends GraftType // read-only passthrough

  /** Default short-string budget (`mysql.js:23-25`; example configs use
    * 191, `books/etl/config/connections/source.js:12`). */
  val DefaultVarCharLength = 255

  /** Per-value inference — the `buildTableFromData` switch
    * (`mysql.js:407-433`). */
  def infer(v: Any, varCharLength: Int = DefaultVarCharLength): GraftType = v match {
    case null                  => Unknown
    case None                  => Unknown
    case _: Boolean            => Bool
    case _: Byte | _: Short | _: Int | _: Long => Int
    case _: Float | _: Double  => Float
    case _: java.math.BigDecimal => Float
    case _: java.sql.Timestamp => DateTime
    case _: java.time.Instant  => DateTime
    case _: java.util.Date     => DateTime
    case s: String if s.length <= varCharLength => Varchar(s.length)
    case _: String             => Text
    case other                 => Text // JS would stringify; faithful fallback
  }

  /** Least upper bound in the promotion lattice:
    * Unknown < anything (`mysql.js:277-279`); Int < Float
    * (`mysql.js:412-414`); Varchar(a) ∨ Varchar(b) = Varchar(max)
    * (`mysql.js:428-430` re-measures max length); Varchar < Text
    * (`mysql.js:336-350`); incompatible scalars collapse to Text (the
    * endpoint would have errored; TEXT is the only universal type).
    */
  def widen(a: GraftType, b: GraftType): GraftType = (a, b) match {
    case (x, y) if x == y        => x
    case (Unknown, x)            => x
    case (x, Unknown)            => x
    case (Int, Float) | (Float, Int) => Float
    case (Varchar(x), Varchar(y))    => Varchar(math.max(x, y))
    case (Varchar(_), Text) | (Text, Varchar(_)) => Text
    case (Dec(p1, s1), Dec(p2, s2)) =>
      val s = math.max(s1, s2); Dec(math.min(38, math.max(p1 - s1, p2 - s2) + s), s)
    case (Dec(_, _), Int) | (Int, Dec(_, _)) | (Dec(_, _), Float) | (Float, Dec(_, _)) => Float
    case _                       => Text
  }

  def fromSpark(dt: DataType): GraftType = dt match {
    case NullType        => Unknown
    case BooleanType     => Bool
    case ByteType | ShortType | IntegerType | LongType => Int
    case FloatType | DoubleType => Float
    case d: DecimalType  => Dec(d.precision, d.scale)
    case TimestampType | DateType | TimestampNTZType => DateTime
    case StringType      => Text
    case _               => Text
  }
}

object SchemaLattice {
  import GraftType._

  /** Schema inference over a row batch — scans every row and unions the
    * observed per-column types, exactly the `buildTableFromData`
    * contract (`mysql.js:395-469`; golden test
    * `test/connections/mysql.js:216-248`). Columns never seen non-null
    * stay [[GraftType.Unknown]] (reference `varchar(0)`).
    */
  def inferBatch(rows: Seq[Map[String, Any]],
      varCharLength: Int = DefaultVarCharLength): Map[String, GraftType] = {
    rows.foldLeft(Map.empty[String, GraftType]) { (acc, row) =>
      row.foldLeft(acc) { case (m, (k, v)) =>
        m.updated(k, widen(m.getOrElse(k, Unknown), infer(v, varCharLength)))
      }
    }
  }

  def toStruct(types: Map[String, GraftType], pk: Option[String] = Some("id")): StructType = {
    // PK-first column order (reference DDL convention, mysql.js:449-455)
    val (pkCols, rest) = types.toSeq.sortBy(_._1).partition { case (k, _) => pk.contains(k) }
    StructType((pkCols ++ rest).map { case (k, t) =>
      StructField(k, t.toSpark, nullable = !pk.contains(k))
    })
  }

  /** What `insertData` must do to the destination before writing
    * (`mysql.js:299-358`): columns to ADD (present in src, absent in
    * dest) and columns to WIDEN (both present, src type ⊔ dest type ≠
    * dest type).
    */
  final case class Reconciliation(
      adds: Seq[StructField],
      widens: Seq[(String, DataType)]) {
    def isNoop: Boolean = adds.isEmpty && widens.isEmpty
  }

  def reconcile(dest: StructType, src: StructType): Reconciliation = {
    val destMap = dest.fields.map(f => f.name -> f).toMap
    val adds = src.fields.filterNot(f => destMap.contains(f.name)).toSeq
    val widens = src.fields.toSeq.flatMap { f =>
      destMap.get(f.name).flatMap { d =>
        val w = widen(fromSpark(d.dataType), fromSpark(f.dataType)).toSpark
        if (w != d.dataType) Some(f.name -> w) else None
      }
    }
    Reconciliation(adds, widens)
  }

  /** Apply a reconciliation to a schema (the post-ALTER shape). */
  def apply(dest: StructType, r: Reconciliation): StructType = {
    val widened = dest.fields.map { f =>
      r.widens.find(_._1 == f.name).map { case (_, t) => f.copy(dataType = t) }.getOrElse(f)
    }
    StructType(widened ++ r.adds.map(_.copy(nullable = true)))
  }
}
