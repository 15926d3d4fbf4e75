package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.types.{GraftType, SchemaLattice}
import graft.types.GraftType._

/** Golden cases ported from the reference type-inference tests
  * (test/connections/mysql.js:216-352) plus lattice laws checked
  * exhaustively over a representative finite type universe
  * (SURVEY.md §5 test plan item b).
  */
class SchemaLatticeSpec extends AnyFunSuite {

  // --- goldens: the `monies` fixture (test/connections/mysql.js:216-248)
  test("monies fixture infers the reference DDL types") {
    val row = Map[String, Any](
      "id" -> 1L, "counter" -> 4L, "happy" -> true, "money" -> 12.234,
      "when" -> java.sql.Timestamp.valueOf("2015-11-25 20:42:32"),
      "small_words" -> "a small amount of words",
      "large_words" -> ("x" * 397))
    val t = SchemaLattice.inferBatch(Seq(row), varCharLength = 191)
    assert(t("id") == Int)           // bigint(20)
    assert(t("counter") == Int)
    assert(t("happy") == Bool)       // tinyint(1)
    assert(t("money") == Float)
    assert(t("when") == DateTime)
    assert(t("small_words") == Varchar(23))
    assert(t("large_words") == Text)
  }

  test("all-null column stays Unknown (varchar(0)), promoted on data") {
    // test/connections/mysql.js:313-336
    val t1 = SchemaLattice.inferBatch(Seq(Map("id" -> 1L, "c" -> null)))
    assert(t1("c") == Unknown)
    val t2 = SchemaLattice.inferBatch(Seq(Map("id" -> 1L, "c" -> null),
      Map("id" -> 2L, "c" -> "hello")))
    assert(t2("c") == Varchar(5))
  }

  test("int column promoted to float on first float (mysql.js:412-414)") {
    val t = SchemaLattice.inferBatch(Seq(Map("v" -> 1L), Map("v" -> 2.5)))
    assert(t("v") == Float)
  }

  test("varchar widens to text on overflow (mysql.js:336-350)") {
    val t = SchemaLattice.inferBatch(Seq(Map("v" -> "short"), Map("v" -> ("y" * 300))))
    assert(t("v") == Text)
  }

  test("PK-first column order in toStruct (mysql.js:449-455)") {
    val s = SchemaLattice.toStruct(Map("zz" -> Int, "id" -> Int, "aa" -> Bool))
    assert(s.fields.head.name == "id")
    assert(!s.fields.head.nullable)
  }

  // --- reconciliation: add + widen (mysql.js:299-358)
  test("reconcile reports adds and widens") {
    val dest = StructType(Seq(StructField("id", LongType), StructField("v", LongType)))
    val src = StructType(Seq(StructField("id", LongType),
      StructField("v", DoubleType), StructField("extra", StringType)))
    val r = SchemaLattice.reconcile(dest, src)
    assert(r.adds.map(_.name) == Seq("extra"))
    assert(r.widens == Seq("v" -> DoubleType))
    val evolved = SchemaLattice(dest, r)
    assert(evolved.fieldNames.toSeq == Seq("id", "v", "extra"))
    assert(evolved("v").dataType == DoubleType)
  }

  // --- lattice laws, exhaustive over a representative universe
  private val universe: Seq[GraftType] = Seq(
    Unknown, Bool, Int, Float, DateTime, Text,
    Varchar(0), Varchar(5), Varchar(191), Varchar(255), Varchar(500),
    Dec(10, 2), Dec(18, 4), Dec(38, 0))

  test("widen is commutative") {
    for (a <- universe; b <- universe)
      assert(GraftType.widen(a, b) == GraftType.widen(b, a), s"$a ∨ $b")
  }

  test("widen is idempotent") {
    for (a <- universe) assert(GraftType.widen(a, a) == a)
  }

  test("widen is associative") {
    for (a <- universe; b <- universe; c <- universe)
      assert(GraftType.widen(GraftType.widen(a, b), c) ==
        GraftType.widen(a, GraftType.widen(b, c)), s"$a, $b, $c")
  }

  test("Unknown is the bottom element") {
    for (a <- universe) assert(GraftType.widen(Unknown, a) == a)
  }

  test("inferBatch is row-order independent") {
    val rows = Seq(Map[String, Any]("v" -> 1L), Map[String, Any]("v" -> 2.5),
      Map[String, Any]("v" -> null))
    assert(rows.permutations.map(SchemaLattice.inferBatch(_)).toSet.size == 1)
  }
}
