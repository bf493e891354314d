package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.engine.Types

/** Ports the reference's pure-function case tables verbatim
  * (`/root/reference/tests/test_util.py`).
  */
class TypesSpec extends AnyFunSuite {

  test("qualifyName (test_util.py:12-15)") {
    assert(Types.qualifyName("Schema", "Table") == "Schema.Table")
    assert(Types.qualifyName("", "Table") == "Table")
    assert(Types.qualifyName(null, "Table") == "Table")
  }

  test("translateDtype (test_util.py:17-32)") {
    val cases = Map(
      "object" -> "text",
      "str" -> "text",
      "string" -> "text",
      "int64" -> "number",
      "longlong" -> "number",
      "uint64" -> "number",
      "ulonglong" -> "number",
      "float64" -> "decimal",
      "datetime64[ns]" -> "datetime",
      "bool" -> "bool"
    )
    cases.foreach { case (name, exp) =>
      assert(Types.translateDtype(name) == exp, s"translateDtype($name)")
    }
  }

  test("isCastExplicit 26-case lattice (test_util.py:34-67)") {
    val cases = Map(
      ("text", "char") -> false,
      ("text", "char(10)") -> false,
      ("text", "nvarchar(10)") -> false,
      ("text", "number") -> true,
      ("number", "int") -> false,
      ("number", "decimal") -> false,
      ("number", "decimal(10)") -> false,
      ("number", "decimal(10, 5)") -> false,
      ("number", "numeric") -> false,
      ("number", "numeric(10)") -> false,
      ("number", "numeric(10, 5)") -> false,
      ("number", "nvarchar(10)") -> true,
      ("decimal", "float") -> false,
      ("decimal", "decimal") -> true,
      ("decimal", "decimal(10)") -> true,
      ("decimal", "decimal(10, 0)") -> true,
      ("decimal", "decimal(10, 1)") -> false,
      ("decimal", "numeric") -> true,
      ("decimal", "numeric(10)") -> true,
      ("decimal", "numeric(10, 0)") -> true,
      ("decimal", "numeric(10, 1)") -> false,
      ("decimal", "nvarchar(10)") -> true,
      ("datetime", "datetime") -> false,
      ("datetime", "datetime2") -> false,
      ("datetime", "datetimeoffset") -> false,
      ("datetime", "smalldatetime") -> false,
      ("datetime", "date") -> true,
      ("datetime", "time") -> true
    )
    cases.foreach { case ((src, dst), exp) =>
      assert(
        Types.isCastExplicit(src, dst) == exp,
        s"isCastExplicit($src, $dst)"
      )
    }
  }

  test("quoteName incl. 128/129-char boundary (test_util.py:69-87)") {
    val cases = Map(
      "" -> Some("[]"),
      "]" -> Some("[]]]"),
      "[" -> Some("[[]"),
      "][][" -> Some("[]][]][]"),
      "a" -> Some("[a]"),
      "[a]" -> Some("[[a]]]"),
      ("a" * 128) -> Some("[" + "a" * 128 + "]"),
      ("a" * 129) -> None
    )
    cases.foreach { case (s, exp) =>
      assert(Types.quoteName(s) == exp, s"quoteName($s)")
    }
  }

  test("sourceTypeOf maps Spark types into the 4-value domain") {
    assert(Types.sourceTypeOf(StringType) == Types.Text)
    assert(Types.sourceTypeOf(LongType) == Types.Number)
    assert(Types.sourceTypeOf(IntegerType) == Types.Number)
    assert(Types.sourceTypeOf(DoubleType) == Types.DecimalSrc)
    assert(Types.sourceTypeOf(TimestampType) == Types.DatetimeSrc)
    assert(Types.sourceTypeOf(BooleanType) == Types.Other("boolean"))
  }

  test("isCastExplicit over Spark DataType pairs is precision-aware") {
    assert(!Types.isCastExplicit(StringType, StringType))
    assert(Types.isCastExplicit(StringType, LongType))
    // Decimal(25,5) can hold every Long; Decimal(10,5) cannot.
    assert(!Types.isCastExplicit(LongType, DecimalType(25, 5)))
    assert(Types.isCastExplicit(LongType, DecimalType(10, 5)))
    // Narrowing numeric casts may lose information → explicit.
    assert(Types.isCastExplicit(DoubleType, FloatType))
    assert(Types.isCastExplicit(LongType, ByteType))
    assert(!Types.isCastExplicit(FloatType, DoubleType))
    assert(!Types.isCastExplicit(IntegerType, LongType))
    // Fractional → decimal can lose precision → explicit.
    assert(Types.isCastExplicit(DoubleType, DecimalType(10, 1)))
    assert(Types.isCastExplicit(DoubleType, DecimalType(10, 0)))
    assert(!Types.isCastExplicit(TimestampType, TimestampType))
    assert(Types.isCastExplicit(TimestampType, DateType))
  }

  test("normalizeMessage (util.py:20-24)") {
    assert(Types.normalizeMessage("hello") == "Hello.".padTo(30, ' '))
    assert(Types.normalizeMessage("done!") == "Done!".padTo(30, ' '))
    assert(Types.normalizeMessage("ok.") == "Ok.".padTo(30, ' '))
    // '?' is NOT terminal punctuation in the reference
    assert(Types.normalizeMessage("what?") == "What?.".padTo(30, ' '))
    assert(Types.normalizeMessage("") == ".".padTo(30, ' '))
    val long = "x" * 40
    assert(Types.normalizeMessage(long) == "X" + "x" * 39 + ".")
  }

  test("renderCatalogType (util.py:63-74)") {
    assert(Types.renderCatalogType("varchar", Some(10), None) == "varchar(10)")
    assert(
      Types.renderCatalogType("decimal", Some(10), Some(2)) == "decimal(10, 2)"
    )
    assert(Types.renderCatalogType("int", Some(10), None) == "int")
    assert(Types.renderCatalogType("int", None, None) == "int")
    // Missing size metadata on a sized type surfaces the bad catalog row.
    intercept[IllegalArgumentException] {
      Types.renderCatalogType("varchar", None, None)
    }
    intercept[IllegalArgumentException] {
      Types.renderCatalogType("decimal", Some(10), None)
    }
  }
}
