package graft.engine

import org.apache.spark.sql.types._

/** Pure type-system layer of the engine (no SparkSession needed).
  *
  * Re-expresses the reference's source/target type translation and
  * cast-safety lattice (see `/root/reference/dbimport/util.py:79-143`)
  * in terms of both the reference's string-typed domain (for exact
  * contract parity, pinned by the ported case tables in
  * `tests/test_util.py`) and Spark's `DataType` algebra (for use inside
  * the engine).
  */
object Types {

  /** Source-side type domain after normalization — the reference
    * collapses pandas/numpy dtype names into 4 values plus passthrough
    * (`util.py:87-104`). Note: its "decimal" means *floating point*.
    */
  sealed trait SourceType { def name: String }
  case object Text extends SourceType { val name = "text" }
  case object Number extends SourceType { val name = "number" }
  case object DecimalSrc extends SourceType { val name = "decimal" }
  case object DatetimeSrc extends SourceType { val name = "datetime" }
  /** Passthrough for anything outside the 4-value domain (e.g. "bool"). */
  final case class Other(name: String) extends SourceType

  /** F3 — dtype-name normalization (`util.py:87-104`). */
  def translateDtype(name: String): String = {
    val n = name.toLowerCase
    if (n == "object" || n.startsWith("str")) "text"
    else if (
      n.startsWith("int") || n.startsWith("uint") ||
      n.startsWith("longlong") || n.startsWith("ulonglong")
    ) "number"
    else if (n.startsWith("float")) "decimal"
    else if (n.startsWith("datetime")) "datetime"
    else name
  }

  /** Spark-native variant of F3: map a Spark `DataType` into the
    * reference's 4-value source domain (SURVEY §1.2 table).
    */
  def sourceTypeOf(dt: DataType): SourceType = dt match {
    case StringType | _: VarcharType | _: CharType     => Text
    case ByteType | ShortType | IntegerType | LongType => Number
    case FloatType | DoubleType                        => DecimalSrc
    case TimestampType | TimestampNTZType              => DatetimeSrc
    case other                                         => Other(other.simpleString)
  }

  private val DecimalPattern =
    "^(decimal|numeric)\\((\\d+)\\s*,\\s*(\\d+)\\)$".r

  /** F4 — cast-safety predicate (`util.py:107-132`).
    *
    * Returns false (implicit/safe) only for:
    *   - text  → any type containing "char" or "text"
    *   - number → int | decimal* | numeric*
    *   - decimal → float, or decimal/numeric(p,s) with s > 0
    *   - datetime → any type containing "datetime" (not date/time)
    * Everything else requires an explicit cast (true).
    */
  def isCastExplicit(src: String, dst: String): Boolean = src match {
    case "text" =>
      !(dst.contains("char") || dst.contains("text"))
    case "number" =>
      !(dst == "int" || dst.startsWith("decimal") || dst.startsWith("numeric"))
    case "decimal" =>
      if (dst == "float") false
      else
        DecimalPattern.findFirstMatchIn(dst) match {
          case Some(m) if m.group(3).toInt > 0 => false
          case _                               => true
        }
    case "datetime" =>
      !dst.contains("datetime")
    case _ => true
  }

  /** Spark-native cast-safety over `DataType` pairs: true when the cast
    * from `src` to `dst` may lose information and so should be surfaced
    * to the user (the reference's yellow-cell warning,
    * `window.py:413-414`).
    *
    * Unlike the reference's coarse 4-value lattice (which collapses all
    * integers into "number"), this matches on the concrete source
    * `DataType` via `Cast.canUpCast`, so lossy narrowing casts such as
    * `LongType -> ByteType`, `LongType -> DecimalType(3,0)` and
    * `DoubleType -> FloatType` are correctly reported as explicit.
    */
  def isCastExplicit(src: DataType, dst: DataType): Boolean =
    !org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(src, dst)

  /** F1 — SQL Server delimited identifier (`util.py:135-143`): wrap in
    * brackets, double any `]`; None when the input exceeds 128 chars.
    */
  def quoteName(s: String): Option[String] =
    if (s.length > 128) None
    else Some("[" + s.replace("]", "]]") + "]")

  /** F2 — `schema.table`, or bare table when schema is empty/null
    * (`util.py:79-84`).
    */
  def qualifyName(schema: String, table: String): String =
    if (schema == null || schema.isEmpty) table else schema + "." + table

  /** F5 — user-message normalization (`util.py:20-24`): uppercase the
    * first character, append '.' unless the text already ends in '.'
    * or '!', left-justify to 30 chars (the reference pads so stacked
    * GUI message lines align). Empty input becomes a padded ".".
    */
  def normalizeMessage(message: String): String = {
    val capped =
      if (message.isEmpty) message
      else message.substring(0, 1).toUpperCase + message.substring(1)
    val punctuated =
      if (capped.endsWith(".") || capped.endsWith("!")) capped
      else capped + "."
    punctuated.padTo(30, ' ')
  }

  /** Render a catalog column type the way the reference's catalog scan
    * does (`util.py:63-74`): `type`, `type(n)` for char-ish, or
    * `type(p, s)` for decimal/numeric. Sized types with missing size
    * metadata throw (the reference would raise on a NULL size too) so a
    * bad catalog row is surfaced instead of rendered as `char(0)`.
    */
  def renderCatalogType(
      typeName: String,
      columnSize: Option[Int],
      decimalDigits: Option[Int]
  ): String = {
    def size(o: Option[Int], what: String): Int = o.getOrElse(
      throw new IllegalArgumentException(
        s"catalog metadata for sized type '$typeName' is missing $what"))
    if (typeName.contains("char"))
      s"$typeName(${size(columnSize, "column size")})"
    else if (typeName == "decimal" || typeName == "numeric")
      s"$typeName(${size(columnSize, "precision")}, ${size(decimalDigits, "scale")})"
    else typeName
  }
}
