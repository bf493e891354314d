package graft.sources

import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.immutable.VectorBuilder
import scala.collection.mutable

import org.apache.spark.sql.types._

/** S1 — minimal from-scratch `.xlsx` workbook reader, the engine's
  * native analogue of the reference's
  * `pd.read_excel(fp, sheet_name=None, dtype=object)`
  * (`/root/reference/dbimport/window.py:294-311`). Zero external
  * dependencies: an xlsx file is a zip of XML parts, and this reader
  * consumes exactly the parts the reference's loader needs —
  *
  *   - `xl/workbook.xml`            sheet names in workbook order
  *   - `xl/_rels/workbook.xml.rels` sheet-id → worksheet part path
  *   - `xl/sharedStrings.xml`       the shared-string table
  *   - `xl/worksheets/sheetN.xml`   `sheetData` cell grid
  *
  * Cell semantics covered: shared strings (`t="s"`), formula-cached
  * strings (`t="str"`), inline strings (`t="inlineStr"`), booleans
  * (`t="b"`), numbers (`t="n"` / untyped), blanks (no `<v>`), error
  * cells (`t="e"` → null), sparse rows (gap refs pad with nulls),
  * cells without an `r` reference (sequential placement), ISO date
  * cells (`t="d"`), and serial date/datetime cells (numeric cells
  * whose `xl/styles.xml` number format is a date format — built-in
  * ids per ECMA-376 §18.8.30 or a custom `formatCode` with date
  * letters), which surface as date/timestamp columns like
  * `pd.read_excel`'s datetime handling.
  *
  * Scale note: xlsx is inherently a driver-side format — a single zip
  * that cannot be split, holding at most ~10⁶ rows by spec. It is the
  * small-side ingestion path (user-supplied deltas and dimensions, as
  * in the reference GUI); bulk data enters the engine as parquet. The
  * parse is streaming (StAX, one pass, no DOM), so memory is bounded
  * by the produced cells, not the XML text.
  */
object Xlsx {

  /** One parsed cell: `kind` is 's' (string), 'n' (number, raw text
    * preserved for lossless Long/Double inference), 'b' (boolean) or
    * 'd' (date/datetime, ISO-8601 text — produced when a numeric cell
    * carries a date number format, mirroring `pd.read_excel`'s
    * datetime columns).
    */
  final case class Cell(kind: Char, text: String)

  private val IsoFmt =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** Excel serial → local datetime. 1900 system: day 0 = 1899-12-30,
    * which also absorbs the historical 1900 leap-year bug for serials
    * ≥ 61. 1904 system (`<workbookPr date1904="1"/>`, legacy Mac
    * Excel): day 0 = 1904-01-01 — without honoring the flag every date
    * cell in such a workbook lands 4 years and 1 day early, silently.
    * Fraction = time of day, rounded to the second.
    */
  private[graft] def serialToDateTime(
      serial: Double, date1904: Boolean = false): java.time.LocalDateTime = {
    val days = math.floor(serial).toLong
    val secs = math.round((serial - days) * 86400.0)
    val epoch =
      if (date1904) java.time.LocalDate.of(1904, 1, 1)
      else java.time.LocalDate.of(1899, 12, 30)
    epoch.plusDays(days).atStartOfDay.plusSeconds(secs)
  }

  /** 0-based column index of an A1-style reference ("B7" → 1). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && Character.isLetter(ref.charAt(i))) {
      acc = acc * 26 + (Character.toUpperCase(ref.charAt(i)) - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  private def xmlFactory: XMLInputFactory = {
    val f = XMLInputFactory.newInstance()
    // untrusted input: no external entities, no DTDs
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f
  }

  private def withXml[A](zip: ZipFile, entry: String)(
      f: XMLStreamReader => A): Option[A] =
    Option(zip.getEntry(entry)).map { e =>
      val in = zip.getInputStream(e)
      val r = xmlFactory.createXMLStreamReader(in)
      try f(r)
      finally { r.close(); in.close() }
    }

  /** `xl/_rels/workbook.xml.rels`: relationship id → worksheet part. */
  private def parseRels(r: XMLStreamReader): Map[String, String] = {
    val m = mutable.Map.empty[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT &&
        r.getLocalName == "Relationship") {
        val id = r.getAttributeValue(null, "Id")
        val target = r.getAttributeValue(null, "Target")
        if (id != null && target != null) m(id) = target
      }
    }
    m.toMap
  }

  /** `xl/workbook.xml`: (sheet name, relationship id) in file order,
    * plus the workbook's date system (`workbookPr date1904`).
    */
  private def parseWorkbook(
      r: XMLStreamReader): (Seq[(String, String)], Boolean) = {
    val out = mutable.Buffer.empty[(String, String)]
    var date1904 = false
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT) r.getLocalName match {
        case "workbookPr" =>
          val v = r.getAttributeValue(null, "date1904")
          date1904 = v == "1" || v == "true"
        case "sheet" =>
          val name = r.getAttributeValue(null, "name")
          // r:id is namespace-qualified; match by local name
          var rid: String = null
          var i = 0
          while (i < r.getAttributeCount) {
            if (r.getAttributeLocalName(i) == "id") rid = r.getAttributeValue(i)
            i += 1
          }
          if (name != null && rid != null) out += ((name, rid))
        case _ =>
      }
    }
    (out.toSeq, date1904)
  }

  /** `xl/sharedStrings.xml`: one concatenated string per `<si>` (rich
    * runs contribute their `<t>` fragments; phonetic `<rPh>` runs are
    * skipped, as every consumer does).
    */
  private def parseSharedStrings(r: XMLStreamReader): IndexedSeq[String] = {
    val out = new VectorBuilder[String]
    val sb = new java.lang.StringBuilder
    var inT = false
    var phonetic = 0
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "si"  => sb.setLength(0)
          case "rPh" => phonetic += 1
          case "t"   => inT = phonetic == 0
          case _     =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (inT) sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "si"  => out += sb.toString
          case "rPh" => phonetic -= 1
          case "t"   => inT = false
          case _     =>
        }
        case _ =>
      }
    }
    out.result()
  }

  /** Built-in date/time number-format ids (ECMA-376 §18.8.30). */
  private val BuiltinDateFmts: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** Is a custom format code a date/time format? Strip quoted
    * literals, bracketed sections ([Red], [$-409]) and escapes, then
    * look for date letters — a numeric format like `#,##0.00` has
    * none.
    */
  private[graft] def isDateFormat(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\\\\.", "")
    cleaned.exists(c => "ymdhs".contains(Character.toLowerCase(c)))
  }

  /** `xl/styles.xml` → per-`cellXfs`-index "is a date style" flags. */
  private def parseStyles(r: XMLStreamReader): IndexedSeq[Boolean] = {
    val custom = mutable.Map.empty[Int, Boolean]
    val xfs = mutable.Buffer.empty[Boolean]
    var inCellXfs = false
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "numFmt" =>
            val id = Option(r.getAttributeValue(null, "numFmtId"))
            val code = Option(r.getAttributeValue(null, "formatCode"))
            for (i <- id; c <- code) custom(i.toInt) = isDateFormat(c)
          case "cellXfs" => inCellXfs = true
          case "xf" if inCellXfs =>
            val fmt = Option(r.getAttributeValue(null, "numFmtId"))
              .map(_.toInt).getOrElse(0)
            xfs += (BuiltinDateFmts.contains(fmt) ||
              custom.getOrElse(fmt, false))
          case _ =>
        }
        case XMLStreamConstants.END_ELEMENT =>
          if (r.getLocalName == "cellXfs") inCellXfs = false
        case _ =>
      }
    }
    xfs.toIndexedSeq
  }

  /** One worksheet's `sheetData` as a row-major cell grid. */
  private def parseSheet(
      r: XMLStreamReader, shared: IndexedSeq[String],
      dateStyles: IndexedSeq[Boolean], date1904: Boolean
  ): Vector[Vector[Option[Cell]]] = {
    val rows = new VectorBuilder[Vector[Option[Cell]]]
    var row: mutable.ArrayBuffer[Option[Cell]] = null
    var cellCol = -1
    var cellType = "n"
    var cellDateStyle = false
    var sawValue = false
    var capture = false
    val text = new java.lang.StringBuilder

    def closeCell(): Unit = {
      val cell: Option[Cell] =
        if (!sawValue) None
        else cellType match {
          case "s"                 => Some(Cell('s', shared(text.toString.trim.toInt)))
          case "str" | "inlineStr" => Some(Cell('s', text.toString))
          case "b" =>
            Some(Cell('b', if (text.toString.trim == "1") "true" else "false"))
          case "e" => None
          case "d" =>
            // ISO-8601 cell (rare but in-spec); normalize to our form
            val t = text.toString.trim
            val norm =
              if (t.length >= 19) t.take(19)
              else if (t.length == 10) t + "T00:00:00"
              else t
            Some(Cell('d', norm))
          case _ =>
            val t = text.toString.trim
            if (cellDateStyle)
              Some(Cell('d', IsoFmt.format(serialToDateTime(t.toDouble, date1904))))
            else Some(Cell('n', t))
        }
      while (row.length < cellCol) row += None
      if (cellCol < row.length) row(cellCol) = cell else row += cell
    }

    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" => row = mutable.ArrayBuffer.empty[Option[Cell]]
          case "c" if row != null =>
            val ref = r.getAttributeValue(null, "r")
            cellCol = if (ref != null) colIndex(ref) else row.length
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
            cellDateStyle = Option(r.getAttributeValue(null, "s"))
              .flatMap(s => dateStyles.lift(s.toInt)).getOrElse(false)
            sawValue = false
            text.setLength(0)
          case "v" => capture = true
          case "t" if cellType == "inlineStr" => capture = true
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (capture) text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "row" => rows += row.toVector; row = null
          case "c" if row != null => closeCell()
          case "v" => capture = false; sawValue = true
          case "t" if cellType == "inlineStr" =>
            capture = false; sawValue = true
          case _ =>
        }
        case _ =>
      }
    }
    rows.result()
  }

  /** Every sheet of the workbook, in workbook order — the analogue of
    * `sheet_name=None` (`window.py:296`).
    */
  def readSheets(path: String): Seq[(String, Vector[Vector[Option[Cell]]])] = {
    val zip = new ZipFile(path)
    try {
      val rels = withXml(zip, "xl/_rels/workbook.xml.rels")(parseRels)
        .getOrElse(Map.empty)
      val (sheets, date1904) = withXml(zip, "xl/workbook.xml")(parseWorkbook)
        .getOrElse((Seq.empty, false))
      val shared = withXml(zip, "xl/sharedStrings.xml")(parseSharedStrings)
        .getOrElse(Vector.empty)
      val dateStyles = withXml(zip, "xl/styles.xml")(parseStyles)
        .getOrElse(IndexedSeq.empty)
      sheets.map { case (name, rid) =>
        val target = rels.getOrElse(rid, "")
        val part =
          if (target.startsWith("/")) target.substring(1)
          else "xl/" + target
        val grid = withXml(zip, part)(parseSheet(_, shared, dateStyles, date1904))
          .getOrElse(Vector.empty)
        name -> grid
      }
    } finally zip.close()
  }

  private def isLong(t: String): Boolean =
    t.nonEmpty && t.forall(c => c.isDigit || c == '-' || c == '+') &&
      scala.util.Try(t.toLong).isSuccess

  /** S2 — column type inference over a parsed column, the analogue of
    * `convert_dtypes()` (`window.py:304`): all-boolean → boolean,
    * all-numeric → long when every value is integral else double,
    * anything mixed or textual → string. All columns stay nullable
    * (blank cells), like pandas' nullable extension dtypes.
    */
  private[graft] def inferType(cells: Seq[Option[Cell]]): DataType = {
    val present = cells.flatten
    if (present.isEmpty) StringType
    else if (present.forall(_.kind == 'b')) BooleanType
    else if (present.forall(_.kind == 'd')) {
      // pure-midnight columns are dates, anything with a time of day
      // is a (zone-less) timestamp — pandas' date vs datetime split
      if (present.forall(_.text.endsWith("T00:00:00"))) DateType
      else TimestampNTZType
    } else if (present.forall(_.kind == 'n')) {
      if (present.forall(c => isLong(c.text))) LongType else DoubleType
    } else StringType
  }

  private[graft] def convert(cell: Option[Cell], dt: DataType): Any =
    cell match {
      case None => null
      case Some(c) => dt match {
        case LongType         => c.text.toLong
        case DoubleType       => c.text.toDouble
        case BooleanType      => c.text.toBoolean
        case DateType         => java.sql.Date.valueOf(c.text.take(10))
        case TimestampNTZType => java.time.LocalDateTime.parse(c.text, IsoFmt)
        case _                => c.text
      }
    }

  /** Header names from the first grid row (blank header → `_cN`). */
  private[graft] def headerNames(
      header: Vector[Option[Cell]], width: Int): Seq[String] =
    (0 until width).map { i =>
      header.lift(i).flatten.map(_.text).filter(_.nonEmpty)
        .getOrElse(s"_c$i")
    }
}
