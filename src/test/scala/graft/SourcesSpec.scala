package graft

import graft.sources.Sources
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  test("S1: workbook scan loads every table keyed by name") {
    val wb = Sources.workbook(spark, sf())
    assert(wb.keySet == Set("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings"))
    assert(wb("region").count() == 5)
  }

  test("S3: source enumeration is sorted") {
    val names = Sources.listSources(spark, sf())
    assert(names == names.sorted && names.contains("lineitem"))
  }

  test("S2: CSV schema inference types columns like convert_dtypes") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f,
      "id,name,qty,price\n1,Apple,5,10.5\n2,Pear,4,9.25\n")
    val df = Sources.readCsv(spark, f.toString)
    assert(df.schema("id").dataType == IntegerType)
    assert(df.schema("name").dataType == StringType)
    assert(df.schema("price").dataType == DoubleType)
    assert(df.count() == 2)
  }

  test("S2: explicit schema overrides inference") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src2")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f, "id,qty\n1,5\n")
    val st = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val df = Sources.readCsv(spark, f.toString, schema = Some(st))
    assert(df.schema("id").dataType == LongType)
  }

  /** Hand-built xlsx via java.util.zip — no writer library, so the
    * reader is pinned against the file format itself, not a codec's
    * idea of it.
    */
  private def writeXlsx(entries: (String, String)*): String = {
    val f = java.nio.file.Files.createTempFile("wb", ".xlsx")
    val zos = new java.util.zip.ZipOutputStream(
      java.nio.file.Files.newOutputStream(f))
    try entries.foreach { case (name, content) =>
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    } finally zos.close()
    f.toString
  }

  private def sampleXlsx(): String = writeXlsx(
    "[Content_Types].xml" ->
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""",
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |  <sheets>
        |    <sheet name="items" sheetId="1" r:id="rId1"/>
        |    <sheet name="flags" sheetId="2" r:id="rId2"/>
        |  </sheets>
        |</workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
        |  <Relationship Id="rId2" Type="w" Target="worksheets/sheet2.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst count="4" uniqueCount="4">
        |  <si><t>id</t></si>
        |  <si><t>name</t></si>
        |  <si><r><t>Ap</t></r><r><t>ple</t></r></si>
        |  <si><t>Pear &amp; Co</t></si>
        |</sst>""".stripMargin,
    // row 3 has a gap at B (blank name); C4 carries an inline string;
    // the qty cell in row 4 omits its r= reference (sequential
    // placement); id values exercise Long vs Double inference
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1">
        |      <c r="A1" t="s"><v>0</v></c>
        |      <c r="B1" t="s"><v>1</v></c>
        |      <c r="C1" t="str"><v>qty</v></c>
        |      <c r="D1" t="inlineStr"><is><t>price</t></is></c>
        |    </row>
        |    <row r="2">
        |      <c r="A2"><v>1</v></c>
        |      <c r="B2" t="s"><v>2</v></c>
        |      <c r="C2"><v>5</v></c>
        |      <c r="D2"><v>10.5</v></c>
        |    </row>
        |    <row r="3">
        |      <c r="A3"><v>90000000000</v></c>
        |      <c r="C3"><v>4</v></c>
        |      <c r="D3"><v>9</v></c>
        |    </row>
        |    <row r="4">
        |      <c r="A4"><v>3</v></c>
        |      <c r="B4" t="s"><v>3</v></c>
        |      <c><v>7</v></c>
        |      <c r="D4"><v>2.5E2</v></c>
        |    </row>
        |  </sheetData>
        |</worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |  <sheetData>
        |    <row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c>
        |      <c r="B1" t="inlineStr"><is><t>ok</t></is></c></row>
        |    <row r="2"><c r="A2"><v>1</v></c><c r="B2" t="b"><v>1</v></c></row>
        |    <row r="3"><c r="A3"><v>2</v></c><c r="B3" t="b"><v>0</v></c></row>
        |  </sheetData>
        |</worksheet>""".stripMargin
  )

  test("S1: xlsx reader loads every sheet in workbook order") {
    val wb = Sources.readXlsx(spark, sampleXlsx())
    assert(wb.keys.toSeq == Seq("items", "flags"))
    assert(wb("items").count() == 3)
    assert(wb("flags").count() == 2)
  }

  test("S1+S2: xlsx cell types, shared/inline strings, gaps, inference") {
    val items = Sources.readXlsx(spark, sampleXlsx())("items")
    assert(items.schema.fieldNames.toSeq == Seq("id", "name", "qty", "price"))
    // id stays integral across the >2^31 value; price mixes 10.5/9/2.5E2
    assert(items.schema("id").dataType == LongType)
    assert(items.schema("name").dataType == StringType)
    assert(items.schema("qty").dataType == LongType)
    assert(items.schema("price").dataType == DoubleType)
    val rows = items.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 90000000000L))
    // rich-run shared string, r-less sequential cell, scientific notation
    assert(rows(0).getString(1) == "Apple" && rows(0).getLong(2) == 5L)
    assert(rows(1).getString(1) == "Pear & Co" && rows(1).getLong(2) == 7L)
    assert(rows(1).getDouble(3) == 250.0)
    // the gap cell (row 3, column B) is null
    assert(rows(2).isNullAt(1) && rows(2).getLong(2) == 4L)
  }

  test("S1+S2: xlsx boolean column inference and workbook dispatch") {
    val path = sampleXlsx()
    // workbook() dispatches on the .xlsx suffix (window.py:294-311)
    val wb = Sources.workbook(spark, path)
    val flags = wb("flags")
    assert(flags.schema("ok").dataType == BooleanType)
    assert(flags.orderBy("k").collect().map(_.getBoolean(1)).toSeq ==
      Seq(true, false))
  }

  test("S1+S2: date-styled numeric cells become date/timestamp columns") {
    // serial 45000 = 2023-03-15 (1900 system, day 0 = 1899-12-30);
    // styles: xf 0 = General, xf 1 = built-in 14 (m/d/yyyy),
    // xf 2 = custom datetime format
    val path = writeXlsx(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="dated" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/styles.xml" ->
        """<?xml version="1.0"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <numFmts count="1">
          |    <numFmt numFmtId="164" formatCode="yyyy-mm-dd hh:mm:ss"/>
          |  </numFmts>
          |  <cellXfs count="3">
          |    <xf numFmtId="0"/><xf numFmtId="14"/><xf numFmtId="164"/>
          |  </cellXfs>
          |</styleSheet>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1">
          |      <c r="A1" t="inlineStr"><is><t>id</t></is></c>
          |      <c r="B1" t="inlineStr"><is><t>day</t></is></c>
          |      <c r="C1" t="inlineStr"><is><t>at</t></is></c>
          |    </row>
          |    <row r="2">
          |      <c r="A2"><v>1</v></c>
          |      <c r="B2" s="1"><v>45000</v></c>
          |      <c r="C2" s="2"><v>45000.5</v></c>
          |    </row>
          |    <row r="3">
          |      <c r="A3"><v>2</v></c>
          |      <c r="B3" s="1"><v>45001</v></c>
          |      <c r="C3" s="2"><v>45000.25</v></c>
          |    </row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
    val df = Sources.readXlsx(spark, path)("dated")
    // integral serials under a date format → DateType; fractional → NTZ
    assert(df.schema("day").dataType == DateType)
    assert(df.schema("at").dataType == TimestampNTZType)
    val rows = df.orderBy("id").collect()
    assert(rows(0).getDate(1).toString == "2023-03-15")
    assert(rows(0).getAs[java.time.LocalDateTime](2).toString == "2023-03-15T12:00")
    assert(rows(1).getDate(1).toString == "2023-03-16")
    assert(rows(1).getAs[java.time.LocalDateTime](2).toString == "2023-03-15T06:00")
  }

  test("E1 end-to-end: xlsx sheet -> Importer merge -> ParquetMergeSink") {
    // the reference's whole GUI workflow (window.py:294-311 load,
    // :453-502 import) minus the GUI: a user workbook updates a table
    import graft.engine.{Catalog, Importer, MergeSpec, ParquetMergeSink}
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val keys = orders.select("o_orderkey").orderBy("o_orderkey")
      .limit(3).collect().map(_.getLong(0))
    val sheetRows = keys.zipWithIndex.map { case (k, i) =>
      s"""<row r="${i + 2}"><c r="A${i + 2}"><v>$k</v></c>
         |<c r="B${i + 2}"><v>${1000.5 + i}</v></c></row>""".stripMargin
    }.mkString("\n")
    val path = writeXlsx(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <sheets><sheet name="updates" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
           |  <sheetData>
           |    <row r="1"><c r="A1" t="inlineStr"><is><t>o_orderkey</t></is></c>
           |      <c r="B1" t="inlineStr"><is><t>o_totalprice</t></is></c></row>
           |    $sheetRows
           |  </sheetData>
           |</worksheet>""".stripMargin)
    val sheet = Sources.workbook(spark, path)("updates")
    assert(sheet.schema("o_orderkey").dataType == LongType)
    val merge = Importer.merge(orders, sheet,
      joinOn = Seq("o_orderkey"), subset = Seq("o_totalprice"),
      tablePk = Catalog.defaultPks("orders"))
    val out = java.nio.file.Files
      .createTempDirectory("e1_sink").toString + "/orders"
    val affected = new ParquetMergeSink(out).write(merge, sheet,
      MergeSpec("orders", Seq("o_orderkey"), Seq("o_totalprice")))
    assert(affected == keys.length.toLong)
    val back = spark.read.parquet(out)
    assert(back.count() == orders.count())
    val updated = back
      .filter(org.apache.spark.sql.functions.col("o_orderkey").isin(keys: _*))
      .orderBy("o_orderkey").collect()
      .map(r => r.getAs[Double]("o_totalprice"))
    assert(updated.toSeq == keys.indices.map(i => 1000.5 + i))
  }

  test("xlsx primitives: A1 column refs and 1900-system date serials") {
    import graft.sources.Xlsx
    assert(Seq("A1", "Z9", "AA1", "AB77", "BA2", "AAA1")
      .map(Xlsx.colIndex) == Seq(0, 25, 26, 27, 52, 702))
    assert(Xlsx.serialToDateTime(45000.0).toString == "2023-03-15T00:00")
    assert(Xlsx.serialToDateTime(45000.75).toString == "2023-03-15T18:00")
    // day 61 = 1900-03-01: first serial unaffected by the 1900 leap bug
    assert(Xlsx.serialToDateTime(61.0).toString == "1900-03-01T00:00")
    // 1904 system: day 0 = 1904-01-01, and (1904 being a real leap
    // year) day 61 is plain arithmetic — no leap-bug discontinuity
    assert(Xlsx.serialToDateTime(0.0, date1904 = true).toString ==
      "1904-01-01T00:00")
    assert(Xlsx.serialToDateTime(61.0, date1904 = true).toString ==
      "1904-03-02T00:00")
    // the documented 1462-day offset between the two systems
    for (s <- Seq(61.0, 1000.25, 45000.75))
      assert(Xlsx.serialToDateTime(s, date1904 = true) ==
        Xlsx.serialToDateTime(s + 1462.0))
  }

  test("S1: workbookPr date1904 shifts every serial date cell") {
    val path = writeXlsx(
      "xl/workbook.xml" ->
        """<?xml version="1.0"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
          |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |  <workbookPr date1904="1"/>
          |  <sheets><sheet name="mac" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |  <Relationship Id="rId1" Type="w" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/styles.xml" ->
        """<?xml version="1.0"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="14"/></cellXfs>
          |</styleSheet>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        """<?xml version="1.0"?>
          |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |  <sheetData>
          |    <row r="1"><c r="A1" t="inlineStr"><is><t>day</t></is></c></row>
          |    <row r="2"><c r="A2" s="1"><v>45000</v></c></row>
          |  </sheetData>
          |</worksheet>""".stripMargin)
    val df = Sources.readXlsx(spark, path)("mac")
    assert(df.schema("day").dataType == DateType)
    // 45000 in the 1904 system = 45000 + 1462 in the 1900 system:
    // 2023-03-15 shifted 4 years and a day — the silent misdate a
    // reader that ignores the flag would produce
    assert(df.collect().head.getDate(0).toString == "2027-03-16")
  }

  /** Hand-writes a 2-row parquet whose `ts` column is annotated
    * TIMESTAMP(NANOS) — a type Spark lacks and the driver fixtures no
    * longer carry — so the footer-based detection and the exact ns→µs
    * normalization stay covered against a real file.
    */
  private def writeNanosParquet(dir: java.nio.file.Path): String = {
    import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.example.data.simple.SimpleGroup
    import org.apache.parquet.hadoop.example.ExampleParquetWriter
    val schema: MessageType = Types.buildMessage()
      .addField(Types.required(PrimitiveTypeName.INT64).named("event_id"))
      .addField(Types.required(PrimitiveTypeName.INT64)
        .as(LogicalTypeAnnotation.timestampType(false,
          LogicalTypeAnnotation.TimeUnit.NANOS)).named("ts"))
      .named("events")
    val out = dir.resolve("nanos.parquet").toString
    val w = ExampleParquetWriter
      .builder(new org.apache.hadoop.fs.Path(out))
      .withType(schema)
      .withConf(spark.sparkContext.hadoopConfiguration)
      .build()
    try {
      // 2021-01-01 00:00:00.000000001 and +1s+999ns — sub-µs digits
      // must truncate, not round, under DIV 1000
      val base = 1609459200L * 1000000000L
      for ((id, ns) <- Seq((1L, base + 1L), (2L, base + 1000000999L))) {
        val g = new SimpleGroup(schema)
        g.add("event_id", id)
        g.add("ts", ns)
        w.write(g)
      }
    } finally w.close()
    out
  }

  test("source layer normalizes parquet TIMESTAMP(NANOS) to timestamp_ntz") {
    import graft.sources.Sources
    val tmp = java.nio.file.Files.createTempDirectory("nanos_src")
    try {
      val nanosFile = writeNanosParquet(tmp)
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(nanosFile),
        tmp.resolve("nanos_tbl.parquet"))
      // detection comes from the parquet footer, not column names
      assert(Sources.nanosTimestampColumns(spark, nanosFile) == Seq("ts"))
      assert(Sources.nanosTimestampColumns(spark, s"${sf()}/orders.parquet")
        .isEmpty)
      // the regenerated driver fixtures store µs — detection must not
      // fire on them, and the scan passes them through untouched
      assert(Sources.nanosTimestampColumns(spark, s"${sf()}/events.parquet")
        .isEmpty)
      assert(Sources.readTable(spark, sf(), "events").schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      val ev = Sources.readTable(spark, tmp.toString, "nanos_tbl")
      assert(ev.schema("ts").dataType ==
        org.apache.spark.sql.types.TimestampNTZType)
      // value parity with the raw ns-long DIV 1000 derivation
      val norm = ev.orderBy("event_id").select("ts").collect()
        .map(_.getAs[java.time.LocalDateTime](0))
      def want(ns: Long) = {
        val us = ns / 1000
        java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(us, 1000000L),
          Math.floorMod(us, 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC)
      }
      val base = 1609459200L * 1000000000L
      assert(norm.toSeq ==
        Seq(want(base + 1L), want(base + 1000000999L)))
      // untouched columns pass through identically
      val o = Sources.readTable(spark, sf(), "orders")
      assert(o.schema == spark.read.parquet(s"${sf()}/orders.parquet").schema)
      // the NTZ derivation must not consult the session timezone — an
      // LTZ round-trip would shift every value for non-UTC sessions
      val prevTz = spark.conf.get("spark.sql.session.timeZone")
      try {
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        val shifted = Sources.readTable(spark, tmp.toString, "nanos_tbl")
          .orderBy("event_id").select("ts").head()
          .getAs[java.time.LocalDateTime](0)
        assert(shifted == norm(0), "ts must be session-timezone-independent")
      } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }

  test("S2: JSON-lines read infers nested types") {
    val dir = java.nio.file.Files.createTempDirectory("json_src")
    val f = dir.resolve("t.json")
    java.nio.file.Files.writeString(f,
      """{"id":1,"tags":["a","b"]}""" + "\n" + """{"id":2,"tags":[]}""" + "\n")
    val df = Sources.readJson(spark, f.toString)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("tags").dataType == ArrayType(StringType, containsNull = true))
  }
}
