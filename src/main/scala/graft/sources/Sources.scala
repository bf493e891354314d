package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StructField, StructType}

/** Source layer (SURVEY §2.1): the reference reads an Excel workbook —
  * every sheet into an untyped frame, then infers types
  * (`window.py:294-311`, S1/S2). Spark-side, a "workbook" is either a
  * real `.xlsx` file (read by the engine's own codec-free [[Xlsx]]
  * parser) or a directory of named tables; sheets map to per-table
  * DataFrames and type inference maps to reader schema inference.
  */
object Sources {

  /** S2 — schema-inferring CSV read (header row as sheet columns;
    * `inferSchema` plays `convert_dtypes`).
    */
  def readCsv(
      s: SparkSession, path: String,
      header: Boolean = true, inferSchema: Boolean = true,
      schema: Option[StructType] = None
  ): DataFrame = {
    val r = s.read.option("header", header.toString)
    schema match {
      case Some(st) => r.schema(st).csv(path)
      case None     => r.option("inferSchema", inferSchema.toString).csv(path)
    }
  }

  /** S2 — schema-inferring JSON-lines read. */
  def readJson(s: SparkSession, path: String): DataFrame =
    s.read.json(path)

  /** S1 — workbook scan: every table ("sheet") keyed by name — the
    * analogue of `pd.read_excel(fp, sheet_name=None)`
    * (`window.py:296`). A `.xlsx` path is read natively by [[Xlsx]];
    * a directory is treated as a workbook of parquet tables.
    */
  def workbook(s: SparkSession, dir: String): Map[String, DataFrame] = {
    val d = new java.io.File(dir)
    if (d.isFile && dir.toLowerCase.endsWith(".xlsx")) readXlsx(s, dir)
    else Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet"))
      .map(f => f.stripSuffix(".parquet") ->
        s.read.parquet(s"$dir/$f"))
      .toMap
  }

  /** S1 + S2 — every sheet of an xlsx workbook as a typed DataFrame
    * (first row = header, column types inferred per
    * [[Xlsx.inferType]], the `convert_dtypes` analogue,
    * `window.py:303-304`). Workbook order is preserved. The parse is
    * driver-side by nature — xlsx is a single unsplittable zip and the
    * reference loads it into GUI memory; it is the small-side input
    * path (user deltas/dimensions), while bulk data enters as parquet.
    */
  def readXlsx(s: SparkSession, path: String): Map[String, DataFrame] = {
    val sheets = Xlsx.readSheets(path).map { case (name, grid) =>
      name -> sheetDf(s, grid)
    }
    scala.collection.immutable.ListMap(sheets: _*)
  }

  private def sheetDf(
      s: SparkSession, grid: Vector[Vector[Option[Xlsx.Cell]]]
  ): DataFrame = {
    if (grid.isEmpty) return s.emptyDataFrame
    val width = grid.map(_.length).max
    val names = Xlsx.headerNames(grid.head, width)
    val data = grid.tail.map(r => (0 until width).map(i => r.lift(i).flatten))
    val types = (0 until width).map(i => Xlsx.inferType(data.map(_(i))))
    val schema = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    val rows: java.util.List[Row] = new java.util.ArrayList[Row]
    data.foreach { r =>
      rows.add(Row.fromSeq((0 until width).map(i => Xlsx.convert(r(i), types(i)))))
    }
    s.createDataFrame(rows, schema)
  }

  /** S3 — source enumeration: the names a workbook offers (the
    * analogue of `pyodbc.dataSources()` / sheet listing).
    */
  def listSources(s: SparkSession, dir: String): Seq[String] =
    workbook(s, dir).keys.toSeq.sorted

  /** Columns stored as parquet TIMESTAMP(NANOS) — a type Spark doesn't
    * have, surfaced as raw Long under
    * `spark.sql.legacy.parquet.nanosAsLong`. Detected from the parquet
    * FOOTER (one driver-side metadata read per table, the same class
    * of work as a catalog scan), not guessed from column names.
    */
  def nanosTimestampColumns(s: SparkSession, path: String): Seq[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val f = new java.io.File(path)
    val dataFile =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .filter(x => x.isFile && x.getName.endsWith(".parquet"))
          .sortBy(_.getName).headOption.map(_.getPath)
      else Some(path)
    dataFile.toSeq.flatMap { df =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
        new org.apache.hadoop.fs.Path(df),
        s.sparkContext.hadoopConfiguration)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getFooter.getFileMetaData.getSchema.getFields.asScala.toSeq
        .collect {
          case field if field.isPrimitive &&
            (field.asPrimitiveType().getLogicalTypeAnnotation match {
              case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
                t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
              case _ => false
            }) => field.getName
        }
      finally r.close()
    }
  }

  /** S1/S2 — typed parquet table read with source-layer normalization:
    * TIMESTAMP(NANOS) columns become `timestamp_ntz` at the scan
    * (exact integer ns→µs division, applied as pure NTZ epoch
    * arithmetic — the wall-clock value parquet stored). Downstream
    * consumers (and the catalog) then see a timestamp, not a
    * workaround's raw Long.
    *
    * Deliberately NOT `timestamp_micros(..).cast("timestamp_ntz")`:
    * that renders the instant in the SESSION timezone, silently
    * shifting every value for any caller whose session isn't UTC.
    * `timestampadd` onto an NTZ epoch base never consults a zone.
    */
  def readTable(s: SparkSession, dir: String, table: String): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val path = s"$dir/$table.parquet"
    val raw = s.read.parquet(path)
    nanosTimestampColumns(s, path).foldLeft(raw) { (df, c) =>
      df.withColumn(c, expr(
        s"timestampadd(MICROSECOND, `$c` DIV 1000, TIMESTAMP_NTZ '1970-01-01 00:00:00')"))
    }
  }
}
