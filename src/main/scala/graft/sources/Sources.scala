package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source layer (SURVEY §2.1): the reference reads an Excel workbook —
  * every sheet into an untyped frame, then infers types
  * (`window.py:294-311`, S1/S2). Spark-side, a "workbook" is a
  * directory of named tables; sheets map to per-table DataFrames and
  * type inference maps to reader schema inference. No Excel codec
  * exists offline, so the bundled formats are parquet/CSV/JSON — the
  * workbook abstraction is format-agnostic.
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

  /** S1 — workbook scan: every table ("sheet") in the directory, keyed
    * by name — the analogue of `pd.read_excel(fp, sheet_name=None)`.
    */
  def workbook(s: SparkSession, dir: String): Map[String, DataFrame] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet"))
      .map(f => f.stripSuffix(".parquet") ->
        s.read.parquet(s"$dir/$f"))
      .toMap
  }

  /** S3 — source enumeration: the names a workbook offers (the
    * analogue of `pyodbc.dataSources()` / sheet listing).
    */
  def listSources(s: SparkSession, dir: String): Seq[String] =
    workbook(s, dir).keys.toSeq.sorted
}
