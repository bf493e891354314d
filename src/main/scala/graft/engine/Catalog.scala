package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** One catalog row, the analogue of an `INFORMATION_SCHEMA.COLUMNS`
  * record (`/root/reference/dbimport/util.py:31-76`).
  */
final case class ColumnMeta(
    table: String,
    column: String,
    ordinal: Int,
    dataType: DataType
) {
  /** The reference's string rendering of a catalog type (`util.py:63-74`). */
  def rendered: String = dataType match {
    case d: DecimalType => Types.renderCatalogType("decimal", Some(d.precision), Some(d.scale))
    case v: VarcharType => Types.renderCatalogType("varchar", Some(v.length), None)
    case c: CharType    => Types.renderCatalogType("char", Some(c.length), None)
    case other          => other.simpleString
  }
}

/** Table registry over a directory of parquet tables, standing in for
  * the reference's ODBC catalog round-trips (S3-S6):
  *
  *   - S3 source enumeration  — `pyodbc.dataSources()` (`window.py:201`)
  *     → [[listTables]]
  *   - S4 catalog column scan — `get_column_metadata` (`util.py:31-76`)
  *     → [[allColumns]] / [[columnsDf]]
  *   - S5 primary-key scan    — `_get_pk` (`importer.py:149-155`)
  *     → [[primaryKey]] (Spark has no PK concept; a sidecar map carries
  *     key metadata beside the data, defaulted for the test corpus)
  *   - S6 table column scan   — `_get_cols` (`importer.py:157-163`)
  *     → [[columns]]
  *
  * Schema metadata is driver-side by nature (it is per-table, not
  * per-row) — mirroring the reference, where catalog scans are small
  * metadata queries, cached per source (`window.py:211-216`).
  */
final class Catalog(
    spark: SparkSession,
    dir: String,
    pkOverrides: Map[String, Seq[String]] = Map.empty
) {

  private val pks: Map[String, Seq[String]] = Catalog.defaultPks ++ pkOverrides

  /** S3 — enumerate tables (one parquet file/dir per table). */
  def listTables: Seq[String] = {
    val d = new java.io.File(dir)
    Option(d.list()).getOrElse(Array.empty[String]).toSeq
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet")).sorted
  }

  /** Load one table through the source layer: parquet TIMESTAMP(NANOS)
    * columns surface as `timestamp_ntz` (not the nanosAsLong
    * workaround's raw Long), so the catalog reports what the data
    * means, not how the engine stores it in flight.
    */
  def table(name: String): DataFrame =
    graft.sources.Sources.readTable(spark, dir, name)

  private val schemaCache =
    scala.collection.concurrent.TrieMap.empty[String, StructType]

  def schemaOf(name: String): StructType =
    schemaCache.getOrElseUpdate(name, table(name).schema)

  /** S6 — ordered column metadata of one table (`_get_cols`). */
  def columns(name: String): Seq[ColumnMeta] =
    schemaOf(name).fields.zipWithIndex.toSeq.map { case (f, i) =>
      ColumnMeta(name, f.name, i + 1, f.dataType)
    }

  /** S4 + O1 — full catalog scan, ordered by table then ordinal
    * position like the reference's
    * `order by table_schema, table_name, ordinal_position`
    * (`util.py:45-47`).
    */
  def allColumns: Seq[ColumnMeta] =
    listTables.flatMap(columns)

  /** S4 as a relation, so the catalog scan is queryable/joinable. */
  def columnsDf: DataFrame = {
    val rows = allColumns.map(m =>
      Row(m.table, m.column, m.ordinal, m.rendered))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("table_name", StringType, nullable = false),
        StructField("column_name", StringType, nullable = false),
        StructField("ordinal_position", IntegerType, nullable = false),
        StructField("data_type", StringType, nullable = false)
      ))
    )
  }

  /** S5 — primary-key columns in ordinal order. */
  def primaryKey(name: String): Seq[String] =
    pks.getOrElse(name, Nil)

  /** Build an [[Importer]] with catalog-resolved PK metadata, the
    * analogue of `Importer.__init__`'s catalog round-trip
    * (`importer.py:95-98`).
    */
  def importer(
      tableName: String,
      data: DataFrame,
      joinOn: Option[Seq[String]] = None,
      subset: Option[Seq[String]] = None
  ): Importer =
    new Importer(table(tableName), data, table = tableName,
      tablePk = primaryKey(tableName), joinOn = joinOn, subset = subset)
}

/** S3/S5/S6 against a live database: enumeration through JDBC
  * `DatabaseMetaData` — the direct analogue of the reference's
  * `pyodbc.dataSources()` source listing (`window.py:201`) and its
  * catalog round-trips (`util.py:31-76`, `importer.py:149-163`).
  * Mirrors [[Catalog]]'s surface over a connection factory instead of
  * a parquet directory. Like [[JdbcMergeSink]], the connection is
  * injected so the metadata protocol is pinned offline by proxy-backed
  * fakes (JdbcCatalogSpec); there is no live DSN in this environment.
  *
  * Metadata volumes are per-table, not per-row — driver-side by
  * nature, same as the reference's cached catalog scans
  * (`window.py:211-216`).
  */
final class JdbcCatalog(
    connect: () => java.sql.Connection,
    catalog: Option[String] = None,
    schemaPattern: Option[String] = None
) {

  private def withConn[A](f: java.sql.DatabaseMetaData => A): A = {
    val conn = connect()
    try f(conn.getMetaData)
    finally conn.close()
  }

  /** S3 — table enumeration via `getTables`, sorted like
    * [[Catalog.listTables]] (O1).
    */
  def listTables: Seq[String] = withConn { md =>
    // table-type labels are vendor-defined: SQL Server/SQLite report
    // "TABLE", engines following the information-schema wording
    // (DuckDB, MySQL dumps) report "BASE TABLE" — filter on both so
    // views/system tables stay excluded everywhere
    val rs = md.getTables(
      catalog.orNull, schemaPattern.orNull, "%", Array("TABLE", "BASE TABLE"))
    val out = scala.collection.mutable.Buffer.empty[String]
    try while (rs.next()) out += rs.getString("TABLE_NAME")
    finally rs.close()
    out.toSeq.sorted
  }

  /** S6 — ordered column metadata via `getColumns` (`_get_cols`,
    * `importer.py:157-163`); JDBC type codes map back to Spark types
    * (the inverse of [[JdbcMergeSink.sqlTypesFor]]).
    */
  def columns(table: String): Seq[ColumnMeta] = withConn { md =>
    val rs = md.getColumns(catalog.orNull, schemaPattern.orNull, table, "%")
    val out = scala.collection.mutable.Buffer.empty[ColumnMeta]
    try while (rs.next()) out += ColumnMeta(
      table,
      rs.getString("COLUMN_NAME"),
      rs.getInt("ORDINAL_POSITION"),
      JdbcCatalog.toDataType(
        rs.getInt("DATA_TYPE"),
        rs.getInt("COLUMN_SIZE"),
        rs.getInt("DECIMAL_DIGITS")))
    finally rs.close()
    out.sortBy(_.ordinal).toSeq
  }

  /** S4 + O1 — full catalog scan ordered by table then ordinal, the
    * `order by table_schema, table_name, ordinal_position` contract
    * (`util.py:45-47`).
    */
  def allColumns: Seq[ColumnMeta] = listTables.flatMap(columns)

  /** S5 — primary-key columns in key order via `getPrimaryKeys`
    * (`_get_pk`, `importer.py:149-155`).
    */
  def primaryKey(table: String): Seq[String] = withConn { md =>
    val rs = md.getPrimaryKeys(catalog.orNull, schemaPattern.orNull, table)
    val out = scala.collection.mutable.Buffer.empty[(Short, String)]
    try while (rs.next())
      out += ((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
    finally rs.close()
    out.sortBy(_._1).map(_._2).toSeq
  }
}

object JdbcCatalog {
  /** `java.sql.Types` code → Spark type (catalog rendering follows
    * [[ColumnMeta.rendered]], matching `translate_dtype`'s table,
    * `util.py:63-74`).
    */
  private[graft] def toDataType(
      sqlType: Int, size: Int, scale: Int): DataType = {
    import java.sql.Types._
    sqlType match {
      case BIGINT                      => LongType
      case INTEGER                     => IntegerType
      case SMALLINT                    => ShortType
      case TINYINT                     => ByteType
      case DOUBLE | FLOAT              => DoubleType
      case REAL                        => FloatType
      case BOOLEAN | BIT               => BooleanType
      case DECIMAL | NUMERIC           =>
        // drivers report out-of-domain shapes (Oracle NUMBER: precision
        // 0 = unspecified, scale up to 127 or negative; ODBC bridges:
        // precision > 38) — DecimalType would throw and abort the whole
        // catalog scan, so clamp into Spark's domain; precision < 1
        // means the driver told us nothing usable → StringType
        val p = math.min(size, DecimalType.MAX_PRECISION)
        if (p < 1) StringType
        else DecimalType(p, math.min(math.max(scale, 0), p))
      case DATE                        => DateType
      case TIMESTAMP                   => TimestampNTZType
      case TIMESTAMP_WITH_TIMEZONE     => TimestampType
      case VARBINARY | BINARY | LONGVARBINARY => BinaryType
      // same clamp discipline as DECIMAL: drivers report 0 /
      // out-of-range lengths, and CharType/VarcharType throw on them
      case CHAR if size > 0 && size < Int.MaxValue    => CharType(size)
      case VARCHAR if size > 0 && size < Int.MaxValue => VarcharType(size)
      case _                           => StringType
    }
  }
}

object Catalog {
  /** PK sidecar for the driver-generated test corpus (TESTDATA.md) —
    * the stand-in for `information_schema.key_column_usage`.
    */
  val defaultPks: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey"),
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id")
  )
}
