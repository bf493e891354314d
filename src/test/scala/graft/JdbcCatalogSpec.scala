package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DatabaseMetaData, ResultSet}

import graft.engine.JdbcCatalog
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins S3/S5/S6 over JDBC `DatabaseMetaData` with proxy-backed fakes
  * (no live DSN offline), the same technique as MergeSinkSpec: the
  * metadata protocol — which calls, which result-set columns, which
  * ordering contract — is asserted, not a driver's behavior.
  */
class JdbcCatalogSpec extends AnyFunSuite {

  private def proxy[T](cls: Class[T], h: InvocationHandler): T =
    Proxy.newProxyInstance(getClass.getClassLoader, Array[Class[_]](cls), h)
      .asInstanceOf[T]

  /** Forward-only ResultSet over literal rows. */
  private def rsOf(rows: Seq[Map[String, Any]]): ResultSet = {
    var i = -1
    proxy(classOf[ResultSet], new InvocationHandler {
      override def invoke(
          p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "next" =>
            i += 1; java.lang.Boolean.valueOf(i < rows.size)
          case "getString" =>
            rows(i)(args(0).toString).asInstanceOf[AnyRef]
          case "getInt" =>
            Integer.valueOf(rows(i)(args(0).toString).asInstanceOf[Int])
          case "getShort" => java.lang.Short.valueOf(
            rows(i)(args(0).toString).asInstanceOf[Int].toShort)
          case _ => null
        }
    })
  }

  private val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  private val closed = new java.util.concurrent.atomic.AtomicInteger(0)

  private def conn(): Connection = {
    opened.incrementAndGet()
    val md = proxy(classOf[DatabaseMetaData], new InvocationHandler {
      override def invoke(
          p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "getTables" =>
            // deliberately unsorted: listTables owns the O1 ordering
            rsOf(Seq(Map("TABLE_NAME" -> "orders"),
              Map("TABLE_NAME" -> "customer")))
          case "getColumns" => args(2).toString match {
            case "orders" => rsOf(Seq(
              // deliberately out of ordinal order
              Map("COLUMN_NAME" -> "o_totalprice", "ORDINAL_POSITION" -> 2,
                "DATA_TYPE" -> java.sql.Types.DOUBLE,
                "COLUMN_SIZE" -> 0, "DECIMAL_DIGITS" -> 0),
              Map("COLUMN_NAME" -> "o_orderkey", "ORDINAL_POSITION" -> 1,
                "DATA_TYPE" -> java.sql.Types.BIGINT,
                "COLUMN_SIZE" -> 0, "DECIMAL_DIGITS" -> 0),
              Map("COLUMN_NAME" -> "o_comment", "ORDINAL_POSITION" -> 3,
                "DATA_TYPE" -> java.sql.Types.VARCHAR,
                "COLUMN_SIZE" -> 79, "DECIMAL_DIGITS" -> 0)))
            case "customer" => rsOf(Seq(
              Map("COLUMN_NAME" -> "c_custkey", "ORDINAL_POSITION" -> 1,
                "DATA_TYPE" -> java.sql.Types.BIGINT,
                "COLUMN_SIZE" -> 0, "DECIMAL_DIGITS" -> 0),
              Map("COLUMN_NAME" -> "c_acctbal", "ORDINAL_POSITION" -> 2,
                "DATA_TYPE" -> java.sql.Types.DECIMAL,
                "COLUMN_SIZE" -> 12, "DECIMAL_DIGITS" -> 2)))
            case _ => rsOf(Nil)
          }
          case "getPrimaryKeys" =>
            // KEY_SEQ order, not result order, defines the key
            rsOf(Seq(
              Map("COLUMN_NAME" -> "l_linenumber", "KEY_SEQ" -> 2),
              Map("COLUMN_NAME" -> "l_orderkey", "KEY_SEQ" -> 1)))
          case _ => null
        }
    })
    proxy(classOf[Connection], new InvocationHandler {
      override def invoke(
          p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "getMetaData" => md
          case "close"       => closed.incrementAndGet(); null
          case _             => null
        }
    })
  }

  private def cat = new JdbcCatalog(() => conn())

  test("S3: JDBC table enumeration is sorted") {
    assert(cat.listTables == Seq("customer", "orders"))
  }

  test("S6: JDBC column scan orders by ordinal and maps JDBC types") {
    val cols = cat.columns("orders")
    assert(cols.map(_.column) == Seq("o_orderkey", "o_totalprice", "o_comment"))
    assert(cols.map(_.ordinal) == Seq(1, 2, 3))
    assert(cols.map(_.dataType) == Seq(LongType, DoubleType, VarcharType(79)))
  }

  test("S4+O1: full scan is table-then-ordinal; rendered types match util.py:63-74") {
    val all = cat.allColumns
    assert(all.map(m => (m.table, m.ordinal)) == Seq(
      ("customer", 1), ("customer", 2),
      ("orders", 1), ("orders", 2), ("orders", 3)))
    assert(all.find(_.column == "c_acctbal").get.rendered == "decimal(12, 2)")
    assert(all.find(_.column == "o_comment").get.rendered == "varchar(79)")
  }

  test("S5: primary-key columns come back in KEY_SEQ order") {
    assert(cat.primaryKey("lineitem") == Seq("l_orderkey", "l_linenumber"))
  }

  test("out-of-domain driver decimals clamp instead of aborting the scan") {
    import graft.engine.JdbcCatalog.toDataType
    import java.sql.Types.NUMERIC
    // Oracle NUMBER with unspecified precision reports 0 → unusable
    assert(toDataType(NUMERIC, 0, 0) == StringType)
    // ODBC bridges report precision > 38 → clamp to Spark's max
    assert(toDataType(NUMERIC, 77, 4) == DecimalType(38, 4))
    // scale > precision and negative scale both clamp into [0, p]
    assert(toDataType(NUMERIC, 10, 40) == DecimalType(10, 10))
    assert(toDataType(NUMERIC, 10, -84) == DecimalType(10, 0))
    // in-domain shapes pass through untouched
    assert(toDataType(NUMERIC, 12, 2) == DecimalType(12, 2))
    // CHAR/VARCHAR with unusable driver lengths degrade to string
    // instead of throwing
    assert(toDataType(java.sql.Types.CHAR, 0, 0) == StringType)
    assert(toDataType(java.sql.Types.CHAR, 8, 0) == CharType(8))
    assert(toDataType(java.sql.Types.VARCHAR, 0, 0) == StringType)
  }

  test("each metadata call opens and closes exactly one connection") {
    opened.set(0); closed.set(0)
    val c = cat
    c.listTables
    c.primaryKey("lineitem")
    assert(opened.get() == 2 && closed.get() == 2)
  }
}
