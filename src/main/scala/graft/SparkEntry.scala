package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{Catalog, Importer, Staging}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is registered here as a
  * named query over the parquet corpus in `dir`, with an equivalent
  * DuckDB oracle in [[oracleSql]] where the semantics are
  * SQL-expressible. Column names are aliased identically on both sides
  * (the driver's compare sorts columns by name before hashing).
  */
object SparkEntry {

  private def rd(s: SparkSession, dir: String, t: String): DataFrame =
    s.read.parquet(s"$dir/$t.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    mergeOrders(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Core reference semantics (J1/J4/A4/P1-P3, S7/O2, A1/A3)
  // ---------------------------------------------------------------------

  /** J1 flagship — keyed bulk UPDATE of `orders` from a derived delta:
    * urgent orders get a 10% price bump and status 'F'. The delta side
    * is broadcast; the target is never shuffled.
    */
  private def mergeOrders(s: SparkSession, dir: String): DataFrame = {
    val orders = rd(s, dir, "orders")
    val delta = orders
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(
        col("o_orderkey"),
        (col("o_totalprice") * expr("CAST(1.1 AS DOUBLE)")).as("o_totalprice"),
        lit("F").as("o_orderstatus"))
    Importer.merge(orders, delta,
      joinOn = Seq("o_orderkey"),
      subset = Seq("o_totalprice", "o_orderstatus"),
      tablePk = Seq("o_orderkey")).updated
  }

  /** J1 + P3 — merge with null-keyed delta rows: rows whose key was
    * nulled out are dropped and their targets stay untouched
    * (`test_importer.py:166-189` semantics at fixture scale).
    */
  private def mergeCustomerNullKeys(s: SparkSession, dir: String): DataFrame = {
    val customer = rd(s, dir, "customer")
    val delta = customer
      .filter(col("c_custkey") <= 750)
      .select(
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_custkey"))
          .as("c_custkey"),
        (col("c_acctbal") + expr("CAST(100.0 AS DOUBLE)")).as("c_acctbal"))
    Importer.merge(customer, delta,
      joinOn = Seq("c_custkey"), subset = Seq("c_acctbal"),
      tablePk = Seq("c_custkey")).updated
  }

  /** A4 — affected-row count of the null-key merge, as a relation. */
  private def mergeRowCount(s: SparkSession, dir: String): DataFrame = {
    val customer = rd(s, dir, "customer")
    val delta = customer
      .filter(col("c_custkey") <= 750)
      .select(
        when(col("c_custkey") % 10 === 0, lit(null)).otherwise(col("c_custkey"))
          .as("c_custkey"),
        (col("c_acctbal") + expr("CAST(100.0 AS DOUBLE)")).as("c_acctbal"))
    val n = Importer.merge(customer, delta,
      joinOn = Seq("c_custkey"), subset = Seq("c_acctbal"),
      tablePk = Seq("c_custkey")).rowCountUpdated
    import s.implicits._
    Seq(n).toDF("row_count_updated")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // J1/S9 — the flagship keyed-update merge
    "merge_orders" -> ((s, dir) => mergeOrders(s, dir)),
    // J1 + P3 — null-key delta rows leave targets untouched
    "merge_customer_nullkeys" -> ((s, dir) => mergeCustomerNullKeys(s, dir)),
    // A4 — affected-row count
    "merge_row_count" -> ((s, dir) => mergeRowCount(s, dir)),
    // P1/P2 — projection + rename through the Importer slice contract
    "project_rename" -> ((s, dir) =>
      rd(s, dir, "customer").select(
        col("c_custkey").as("custkey"),
        col("c_name").as("customer_name"),
        col("c_mktsegment").as("segment"))),
    // P3 — null-key filter as a standalone operator
    "null_key_filter" -> ((s, dir) => {
      val withNulls = rd(s, dir, "orders").select(
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(col("o_orderkey"))
          .as("o_orderkey"),
        col("o_totalprice"))
      withNulls.na.drop("any", Seq("o_orderkey"))
    }),
    // A1/V10 — duplicate-key detection (lineitem's key genuinely repeats)
    "dup_key_detect" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1)),
    // O2/S7 — LIMIT 0 schema clone (staging DDL)
    "limit0_clone" -> ((s, dir) =>
      Staging.emptyClone(rd(s, dir, "lineitem"))),
    // A3 — first-occurrence distinct, pinned deterministically by min key
    "distinct_first" -> ((s, dir) =>
      rd(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(min("l_orderkey").as("first_key"))),
    // S4/S6/O1 — catalog column scan as a relation (no SQL oracle: the
    // catalog is engine-side metadata; driver records rows-only)
    "catalog_columns" -> ((s, dir) =>
      new Catalog(s, dir).columnsDf)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "merge_orders" ->
      """SELECT t.o_orderkey,
        |       t.o_custkey,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
        |       CASE WHEN u.o_orderkey IS NOT NULL THEN u.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
        |       t.o_orderdate,
        |       t.o_orderpriority
        |FROM orders t
        |LEFT JOIN (
        |  SELECT o_orderkey,
        |         o_totalprice * CAST(1.1 AS DOUBLE) AS o_totalprice,
        |         'F' AS o_orderstatus
        |  FROM orders WHERE o_orderpriority = '1-URGENT'
        |) u ON t.o_orderkey = u.o_orderkey""".stripMargin,
    "merge_customer_nullkeys" ->
      """SELECT t.c_custkey,
        |       t.c_name,
        |       t.c_nationkey,
        |       CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal ELSE t.c_acctbal END AS c_acctbal,
        |       t.c_mktsegment
        |FROM customer t
        |LEFT JOIN (
        |  SELECT CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_custkey END AS c_custkey,
        |         c_acctbal + CAST(100.0 AS DOUBLE) AS c_acctbal
        |  FROM customer WHERE c_custkey <= 750
        |) u ON t.c_custkey = u.c_custkey""".stripMargin,
    "merge_row_count" ->
      """SELECT count(*) AS row_count_updated
        |FROM customer
        |WHERE c_custkey <= 750 AND c_custkey % 10 <> 0""".stripMargin,
    "project_rename" ->
      """SELECT c_custkey AS custkey, c_name AS customer_name,
        |       c_mktsegment AS segment
        |FROM customer""".stripMargin,
    "null_key_filter" ->
      """SELECT o_orderkey, o_totalprice
        |FROM (
        |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey END AS o_orderkey,
        |         o_totalprice
        |  FROM orders
        |) WHERE o_orderkey IS NOT NULL""".stripMargin,
    "dup_key_detect" ->
      """SELECT l_orderkey, l_linenumber, count(*) AS n
        |FROM lineitem
        |GROUP BY l_orderkey, l_linenumber
        |HAVING count(*) > 1""".stripMargin,
    "limit0_clone" ->
      "SELECT * FROM lineitem LIMIT 0",
    "distinct_first" ->
      """SELECT l_returnflag, min(l_orderkey) AS first_key
        |FROM lineitem
        |GROUP BY l_returnflag""".stripMargin
  )
}
