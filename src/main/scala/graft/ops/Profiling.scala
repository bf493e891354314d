package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-profiling and expectation checks — the Deequ-shaped QA passes
  * a pipeline runs on every corpus drop before anything downstream
  * trusts it. Both are EXACT (no sketches), so the DuckDB oracle
  * replays them verbatim.
  *
  * [[profileColumns]] — one scan profiles every column: the columns
  * stack into (col_name, value) rows (5× row multiplier, all narrow),
  * then ONE (col, value)-keyed aggregate carries counts and a second
  * |columns|-keyed reduce derives rows/nulls/exact-distinct/min/max
  * and the top value. The top-value tie-break is deterministic by
  * construction: the per-value counts fold into `lpad(count)|value`
  * strings whose max is "highest count, then highest value" under
  * binary collation on both engines — no arg_max nondeterminism.
  *
  * [[checkExpectations]] — the constraint suite: key uniqueness and
  * completeness on `documents`, a value-range bound, and REFERENTIAL
  * integrity across tables (orders→customer, lineitem→orders) via
  * anti-join violation counts. Each check reports its violation
  * count as the metric; `passed` is `metric == 0`. At 100 TB the
  * anti-joins are plain key-hash joins and everything else rides the
  * profiling scan's aggregates.
  */
object Profiling {

  def profileColumns(s: SparkSession, dir: String): DataFrame = {
    val long = s.read.parquet(s"$dir/documents.parquet")
      .selectExpr(
        """stack(5,
          |  'doc_id', cast(doc_id as string),
          |  'text', text,
          |  'lang', lang,
          |  'source', source,
          |  'n_chars', cast(n_chars as string)) AS (col_name, v)"""
          .stripMargin)
    val vc = long.groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    vc.groupBy("col_name").agg(
      sum(col("cnt")).as("n_rows"),
      coalesce(sum(when(col("v").isNull, col("cnt"))), lit(0L))
        .as("n_nulls"),
      count(when(col("v").isNotNull, 1)).as("n_distinct"),
      min(col("v")).as("min_value"),
      max(col("v")).as("max_value"),
      max(when(col("v").isNotNull,
        concat(lpad(col("cnt").cast("string"), 12, "0"), lit("|"),
          col("v")))).as("packed"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_value"), col("max_value"),
        expr("substring(packed, 14)").as("top_value"),
        expr("cast(substring(packed, 1, 12) as bigint)").as("top_count"))
  }

  /** Shannon entropy per profiled column — the distribution-shape
    * telemetry [[profileColumns]]' min/max/top-1 can't see: a column
    * can keep its range while its mass collapses onto one value
    * (entropy → 0) or fragments into noise (entropy → ln k). Reported
    * both raw (nats) and normalized by ln(n_distinct) ∈ [0, 1].
    *
    * Determinism: counts are exact; each term rounds
    * `(cnt/n)·ln(cnt/n)` to 12 decimals and sums as DECIMAL(28,12) —
    * order-independent across any partition layout (the repo-wide ln
    * convention); the final entropy rounds to 6. Shape at scale: the
    * same stacked (col, value)-keyed count aggregation the profiler
    * runs (map-side combines), then column-cardinality relations —
    * the 5-row totals relation broadcasts.
    */
  def columnEntropy(s: SparkSession, dir: String): DataFrame = {
    val long = s.read.parquet(s"$dir/documents.parquet")
      .selectExpr(
        """stack(5,
          |  'doc_id', cast(doc_id as string),
          |  'text', text,
          |  'lang', lang,
          |  'source', source,
          |  'n_chars', cast(n_chars as string)) AS (col_name, v)"""
          .stripMargin)
      .filter(col("v").isNotNull)
    val vc = long.groupBy("col_name", "v").agg(count(lit(1)).as("cnt"))
    val totals = vc.groupBy("col_name")
      .agg(sum("cnt").as("n"), count(lit(1)).as("k"))
    val p = col("cnt").cast("double") / col("n").cast("double")
    vc.join(broadcast(totals), Seq("col_name"))
      .select(col("col_name"), col("n"), col("k"),
        round(p * log(p), 12).cast("decimal(28,12)").as("t"))
      .groupBy("col_name")
      .agg(max("n").as("n_rows"), max("k").as("n_distinct"),
        round((sum(col("t")) * lit(-1)).cast("double"), 6).as("entropy"),
        when(max("k") > 1, round(
          (sum(col("t")) * lit(-1)).cast("double")
            / round(log(max("k").cast("double")), 12), 6))
          .otherwise(lit(0.0)).as("norm_entropy"))
  }

  def checkExpectations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = s.read.parquet(s"$dir/documents.parquet")
    val orders = s.read.parquet(s"$dir/orders.parquet")
    val customer = s.read.parquet(s"$dir/customer.parquet")
    val lineitem = s.read.parquet(s"$dir/lineitem.parquet")
    def one(name: String, violations: DataFrame): DataFrame =
      violations.agg(count(lit(1)).as("metric"))
        .select(lit(name).as("check_name"),
          (col("metric") === 0L).as("passed"), col("metric"))
    one("doc_id_unique",
      docs.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .filter(col("n") > 1))
      .union(one("doc_id_complete", docs.filter(col("doc_id").isNull)))
      .union(one("n_chars_range",
        docs.filter(col("n_chars") < 0 || col("n_chars") > 100000)))
      .union(one("lang_complete", docs.filter(col("lang").isNull)))
      .union(one("orders_customer_fk",
        orders.join(customer,
          orders("o_custkey") === customer("c_custkey"), "left_anti")))
      .union(one("lineitem_orders_fk",
        lineitem.join(orders,
          lineitem("l_orderkey") === orders("o_orderkey"), "left_anti")))
  }
}
