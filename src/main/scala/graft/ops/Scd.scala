package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 merge — the historized sibling of
  * the engine's in-place keyed UPDATE (`engine/Importer.merge`):
  * instead of overwriting a matched row, the old version is CLOSED
  * (`valid_to` = the new version stamp, `is_current` = false) and the
  * delta's values OPEN a new current version. Rows whose delta
  * values are attribute-identical are no-ops (null-safe comparison),
  * matching the warehouse convention that reloading the same
  * snapshot must not grow history.
  *
  * Scale shape: one key-partitioned join between the CURRENT slice
  * and the delta (history rows never join — they pass through
  * untouched), then unions, which are plan-level concatenations, not
  * shuffles. At 100 TB the current slice is the dimension's live
  * cardinality, the natural build side.
  */
object Scd {

  /** Apply `delta` (keys ++ attrs) to an SCD2 `dim` carrying
    * `valid_from`/`valid_to`/`is_current`, stamping changes at
    * `version`. Attribute set = delta columns minus keys; must be
    * present in `dim`.
    */
  def apply2(dim: DataFrame, delta: DataFrame, keys: Seq[String],
      version: Long): DataFrame = {
    val attrs = delta.columns.toSeq.filterNot(keys.contains)
    require(attrs.nonEmpty, "delta carries no attributes")
    require(attrs.forall(dim.columns.contains), "delta attrs not in dim")
    val meta = Seq("valid_from", "valid_to", "is_current")
    require(meta.forall(dim.columns.contains), "dim is not an SCD2 table")
    val dimCols = dim.columns.toSeq

    val current = dim.where(col("is_current"))
    val history = dim.where(!col("is_current"))
    val d = attrs.foldLeft(delta)((acc, a) =>
      acc.withColumnRenamed(a, s"__new_$a"))
      .withColumn("__matched", lit(true))
    val joined = current.join(d, keys, "left")
    val changed = col("__matched") &&
      attrs.map(a => !(col(a) <=> col(s"__new_$a"))).reduce(_ || _)

    val kept = joined.where(!coalesce(col("__matched"), lit(false)) ||
        !changed)
      .select(dimCols.map(col): _*)
    val closed = joined.where(changed)
      .select(dimCols.map {
        case "valid_to" => lit(version).as("valid_to")
        case "is_current" => lit(false).as("is_current")
        case c => col(c)
      }: _*)
    val opened = joined.where(changed)
      .select(dimCols.map {
        case "valid_from" => lit(version).as("valid_from")
        case "valid_to" => lit(null).cast("long").as("valid_to")
        case "is_current" => lit(true).as("is_current")
        case c if attrs.contains(c) => col(s"__new_$c").as(c)
        case c => col(c)
      }: _*)
    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** The oracled fixture: the customer table as a version-0 SCD2
    * dimension, then a deterministic delta (every fifth key changes
    * segment and balance) applied at version 1. Every changed key
    * yields exactly one closed and one opened row; unchanged keys
    * pass through — row count pins the history-growth contract.
    */
  def scd2Customers(s: SparkSession, dir: String): DataFrame = {
    val customer = s.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
    val dim = customer
      .withColumn("valid_from", lit(0L))
      .withColumn("valid_to", lit(null).cast("long"))
      .withColumn("is_current", lit(true))
    val delta = customer
      .where(col("c_custkey") % 5 === 0)
      .select(col("c_custkey"),
        concat(col("c_mktsegment"), lit("+")).as("c_mktsegment"),
        (col("c_acctbal") + lit(100.0)).as("c_acctbal"))
    apply2(dim, delta, Seq("c_custkey"), version = 1L)
  }
}
