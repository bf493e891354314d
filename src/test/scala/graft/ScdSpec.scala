package graft

import org.apache.spark.sql.functions._
import graft.ops.Scd

/** SCD Type-2 contracts: exactly-one-current per changed key, history
  * is append-only, attribute-identical deltas are no-ops (reloading a
  * snapshot never grows history), and versions chain.
  */
class ScdSpec extends SparkSpec {

  import spark.implicits._

  private def dim0 = Seq(
    (1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
    .toDF("k", "seg", "bal")
    .withColumn("valid_from", lit(0L))
    .withColumn("valid_to", lit(null).cast("long"))
    .withColumn("is_current", lit(true))

  test("changed keys close the old version and open a new current one") {
    val delta = Seq((1L, "A2", 11.0), (3L, "C", 30.0))
      .toDF("k", "seg", "bal")
    val out = Scd.apply2(dim0, delta, Seq("k"), version = 1L).collect()
    assert(out.length == 4) // 3 originals + 1 new version for key 1
    val k1 = out.filter(_.getLong(0) == 1L)
      .sortBy(r => Option(r.getAs[Any]("valid_to")).isEmpty)
    assert(k1.length == 2)
    val closed = k1.head
    assert(closed.getString(1) == "A" &&
      closed.getAs[Long]("valid_to") == 1L &&
      !closed.getAs[Boolean]("is_current"))
    val opened = k1.last
    assert(opened.getString(1) == "A2" && opened.getDouble(2) == 11.0 &&
      opened.getAs[Long]("valid_from") == 1L &&
      opened.getAs[Boolean]("is_current"))
    // key 3's delta was attribute-identical: untouched
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 1 && k3.head.getAs[Boolean]("is_current") &&
      k3.head.getAs[Long]("valid_from") == 0L)
  }

  test("reloading the same snapshot is a no-op at any version") {
    val snapshot = Seq((1L, "A", 10.0), (2L, "B", 20.0), (3L, "C", 30.0))
      .toDF("k", "seg", "bal")
    val once = Scd.apply2(dim0, snapshot, Seq("k"), 1L)
    assert(once.collect().toSet == dim0.collect().toSet)
  }

  test("versions chain: each key holds one current row, history intact") {
    val v1 = Scd.apply2(dim0,
      Seq((1L, "A2", 11.0)).toDF("k", "seg", "bal"), Seq("k"), 1L)
    val v2 = Scd.apply2(v1,
      Seq((1L, "A3", 12.0), (2L, "B2", 21.0)).toDF("k", "seg", "bal"),
      Seq("k"), 2L)
    val rows = v2.collect()
    assert(rows.length == 6) // 3 + 1 (v1) + 2 (v2)
    // exactly one current row per key, carrying the latest values
    val current = rows.filter(_.getAs[Boolean]("is_current"))
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(current == Map(1L -> "A3", 2L -> "B2", 3L -> "C"))
    // key 1's history covers [0,1), [1,2), [2,null) with no overlap
    val k1 = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("valid_from"),
        Option(r.getAs[Any]("valid_to")).map(_.asInstanceOf[Long])))
      .sortBy(_._1)
    assert(k1.toSeq == Seq((0L, Some(1L)), (1L, Some(2L)), (2L, None)))
  }
}
