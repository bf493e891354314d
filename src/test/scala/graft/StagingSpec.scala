package graft

import graft.engine.{SqlGen, Staging}
import org.apache.spark.sql.functions.{col, max}

class StagingSpec extends SparkSpec {

  test("O2: emptyClone preserves schema with zero rows") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val clone = Staging.emptyClone(li)
    assert(clone.schema == li.schema)
    assert(clone.isEmpty)
    val sliced = Staging.emptyClone(li, Seq("l_orderkey", "l_quantity"))
    assert(sliced.columns.toSeq == Seq("l_orderkey", "l_quantity"))
  }

  test("S7: stage/unstage lifecycle is idempotent") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    Staging.stage(li.limit(5), "stg_test")
    Staging.stage(li.limit(3), "stg_test") // replace, not fail
    assert(spark.table("stg_test").count() == 3)
    Staging.unstage(li, "stg_test")
    assert(!spark.catalog.tableExists("stg_test"))
  }

  test("F6: chunk ids bound every chunk at the chunk size") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val counts = Staging.withChunkId(li, chunkSize = 1000)
      .groupBy("chunk_id").count()
    assert(counts.agg(max(col("count"))).head.getLong(0) <= 1000L)
  }

  test("F6: chunk ids never collide across partitions (bit-width boundary)") {
    import spark.implicits._
    // partition 1 / offset 0 vs partition 0 / offset 2^31, chunkSize 1:
    // packing the partition id below bit 33 (as an earlier revision did
    // at bit 31) makes these two collide
    val mids = Seq(1L << 33, 1L << 31).toDF("mid")
    val ids = mids.select(Staging.chunkIdFor(col("mid"), 1).as("cid"))
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == 2, ids.toString)
  }

  test("S8 scale path: bucketed tables join without any Exchange") {
    Seq("orders_bkt", "delta_bkt").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
        }
        rm(loc)
      }
    }
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val delta = orders.limit(500)
      .selectExpr("o_orderkey", "o_totalprice * 2 AS o_totalprice")
    Staging.writeBucketed(orders, "orders_bkt", Seq("o_orderkey"), 8)
    Staging.writeBucketed(delta, "delta_bkt", Seq("o_orderkey"), 8)
    // disable the small-table broadcast so the plan demonstrates the
    // big-big case bucketing exists for: co-located SMJ, zero Exchange
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bkt")
        .join(spark.table("delta_bkt"), "o_orderkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("SortMergeJoin"), plan)
      assert(plan.contains("Bucketed: true"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE orders_bkt")
      spark.sql("DROP TABLE delta_bkt")
    }
  }

  test("V2: unknown dialect rejected with sorted available list") {
    val e = intercept[IllegalArgumentException] {
      SqlGen.requireDialect("mysql")
    }
    assert(e.getMessage == "unsupported dialect, use available: 'mssql', 'sqlite'")
    SqlGen.requireDialect("mssql")
    SqlGen.requireDialect("sqlite")
  }

  test("J1: mssql UPDATE..INNER JOIN codegen shape (importer.py:313-330)") {
    val sql = SqlGen.updateMssql("dbo", "groceries", "#dbimport",
      Seq("id"), Seq("item", "price"))
    assert(sql ==
      "update a set a.[item] = b.[item], a.[price] = b.[price] " +
        "from [dbo].[groceries] as a inner join #dbimport as b " +
        "on a.[id] = b.[id]")
  }

  test("J2: sqlite correlated-subquery UPDATE codegen (importer.py:331-354)") {
    val sql = SqlGen.updateSqlite("groceries", "temp.dbimport",
      Seq("id"), Seq("price"))
    assert(sql.contains(
      "price = (select price from temp.dbimport where groceries.id = temp.dbimport.id)"))
    assert(sql.contains(
      "where exists (select * from temp.dbimport where groceries.id = temp.dbimport.id)"))
  }

  test("S7: staging DDL per dialect (importer.py:41-51)") {
    assert(SqlGen.createTempTable("mssql", "[dbo].[t]", "#stg", Seq("a", "b"))
      == "select top 0 [a], [b] into #stg from [dbo].[t]")
    assert(SqlGen.createTempTable("sqlite", "t", "temp.stg", Seq("a", "b"))
      == "create temp table temp.stg as select a, b from t limit 0")
  }
}
