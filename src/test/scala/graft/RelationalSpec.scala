package graft

import graft.ops.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("shard assignments: md5-derived, dense positions, deterministic") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = Relational.shardAssignments(spark, sf()).collect()
    val nDocs = spark.read.parquet(s"${sf()}/documents.parquet").count()
    assert(rows.length.toLong == nDocs)
    // shard id = first md5 nibble mod 8, recomputed driver-side
    rows.foreach { r =>
      val hx = md5hex(r.getAs[Long]("doc_id").toString + "#shard")
      assert(r.getAs[Int]("shard_id") ==
        Integer.parseInt(hx.substring(0, 1), 16) % 8)
    }
    // positions dense 1..n per shard, ordered by (hash, doc_id)
    rows.groupBy(_.getAs[Int]("shard_id")).values.foreach { rs =>
      val byPos = rs.sortBy(_.getAs[Int]("shard_pos"))
      assert(byPos.map(_.getAs[Int]("shard_pos")).toSeq == (1 to rs.length))
      val keys = byPos.map { r =>
        (md5hex(r.getAs[Long]("doc_id").toString + "#shard"),
          r.getAs[Long]("doc_id"))
      }
      assert(keys.toSeq == keys.sorted.toSeq, "positions follow (hash, id) order")
    }
    // byte-stable across runs
    val again = Relational.shardAssignments(spark, sf()).collect()
    assert(rows.map(_.toString).sorted.toSeq == again.map(_.toString).sorted.toSeq)
  }

  test("saltedJoin equals the plain join on a skewed key") {
    // lineitem ⋈ orders on orderkey: orderkey repeats up to ~12x and
    // serves as the 'hot key' stand-in
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey").as("o_orderkey"), col("l_quantity"))
    val ord = spark.read.parquet(s"${sf()}/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    val plain = li.join(ord, "o_orderkey")
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,6)")),
        sum(col("o_totalprice").cast("decimal(18,6)"))).head()
    val salted = Relational.saltedJoin(li, ord, "o_orderkey", salt = 8)
      .agg(count(lit(1)), sum(col("l_quantity").cast("decimal(18,6)")),
        sum(col("o_totalprice").cast("decimal(18,6)"))).head()
    assert(plain == salted)
  }

  test("approx percentiles certify their rank contract per group") {
    val exact = Relational.pricePercentiles(spark, sf()).collect()
      .map(r => r.getString(0)).toSet
    val rows = Relational.approxPricePercentiles(spark, sf()).collect()
    assert(rows.map(_.getString(0)).toSet == exact)
    // the certificate holds at fixture scale: both verdicts TRUE and
    // the hashed count is the exact group size
    val sizes = spark.read.parquet(s"${sf()}/orders.parquet")
      .groupBy("o_orderstatus").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n") == sizes(r.getString(0)))
      assert(r.getAs[Boolean]("p50_ok"), s"${r.getString(0)} p50 rank")
      assert(r.getAs[Boolean]("p90_ok"), s"${r.getString(0)} p90 rank")
    }
  }

  test("dedup_approx verdict covers exact counts and holds at fixture scale") {
    val r = Relational.dedupApprox(spark, sf()).head()
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(r.getAs[Long]("n_docs") == docs.count())
    assert(r.getAs[Long]("n_unique") ==
      docs.select("text").distinct().count())
    assert(r.getAs[Boolean]("within_eps"),
      "HLL estimate drifted past 3x its rsd on fixed data")
    // the verdict is computed, not a constant TRUE: recompute the HLL
    // estimate directly and check the boolean tracks the bound at
    // both the shipped eps and eps=0 ('estimate is exact')
    val est = docs.agg(approx_count_distinct(col("text"))).head().getLong(0)
    val exact = r.getAs[Long]("n_unique")
    def want(eps: Double) = math.abs(est - exact) <= eps * exact
    assert(r.getAs[Boolean]("within_eps") == want(0.15))
    val strict = Relational.dedupApprox(spark, sf(), eps = 0.0).head()
    assert(strict.getAs[Boolean]("within_eps") == want(0.0))
  }

  test("q6 predicates reach the parquet scan (pushdown)") {
    val df = Relational.selectiveRevenue(spark, sf())
    val scan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(scan.contains("PushedFilters"), scan)
    assert(scan.contains("GreaterThanOrEqual(l_shipdate"), scan)
    assert(scan.contains("LessThan(l_quantity,24.0)"), scan)
    assert(df.head().getLong(1) > 0)
  }

  test("q3 broadcasts the filtered dimension, not the facts") {
    val plan = Relational.shippingPriority(spark, sf())
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pivot: explicit values, one agg shuffle, cells match a groupBy") {
    val df = Relational.pivotStatus(spark, sf())
    assert(df.columns.toSeq == Seq("o_orderpriority",
      "O_cnt", "O_rev", "F_cnt", "F_rev", "P_cnt", "P_rev"))
    // the explicit value list must not plan a distinct-value pre-scan:
    // ONE orders scan and exactly the double-agg's two Exchanges (the
    // data-proportional (priority,status) partial, then the tiny
    // |cells|-row pivot shuffle) — no third job, no extra pass
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert("Exchange \\(\\d+\\)".r.findAllIn(plan).size == 2, plan)
    assert("Scan parquet.* \\(\\d+\\)".r.findAllIn(plan).size == 1, plan)
    // cross-check one cell against the plain grouped aggregation
    val expect = spark.read.parquet(s"${sf()}/orders.parquet")
      .where(col("o_orderstatus") === "F")
      .groupBy("o_orderpriority").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    df.collect().foreach { r =>
      assert(r.getAs[Long]("F_cnt") ==
        expect.getOrElse(r.getString(0), 0L))
    }
  }

  test("semi/anti joins broadcast key-only probe legs, facts survive once") {
    val semi = Relational.semiJoinUrgent(spark, sf())
    val semiPlan = semi.queryExecution.executedPlan.toString
    assert(semiPlan.contains("BroadcastHashJoin") &&
      semiPlan.contains("LeftSemi"), semiPlan)
    val anti = Relational.antiJoinPending(spark, sf())
    val antiPlan = anti.queryExecution.executedPlan.toString
    assert(antiPlan.contains("BroadcastHashJoin") &&
      antiPlan.contains("LeftAnti"), antiPlan)
    // semantics cross-check against the join+distinct spelling
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val pending = orders.where(col("o_orderstatus") === "P")
      .select("o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val antiKeys = anti.collect().map(_.getLong(0)).toSet
    assert(antiKeys.intersect(pending).isEmpty)
    val nCust = spark.read.parquet(s"${sf()}/customer.parquet").count()
    val custWithPending = spark.read.parquet(s"${sf()}/customer.parquet")
      .where(col("c_custkey").isin(pending.toSeq: _*)).count()
    assert(antiKeys.size.toLong == nCust - custWithPending)
  }

  test("unpivot: melt emits one row per (flag, metric), values intact") {
    val long = Relational.unpivotMetrics(spark, sf())
    assert(long.columns.toSeq == Seq("l_returnflag", "metric", "value"))
    val byFlag = long.collect()
      .groupBy(_.getString(0)).view.mapValues(rs =>
        rs.map(r => r.getString(1) -> r.getDouble(2)).toMap).toMap
    val flags = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select("l_returnflag").distinct().collect().map(_.getString(0))
    assert(byFlag.keySet == flags.toSet)
    byFlag.values.foreach { m =>
      assert(m.keySet == Set("sum_qty", "sum_price", "n"))
      assert(m("sum_price") > m("sum_qty")) // prices dominate quantities
    }
  }
}
