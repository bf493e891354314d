package graft

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions.{col, input_file_name}

import graft.ops.Bucketed

/** The bucketed co-located join: semantics equal the plain join, and
  * the EXECUTED plan proves the layout did its job — a SortMergeJoin
  * with zero Exchange of any kind (no shuffle, no broadcast), reading
  * bucketed scans on both sides.
  */
class BucketedSpec extends SparkSpec {

  private def scratch: String = {
    val p = java.nio.file.Files.createTempDirectory("bucketed_spec")
    p.toString
  }

  test("bucketed join matches the plain join row-for-row") {
    val out = Bucketed.bucketedVerdictJoin(spark, sf(), scratch)
    val expected = spark.read.parquet(s"${sf()}/documents.parquet")
      .selectExpr("doc_id", "source", "n_chars",
        "size(split(lower(text), '\\\\s+')) AS n_tokens")
    assert(out.count() == expected.count())
    assert(out.exceptAll(expected).isEmpty && expected.exceptAll(out).isEmpty)
  }

  test("executed plan: SortMergeJoin, bucketed scans, ZERO Exchange") {
    val df = Bucketed.bucketedVerdictJoin(spark, sf(), scratch)
    df.collect() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange"), // covers shuffle AND broadcast
      s"a bucketed co-located join must not exchange:\n$plan")
    val formatted =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(formatted.contains("Bucketed: true"), formatted)
    assert(formatted.contains(s"SelectedBucketsCount: ${Bucketed.Buckets}"),
      formatted)
  }

  test("partitioned layout: lang predicate prunes partitions, not rows") {
    val dir = scratch
    val df = graft.ops.Bucketed.partitionedScan(spark, sf(), dir)
    df.collect()
    val formatted =
      df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the lang predicate is a PARTITION filter (pruned before I/O)...
    val pf = formatted.linesIterator
      .find(_.trim.startsWith("PartitionFilters:")).getOrElse("")
    assert(pf.contains("lang"), formatted)
    // ...and the data predicate stays separately pushed to the scan
    val pushed = formatted.linesIterator
      .find(_.trim.startsWith("PushedFilters:")).getOrElse("")
    assert(pushed.contains("GreaterThan(n_chars,200)"), formatted)
    // only the selected language's files are read, as-executed
    val langs = new java.io.File(s"$dir/by_lang").listFiles()
      .count(_.getName.startsWith("lang="))
    assert(langs > 1, "fixture must have several languages")
    import org.apache.spark.sql.functions.input_file_name
    val touched = spark.read.parquet(s"$dir/by_lang")
      .filter("lang = 'en'")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(touched.nonEmpty && touched.forall(_.contains("lang=en")),
      s"reads escaped the selected partition: ${touched.mkString(", ")}")
    // semantics match the unpartitioned aggregate
    val expected = spark.read.parquet(s"${sf()}/documents.parquet")
      .filter("lang = 'en' AND n_chars > 200")
      .groupBy("source").count()
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.collect().foreach(r =>
      assert(got(r.getString(0)) == r.getLong(1)))
  }

  test("the bucketed files stay engine-portable plain parquet") {
    val dir = scratch
    Bucketed.bucketedVerdictJoin(spark, sf(), dir).collect()
    // a reader with no catalog entry sees ordinary parquet
    val raw = spark.read.parquet(s"$dir/docs")
    assert(raw.columns.toSeq == Seq("doc_id", "source", "n_chars"))
    assert(raw.count() ==
      spark.read.parquet(s"${sf()}/documents.parquet").count())
  }

  test("csv round-trip survives trailing spaces, CRLF, quotes, empties") {
    import spark.implicits._
    val dir = scratch + "/csv"
    val rows = Seq(
      (1L, "ends in space "), (2L, " leading"), (3L, "a,\"b\"\r\nc"),
      (4L, ""), (5L, "\"\",\n,\""), (6L, "plain"))
    rows.toDF("id", "s").write
      .option("header", "true").option("escape", "\"")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read
      .option("header", "true").option("escape", "\"")
      .option("multiLine", "true")
      .schema("id BIGINT, s STRING").csv(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, s) =>
      val got = back(id)
      // CSV cannot distinguish empty from null — both come back null;
      // everything else must be byte-identical
      if (s.isEmpty) assert(got == null, s"row $id")
      else assert(got == s, s"row $id: got ${Option(got)}")
    }
    // the engine query path: full-table round-trip equality
    val rt = Bucketed.csvRoundTrip(spark, sf(), scratch + "/csvq")
      .select("doc_id", "tricky").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"),
        org.apache.spark.sql.functions.concat(
          org.apache.spark.sql.functions.lit("x,\"q\"\n"),
          org.apache.spark.sql.functions.substring(col("text"), 1, 16))
          .as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rt == want)
  }

  test("json round-trip: wire stays line-framed, escapes carry the payload") {
    val dir = scratch + "/json"
    val rt = Bucketed.jsonRoundTrip(spark, sf(), dir)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    assert(rt.count() == docs.count())
    // round-trip equality on the adversarial string, exact
    val back = rt.select("doc_id", "tricky").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("q\"b\\\n\t\u0001𝄞"),
        org.apache.spark.sql.functions.substring(col("text"), 1, 16))
        .as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back == want)
    // SPLITTABILITY pin: no raw control byte below 0x20 survives on
    // the wire except the record-framing newlines themselves — the
    // embedded newline/tab/0x01 must ride as two-char escapes
    // (multi-byte UTF-8 payload bytes are negative in JVM: mask first)
    val files = new java.io.File(dir + "/docs_json").listFiles()
      .filter(_.getName.endsWith(".json"))
    assert(files.nonEmpty)
    files.foreach { f =>
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      bytes.zipWithIndex.foreach { case (b, i) =>
        assert((b & 0xff) >= 0x20 || b == '\n',
          s"raw control byte 0x${"%02x".format(b)} at ${f.getName}:$i " +
            "breaks line framing")
      }
    }
  }

  test("compaction: 64 files -> 4, disjoint key ranges, identity rows") {
    val dir = scratch + "/compact"
    val out = Bucketed.compactFiles(spark, sf(), dir)
    def parquetFiles(p: String): Array[java.io.File] =
      new java.io.File(p).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(parquetFiles(dir + "/small").length == 64)
    assert(parquetFiles(dir + "/compacted").length == 4)
    // rows survive exactly
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "source", "n_chars")
    assert(out.count() == docs.count())
    assert(out.exceptAll(docs).isEmpty && docs.exceptAll(out).isEmpty)
    // clustering: per-file doc_id ranges are pairwise disjoint after
    // compaction — the property min/max pruning needs
    val ranges = out
      .select(input_file_name().as("f"), col("doc_id"))
      .groupBy("f")
      .agg(org.apache.spark.sql.functions.min("doc_id").as("lo"),
        org.apache.spark.sql.functions.max("doc_id").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length == 4)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, ranges.mkString(","))
      case _ => ()
    }
  }

  test("zvalue interleaves bits: bit i of dim1 -> 2i, dim2 -> 2i+1") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L))
      .toDF("a", "b")
      .select(Bucketed.zvalue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    def ref(a: Long, b: Long): Long =
      (0 until 16).map(i =>
        (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      ).reduce(_ | _)
    assert(rows.toSeq == Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L),
      (65535L, 65535L)).map { case (a, b) => ref(a, b) })
    assert(ref(1, 0) == 1L && ref(0, 1) == 2L && ref(65535, 65535) == 0xffffffffL)
  }

  test("z-order clusters both dims: fewer touched files than 1-dim sort") {
    val dir = scratch
    // same rows, same file granularity, two layouts
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    li.withColumn("zv", Bucketed.zvalue(
        col("l_partkey").cast("long"), col("l_suppkey").cast("long")))
      .repartitionByRange(Bucketed.Buckets, col("zv"))
      .sortWithinPartitions("zv").drop("zv")
      .write.option("maxRecordsPerFile", 1024).parquet(s"$dir/z")
    li.repartitionByRange(Bucketed.Buckets, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.option("maxRecordsPerFile", 1024).parquet(s"$dir/p")
    def touched(path: String): (Long, Long) = {
      val all = spark.read.parquet(path)
        .select(input_file_name()).distinct().count()
      val hit = spark.read.parquet(path)
        .where(col("l_partkey").between(64, 127) &&
          col("l_suppkey").between(4, 7))
        .select(input_file_name()).distinct().count()
      (hit, all)
    }
    val (zHit, zAll) = touched(s"$dir/z")
    val (pHit, pAll) = touched(s"$dir/p")
    // the partkey predicate clusters in BOTH layouts; the suppkey
    // predicate only prunes under z-order, so z touches fewer files
    // for the same scan over the same number of files
    assert(zAll >= 30 && pAll >= 30, s"granularity $zAll/$pAll")
    assert(zHit < pHit, s"z $zHit/$zAll vs p $pHit/$pAll")
    // and the two-dim locality is real, not marginal: under half
    assert(zHit.toDouble / pHit <= 0.5, s"z $zHit vs p $pHit")
  }
}
