package graft

import graft.sources.Sources
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {

  test("S1: workbook scan loads every table keyed by name") {
    val wb = Sources.workbook(spark, sf())
    assert(wb.keySet == Set("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "events", "documents", "embeddings"))
    assert(wb("region").count() == 5)
  }

  test("S3: source enumeration is sorted") {
    val names = Sources.listSources(spark, sf())
    assert(names == names.sorted && names.contains("lineitem"))
  }

  test("S2: CSV schema inference types columns like convert_dtypes") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f,
      "id,name,qty,price\n1,Apple,5,10.5\n2,Pear,4,9.25\n")
    val df = Sources.readCsv(spark, f.toString)
    assert(df.schema("id").dataType == IntegerType)
    assert(df.schema("name").dataType == StringType)
    assert(df.schema("price").dataType == DoubleType)
    assert(df.count() == 2)
  }

  test("S2: explicit schema overrides inference") {
    val dir = java.nio.file.Files.createTempDirectory("csv_src2")
    val f = dir.resolve("t.csv")
    java.nio.file.Files.writeString(f, "id,qty\n1,5\n")
    val st = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType)))
    val df = Sources.readCsv(spark, f.toString, schema = Some(st))
    assert(df.schema("id").dataType == LongType)
  }

  test("S2: JSON-lines read infers nested types") {
    val dir = java.nio.file.Files.createTempDirectory("json_src")
    val f = dir.resolve("t.json")
    java.nio.file.Files.writeString(f,
      """{"id":1,"tags":["a","b"]}""" + "\n" + """{"id":2,"tags":[]}""" + "\n")
    val df = Sources.readJson(spark, f.toString)
    assert(df.schema("id").dataType == LongType)
    assert(df.schema("tags").dataType == ArrayType(StringType, containsNull = true))
  }
}
