package graft

import graft.ops.Multimodal
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  test("payload metadata round-trips the binary column") {
    val meta = Multimodal.payloadMeta(spark, sf()).orderBy("media_id")
    val doc = spark.read.parquet(s"${sf()}/documents.parquet")
      .orderBy("doc_id").select("doc_id", "text").head()
    val m = meta.head()
    assert(m.getLong(0) == doc.getLong(0))
    val bytes = doc.getString(1).getBytes("UTF-8")
    assert(m.getInt(2) == bytes.length)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(bytes).map("%02x".format(_)).mkString
    assert(m.getString(3) == hex)
  }

  test("feature extraction: histogram covers all decoded pixels") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf()))
    val f = feats.filter(_.media_id == 0L).head()
    assert(f.histogram.length == 16)
    assert(f.thumbnail.length == 16)
    assert(f.histogram.sum > 0)
    assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
  }

  test("feature extraction is partitioning-independent") {
    val a = Multimodal.featureSummary(spark, sf())
      .orderBy("media_id").limit(5).collect().toSeq
    val b = Multimodal.extractFeatures(
        Multimodal.mediaTable(spark, sf()).repartition(7))
      .toDF().select(col("media_id"), col("media_type"), col("n_bytes"),
        col("mean_byte"))
      .orderBy("media_id").limit(5).collect().toSeq
    assert(a == b)
  }

  test("frame sampling emits only video rows with stride") {
    val frames = Multimodal.sampledFrames(spark, sf(), stride = 4)
    val ids = frames.select("media_id").distinct()
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    assert(ids.forall(_ % 3 == 2), "only doc_id % 3 == 2 rows are video")
    val idx = frames.filter(col("media_id") === ids.head)
      .select("frame_idx").collect().map(_.getInt(0)).sorted
    assert(idx.toSeq == (0 until idx.length).toSeq)
  }
}
