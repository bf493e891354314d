package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Pins the native CosineSimilarity expression against the built-in
  * higher-order-function formulation and its SQL registration.
  */
class PlansSpec extends SparkSpec {

  test("cosine_sim is bit-identical to the HOF formulation") {
    val emb = Similarity.load(spark, sf()).limit(50)
    val q = emb.select(col("vec_id").as("qid"), col("v").as("qv")).limit(1)
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.cosine(col("v"), col("qv")).as("native"),
      (Similarity.dot(col("v"), col("qv")) /
        (Similarity.l2norm(col("v")) * Similarity.l2norm(col("qv"))))
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("cosine_sim is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(r.getDouble(0) == 1.0)
    val ortho = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
    assert(ortho.getDouble(0) == 0.0)
  }

  test("cosine_sim: zero vector yields null, null input yields null") {
    val z = spark.sql(
      "SELECT cosine_sim(array(0.0d), array(1.0d)) AS c").head()
    assert(z.isNullAt(0))
    val n = spark.sql(
      "SELECT cosine_sim(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS c").head()
    assert(n.isNullAt(0))
  }

  test("cosine_sim participates in whole-stage codegen") {
    val emb = Similarity.load(spark, sf()).limit(10)
    val q = emb.select(col("v").as("qv")).limit(1)
    val df = emb.crossJoin(broadcast(q))
      .select(Similarity.cosine(col("v"), col("qv")).as("s"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // "*(n)" marks a whole-stage-codegen span in the compact format;
    // the expression must sit inside one, not in an interpreted Project
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[cosinesimilarity.*"), plan)
  }
}
