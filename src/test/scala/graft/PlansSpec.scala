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

  test("dot_product is bit-identical to the HOF formulation") {
    val emb = Similarity.load(spark, sf()).limit(50)
    val q = emb.select(col("v").as("qv")).limit(1)
    val both = emb.crossJoin(broadcast(q)).select(
      Similarity.dot(col("v"), col("qv")).as("native"),
      Similarity.dotHof(col("v"), col("qv")).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).isEmpty)
  }

  test("dot_product is callable from SQL via GraftExtensions") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d").head()
    assert(r.getDouble(0) == 11.0)
  }

  // Null semantics, interpreted (eval) path: the expressions are built
  // and evaluated directly, bypassing codegen and the optimizer's
  // constant folding of foldable projections.
  test("eval path: length mismatch, null element, zero norm all yield null") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    import graft.plans.{CosineSimilarity, DotProduct}
    def arr(xs: Any*): Literal =
      Literal.create(xs, ArrayType(DoubleType, containsNull = true))
    // baseline: well-formed input evaluates
    assert(DotProduct(arr(1.0, 2.0), arr(3.0, 4.0)).eval(null) == 11.0)
    assert(CosineSimilarity(arr(1.0, 0.0), arr(1.0, 0.0)).eval(null) == 1.0)
    // length mismatch
    assert(DotProduct(arr(1.0), arr(1.0, 2.0)).eval(null) == null)
    assert(CosineSimilarity(arr(1.0), arr(1.0, 2.0)).eval(null) == null)
    // null element (zip_with semantics: null product nulls the sum)
    assert(DotProduct(arr(1.0, null), arr(1.0, 2.0)).eval(null) == null)
    assert(CosineSimilarity(arr(1.0, null), arr(1.0, 2.0)).eval(null) == null)
    // zero norm
    assert(CosineSimilarity(arr(0.0, 0.0), arr(1.0, 2.0)).eval(null) == null)
  }

  // Null semantics, codegen path: inputs are derived from a range
  // column so they are non-foldable — the optimizer cannot constant-
  // fold them, forcing evaluation inside whole-stage codegen.
  test("codegen path: length mismatch, null element, zero norm all yield null") {
    def run(mk: org.apache.spark.sql.Column): Option[Double] = {
      val r = spark.range(1).select(mk.as("x")).head()
      if (r.isNullAt(0)) None else Some(r.getDouble(0))
    }
    val live = col("id").cast("double") // 0.0, non-foldable
    // baseline: well-formed input evaluates
    assert(run(Similarity.dot(
      array(live + 1.0, lit(2.0)), array(lit(3.0), lit(4.0)))).contains(11.0))
    // length mismatch
    assert(run(Similarity.dot(
      array(live + 1.0), array(lit(1.0), lit(2.0)))).isEmpty)
    assert(run(Similarity.cosine(
      array(live + 1.0), array(lit(1.0), lit(2.0)))).isEmpty)
    // null element
    assert(run(Similarity.dot(
      array(when(col("id") < 0, 1.0), lit(2.0)),
      array(lit(1.0), lit(2.0)))).isEmpty)
    assert(run(Similarity.cosine(
      array(when(col("id") < 0, 1.0), lit(2.0)),
      array(lit(1.0), lit(2.0)))).isEmpty)
    // zero norm
    assert(run(Similarity.cosine(
      array(live, live), array(lit(1.0), lit(2.0)))).isEmpty)
  }

  test("dot_product participates in whole-stage codegen") {
    val emb = Similarity.load(spark, sf()).limit(10)
    val q = emb.select(col("v").as("qv")).limit(1)
    val df = emb.crossJoin(broadcast(q))
      .select(Similarity.dot(col("v"), col("qv")).as("s"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[dotproduct.*"), plan)
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

  test("bloom_gram_count: hand-computed bits, null algebra, SQL + codegen") {
    import spark.implicits._
    // hand construction: one bench gram "alpha beta" — compute its two
    // 60-bit halves and k=2 positions in the test, set exactly those
    // bits in a 2-word (128-bit) filter
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest("alpha beta".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val h1 = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val h2 = java.lang.Long.parseLong(hex.substring(15, 30), 16)
    val pos = Seq(0, 1).map(j => (h1 + j * h2) % 128)
    val words = Array(0L, 0L)
    pos.foreach(p => words(p.toInt / 64) |= (1L << (p % 64).toInt))
    val df = Seq(
      (1L, Seq("alpha beta", "gamma delta")), // member + non-member
      (2L, Seq.empty[String]),
      (3L, null.asInstanceOf[Seq[String]])
    ).toDF("id", "grams")
      .select(col("id"), call_function("bloom_gram_count",
        col("grams"), typedLit(words.toSeq), lit(2)).as("c"))
      .orderBy("id").collect()
    assert(df(0).getLong(1) >= 1L, "planted member must be counted")
    // "gamma delta" could only count via a 2-position collision in 128
    // bits — recompute to pin exactly
    val gHex = java.security.MessageDigest.getInstance("MD5")
      .digest("gamma delta".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val gPos = Seq(0, 1).map { j =>
      (java.lang.Long.parseLong(gHex.substring(0, 15), 16) +
        j * java.lang.Long.parseLong(gHex.substring(15, 30), 16)) % 128
    }
    val gHit = gPos.forall(p => (words(p.toInt / 64) >> (p % 64).toInt & 1L) == 1L)
    assert(df(0).getLong(1) == (if (gHit) 2L else 1L))
    assert(df(1).getLong(1) == 0L, "empty gram list counts zero")
    assert(df(2).isNullAt(1), "null gram array yields null")
    // the probe must run inside a whole-stage-codegen span over a real
    // scan (a local relation would constant-fold the whole project)
    val docs = spark.read.parquet(s"${sf()}/documents.parquet").limit(10)
      .select(call_function("bloom_gram_count",
        split(lower(col("text")), "\\s+"), typedLit(words.toSeq), lit(2))
        .as("c"))
    docs.collect()
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[bloom_gram_count.*"), plan)
  }

  test("JL projection preserves pairwise distances within JL distortion") {
    import graft.ops.Similarity
    val proj = Similarity.randomProjection(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        (1 to 8).map(r.getDouble).toArray).toMap
    val orig = Similarity.load(spark, sf()).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](r.fieldIndex("v")).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    // E[||Px||²] = k·||x||² for a ±1 matrix: compare scaled distances
    // over a deterministic pair sample; JL at k=8 is coarse, so the
    // bound is loose but must hold on average and never be degenerate
    val ids = proj.keys.toArray.sorted.take(40)
    val ratios = for {
      Seq(a, b) <- ids.toSeq.combinations(2).toSeq
      od = d2(orig(a), orig(b)) if od > 1e-9
    } yield d2(proj(a), proj(b)) / (8.0 * od)
    val mean = ratios.sum / ratios.size
    assert(math.abs(mean - 1.0) < 0.25, s"mean distortion $mean")
    assert(ratios.count(r => r > 0.1 && r < 4.0) >= ratios.size * 9 / 10)
    // and the plan is row-local: zero exchanges, one scan
    val plan = Similarity.randomProjection(spark, sf()).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert(!"Exchange \\(\\d+\\)".r.findAllIn(plan).hasNext, plan.take(1500))
  }
}
