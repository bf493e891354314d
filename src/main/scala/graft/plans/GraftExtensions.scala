package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions so
  * they are callable from SQL (`SELECT cosine_sim(a, b)`) as well as
  * the Column API. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` or via
  * `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSim)
    ext.injectFunction(GraftExtensions.dotProduct)
    ext.injectFunction(GraftExtensions.bloomGramCount)
    ext.injectFunction(GraftExtensions.hllRegs)
  }
}

object GraftExtensions {
  val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "cosine_sim takes exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    }
  )

  val dotProduct: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_product takes exactly 2 arguments")
      DotProduct(children.head, children(1))
    }
  )

  val bloomGramCount: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("bloom_gram_count"),
    new ExpressionInfo(classOf[BloomGramCount].getName, "bloom_gram_count"),
    (children: Seq[Expression]) => {
      require(children.size == 3,
        "bloom_gram_count takes (grams, bitmap_words, k)")
      val k = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"bloom_gram_count k must be an integer literal, got $other")
      }
      BloomGramCount(children.head, children(1), k)
    }
  )

  val hllRegs: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("hll_regs"),
    new ExpressionInfo(classOf[HllRegisterAgg].getName, "hll_regs"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "hll_regs takes exactly 1 argument")
      HllRegisterAgg(children.head)
    }
  )
}
