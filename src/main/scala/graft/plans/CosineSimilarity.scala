package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two double arrays,
  * `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))`, with whole-stage
  * codegen (`doGenCode`) — Spark's array higher-order functions are
  * CodegenFallback (interpreted), so the composed
  * `aggregate(zip_with(...))` formulation pays per-element closure
  * overhead in the N×K scoring loop of similarity search. This
  * expression emits a single fused primitive loop instead.
  *
  * Math note: the accumulation order (sequential, left to right) and
  * the final `dot / (sqrt(na) * sqrt(nb))` shape exactly match the
  * built-in-function formulation in [[graft.ops.Similarity]], so both
  * paths produce bit-identical doubles (pinned by PlansSpec and the
  * shared DuckDB oracle). Length-mismatched arrays yield null — the
  * same result as the `zip_with` formulation (whose null padding nulls
  * the whole sum) — so malformed input never silently scores a common
  * prefix; a null ELEMENT likewise yields null, matching `zip_with`'s
  * null propagation. Both pinned by PlansSpec.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // length mismatch → null, matching the zip_with formulation (which
    // pads the shorter side with nulls and so nulls the whole sum) —
    // malformed input must not silently score a common prefix
    if (x.numElements() != y.numElements()) null
    else {
      val n = x.numElements()
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      var sawNull = false
      while (i < n && !sawNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) sawNull = true
        else {
          val xi = x.getDouble(i); val yi = y.getDouble(i)
          dot += xi * yi; na += xi * xi; nb += yi * yi
          i += 1
        }
      }
      if (sawNull) null
      else {
        val denom = math.sqrt(na) * math.sqrt(nb)
        if (denom == 0.0) null else dot / denom
      }
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val denom = ctx.freshName("denom")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      double $xi = $a.getDouble($i);
         |      double $yi = $b.getDouble($i);
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |    if ($denom == 0.0) {
         |      ${ev.isNull} = true;
         |    } else {
         |      ${ev.value} = $dot / $denom;
         |    }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}
