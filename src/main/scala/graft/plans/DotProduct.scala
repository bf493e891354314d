package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: sequential-fold dot product of two
  * double arrays. Exists for the same reason as [[CosineSimilarity]]:
  * Spark's array higher-order functions (`aggregate`/`zip_with`) are
  * CodegenFallback, so folding them per plane in the LSH signature
  * builder paid interpreted per-element closure cost (measured ~10x at
  * sf0.1 in round 2); this emits one fused primitive loop under
  * whole-stage codegen instead.
  *
  * Math note: accumulation is sequential left-to-right — bit-identical
  * to the `aggregate(zip_with(a, b, *), 0.0, +)` formulation and to
  * DuckDB's `list_dot_product`, which is what lets the LSH signature
  * pipeline be pinned by a cross-engine oracle (sign bits are
  * comparisons of these sums against zero). Length-mismatched inputs
  * yield null, matching `zip_with`'s null padding; a null ELEMENT also
  * yields null (the `zip_with` product of a null element is null and
  * nulls the whole aggregate sum) — both pinned by PlansSpec.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_product requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      var dot = 0.0
      var i = 0
      var sawNull = false
      val n = x.numElements()
      while (i < n && !sawNull) {
        if (x.isNullAt(i) || y.isNullAt(i)) sawNull = true
        else {
          dot += x.getDouble(i) * y.getDouble(i)
          i += 1
        }
      }
      if (sawNull) null else dot
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |    } else {
         |      $dot += $a.getDouble($i) * $b.getDouble($i);
         |    }
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
