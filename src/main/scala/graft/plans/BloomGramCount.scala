package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: count of a document's grams whose
  * Kirsch–Mitzenmacher double-hash positions are ALL set in a Bloom
  * bitmap of packed 64-bit words — the per-row probe of
  * [[graft.ops.Dedup.bloomContamination]].
  *
  * Exists for the same reason as [[CosineSimilarity]]: the composed
  * `filter(transform(grams, g -> md5(g)), ...)` formulation is a
  * higher-order-function chain, which Spark evaluates interpreted
  * (CodegenFallback) — per-gram closure dispatch, UTF8String→hex→
  * `conv` round-trips, and 2·k re-evaluations of the position
  * arithmetic. This expression runs the whole probe as one fused JVM
  * loop per row: one MD5 digest per gram (nibbles split directly off
  * the digest bytes — the hex string never materializes), k positions
  * by integer arithmetic, early exit on the first clear bit.
  *
  * Semantics are pinned identical to the SQL formulation the DuckDB
  * oracle replays: `h1` = digest nibbles 0-14, `h2` = nibbles 15-29
  * (exactly `conv(substring(hex, 1|16, 15), 16, 10)`),
  * `pos_j = (h1 + j·h2) mod (64·|words|)`. Null gram elements are
  * skipped; a null array yields null.
  *
  * `kHash` is a constructor parameter, not a child: it shapes the
  * probe loop, is always a literal, and keeping it out of the child
  * list keeps the null-safe binary codegen template applicable.
  */
case class BloomGramCount(left: Expression, right: Expression, kHash: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(LongType, _))
        if kHash >= 1 && kHash <= 8 =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"bloom_gram_count requires (array<string>, array<bigint>) and k in [1, 8], " +
        s"got ${left.dataType.simpleString}, ${right.dataType.simpleString}, k=$kHash")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "bloom_gram_count"

  override protected def nullSafeEval(g: Any, w: Any): Any =
    BloomGramCount.countFlagged(
      g.asInstanceOf[ArrayData], w.asInstanceOf[ArrayData], kHash)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (g, w) =>
      s"${ev.value} = graft.plans.BloomGramCount.countFlagged($g, $w, $kHash);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomGramCount =
    copy(left = newLeft, right = newRight)
}

object BloomGramCount {

  private val tlMd = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Nibble `i` (0-based, high-first) of the digest — digit `i+1` of
    * the hex rendering.
    */
  private def nib(d: Array[Byte], i: Int): Long =
    ((d(i >> 1) >> (if ((i & 1) == 0) 4 else 0)) & 0xf).toLong

  /** The fused probe loop; called from both the interpreted path and
    * generated code. `words` is the bitmap as packed longs; the filter
    * size is `64 · |words|` bits by construction.
    */
  def countFlagged(grams: ArrayData, words: ArrayData, kHash: Int): Long = {
    val md = tlMd.get()
    val m = words.numElements().toLong * 64L
    if (m == 0L) return 0L
    var count = 0L
    var gi = 0
    val n = grams.numElements()
    while (gi < n) {
      if (!grams.isNullAt(gi)) {
        md.reset()
        val d = md.digest(grams.getUTF8String(gi).getBytes)
        var h1 = 0L
        var h2 = 0L
        var i = 0
        while (i < 15) { h1 = (h1 << 4) | nib(d, i); i += 1 }
        while (i < 30) { h2 = (h2 << 4) | nib(d, i); i += 1 }
        var j = 0
        var all = true
        while (j < kHash && all) {
          val p = (h1 + j.toLong * h2) % m
          val w = words.getLong((p >>> 6).toInt)
          if (((w >>> (p & 63L).toInt) & 1L) == 0L) all = false
          j += 1
        }
        if (all) count += 1L
      }
      gi += 1
    }
    count
  }
}
