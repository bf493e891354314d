package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native HyperLogLog register aggregate (`hll_regs` in SQL) — the
  * engine's [[TypedImperativeAggregate]] extension point, the
  * aggregate sibling of the codegen'd scalar expressions
  * ([[DotProduct]], [[BloomGramCount]]).
  *
  * Input: the md5-derived non-negative 60-bit hash the declarative
  * pipeline uses ([[graft.ops.Sketches]]'s `h60`). The buffer is the
  * 1024-byte register array itself; update folds a hash into ONE byte
  * (index = low 10 bits, rho = 51 − bitlength of the remaining 50
  * bits), merge is pointwise max, and serialization is the raw byte
  * array — no boxing, no row objects, constant 1 KB state per group
  * per task regardless of input volume.
  *
  * Why this exists next to the declarative register build: the
  * declarative form shuffles O(groups·1024) register ROWS (already
  * cheap); this one shuffles O(groups) 1-KB BUFFERS and demonstrates
  * the engine's custom-aggregate surface with real partial-merge
  * semantics — Spark runs update map-side, ships serialized buffers,
  * and merges reduce-side, exactly the HLL union algebra.
  * [[graft.ops.Sketches.hllRegistersNative]] rebuilds the (source, j,
  * mj) relation from the evaluated array, so everything downstream
  * (finalize, merge row, oracle) is shared verbatim with the
  * declarative path — `corpus_hll_native` is pinned by the SAME
  * DuckDB oracle as `corpus_hll`.
  *
  * Determinism: rho arithmetic is the exact integer recurrence the
  * oracle replays (`51 − length(bin(rem))`, rem = 0 → 51); max-merge
  * is order-independent, so any partition layout yields identical
  * registers. Null inputs are skipped (SQL aggregate convention).
  * Negative inputs CANNOT be rejected at type check time (the input
  * type is plain bigint), so `update` enforces the non-negative h60
  * contract with a cheap runtime `require` — a negative long would
  * index correctly (masked) but rho would silently see the sign
  * bits, corrupting the register. Callers own the h60 domain, as
  * everywhere else in the sketch family; the guard makes a contract
  * breach loud instead of wrong.
  */
case class HllRegisterAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val M = 1024
  private val B = 10
  private val RhoMax = 51 // 60-bit hash, 50-bit remainder, +1

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_regs requires a bigint hash, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      require(h >= 0L,
        s"hll_regs input must be a non-negative h60 hash, got $h")
      val j = (h & (M - 1)).toInt
      val rem = h >>> B
      val rho =
        (if (rem == 0L) RhoMax
         else RhoMax - (64 - java.lang.Long.numberOfLeadingZeros(rem))).toByte
      if (rho > buf(j)) buf(j) = rho
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): HllRegisterAgg =
    copy(mutableAggBufferOffset = offset)

  override def withNewInputAggBufferOffset(offset: Int): HllRegisterAgg =
    copy(inputAggBufferOffset = offset)

  override protected def withNewChildInternal(
      newChild: Expression): HllRegisterAgg = copy(child = newChild)

  override def prettyName: String = "hll_regs"
}
