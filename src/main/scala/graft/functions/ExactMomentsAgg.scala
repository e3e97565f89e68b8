package org.apache.spark.sql.graft

import java.math.{BigDecimal => JBigDecimal, BigInteger, RoundingMode}
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** DECIMAL-EXACT centered moments in fixed-point 128-bit integer
  * arithmetic — the zero-fan-out form of the `covarianceUpperExact`
  * oracle face (graft.ops.Pca).
  *
  * The exploded decimal form (posexplode of `d + d(d+1)/2` DECIMAL
  * values per row → pos-keyed decimal sums) is order-independent but
  * materializes N × ~2.1k generated rows of boxed decimal work at
  * d = 64 — the single most expensive query of the round-9 bench
  * (7.1 s at sf0.1). This aggregate reproduces the IDENTICAL exact
  * sums with no row generation: per input vector it snaps each
  * centered value to 9 dp — `k = round9(x − mean)` as a scale-9
  * unscaled long, the same value the expression pipeline's
  * `round(c, 9) :: decimal(14,9)` produces (both go through
  * `BigDecimal.valueOf(double)`'s shortest-repr canonicalization) —
  * and accumulates
  *
  *   S_i  = Σ k_i           (scale 9),
  *   P_ij = Σ k_i·k_j       (scale 18, j ≥ i, row-major triangle)
  *
  * in signed 128-bit integer lanes (`Math.multiplyHigh` + carry-aware
  * adds; |k| ≤ ~2e10 ⇒ |k_i·k_j| ≤ ~4e20 needs more than a long, and
  * Σ overflows nothing before ~4e17 rows). Integer sums are exact, so
  * partitioning, merge order, and engine CANNOT move any bit — the
  * property the 6-dp oracle face rests on.
  *
  * Returns `array<decimal(38,18)>` of length `1 + d + d(d+1)/2`:
  * [n, S_0.., P_00, P_01, ..] — every element exact at scale 18.
  * Non-finite inputs throw (a silently nulled cell would bias the
  * covariance; embeddings are finite by contract).
  */
case class ExactMomentsAgg(
    child: Expression,
    d: Int,
    mean: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(d > 0 && mean.length == d, s"mean must have length d=$d")

  private val nTri: Int = d * (d + 1) / 2
  // layout: [n | S_hi(d) | S_lo(d) | P_hi(nTri) | P_lo(nTri)]
  private val bufLen: Int = 1 + 2 * d + 2 * nTri
  private val sHi = 1
  private val sLo = 1 + d
  private val pHi = 1 + 2 * d
  private val pLo = 1 + 2 * d + nTri
  @transient private lazy val mu: Array[Double] = mean.toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType =
    ArrayType(DecimalType(38, 18), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_exact_moments"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bufLen)

  // signed 128-bit accumulate: (hi, lo) += v where v is a signed long
  // promoted to 128 bits (hi lane = sign extension)
  @inline private def add128(buf: Array[Long], hiIdx: Int, loIdx: Int,
      vHi: Long, vLo: Long): Unit = {
    val lo0 = buf(loIdx)
    val lo1 = lo0 + vLo
    // unsigned carry out of the low lane
    val carry = if (java.lang.Long.compareUnsigned(lo1, lo0) < 0) 1L else 0L
    buf(loIdx) = lo1
    buf(hiIdx) += vHi + carry
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    require(arr.numElements() == d,
      s"expected vectors of dim $d, got ${arr.numElements()}")
    val k = new Array[Long](d)
    var i = 0
    while (i < d) {
      val c = arr.getDouble(i) - mu(i)
      require(!java.lang.Double.isNaN(c) && !java.lang.Double.isInfinite(c),
        s"non-finite centered value at dim $i (exact moments require finite input)")
      // identical canonicalization to the expression pipeline's
      // round(c, 9)::decimal(14,9): valueOf uses Double.toString's
      // shortest repr, so both paths see the same scale-9 integer
      k(i) = JBigDecimal.valueOf(c)
        .setScale(9, RoundingMode.HALF_UP).unscaledValue().longValueExact()
      i += 1
    }
    buf(0) += 1L
    i = 0
    while (i < d) {
      val ki = k(i)
      add128(buf, sHi + i, sLo + i, if (ki < 0) -1L else 0L, ki)
      i += 1
    }
    var t = 0
    i = 0
    while (i < d) {
      val ki = k(i)
      var j = i
      while (j < d) {
        val kj = k(j)
        add128(buf, pHi + t, pLo + t, Math.multiplyHigh(ki, kj), ki * kj)
        j += 1; t += 1
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    b1(0) += b2(0)
    var i = 0
    while (i < d) { add128(b1, sHi + i, sLo + i, b2(sHi + i), b2(sLo + i)); i += 1 }
    i = 0
    while (i < nTri) { add128(b1, pHi + i, pLo + i, b2(pHi + i), b2(pLo + i)); i += 1 }
    b1
  }

  private def dec128(hi: Long, lo: Long, scale: Int): org.apache.spark.sql.types.Decimal = {
    val bi = BigInteger.valueOf(hi).shiftLeft(64)
      .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
    // exact value, re-scaled to the uniform 18-dp face (×10^(18−scale)
    // on the unscaled integer — no rounding anywhere)
    Decimal(new JBigDecimal(bi, scale).setScale(18), 38, 18)
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](1 + d + nTri)
    out(0) = Decimal(new JBigDecimal(buf(0)).setScale(18), 38, 18)
    var i = 0
    while (i < d) { out(1 + i) = dec128(buf(sHi + i), buf(sLo + i), 9); i += 1 }
    i = 0
    while (i < nTri) { out(1 + d + i) = dec128(buf(pHi + i), buf(pLo + i), 18); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bufLen)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ExactMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ExactMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ExactMomentsAgg =
    copy(child = newChild)
}

object ExactMomentsAgg {
  /** Column face (an aggregate — use inside `.agg(...)`). */
  def col(vec: Column, d: Int, mean: Seq[Double]): Column =
    ExpressionUtils.column(
      ExactMomentsAgg(ExpressionUtils.expression(vec), d, mean)
        .toAggregateExpression())
}
