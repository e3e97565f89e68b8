package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Zero-fan-out moment aggregation for the PCA fit (graft.ops.Pca).
  *
  * The exploded moment pass (`posexplode` of a `1 + d + d(d+1)/2`-element
  * payload, then a pos-keyed groupBy) keeps the SHUFFLE tiny via map-side
  * combine, but still materializes N × ~131k generated rows of CPU work at
  * d = 512. This aggregate folds each vector straight into ONE flat
  * per-partition buffer of `1 + d (+ d(d+1)/2)` doubles — count, per-dim
  * sums, and (optionally) the upper-triangular product sums in row-major
  * (i, j ≥ i) order — so the corpus scan does no row generation at all and
  * the shuffle carries one buffer per partition.
  *
  * Values are centered at the caller-supplied `mean` before accumulating:
  * the two-pass centered covariance `(Σc_i·c_j − Σc_i·Σc_j/n)/(n−1)` with
  * `c = x − mean` is algebraically the sample covariance but free of the
  * catastrophic `Σxy − Σx·Σy/n` cancellation that made 6-dp rounding of
  * the raw-moment form flip on summation order. Pass `mean = zeros(d)` for
  * raw moments (the mean-estimation first pass).
  *
  * Input must be `array<double>` of exactly length `d` with no null
  * elements (enforced loudly — a silently skipped row would bias every
  * moment); null rows are ignored like any SQL aggregate.
  */
case class CenteredMomentsAgg(
    child: Expression,
    d: Int,
    mean: Seq[Double],
    withTri: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(d > 0 && mean.length == d, s"mean must have length d=$d")

  private val bufLen: Int = if (withTri) 1 + d + d * (d + 1) / 2 else 1 + d
  // Seq.apply on a per-row path would box; snapshot once.
  @transient private lazy val mu: Array[Double] = mean.toArray

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_centered_moments"

  override def createAggregationBuffer(): Array[Double] = new Array[Double](bufLen)

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    require(arr.numElements() == d,
      s"expected vectors of dim $d, got ${arr.numElements()}")
    val c = new Array[Double](d)
    var i = 0
    while (i < d) { c(i) = arr.getDouble(i) - mu(i); i += 1 }
    buf(0) += 1.0
    i = 0
    while (i < d) { buf(1 + i) += c(i); i += 1 }
    if (withTri) {
      var k = 1 + d
      i = 0
      while (i < d) {
        val ci = c(i)
        var j = i
        while (j < d) { buf(k) += ci * c(j); j += 1; k += 1 }
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    var i = 0
    while (i < bufLen) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bufLen)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CenteredMomentsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CenteredMomentsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CenteredMomentsAgg =
    copy(child = newChild)
}

/** Per-dimension min/max of the L2-NORMALIZED input vectors in ONE flat
  * buffer — the SQ8 fit pass (graft.ops.ScalarQuant). Replaces a forest
  * of 2·d separate `min(element_at(transform(vec, x/norm), i))` /
  * `max(...)` aggregates: one tight loop per row (norm + d compares)
  * instead of 2·d expression evaluations, and a plan whose size is
  * d-independent.
  *
  * Exact-parity contract with the expression forest it replaces:
  * normalization is `x / sqrt(Σx²)` with the ascending L2Norm fold
  * (identical IEEE); min/max compare via `java.lang.Double.compare`,
  * Spark's SQL ordering (NaN greatest — max PICKS NaN when present, min
  * avoids it); per-element nulls and elements beyond `d` are skipped
  * like `element_at` + null-ignoring min/max; zero input rows eval to
  * null. Output: array of 2·d doubles, mins then maxs. */
case class NormalizedMinMaxAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]]
  with UnaryLike[Expression] with ExpectsInputTypes {

  require(d > 0, "d must be positive")

  // [count, mins(d), maxs(d)]
  private val bufLen: Int = 1 + 2 * d

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_normalized_minmax"

  override def createAggregationBuffer(): Array[Double] = {
    val buf = new Array[Double](bufLen)
    var i = 0
    while (i < d) {
      buf(1 + i) = Double.PositiveInfinity
      buf(1 + d + i) = Double.NegativeInfinity
      i += 1
    }
    buf
  }

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val a = child.eval(input)
    if (a == null) return buf
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { val v = arr.getDouble(i); s += v * v }
      i += 1
    }
    val nrm = math.sqrt(s)
    buf(0) += 1.0
    val stop = math.min(d, n)
    i = 0
    while (i < stop) {
      if (!arr.isNullAt(i)) {
        val x = arr.getDouble(i) / nrm
        if (java.lang.Double.compare(x, buf(1 + i)) < 0) buf(1 + i) = x
        if (java.lang.Double.compare(x, buf(1 + d + i)) > 0) buf(1 + d + i) = x
      }
      i += 1
    }
    buf
  }

  override def merge(b1: Array[Double], b2: Array[Double]): Array[Double] = {
    b1(0) += b2(0)
    var i = 0
    while (i < d) {
      if (java.lang.Double.compare(b2(1 + i), b1(1 + i)) < 0) b1(1 + i) = b2(1 + i)
      if (java.lang.Double.compare(b2(1 + d + i), b1(1 + d + i)) > 0)
        b1(1 + d + i) = b2(1 + d + i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf(0) == 0.0) return null
    val out = new Array[Double](2 * d)
    System.arraycopy(buf, 1, out, 0, 2 * d)
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bufLen * 8)
    bb.asDoubleBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val out = new Array[Double](bufLen)
    ByteBuffer.wrap(bytes).asDoubleBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): NormalizedMinMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): NormalizedMinMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): NormalizedMinMaxAgg =
    copy(child = newChild)
}

object MomentShim {
  /** Column face of [[CenteredMomentsAgg]] (an aggregate — use inside
    * `.agg(...)`). */
  def centeredMomentsCol(vec: Column, d: Int, mean: Seq[Double],
      withTri: Boolean): Column =
    ExpressionUtils.column(
      CenteredMomentsAgg(ExpressionUtils.expression(vec), d, mean, withTri)
        .toAggregateExpression())

  /** Column face of [[NormalizedMinMaxAgg]]. */
  def normalizedMinMaxCol(vec: Column, d: Int): Column =
    ExpressionUtils.column(
      NormalizedMinMaxAgg(ExpressionUtils.expression(vec), d)
        .toAggregateExpression())
}
