package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Mergeable KLL quantile sketches (Karnin–Lang–Liberty 2016) as native
  * aggregates — the quantile twin of Spark's built-in DataSketches HLL
  * surface (`hll_sketch_agg`/`hll_union_agg`, which Spark 4 ships for
  * cardinality but NOT for quantiles).
  *
  * `graft_kll_agg(x, k)` folds raw doubles into a compact sketch image
  * (binary); `graft_kll_merge(sketch, k)` unions persisted sketch images;
  * `graft_kll_quantile(sketch, rank)` / `graft_kll_rank(sketch, x)` /
  * `graft_kll_n(sketch)` read them. All DataSketches ops are via the
  * datasketches-java jar already on Spark's classpath.
  *
  * Scale shape: a sketch is O(k log n) bytes (k=200 ≈ a few KB), updates
  * are amortized O(1), and merge is associative+commutative — so a
  * 100 TB scan collapses map-side into one small buffer per (partition,
  * group) and the shuffle carries sketches, not rows. Rolling up a
  * persisted sketch table to any coarser dim subset never rescans raw
  * data (cf. `Stats.buildKllSketches`/`rollupKllSketches`).
  *
  * Determinism note: unlike the rest of the graft surface, a KLL sketch's
  * compaction makes >k-item estimates depend on input order, so these are
  * spec-verified (exact in the ≤k regime, error-bounded above) rather than
  * DuckDB-oracled — same verification stance as the HLL rollup tables.
  */
object KllImpl {
  private def read(b: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.wrap(Memory.wrap(b))

  def quantile(b: Array[Byte], r: Double): Double = {
    val s = read(b)
    if (s.isEmpty || r.isNaN || r < 0.0 || r > 1.0) Double.NaN
    else s.getQuantile(r, QuantileSearchCriteria.INCLUSIVE)
  }

  def rank(b: Array[Byte], v: Double): Double = {
    val s = read(b)
    if (s.isEmpty || v.isNaN) Double.NaN
    else s.getRank(v, QuantileSearchCriteria.INCLUSIVE)
  }

  def n(b: Array[Byte]): Long = read(b).getN
}

/** Builds a KLL doubles sketch from raw values; emits the compact image. */
case class KllDoublesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.wrap(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllDoublesAgg =
    copy(child = newChild)
}

/** Unions persisted KLL sketch images (binary) — the rollup aggregate. */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_merge"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.wrap(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = {
    val s = KllDoublesSketch.newHeapInstance(k)
    s.merge(KllDoublesSketch.wrap(Memory.wrap(bytes)))
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

/** `graft_kll_quantile(sketch, rank)` — inclusive-rank quantile estimate. */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_quantile"

  override def nullSafeEval(sketch: Any, rank: Any): Any =
    KllImpl.quantile(sketch.asInstanceOf[Array[Byte]], rank.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, r) =>
      s"${ev.value} = org.apache.spark.sql.graft.KllImpl.quantile($s, $r);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** `graft_kll_rank(sketch, x)` — inclusive normalized rank of a value. */
case class KllRank(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kll_rank"

  override def nullSafeEval(sketch: Any, v: Any): Any =
    KllImpl.rank(sketch.asInstanceOf[Array[Byte]], v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, v) =>
      s"${ev.value} = org.apache.spark.sql.graft.KllImpl.rank($s, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllRank =
    copy(left = newLeft, right = newRight)
}

/** `graft_kll_n(sketch)` — exact item count carried by the sketch. */
case class KllN(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kll_n"

  override def nullSafeEval(sketch: Any): Any =
    KllImpl.n(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.KllImpl.n($s)")

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

/** Frequent-items (heavy hitters) sketches — Misra–Gries style
  * (Anderson et al., DataSketches `ItemsSketch<String>`): the third leg
  * of the mergeable-sketch triad (HLL distinct / KLL quantiles / FI top
  * items). `graft_freq_agg(item, maxMapSize)` folds strings into a
  * compact image; `graft_freq_merge` unions images; `graft_freq_items`
  * reads one as array<struct<item, estimate, lower, upper>> under
  * NO_FALSE_NEGATIVES (every item with true count > ε·N is present).
  * Exact (lower = upper = estimate) while distinct items ≤ ~maxMapSize·¾.
  */
object FreqImpl {
  import org.apache.datasketches.common.ArrayOfStringsSerDe
  import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}

  private val serde = new ArrayOfStringsSerDe

  def empty(maxMapSize: Int): ItemsSketch[String] = new ItemsSketch[String](maxMapSize)

  def fromBytes(b: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(b), serde)

  def toBytes(s: ItemsSketch[String]): Array[Byte] = s.toByteArray(serde)

  /** Rows sorted (estimate desc, item asc) for deterministic output. */
  def items(b: Array[Byte]): Array[(String, Long, Long, Long)] =
    fromBytes(b).getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .map(r => (r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .sortBy { case (item, est, _, _) => (-est, item) }

  def read(b: Array[Byte]): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    new GenericArrayData(items(b).map { case (item, est, lb, ub) =>
      InternalRow(UTF8String.fromString(item), est, lb, ub)
    }.toArray[Any])
  }
}

/** Builds a frequent-items sketch from a string column. */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]]
  with UnaryLike[Expression] with ExpectsInputTypes {
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_agg"

  override def createAggregationBuffer() = FreqImpl.empty(maxMapSize)

  override def update(buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      input: InternalRow) = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      other: org.apache.datasketches.frequencies.ItemsSketch[String]) =
    buffer.merge(other)

  override def eval(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Any =
    FreqImpl.toBytes(buffer)

  override def serialize(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Array[Byte] =
    FreqImpl.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]) = FreqImpl.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
}

/** Unions persisted frequent-items sketch images. */
case class FreqMergeAgg(
    child: Expression,
    maxMapSize: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[org.apache.datasketches.frequencies.ItemsSketch[String]]
  with UnaryLike[Expression] with ExpectsInputTypes {
  require(maxMapSize >= 8 && (maxMapSize & (maxMapSize - 1)) == 0,
    s"maxMapSize must be a power of two >= 8, got $maxMapSize")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_freq_merge"

  override def createAggregationBuffer() = FreqImpl.empty(maxMapSize)

  override def update(buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      input: InternalRow) = {
    val v = child.eval(input)
    if (v != null) buffer.merge(FreqImpl.fromBytes(v.asInstanceOf[Array[Byte]]))
    else buffer
  }

  override def merge(buffer: org.apache.datasketches.frequencies.ItemsSketch[String],
      other: org.apache.datasketches.frequencies.ItemsSketch[String]) =
    buffer.merge(other)

  override def eval(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Any =
    FreqImpl.toBytes(buffer)

  override def serialize(buffer: org.apache.datasketches.frequencies.ItemsSketch[String]): Array[Byte] =
    FreqImpl.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]) = FreqImpl.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): FreqMergeAgg =
    copy(child = newChild)
}

/** `graft_freq_items(sketch)` → array<struct<item,estimate,lower,upper>>,
  * estimate-descending (item-asc tiebreak), NO_FALSE_NEGATIVES. */
case class FreqItemsRead(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("estimate", LongType, nullable = false),
    StructField("lower", LongType, nullable = false),
    StructField("upper", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_freq_items"

  override def nullSafeEval(sketch: Any): Any =
    FreqImpl.read(sketch.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"org.apache.spark.sql.graft.FreqImpl.read($s)")

  override protected def withNewChildInternal(newChild: Expression): FreqItemsRead =
    copy(child = newChild)
}

object SketchShim {
  def kllAgg(value: Column, k: Int): Column =
    ExpressionUtils.column(
      KllDoublesAgg(ExpressionUtils.expression(value), k).toAggregateExpression())

  def kllMerge(sketch: Column, k: Int): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(sketch), k).toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Column): Column =
    ExpressionUtils.column(KllQuantile(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(rank)))

  def kllRank(sketch: Column, value: Column): Column =
    ExpressionUtils.column(KllRank(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(value)))

  def kllN(sketch: Column): Column =
    ExpressionUtils.column(KllN(ExpressionUtils.expression(sketch)))

  def freqAgg(item: Column, maxMapSize: Int): Column =
    ExpressionUtils.column(
      FreqItemsAgg(ExpressionUtils.expression(item), maxMapSize).toAggregateExpression())

  def freqMerge(sketch: Column, maxMapSize: Int): Column =
    ExpressionUtils.column(
      FreqMergeAgg(ExpressionUtils.expression(sketch), maxMapSize).toAggregateExpression())

  def freqItems(sketch: Column): Column =
    ExpressionUtils.column(FreqItemsRead(ExpressionUtils.expression(sketch)))
}
