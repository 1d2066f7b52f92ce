package graft.sketch

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable FREQUENT-ITEMS (heavy hitters) sketch aggregate — DataSketches
  * `ItemsSketch<String>` (Misra–Gries family), the detection primitive behind
  * explicit skew handling: "salting on hot doc_id ranges" needs to KNOW the
  * hot keys first, and a groupBy(key).count over 10^12 rows to find them
  * would itself be the skewed shuffle it is trying to avoid. This sketch
  * finds every key above a mass fraction in ONE narrow pass with O(maxMapSize)
  * state per task, merging partial→final under ObjectHashAggregateExec like
  * the engine's other sketches (KLL / theta / t-digest).
  *
  * Error contract (Misra–Gries): estimates carry a deterministic bound
  * `getMaximumError() ≤ streamLength / maxMapSize`; every key with true
  * count > that bound is RETAINED (no false negatives at the
  * NO_FALSE_NEGATIVES read). When `maxMapSize` exceeds the number of
  * distinct keys no purge ever happens and every count is EXACT (maximum
  * error 0) — the regime the DuckDB oracle gates on, mirroring the
  * `hll_orders`/`theta` exact-mode gates. Unlike KLL/t-digest, retained
  * counts are a deterministic function of the input MULTISET only in exact
  * mode; in estimation mode bounds (not point estimates) are the contract.
  *
  * Output is the serialized sketch (BinaryType); [[FreqOps]] decodes the
  * handful of per-group blobs driver-side.
  */
case class FreqItemsAgg(
    child: Expression,
    maxMapSize: Int = 256,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"freq_items_agg: maxMapSize must be a power of 2 >= 8, got $maxMapSize")

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.toString)
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(new ArrayOfStringsSerDe)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): FreqItemsAgg =
    copy(child = newChild)
  override def prettyName: String = "freq_items_agg"
}

object FreqItemsAgg {
  /** Column-API entry point: `df.agg(freqItems($"doc_id"))` → binary sketch. */
  def freqItems(col: Column, maxMapSize: Int = 256): Column =
    ColumnBridge.toColumn(
      FreqItemsAgg(ColumnBridge.toExpr(col), maxMapSize).toAggregateExpression())
}

/** Driver-side readers over serialized frequent-items sketches. */
object FreqOps {
  case class Heavy(item: String, estimate: Long, lowerBound: Long, upperBound: Long)

  def fromBytes(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)

  /** Deterministic worst-case estimate error of this sketch (0 = every
    * retained count is exact — the oracle-gated regime). */
  def maxError(bytes: Array[Byte]): Long = fromBytes(bytes).getMaximumError

  def streamLength(bytes: Array[Byte]): Long = fromBytes(bytes).getStreamLength

  /** Items with count ≥ `threshold`. NO_FALSE_NEGATIVES (default) returns a
    * SUPERSET — right for skew salting, where missing a hot key is the
    * hazard and salting a cold one is harmless; NO_FALSE_POSITIVES returns
    * the guaranteed subset (lowerBound ≥ threshold). */
  def heavyHitters(bytes: Array[Byte], threshold: Long,
                   errorType: ErrorType = ErrorType.NO_FALSE_NEGATIVES): Seq[Heavy] =
    fromBytes(bytes).getFrequentItems(threshold, errorType)
      .map(r => Heavy(r.getItem, r.getEstimate, r.getLowerBound, r.getUpperBound))
      .toSeq
}
