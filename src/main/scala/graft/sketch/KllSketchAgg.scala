package graft.sketch

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable KLL quantile sketch aggregate (DataSketches
  * `KllDoublesSketch`, jar shipped with Spark 4).
  *
  * Generalizes the reference's exact quantile needs — the MMD σ median
  * heuristic (reference ml/training.py:123-129) and the offset-distribution
  * CDFs the KS drift check compares — into a sketch that merges
  * treeAggregate-style: Spark plans this as
  * `ObjectHashAggregateExec(partial) → shuffle → ObjectHashAggregateExec(final)`,
  * i.e. map-side partial sketches per task, tiny merge traffic. That is the
  * property that matters at 10^12 rows: per-partition state is O(k log n),
  * never O(n).
  *
  * Output is the serialized sketch (BinaryType); driver-side readers use
  * [[KllOps]] to extract quantiles/CDFs from the handful of per-window rows.
  */
case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(NumCoerce.toDouble(v))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "kll_sketch_agg"
}

object KllSketchAgg {
  /** Column-API entry point: `df.agg(kllSketch($"offset"))` → binary sketch. */
  def kllSketch(col: Column, k: Int = 200): Column =
    ColumnBridge.toColumn(KllSketchAgg(ColumnBridge.toExpr(col), k).toAggregateExpression())
}

/** Driver-side helpers over serialized KLL sketches (tiny per-window blobs). */
object KllOps {
  def fromBytes(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  def quantiles(bytes: Array[Byte], qs: Array[Double]): Array[Double] = {
    val sk = fromBytes(bytes)
    if (sk.isEmpty) Array.fill(qs.length)(Double.NaN)
    else qs.map(q => sk.getQuantile(q))
  }

  /** Empirical CDF evaluator (inclusive rank) from a serialized sketch. */
  def cdf(bytes: Array[Byte]): Double => Double = {
    val sk = fromBytes(bytes)
    if (sk.isEmpty) (_: Double) => 0.0
    else (x: Double) => sk.getRank(x)
  }

  def n(bytes: Array[Byte]): Long = fromBytes(bytes).getN

  /** KS D-statistic between two sketched distributions: max |F1 − F2| over a
    * merged evaluation grid of both sketches' quantiles. */
  def ksD(refBytes: Array[Byte], prodBytes: Array[Byte], gridSize: Int = 201): Double = {
    val ref = fromBytes(refBytes)
    val prod = fromBytes(prodBytes)
    if (ref.isEmpty || prod.isEmpty) return 0.0
    val qs = Array.tabulate(gridSize)(i => i.toDouble / (gridSize - 1))
    val grid = (qs.map(ref.getQuantile) ++ qs.map(prod.getQuantile)).distinct.sorted
    var d = 0.0
    var i = 0
    while (i < grid.length) {
      val diff = math.abs(ref.getRank(grid(i)) - prod.getRank(grid(i)))
      if (diff > d) d = diff
      i += 1
    }
    d
  }
}
