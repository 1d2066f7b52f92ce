package graft.sketch

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tdigest.TDigestDouble
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Mergeable t-digest quantile sketch aggregate (DataSketches
  * `TDigestDouble`, jar shipped with Spark 4) — the tail-accurate companion
  * to [[KllSketchAgg]].
  *
  * KLL's rank error is uniform in rank; the t-digest's k1 scale function
  * concentrates centroid resolution near rank 0 and 1, so extreme quantiles
  * (p99.9 latency-style metrics over span offsets or doc lengths) come out
  * far tighter at the same state size. Both sketches plan identically —
  * `ObjectHashAggregateExec(partial) → shuffle → ObjectHashAggregateExec(final)`,
  * map-side partial sketches per task, O(k) merge traffic per partition —
  * which is the property that matters at 10^12 rows.
  *
  * Exactness contract used by the oracle-gated driver query
  * (`tdigest_quantity`): `getTotalWeight`, min (rank 0) and max (rank 1) are
  * EXACT for any t-digest; interior quantiles are interpolated estimates
  * whose rank error is spec-bounded (TDigestSpec) and oracle-GATED the same
  * way the HLL estimate is (boolean within-bound column that hash-fails on
  * drift). Like KLL (BASELINE.md round-3), centroid layout depends on merge
  * order, so estimates are within-tolerance stable — NOT bit-stable — across
  * parallelism; flagship verdicts therefore keep the exact fixed-edge CDF
  * grid (Fit.exactOffsetEdges) and sketches serve open-ended quantile
  * metrics only.
  */
case class TDigestAgg(
    child: Expression,
    k: Short = TDigestDouble.DEFAULT_K,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TDigestDouble] with UnaryLike[Expression] {

  override def createAggregationBuffer(): TDigestDouble = new TDigestDouble(k)

  override def update(buffer: TDigestDouble, input: InternalRow): TDigestDouble = {
    val v = child.eval(input)
    if (v != null) buffer.update(NumCoerce.toDouble(v))
    buffer
  }

  override def merge(buffer: TDigestDouble, other: TDigestDouble): TDigestDouble = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: TDigestDouble): Any = buffer.toByteArray

  override def serialize(buffer: TDigestDouble): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): TDigestAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TDigestAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): TDigestAgg =
    copy(child = newChild)
  override def prettyName: String = "tdigest_agg"
}

object TDigestAgg {
  /** Column-API entry point: `df.agg(tdigest($"offset"))` → binary sketch. */
  def tdigest(col: Column, k: Short = TDigestDouble.DEFAULT_K): Column =
    ColumnBridge.toColumn(TDigestAgg(ColumnBridge.toExpr(col), k).toAggregateExpression())
}

/** Driver-side helpers over serialized t-digests (tiny per-window blobs). */
object TDigestOps {
  def fromBytes(bytes: Array[Byte]): TDigestDouble =
    TDigestDouble.heapify(Memory.wrap(bytes))

  def quantiles(bytes: Array[Byte], qs: Array[Double]): Array[Double] = {
    val td = fromBytes(bytes)
    if (td.isEmpty) Array.fill(qs.length)(Double.NaN)
    else qs.map(q => td.getQuantile(q))
  }

  /** Empirical CDF evaluator (interpolated rank) from a serialized digest. */
  def cdf(bytes: Array[Byte]): Double => Double = {
    val td = fromBytes(bytes)
    if (td.isEmpty) (_: Double) => 0.0
    else (x: Double) => td.getRank(x)
  }

  def n(bytes: Array[Byte]): Long = fromBytes(bytes).getTotalWeight
  def min(bytes: Array[Byte]): Double = fromBytes(bytes).getMinValue
  def max(bytes: Array[Byte]): Double = fromBytes(bytes).getMaxValue
}
