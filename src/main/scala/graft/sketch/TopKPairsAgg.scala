package graft.sketch

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k (id, score) aggregate: keeps the k best pairs by
  * (score DESC, id ASC) — exactly the ordering of
  * `row_number().over(Window.partitionBy(...).orderBy(score.desc, id))`.
  *
  * Why not the window: a window top-k SORTS every candidate row per key
  * after shuffling ALL of them. This aggregate runs under
  * `ObjectHashAggregateExec` partial→final, so each map task combines its
  * candidates down to ≤k per key BEFORE the shuffle — shuffle volume drops
  * from O(candidates) to O(keys × k), and no per-key sort ever happens.
  * That is the difference between a kNN join that survives a 10⁹-row corpus
  * and one that dies in the exchange.
  *
  * Buffer is a sorted bounded array (k is small); insertion is O(k) against
  * a tail check that rejects non-competitive rows in O(1).
  */
case class TopKPairsAgg(
    left: Expression,   // id: long
    right: Expression,  // score: double
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] with BinaryLike[Expression] {
  require(k >= 1)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"topk_pairs needs (long, double), got ($l, $r)")
    }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buffer: TopKBuffer, input: InternalRow): TopKBuffer = {
    val id = left.eval(input)
    val score = right.eval(input)
    if (id != null && score != null)
      buffer.insert(id.asInstanceOf[Long], score.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKBuffer): Any =
    new GenericArrayData(Array.tabulate[Any](buffer.size) { i =>
      InternalRow(buffer.ids(i), buffer.scores(i))
    })

  override def serialize(buffer: TopKBuffer): Array[Byte] = buffer.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(bytes)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): TopKPairsAgg =
    copy(left = l, right = r)
  override def prettyName: String = "topk_pairs"
}

/** Sorted bounded buffer: ranks 0..size-1 ordered best-first by
  * (score DESC, id ASC). */
final class TopKBuffer(val k: Int) {
  var size: Int = 0
  val ids: Array[Long] = new Array[Long](k)
  val scores: Array[Double] = new Array[Double](k)

  @inline private def beats(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(id: Long, score: Double): Unit = {
    if (size == k && !beats(score, id, scores(k - 1), ids(k - 1))) return
    // find insertion rank (linear from the tail; k is small)
    var pos = if (size < k) size else k - 1
    while (pos > 0 && beats(score, id, scores(pos - 1), ids(pos - 1))) pos -= 1
    if (pos >= k) return
    val last = math.min(size, k - 1)
    var j = last
    while (j > pos) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
    ids(pos) = id
    scores(pos) = score
    if (size < k) size += 1
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.size) { insert(other.ids(i), other.scores(i)); i += 1 }
  }

  def toBytes: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + size * 16)
    bb.putInt(k).putInt(size)
    var i = 0
    while (i < size) { bb.putLong(ids(i)); bb.putDouble(scores(i)); i += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { b.ids(i) = bb.getLong; b.scores(i) = bb.getDouble; i += 1 }
    b.size = n
    b
  }
}

object TopKPairsAgg {
  /** `df.groupBy(key).agg(topkPairs($"id", $"score", k))` →
    * array<struct<id,score>> best-first. */
  def topkPairs(id: Column, score: Column, k: Int): Column =
    ColumnBridge.toColumn(
      TopKPairsAgg(ColumnBridge.toExpr(id), ColumnBridge.toExpr(score), k)
        .toAggregateExpression())
}
