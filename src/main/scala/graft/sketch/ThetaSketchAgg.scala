package graft.sketch

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable theta sketch aggregate (DataSketches theta family) — the
  * distinct-count sketch that also supports SET OPERATIONS: union,
  * intersection, and difference of the sketched key sets combine
  * driver-side from per-window blobs ([[ThetaOps]]).
  *
  * This is the cross-snapshot primitive HLL can't provide: "how many doc
  * ids does snapshot N+1 share with N / add over N?" needs intersection and
  * A-not-B, which HLL sketches do not support (inclusion–exclusion over HLL
  * estimates compounds error and goes negative on small overlaps; the theta
  * intersection operates on the retained hash sets directly). Same plan
  * shape as [[KllSketchAgg]]/[[TDigestAgg]]:
  * `ObjectHashAggregateExec(partial) → shuffle → ObjectHashAggregateExec(final)`,
  * O(k) state per task, O(k) merge traffic per partition.
  *
  * Determinism: theta hashing is seeded (default seed, fixed) and the
  * retained set is a pure function of the VALUE SET, so estimates are
  * invariant to row order, partitioning, and cluster width — unlike KLL/
  * t-digest whose compaction is merge-order dependent. Below `nominal`
  * retained entries the sketch is in EXACT mode: the estimate is the exact
  * distinct count, which is what the oracle-gated driver query pins.
  *
  * Value canonicalization (documented contract, spec-pinned): integral
  * types update as long, floating as double, strings as UTF-8 string,
  * binary as bytes — mixing families for the same logical key (e.g. 1L vs
  * "1") produces distinct hashes by design.
  */
case class ThetaSketchAgg(
    child: Expression,
    nominal: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominal).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) {
      v match {
        case s: UTF8String => buffer.update(s.toString)
        case l: Long => buffer.update(l)
        case i: Int => buffer.update(i.toLong)
        case s: Short => buffer.update(s.toLong)
        case b: Byte => buffer.update(b.toLong)
        case d: Double => buffer.update(d)
        case f: Float => buffer.update(f.toDouble)
        case b: Array[Byte] => buffer.update(b)
        case d: org.apache.spark.sql.types.Decimal => buffer.update(d.toDouble)
        case other => buffer.update(other.toString)
      }
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult())
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult().toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult().toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setNominalEntries(nominal).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
  override def prettyName: String = "theta_sketch_agg"
}

object ThetaSketchAgg {
  /** Column-API entry point: `df.agg(thetaSketch($"doc_id"))` → binary sketch. */
  def thetaSketch(col: Column, nominal: Int = 4096): Column =
    ColumnBridge.toColumn(
      ThetaSketchAgg(ColumnBridge.toExpr(col), nominal).toAggregateExpression())
}

/** Driver-side set algebra over serialized theta sketches (tiny per-window
  * blobs — the whole point: cross-snapshot overlap questions answered from
  * O(k) state without rescanning either snapshot). */
object ThetaOps {
  /** Serialized empty sketch — the identity for union and the safe default
    * when a grouped aggregation produced no row for a key. */
  def empty: Array[Byte] =
    SetOperation.builder().buildUnion().getResult().toByteArray

  def fromBytes(bytes: Array[Byte]): Sketch =
    CompactSketch.heapify(Memory.wrap(bytes))

  def estimate(bytes: Array[Byte]): Double = fromBytes(bytes).getEstimate

  /** Rounded estimate — EXACT when the sketch never exceeded its nominal
    * entries (exact-mode contract used by the oracle gate). */
  def estimateLong(bytes: Array[Byte]): Long = math.round(estimate(bytes))

  /** Union — exact only while the RESULT also fits `nominal` entries (two
    * exact sketches whose union exceeds it re-enter estimation mode); size
    * `nominal` to the expected union cardinality when exactness matters. */
  def union(a: Array[Byte], b: Array[Byte], nominal: Int = 4096): Array[Byte] = {
    val u = SetOperation.builder().setNominalEntries(nominal).buildUnion()
    u.union(fromBytes(a))
    u.union(fromBytes(b))
    u.getResult().toByteArray
  }

  def intersect(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(fromBytes(a))
    i.intersect(fromBytes(b))
    i.getResult().toByteArray
  }

  /** Difference A \ B. */
  def aNotB(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val d = SetOperation.builder().buildANotB()
    d.setA(fromBytes(a))
    d.notB(fromBytes(b))
    d.getResult(true).toByteArray
  }
}
