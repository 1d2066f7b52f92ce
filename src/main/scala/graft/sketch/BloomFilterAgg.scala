package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Mergeable Bloom-filter aggregate (`org.apache.spark.util.sketch`) — the
  * MEMBERSHIP sketch completing the engine's sketch family (KLL/t-digest:
  * quantiles; HLL/theta: distinct counts and set algebra; Misra–Gries:
  * heavy hitters). A Bloom filter answers "might this value be in the
  * set?" from a FIXED byte budget chosen up front from (expectedItems,
  * fpp) — independent of how many items actually arrive — with one-sided
  * error: false positives at ≤ fpp (while inserts stay ≤ expectedItems),
  * NEVER false negatives. That contract is what makes it the bounded-
  * memory gate for decontamination ([[graft.ops.Decontaminate]]): the
  * exact broadcast path must hold every distinct eval shingle in memory
  * and falls back to a corpus-side shuffle above its bound; the Bloom
  * gate is a few fixed MB broadcast regardless of eval-set size, the
  * corpus never shuffles, and anything it misses is a false POSITIVE
  * (over-drop, quantified) — an eval leak can never slip through.
  *
  * Plan shape, like every sketch here:
  * `ObjectHashAggregateExec(partial) → shuffle → ObjectHashAggregateExec(final)`
  * — O(bytes) state per task, O(bytes) merge traffic per partition.
  *
  * Determinism: the bit array is the OR-fold of per-item bit sets under
  * fixed (Murmur3) hashing, so the serialized filter is BIT-IDENTICAL
  * across row orders, partitionings, and cluster widths (the theta-grade
  * contract; spec-asserted at 2 vs 32 partitions) — stronger than KLL/
  * t-digest, whose compaction is merge-order dependent.
  *
  * Value canonicalization (documented contract, shared with
  * [[graft.functions.BloomMightContain]] via [[BloomOps.put]]): strings
  * update as their UTF-8 bytes (identical hashes to Spark's `putString`),
  * binary as bytes, integral types as long. Floating-point values are
  * REJECTED loudly — Spark's Bloom filter has no double domain, and
  * hashing a cast would silently diverge from any other engine probing
  * the same filter. Mixing families for one logical key (1L vs "1") gives
  * independent bits by design.
  */
case class BloomFilterAgg(
    child: Expression,
    expectedItems: Long = 1000000L,
    fpp: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomFilter] with UnaryLike[Expression] {

  require(expectedItems > 0,
    s"bloom_filter_agg: expectedItems must be > 0, got $expectedItems")
  require(fpp > 0.0 && fpp < 1.0,
    s"bloom_filter_agg: fpp must be in (0,1), got $fpp")

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter, input: InternalRow): BloomFilter = {
    val v = child.eval(input)
    if (v != null) BloomOps.put(buffer, v)
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    // same (expectedItems, fpp) on every partial ⇒ identical geometry;
    // mergeInPlace is a bitwise OR
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = BloomOps.toBytes(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] = BloomOps.toBytes(buffer)

  override def deserialize(bytes: Array[Byte]): BloomFilter = BloomOps.fromBytes(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomFilterAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomFilterAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_filter_agg"
}

object BloomFilterAgg {
  /** Column-API entry point: `df.agg(bloomFilter($"shingle", n, fpp))` →
    * binary filter blob. */
  def bloomFilter(col: Column, expectedItems: Long = 1000000L,
                  fpp: Double = 0.01): Column =
    ColumnBridge.toColumn(
      BloomFilterAgg(ColumnBridge.toExpr(col), expectedItems, fpp)
        .toAggregateExpression())
}

/** Shared build/probe canonicalization and codecs — the insert and the
  * membership probe MUST hash identically or recall silently zeroes. */
object BloomOps {
  /** Insert with the documented canonicalization (see [[BloomFilterAgg]]). */
  def put(bf: BloomFilter, v: Any): Unit = v match {
    case s: UTF8String => bf.putBinary(s.getBytes) // ≡ putString, no toString alloc
    case s: String => bf.putString(s)
    case b: Array[Byte] => bf.putBinary(b)
    case l: Long => bf.putLong(l)
    case i: Int => bf.putLong(i.toLong)
    case s: Short => bf.putLong(s.toLong)
    case b: Byte => bf.putLong(b.toLong)
    case other => throw new IllegalArgumentException(
      s"bloom filter: unsupported value type ${other.getClass.getName} " +
        "(supported: string, binary, integral — no double domain exists; " +
        "cast explicitly to a supported family)")
  }

  /** Membership probe, same canonicalization as [[put]]. */
  def mightContain(bf: BloomFilter, v: Any): Boolean = v match {
    case s: UTF8String => bf.mightContainBinary(s.getBytes)
    case s: String => bf.mightContainString(s)
    case b: Array[Byte] => bf.mightContainBinary(b)
    case l: Long => bf.mightContainLong(l)
    case i: Int => bf.mightContainLong(i.toLong)
    case s: Short => bf.mightContainLong(s.toLong)
    case b: Byte => bf.mightContainLong(b.toLong)
    case other => throw new IllegalArgumentException(
      s"bloom filter: unsupported probe type ${other.getClass.getName}")
  }

  def toBytes(bf: BloomFilter): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  def fromBytes(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** The fixed byte budget a (expectedItems, fpp) filter takes — the
    * number callers size broadcasts with. */
  def sizeBytes(expectedItems: Long, fpp: Double): Long =
    BloomFilter.create(expectedItems, fpp).bitSize() / 8
}
