package graft.sketch

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

/** Single-pass uniqueness statistics over key-partitioned 128-bit hash rows
  * (the E5 check's aggregation, collapsed from two stacked hash aggregations
  * into one primitive-map pass).
  *
  * CONTRACT: the input MUST be hash-partitioned by (h1, h2) — every copy of
  * a key lands in one Spark partition (ConstraintChecks.uniqueness
  * repartitions explicitly). Under that contract each partition's key map is
  * globally complete for the keys it holds, so the per-part statistics this
  * buffer reduces to at serialize() time are exact and FINAL, and merging
  * buffers across partitions is plain summation. This is what lets the
  * partial aggregation ship O(parts) reduced rows instead of a key-grain
  * stream: the plan is scan → project → Exchange(h1,h2) → one map pass →
  * O(tasks × parts) rows to the driver. vs the stacked-groupBy formulation
  * this removes the map-side partial hash aggregation (a per-task hash map
  * over mostly-unique keys that combines almost nothing), the second
  * key-grain hash aggregation, and the part-grain rollup exchange — and it
  * shrinks the one remaining full-volume exchange to the raw 3-column rows.
  *
  * The duplicate keys additionally ride along as a BOUNDED side-channel
  * (`dupKeyCap`, overflow-flagged): dup-recovery can then rebuild violation
  * rows from one pruned scan + a broadcast join instead of re-aggregating
  * the dirty part range — on a clean table the side-channel is empty and
  * costs nothing.
  *
  * Per-task memory is the open-addressing map: ~32 B/slot at ≤ 2/3 load over
  * the keys of ONE shuffled partition. Callers bound it by choosing the
  * partition count from the input size (ConstraintChecks.uniqShufflePartitions
  * targets ~4M keys/task ≈ 190 MB peak), the standard scale-adaptive knob.
  */
case class UniqStatsAgg(
    h1Child: Expression,
    h2Child: Expression,
    partChild: Expression,
    dupKeyCap: Int = UniqStatsAgg.DefaultDupKeyCap,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[UniqStatsBuffer]
  with org.apache.spark.sql.catalyst.trees.TernaryLike[Expression] {

  override def first: Expression = h1Child
  override def second: Expression = h2Child
  override def third: Expression = partChild

  override def createAggregationBuffer(): UniqStatsBuffer =
    new UniqStatsBuffer(dupKeyCap)

  // The children are plain column references after ConstraintChecks'
  // pre-projection, so the hot update loop reads primitives straight off the
  // UnsafeRow by ordinal — Expression.eval would box two Longs per row
  // (measured ~10% of the pass CPU at 54M rows). Falls back to eval for any
  // non-BoundReference child (bindReferences rewrites attribute children to
  // BoundReference before execution).
  @transient private lazy val ord1 = h1Child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private lazy val ord2 = h2Child match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }
  @transient private lazy val ordP = partChild match {
    case b: org.apache.spark.sql.catalyst.expressions.BoundReference => b.ordinal
    case _ => -1
  }

  override def update(buf: UniqStatsBuffer, input: InternalRow): UniqStatsBuffer = {
    val h1 = if (ord1 >= 0) input.getLong(ord1) else h1Child.eval(input).asInstanceOf[Long]
    val h2 = if (ord2 >= 0) input.getLong(ord2) else h2Child.eval(input).asInstanceOf[Long]
    val part = if (ordP >= 0) input.getInt(ordP) else partChild.eval(input).asInstanceOf[Int]
    buf.add(h1, h2, part)
    buf
  }

  override def merge(buf: UniqStatsBuffer, other: UniqStatsBuffer): UniqStatsBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: UniqStatsBuffer): Any = buf.serialize()
  override def serialize(buf: UniqStatsBuffer): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): UniqStatsBuffer =
    UniqStatsBuffer.deserialize(bytes)

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(offset: Int): UniqStatsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqStatsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): UniqStatsAgg =
    copy(h1Child = f, h2Child = s, partChild = t)
  override def prettyName: String = "uniq_stats_agg"
}

object UniqStatsAgg {
  /** Dup keys carried to the driver before the side-channel overflows and
    * recovery falls back to the re-aggregating scan: 2M keys ≈ 48 MB of
    * driver bytes worst-case — tables with more DISTINCT duplicated keys
    * than that are corrupt enough that a second aggregation pass over the
    * dirty range is the least of the operator's problems. */
  val DefaultDupKeyCap: Int = 2 * 1000 * 1000

  def uniqStats(h1: Column, h2: Column, part: Column,
                dupKeyCap: Int = DefaultDupKeyCap): Column =
    ColumnBridge.toColumn(UniqStatsAgg(
      ColumnBridge.toExpr(h1), ColumnBridge.toExpr(h2),
      ColumnBridge.toExpr(part), dupKeyCap).toAggregateExpression())

  /** Driver-side view of the reduced aggregate. `parts` is keyed by the part
    * each key is ATTRIBUTED to (its min part — the same convention as the
    * stacked-groupBy formulation); `maxDupPart` is -1 when the part has no
    * duplicated keys. `dupKeys` is (h1, h2, globalCount) per duplicated key,
    * complete iff !dupOverflow. */
  case class PartUniq(dupKeys: Long, distinctKeys: Long, totalRows: Long, maxDupPart: Int)
  case class Decoded(parts: Map[Int, PartUniq],
                     dupKeys: Array[(Long, Long, Long)],
                     dupOverflow: Boolean)

  def decode(bytes: Array[Byte]): Decoded = {
    val buf = UniqStatsBuffer.deserialize(bytes)
    buf.reduce()
    val parts = buf.partIds.take(buf.nParts).zipWithIndex.map { case (p, i) =>
      p -> PartUniq(buf.partDups(i), buf.partDistinct(i), buf.partTotal(i),
        buf.partMaxDupPart(i))
    }.toMap
    val dks = new Array[(Long, Long, Long)](buf.nDup)
    var i = 0
    while (i < buf.nDup) {
      dks(i) = (buf.dupH1(i), buf.dupH2(i), buf.dupN(i))
      i += 1
    }
    Decoded(parts, dks, buf.dupOverflow)
  }
}

/** Aggregation buffer: an open-addressing (h1,h2) → (count, minPart, maxPart)
  * map while updating; reduced to per-attributed-part statistics plus the
  * bounded dup-key list at serialize time (sound because the input contract
  * guarantees the map is globally complete for its keys). Deserialized
  * buffers are always in reduced form; mergeIn reduces the live map first
  * and then sums. */
final class UniqStatsBuffer(val dupKeyCap: Int) {
  // ---- map form (update phase) ----
  private var mask = 0
  private var k1: Array[Long] = null
  private var k2: Array[Long] = null
  private var cnt: Array[Long] = null // 0 = empty slot (live counts are >= 1)
  private var pminmax: Array[Long] = null // (minPart << 32) | maxPart (parts are non-negative ints)
  private var size = 0

  // ---- reduced form ----
  var nParts = 0
  var partIds: Array[Int] = Array.empty
  var partDups: Array[Long] = Array.empty
  var partDistinct: Array[Long] = Array.empty
  var partTotal: Array[Long] = Array.empty
  var partMaxDupPart: Array[Int] = Array.empty
  var nDup = 0
  var dupH1: Array[Long] = Array.empty
  var dupH2: Array[Long] = Array.empty
  var dupN: Array[Long] = Array.empty
  var dupOverflow = false

  private def alloc(capacity: Int): Unit = {
    mask = capacity - 1
    k1 = new Array[Long](capacity)
    k2 = new Array[Long](capacity)
    cnt = new Array[Long](capacity)
    pminmax = new Array[Long](capacity)
    size = 0
  }

  @inline private def slotOf(h1: Long, h2: Long): Int = {
    // 128 bits of xxhash64 input — already uniform; fold and spread
    var h = h1 * -7046029254386353131L + h2 // golden-ratio mix
    h ^= (h >>> 32)
    var i = h.toInt & mask
    while (cnt(i) != 0 && (k1(i) != h1 || k2(i) != h2)) i = (i + 1) & mask
    i
  }

  def add(h1: Long, h2: Long, part: Int): Unit = {
    if (k1 == null) alloc(1 << 16)
    val i = slotOf(h1, h2)
    if (cnt(i) == 0) {
      k1(i) = h1; k2(i) = h2; cnt(i) = 1L
      pminmax(i) = (part.toLong << 32) | (part.toLong & 0xFFFFFFFFL)
      size += 1
      if (size * 3 > mask * 2) grow()
    } else {
      cnt(i) += 1L
      val pm = pminmax(i)
      val mn = (pm >>> 32).toInt
      val mx = pm.toInt
      val nmn = if (part < mn) part else mn
      val nmx = if (part > mx) part else mx
      pminmax(i) = (nmn.toLong << 32) | (nmx.toLong & 0xFFFFFFFFL)
    }
  }

  private def grow(): Unit = {
    val (ok1, ok2, ocnt, opm) = (k1, k2, cnt, pminmax)
    alloc((mask + 1) << 1)
    var i = 0
    while (i < ok1.length) {
      if (ocnt(i) != 0) {
        val s = slotOf(ok1(i), ok2(i))
        k1(s) = ok1(i); k2(s) = ok2(i); cnt(s) = ocnt(i); pminmax(s) = opm(i)
        size += 1
      }
      i += 1
    }
  }

  // ---- reduction: key map → per-attributed-part stats + dup side-channel ----
  // part id → dense index via a small open-addressing table (O(1) per key at
  // any part count — a linear scan would be O(parts)/key at 10^4-part scale)
  private var pSlots: Array[Int] = null // idx + 1; 0 = empty
  private var pMask = 0

  private def pRehash(): Unit = {
    val capacity = math.max(16, Integer.highestOneBit(nParts * 3) << 1)
    pSlots = new Array[Int](capacity)
    pMask = capacity - 1
    var i = 0
    while (i < nParts) {
      var s = (partIds(i) * -1640531527) & pMask // Fibonacci hash of the part id
      while (pSlots(s) != 0) s = (s + 1) & pMask
      pSlots(s) = i + 1
      i += 1
    }
  }

  private def partIdx(part: Int): Int = {
    if (pSlots == null) pRehash()
    var s = (part * -1640531527) & pMask
    while (pSlots(s) != 0) {
      val i = pSlots(s) - 1
      if (partIds(i) == part) return i
      s = (s + 1) & pMask
    }
    if (nParts == partIds.length) {
      val nc = math.max(8, nParts * 2)
      partIds = java.util.Arrays.copyOf(partIds, nc)
      partDups = java.util.Arrays.copyOf(partDups, nc)
      partDistinct = java.util.Arrays.copyOf(partDistinct, nc)
      partTotal = java.util.Arrays.copyOf(partTotal, nc)
      partMaxDupPart = java.util.Arrays.copyOf(partMaxDupPart, nc)
    }
    partIds(nParts) = part
    partMaxDupPart(nParts) = -1
    nParts += 1
    if (nParts * 3 > pMask * 2) pRehash() else pSlots(s) = nParts
    nParts - 1
  }

  private def addDupKey(h1: Long, h2: Long, n: Long): Unit = {
    if (nDup >= dupKeyCap) { dupOverflow = true; return }
    if (nDup == dupH1.length) {
      val nc = math.max(1024, math.min(dupKeyCap, nDup * 2))
      dupH1 = java.util.Arrays.copyOf(dupH1, nc)
      dupH2 = java.util.Arrays.copyOf(dupH2, nc)
      dupN = java.util.Arrays.copyOf(dupN, nc)
    }
    dupH1(nDup) = h1; dupH2(nDup) = h2; dupN(nDup) = n
    nDup += 1
  }

  /** Fold the live key map (if any) into the reduced form; idempotent. */
  def reduce(): Unit = {
    if (k1 == null) return
    var i = 0
    while (i < k1.length) {
      val n = cnt(i)
      if (n != 0) {
        val pm = pminmax(i)
        val mn = (pm >>> 32).toInt
        val mx = pm.toInt
        val pi = partIdx(mn)
        partDistinct(pi) += 1
        partTotal(pi) += n
        if (n > 1) {
          partDups(pi) += 1
          if (mx > partMaxDupPart(pi)) partMaxDupPart(pi) = mx
          addDupKey(k1(i), k2(i), n)
        }
      }
      i += 1
    }
    k1 = null; k2 = null; cnt = null; pminmax = null
    mask = 0; size = 0
  }

  def mergeIn(other: UniqStatsBuffer): Unit = {
    reduce()
    other.reduce()
    var i = 0
    while (i < other.nParts) {
      val pi = partIdx(other.partIds(i))
      partDups(pi) += other.partDups(i)
      partDistinct(pi) += other.partDistinct(i)
      partTotal(pi) += other.partTotal(i)
      if (other.partMaxDupPart(i) > partMaxDupPart(pi))
        partMaxDupPart(pi) = other.partMaxDupPart(i)
      i += 1
    }
    if (other.dupOverflow) dupOverflow = true
    i = 0
    while (i < other.nDup) {
      addDupKey(other.dupH1(i), other.dupH2(i), other.dupN(i))
      i += 1
    }
  }

  def serialize(): Array[Byte] = {
    reduce()
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(dupKeyCap)
    out.writeInt(nParts)
    var i = 0
    while (i < nParts) {
      out.writeInt(partIds(i))
      out.writeLong(partDups(i))
      out.writeLong(partDistinct(i))
      out.writeLong(partTotal(i))
      out.writeInt(partMaxDupPart(i))
      i += 1
    }
    out.writeBoolean(dupOverflow)
    out.writeInt(nDup)
    i = 0
    while (i < nDup) {
      out.writeLong(dupH1(i))
      out.writeLong(dupH2(i))
      out.writeLong(dupN(i))
      i += 1
    }
    out.flush()
    bos.toByteArray
  }
}

object UniqStatsBuffer {
  def deserialize(bytes: Array[Byte]): UniqStatsBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new UniqStatsBuffer(in.readInt())
    val np = in.readInt()
    buf.nParts = np
    buf.partIds = new Array[Int](np)
    buf.partDups = new Array[Long](np)
    buf.partDistinct = new Array[Long](np)
    buf.partTotal = new Array[Long](np)
    buf.partMaxDupPart = new Array[Int](np)
    var i = 0
    while (i < np) {
      buf.partIds(i) = in.readInt()
      buf.partDups(i) = in.readLong()
      buf.partDistinct(i) = in.readLong()
      buf.partTotal(i) = in.readLong()
      buf.partMaxDupPart(i) = in.readInt()
      i += 1
    }
    buf.dupOverflow = in.readBoolean()
    val nd = in.readInt()
    buf.nDup = nd
    buf.dupH1 = new Array[Long](nd)
    buf.dupH2 = new Array[Long](nd)
    buf.dupN = new Array[Long](nd)
    i = 0
    while (i < nd) {
      buf.dupH1(i) = in.readLong()
      buf.dupH2(i) = in.readLong()
      buf.dupN(i) = in.readLong()
      i += 1
    }
    buf
  }
}
