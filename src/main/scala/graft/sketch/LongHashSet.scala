package graft.sketch

/** Primitive open-addressed set of 64-bit hashes — the broadcast shape of the
  * fused referential check (E6). Stores xxhash64 of each valid media_ref
  * instead of UTF8String objects: membership probes are then one hash pass
  * over the candidate's bytes plus a couple of array reads — no per-span
  * object allocation, no equals() byte re-compare. A dangling ref is missed
  * only on a 64-bit collision with a valid entry (P ≈ catalog/2^64 per span,
  * ~5e-15 at a 100k catalog) — far below the engine's 128-bit uniqueness
  * collision budget; the exact anti-join path remains for audits.
  */
final class LongHashSet(expected: Int) extends Serializable {
  // fail fast instead of wrapping: a catalog near 2^29 entries (4+ GB of
  // table) has no business being broadcast (use the shuffled anti-join
  // path), and larger `expected` would overflow the power-of-two sizing
  require(expected >= 0 && expected < (1 << 29),
    s"LongHashSet sized for broadcastable catalogs, got $expected entries")
  private val cap: Int = {
    var c = 16
    while (c < expected * 2) c <<= 1
    c
  }
  private val mask = cap - 1
  private val table = new Array[Long](cap) // 0 = empty sentinel

  /** 0 is the empty sentinel; remap a real 0 hash to a fixed constant. */
  @inline private def norm(h: Long): Long = if (h == 0L) 0x9E3779B97F4A7C15L else h

  def add(h0: Long): Unit = {
    val h = norm(h0)
    var i = (h ^ (h >>> 32)).toInt & mask
    while (table(i) != 0L && table(i) != h) i = (i + 1) & mask
    table(i) = h
  }

  def contains(h0: Long): Boolean = {
    val h = norm(h0)
    var i = (h ^ (h >>> 32)).toInt & mask
    while (table(i) != 0L) {
      if (table(i) == h) return true
      i = (i + 1) & mask
    }
    false
  }
}

object LongHashSet {
  val Seed = 0x6A09E667F3BCC908L // fixed hash seed for media_ref membership

  /** Hash the bytes of a UTF8String with xxhash64 (Spark's XXH64 — the same
    * kernel behind the xxhash64() SQL function). */
  @inline def hashUtf8(u: org.apache.spark.unsafe.types.UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      u.getBaseObject, u.getBaseOffset, u.numBytes, Seed)
}
