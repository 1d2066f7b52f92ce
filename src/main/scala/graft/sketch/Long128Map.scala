package graft.sketch

/** Immutable open-addressing (h1, h2) → count map over primitive arrays —
  * the broadcast payload of the uniqueness dup-recovery probe
  * ([[graft.functions.DupCount]]). Built once driver-side from the
  * aggregation's dup side-channel; probes are allocation-free.
  * Serializable by default field serialization (three long arrays + ints). */
final class Long128Map private (val mask: Int,
                                val k1: Array[Long], val k2: Array[Long],
                                val vals: Array[Long]) extends Serializable {

  /** Count for the key, or -1 when absent. Linear probing; empty slots are
    * marked by vals(i) == 0 (live counts are >= 2 — dup keys only). */
  def get(h1: Long, h2: Long): Long = {
    var h = h1 * -7046029254386353131L + h2
    h ^= (h >>> 32)
    var i = h.toInt & mask
    while (vals(i) != 0L) {
      if (k1(i) == h1 && k2(i) == h2) return vals(i)
      i = (i + 1) & mask
    }
    -1L
  }
}

object Long128Map {
  def build(keys: Array[(Long, Long, Long)]): Long128Map = {
    var cap = 16
    while (cap * 2 < keys.length * 3) cap <<= 1
    val m = new Long128Map(cap - 1, new Array[Long](cap), new Array[Long](cap),
      new Array[Long](cap))
    keys.foreach { case (h1, h2, n) =>
      require(n > 1L, s"Long128Map: dup counts must be > 1, got $n")
      var h = h1 * -7046029254386353131L + h2
      h ^= (h >>> 32)
      var i = h.toInt & m.mask
      while (m.vals(i) != 0L && (m.k1(i) != h1 || m.k2(i) != h2)) i = (i + 1) & m.mask
      m.k1(i) = h1; m.k2(i) = h2; m.vals(i) = n
    }
    m
  }
}
