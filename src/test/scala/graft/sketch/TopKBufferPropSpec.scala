package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import graft.stats.StatMath

/** Randomized property check of TopKBuffer against a sort-based reference
  * (seeded — deterministic across runs). Covers arbitrary insert orders,
  * score ties, k larger/smaller than input, split-merge equivalence, and
  * serde round-trips. */
class TopKBufferPropSpec extends AnyFunSuite {

  private def reference(pairs: Seq[(Long, Double)], k: Int): Seq[(Long, Double)] =
    pairs.sortBy { case (id, s) => (-s, id) }.take(k)

  private def drain(b: TopKBuffer): Seq[(Long, Double)] =
    (0 until b.size).map(i => (b.ids(i), b.scores(i)))

  test("random trials: buffer == sort-based reference; merge == global; serde stable") {
    val rng = new StatMath.SplitMix64(4242L)
    for (trial <- 0 until 200) {
      val n = 1 + rng.nextInt(60)
      val k = 1 + rng.nextInt(12)
      // coarse score grid to force plenty of ties
      val pairs = Seq.fill(n)((rng.nextInt(40).toLong,
        rng.nextInt(5).toDouble / 4.0))
      val expect = reference(pairs, k)

      val whole = new TopKBuffer(k)
      pairs.foreach { case (id, s) => whole.insert(id, s) }
      assert(drain(whole) == expect, s"trial $trial single-buffer")

      // split into two partial buffers, serde one of them, merge
      val cut = rng.nextInt(n + 1)
      val (l, r) = pairs.splitAt(cut)
      val bl = new TopKBuffer(k)
      l.foreach { case (id, s) => bl.insert(id, s) }
      val br = new TopKBuffer(k)
      r.foreach { case (id, s) => br.insert(id, s) }
      bl.mergeIn(TopKBuffer.fromBytes(br.toBytes))
      assert(drain(bl) == expect, s"trial $trial split-merge at $cut")
    }
  }
}
