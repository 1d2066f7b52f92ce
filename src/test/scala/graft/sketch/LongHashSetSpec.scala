package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String

class LongHashSetSpec extends AnyFunSuite {

  test("add/contains over a dense membership set; absent values rejected") {
    val s = new LongHashSet(10000)
    val rng = new java.util.Random(7)
    val members = Array.fill(10000)(rng.nextLong())
    members.foreach(s.add)
    members.foreach(h => assert(s.contains(h)))
    var misses = 0
    (1 to 10000).foreach { _ =>
      val probe = rng.nextLong()
      if (!members.contains(probe) && s.contains(probe)) misses += 1
    }
    assert(misses == 0)
  }

  test("zero hash is storable (empty-sentinel remap)") {
    val s = new LongHashSet(4)
    assert(!s.contains(0L))
    s.add(0L)
    assert(s.contains(0L))
  }

  test("hashUtf8 matches across fromString copies (content hash, not identity)") {
    val a = UTF8String.fromString("m-00001234")
    val b = UTF8String.fromString("m-00001234")
    val c = UTF8String.fromString("m-00001235")
    assert(LongHashSet.hashUtf8(a) == LongHashSet.hashUtf8(b))
    assert(LongHashSet.hashUtf8(a) != LongHashSet.hashUtf8(c))
  }

  test("duplicate adds do not grow the table into an infinite probe loop") {
    val s = new LongHashSet(2)
    (1 to 100).foreach(_ => s.add(42L))
    assert(s.contains(42L) && !s.contains(41L))
  }
}
