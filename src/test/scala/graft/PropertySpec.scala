package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAgg

/** Randomized property checks for the custom aggregate cores — pure
  * JVM (no Spark session), fixed seed, hundreds of cases per run. */
class PropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)

  private def randomEntries(n: Int): List[(Double, Long)] =
    List.fill(n)((rng.nextInt(201).toDouble / 10.0 - 10.0,
      rng.nextInt(50).toLong))

  test("TopKAgg heap == sort-based top-k for 500 random inputs (with ties)") {
    for (_ <- 0 until 500) {
      val xs = randomEntries(rng.nextInt(40))
      val k = 1 + rng.nextInt(8)
      val h = new TopKAgg.Heap(k)
      xs.foreach { case (s, id) => h.offer(s, id) }
      val expect = xs.sortBy { case (s, id) => (-s, id) }.take(k)
      assert(h.sortedDesc == expect, s"k=$k xs=$xs")
    }
  }

  test("TopKAgg merge(a, b) == offering the union") {
    for (_ <- 0 until 500) {
      val xs = randomEntries(rng.nextInt(30))
      val ys = randomEntries(rng.nextInt(30))
      val k = 1 + rng.nextInt(6)
      val a = new TopKAgg.Heap(k)
      xs.foreach { case (s, id) => a.offer(s, id) }
      val b = new TopKAgg.Heap(k)
      ys.foreach { case (s, id) => b.offer(s, id) }
      a.absorb(b)
      val u = new TopKAgg.Heap(k)
      (xs ++ ys).foreach { case (s, id) => u.offer(s, id) }
      assert(a.sortedDesc == u.sortedDesc)
    }
  }

  test("TopKAgg rejects NaN scores (a NaN must never pin a slot)") {
    val h = new TopKAgg.Heap(2)
    h.offer(Double.NaN, 1L)
    h.offer(0.5, 2L)
    h.offer(Double.NaN, 3L)
    h.offer(0.9, 4L)
    h.offer(0.7, 5L) // would be blocked if a NaN squatted in the heap
    assert(h.sortedDesc == Seq((0.9, 4L), (0.7, 5L)))
  }

  test("TopKAgg serialization round-trips") {
    for (_ <- 0 until 200) {
      val xs = randomEntries(rng.nextInt(30))
      val k = 1 + rng.nextInt(6)
      val h = new TopKAgg.Heap(k)
      xs.foreach { case (s, id) => h.offer(s, id) }
      val back = TopKAgg.Heap.fromBytes(k, h.toBytes)
      assert(back.sortedDesc == h.sortedDesc)
    }
  }
}
