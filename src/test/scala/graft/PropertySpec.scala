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

  test("MisraGries core: k-bound, guarantee, undercount bound over random merge trees") {
    import scala.collection.mutable
    // drive the aggregate's own update/merge logic through random
    // partitionings of skewed streams and check the MG invariants
    import graft.functions.MisraGries
    val k = 9
    def updateAll(items: Seq[String]): mutable.HashMap[String, Long] = {
      val buf = mutable.HashMap.empty[String, Long]
      items.foreach(s => MisraGries.add(buf, s, k))
      buf
    }
    for (trial <- 1 to 50) {
      // zipf-ish: item i appears ~ 200/i times, plus noise singletons
      val stream = rng.shuffle(
        (1 to 12).flatMap(i => Seq.fill(200 / i)(s"hh$i")) ++
          (1 to 150).map(i => s"noise${trial}_$i"))
      val n = stream.length
      val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
      // random merge tree: split into 2-7 chunks, fold in random order
      val chunks = stream.grouped(n / (2 + rng.nextInt(6)) max 1)
        .map(c => updateAll(c)).toList
      val merged = rng.shuffle(chunks)
        .reduce((a, b) => MisraGries.merge(a, b, k))
      assert(merged.size <= 9, s"k-bound violated: ${merged.size}")
      val bound = n.toDouble / 10 // n/(k+1)
      for ((item, f) <- exact if f > bound)
        assert(merged.contains(item),
          s"trial $trial: frequent $item (f=$f > $bound) evicted")
      for ((item, est) <- merged) {
        val f = exact(item)
        assert(est <= f && est >= f - bound.toLong - 1,
          s"trial $trial: $item est=$est true=$f bound=$bound")
      }
    }
  }

  test("MisraGries serialization round-trips") {
    import scala.collection.mutable
    val agg = graft.functions.MisraGriesAgg(
      org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 4)
    val buf = mutable.HashMap("a" -> 3L, "βeta" -> 7L, "" -> 1L)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back == buf)
  }

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

  test("Mp4Demux fuzz: random bytes and mutated valid payloads never throw, outputs stay well-formed") {
    import graft.functions.Mp4Demux
    import org.apache.spark.unsafe.types.UTF8String
    val handlers = Seq("vide", "soun", "text").map(UTF8String.fromString)
    def check(b: Array[Byte]): Unit = {
      // the quarantine contract: malformed input degrades to empty
      // or to internally-consistent tables — NEVER an exception
      val sm = Mp4Demux.samples(b)
      val tm = Mp4Demux.timing(b)
      val tr = Mp4Demux.tracks(b)
      assert(sm.numElements >= 0 && tm.numElements >= 0 &&
        tr.numElements >= 0)
      handlers.foreach { h =>
        Mp4Demux.samplesFor(b, h); Mp4Demux.timingFor(b, h); ()
      }
      // sample indexes, when present, are the dense 0..n-1 ladder
      (0 until sm.numElements).foreach { i =>
        assert(sm.getStruct(i, 4).getLong(0) == i.toLong)
      }
    }
    // pure random garbage at assorted sizes
    (0 until 300).foreach { i =>
      val n = rng.nextInt(600)
      val b = new Array[Byte](n)
      rng.nextBytes(b)
      check(b)
    }
    // single-byte mutations and truncations of VALID payloads — the
    // adversarial band where a parser is most likely to misstep
    val valid = Seq(
      graft.operators.Multimodal.mp4Bytes(7L),
      graft.operators.Multimodal.mp4MultiTrackBytes(7L))
    valid.foreach { v =>
      (0 until 400).foreach { _ =>
        val b = v.clone()
        b(rng.nextInt(b.length)) = rng.nextInt(256).toByte
        check(b)
      }
      (0 until 100).foreach { _ => check(v.take(rng.nextInt(v.length))) }
    }
  }
}
