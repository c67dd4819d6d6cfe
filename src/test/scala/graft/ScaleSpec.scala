package graft

import org.scalatest.funsuite.AnyFunSuite

/** Shuffle-volume weak-scaling pins (the CI version of SCALING.md):
  * shuffle write bytes are deterministic — no load, warm-up, or
  * run-order noise — so the sf0.01 → sf0.1 growth ratio is a stable
  * fingerprint of each operator's scale shape. These tests pin one
  * representative per class so a regression that, say, drops map-side
  * combine from a sketch or sneaks a replication blowup into the LSH
  * join fails CI rather than a 100 TB run. Suites run sequentially
  * (build.sbt parallelExecution=false), so the listener tallies are not
  * polluted by concurrent jobs. */
class ScaleSpec extends AnyFunSuite with SparkSuite {

  private val small = "/root/testdata/sf0.01"
  private val big = "/root/testdata/sf0.1"

  private def bytes(name: String, dir: String): Long =
    ScaleAudit.measure(spark, name, dir)._1

  test("top-k never shuffles at any scale (TakeOrderedAndProject)") {
    assert(bytes("topk", small) === 0L)
    assert(bytes("topk", big) === 0L)
  }

  test("sketches are output-bounded: shuffle bytes flat at 10x rows") {
    for (q <- Seq("sketch_kmv", "sketch_hll_registers")) {
      val b1 = bytes(q, small)
      val b2 = bytes(q, big)
      assert(b1 > 0, s"$q: expected a (bounded) shuffle at sf0.01")
      assert(b2 <= 2 * b1,
        s"$q: shuffle grew $b1 -> $b2 bytes at 10x rows — " +
          "the bounded-buffer partials have regressed to key shipping")
    }
  }

  // dedup_near is audited in SCALING.md (fresh JVM) but not here: its
  // memoized pipeline stages could already be checkpointed by DedupSpec
  // in this shared JVM, which would zero the tally.
  test("input-linear operators grow ~10x and never superlinearly") {
    for (q <- Seq("window_rank", "join_multi")) {
      val b1 = bytes(q, small)
      val b2 = bytes(q, big)
      val ratio = b2.toDouble / b1
      assert(ratio > 3.0, s"$q: ratio $ratio implausibly sublinear " +
        "(measurement broken?)")
      assert(ratio < 20.0, s"$q: shuffle grew ${ratio}x at 10x rows — " +
        "superlinear blowup")
    }
  }
}
