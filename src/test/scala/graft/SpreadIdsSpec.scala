package graft

import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** [[Tables.spreadIds]] — the zero-shuffle spread for single-long-column
  * id frames feeding per-id synthesis (r16). Pins the three contract
  * legs the multimodal family depends on:
  *
  *  1. dense ids re-emit as a Range at full parallelism with NO
  *     Exchange (ScaleSpec separately pins the consequence: the PCA
  *     fit's shuffle stays model-bounded at 10x rows);
  *  2. the id SET is identical on every path (the whole point — spread
  *     must never change results);
  *  3. non-dense, multi-column, and non-long frames take the plain
  *     repartition spread, which preserves all columns (the r16
  *     mid-build phash regression: a (doc_id, seed) frame through the
  *     range path silently dropped `seed`).
  */
class SpreadIdsSpec extends AnyFunSuite with SparkSuite {

  import spark.implicits._

  // one-partition inputs so the under-parallel branch (partitions*2 <=
  // defaultParallelism=4) actually fires
  private def onePart(ids: Seq[Long]) =
    ids.toDF("doc_id").coalesce(1)

  test("dense ids spread to full parallelism with zero Exchange") {
    val out = Tables.spreadIds(onePart(5L to 40L))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    val plan = out.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    assert(!plan.contains("Exchange"),
      s"dense path must not shuffle:\n$plan")
    assert(out.as[Long].collect().sorted.toSeq == (5L to 40L))
  }

  test("non-dense ids fall back to repartition with the same id set") {
    val ids = Seq(1L, 2L, 4L, 8L, 16L)
    val out = Tables.spreadIds(onePart(ids))
    assert(out.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    assert(out.as[Long].collect().sorted.toSeq == ids)
  }

  test("multi-column frames keep every column (the phash regression)") {
    val df = (1L to 10L).map(i => (i, i % 4)).toDF("doc_id", "seed")
      .coalesce(1)
    val out = Tables.spreadIds(df)
    assert(out.columns.toSeq == Seq("doc_id", "seed"))
    assert(out.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      .toSeq == (1L to 10L).map(i => (i, i % 4)))
  }

  test("duplicate ids spanning a dense range keep the multiset (r16 ADVICE)") {
    // [1,2,2,4]: count=4 and max-min+1=4 — the pre-fix probe mistook
    // this for the dense range [1,2,3,4] and silently emitted a
    // DIFFERENT id set. The distinct-count guard must route it to the
    // repartition path, preserving the duplicate.
    val ids = Seq(1L, 2L, 2L, 4L)
    val out = Tables.spreadIds(onePart(ids))
    assert(out.as[Long].collect().sorted.toSeq == ids,
      "duplicate-bearing ids must round-trip as a multiset")
  }

  test("already-parallel frames pass through untouched") {
    val df = (1L to 40L).toDF("doc_id")
      .repartition(spark.sparkContext.defaultParallelism)
    assert(Tables.spreadIds(df) eq df)
  }

  test("empty and null-bearing frames are safe") {
    assert(Tables.spreadIds(onePart(Seq.empty)).count() == 0)
    val withNull = Seq(Some(1L), None, Some(2L))
      .toDF("doc_id").coalesce(1)
    assert(Tables.spreadIds(withNull).count() == 3)
  }
}
