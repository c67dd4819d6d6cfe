package graft

import org.apache.spark.TaskContext
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Task-retry determinism — the fault-tolerance claim a 1000-executor
  * deployment actually relies on: when a task dies (preemption, OOM
  * kill, straggler re-launch) Spark recomputes its partition from
  * lineage, and the recomputation must yield the SAME result bytes.
  * These tests inject a deterministic first-attempt failure into one
  * partition of a real query (map side and post-shuffle side) under a
  * `local[4, 3]` master (task maxFailures = 3) and pin that the result
  * equals the clean run — i.e. nothing in the plan (hash seeds, decimal
  * sums, orderings) depends on which attempt produced the partition.
  * Owns its session (maxFailures is fixed at context creation) and
  * restores a clean slate, CatalogSpec-style. */
class FaultRetrySpec extends AnyFunSuite {

  /** Identity on longs that throws on the FIRST attempt of the chosen
    * partition — attempt 1 (the retry) then succeeds. */
  private def flakyId = udf { (x: Long) =>
    val tc = TaskContext.get()
    if (tc != null && tc.attemptNumber() == 0 && tc.partitionId() == 1)
      throw new RuntimeException("injected first-attempt failure")
    x
  }

  test("map-side and reduce-side task retries reproduce the clean result " +
    "bit-for-bit (local[4,3], injected first-attempt failures)") {
    SparkSession.getActiveSession.foreach(_.stop())
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[4, 3]") // 4 threads, maxFailures 3 -> retries live
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val sf = "/root/testdata/sf0.001"
      def agg(flaky: Boolean) = {
        val o = Tables.orders(spark, sf).repartition(4)
        val price = if (flaky) flakyId(col("o_orderkey")) else col("o_orderkey")
        o.select(col("o_orderpriority"), price.as("k"), col("o_totalprice"))
          .groupBy("o_orderpriority")
          .agg(Det.dsum(col("o_totalprice")).as("rev"),
            count(col("k")).as("n"))
          .orderBy("o_orderpriority")
          .collect().map(_.toSeq).toSeq
      }
      assert(agg(flaky = true) == agg(flaky = false),
        "map-side retry changed the aggregate")

      // post-shuffle (reduce-stage) retry: the flaky map runs AFTER the
      // exchange, so the retried task re-reads shuffle blocks
      def reduceSide(flaky: Boolean) = {
        val base = Tables.orders(spark, sf)
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"))
        val n = if (flaky) flakyId(col("n")) else col("n")
        base.select(col("o_orderpriority"), n.as("n"))
          .orderBy("o_orderpriority")
          .collect().map(_.toSeq).toSeq
      }
      assert(reduceSide(flaky = true) == reduceSide(flaky = false),
        "reduce-side retry changed the result")
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
