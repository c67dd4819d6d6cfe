package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

/** Concurrent-workload determinism: a real pipeline fires many queries
  * at one long-lived session at once, so the session-scoped machinery —
  * `Catalog.once` scratch materializations, the dedup family's
  * `frameMemo` checkpoints, temp-view registration — must be race-free
  * and the results identical to sequential execution. The mix below
  * deliberately includes queries that SHARE one-time state (the
  * partsupp scratch behind tpch_q2/q11, the near-dup component memo
  * behind dedup_near_keep/dedup_cluster_rep, the csv/parquet sink
  * copies) so concurrent first-touch races the guards, then a second
  * wave exercises the warm path. */
class ConcurrencySpec extends AnyFunSuite with SparkSuite {

  test("a mixed 12-query workload run on 8 threads matches its " +
    "sequential results, cold and warm") {
    val sf01 = "/root/testdata/sf0.01"
    val qs = Seq(
      "agg_hash", "window_rank", "sketch_kmv", "text_tfidf",
      "sim_topk_cosine", "dedup_near_keep", "dedup_cluster_rep",
      "sink_parquet", "scan_csv", "tpch_q11", "tpch_q2", "cogroup_apply")
    def run(n: String): Seq[Seq[Any]] =
      try SparkEntry.queries(n)(spark, sf01).collect().map(_.toSeq).toSeq
      catch { case e: Throwable =>
        throw new RuntimeException(s"query $n failed: ${e.getMessage}", e)
      }
    // concurrent waves run FIRST: wave 1 is the cold concurrent
    // first-touch that actually races the once/memo guards (a
    // sequential warm-up beforehand would leave both waves on the warm
    // path and the race untested); the sequential baseline follows.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val waves = try {
      (1 to 2).map { wave =>
        wave -> Await.result(
          Future.traverse(qs)(n => Future(n -> run(n))), 10.minutes).toMap
      }
    } finally pool.shutdown()
    val sequential = qs.map(n => n -> run(n)).toMap
    for ((wave, got) <- waves; n <- qs)
      assert(got(n) == sequential(n),
        s"wave $wave: $n diverged under concurrent execution")
  }
}
