package graft

import org.scalatest.funsuite.AnyFunSuite

/** Error bound for the sketch-backed profiler twin: declared-approximate
  * (no DuckDB oracle — SURVEY §2 rule 4), so like B4 the check is a
  * value-level property against its exact sibling at every scale the
  * driver exercises. Everything that is NOT an estimate (row counts,
  * null counts, min/max prints) must match the exact profiler
  * bit-for-bit — the twin may only relax the NDV column. */
class StatsApproxSpec extends AnyFunSuite with SparkSuite {

  test("profile_columns_approx: NDV within 5% of exact, all other " +
      "profile fields identical, at all three SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val exact = SparkEntry.queries("profile_columns")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getString(5))).toMap
      val approx = SparkEntry.queries("profile_columns_approx")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getString(4), r.getString(5))).toMap
      assert(exact.keySet == approx.keySet)
      exact.foreach { case (col, (nRows, nNull, nd, minS, maxS)) =>
        val (aRows, aNull, aNd, aMin, aMax) = approx(col)
        assert(aRows == nRows && aNull == nNull &&
          aMin == minS && aMax == maxS,
          s"$dir $col: non-estimate fields diverged")
        assert(math.abs(aNd - nd).toDouble / math.max(nd, 1L) <= 0.05,
          s"$dir $col: ndv est=$aNd exact=$nd")
      }
    }
  }

  test("profileColumnsRouted: the documented exact-vs-sketch decision " +
      "rule is code — switchover pinned in both directions (r11 item 7)") {
    import graft.queries.Stats
    val dir = "/root/testdata/sf0.01"
    val nRows = Tables.events(spark, dir).count()
    // below the ceiling: rows identical to the DECLARED exact profiler
    val lo = Stats.profileColumnsRouted(spark, dir, exactMaxRows = nRows)
    assert(lo.schema.fieldNames.contains("n_distinct"))
    assert(lo.collect().forall(_.getBoolean(6)), "expected the exact regime")
    val exact = SparkEntry.queries("profile_columns")(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(lo.drop("exact_ndv").collect().map(_.toSeq).toSeq == exact,
      "routed-exact rows diverged from the declared exact profiler")
    // above the ceiling: the sketch regime, same unified schema, plan
    // carries HLL partials instead of the NDV-linear Expand
    val hi = Stats.profileColumnsRouted(spark, dir, exactMaxRows = nRows - 1)
    assert(hi.collect().forall(!_.getBoolean(6)), "expected the sketch regime")
    val plan = hi.queryExecution.executedPlan.toString
    assert(plan.contains("approx_count_distinct"),
      "sketch regime does not plan HLL aggregates")
    assert(!plan.contains("Expand"),
      "sketch regime still plans the exact profiler's Expand")
    // and the routed estimates obey the same ±5% contract
    val exactNd = exact.map(r => r.head.toString -> r(3).asInstanceOf[Long])
      .toMap
    hi.collect().foreach { r =>
      val (c, nd) = (r.getString(0), r.getLong(3))
      assert(math.abs(nd - exactNd(c)).toDouble /
        math.max(exactNd(c), 1L) <= 0.05, s"$c: routed est=$nd")
    }
  }

  test("dq_expectations_approx: the four exact expectation rows " +
      "bit-identical, unique estimate within 5%·N, at all three SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      def rows(q: String) = SparkEntry.queries(q)(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
      val exact = rows("dq_expectations")
      val approx = rows("dq_expectations_approx")
      assert(exact.keySet == approx.keySet)
      exact.foreach { case (e, (nChk, nViol, passed)) =>
        val (aChk, aViol, aPassed) = approx(e)
        assert(aChk == nChk, s"$dir $e: n_checked diverged")
        if (e == "unique_orderkey") {
          // the only estimated row: within the declared ±5%·N band,
          // and on the (unique-keyed) fixtures the 3·rsd gate must
          // still report the expectation as passing
          assert(math.abs(aViol - nViol).toDouble / nChk <= 0.05,
            s"$dir $e: est=$aViol exact=$nViol over $nChk rows")
          assert(aPassed, s"$dir $e: sketch noise failed a unique key")
        } else {
          assert(aViol == nViol && aPassed == passed,
            s"$dir $e: exact expectation row diverged in the approx twin")
        }
      }
    }
  }

  test("agg_mad_approx: med and mad within 5% of the exact window-sort " +
      "MAD at all three SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val exact = SparkEntry.queries("agg_mad")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2))).toMap
      val approx = SparkEntry.queries("agg_mad_approx")(spark, dir)
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2))).toMap
      assert(exact.keySet == approx.keySet)
      exact.foreach { case (k, (medE, madE)) =>
        val (medA, madA) = approx(k)
        assert(math.abs(medA - medE) / medE <= 0.05,
          s"$dir $k: med approx=$medA exact=$medE")
        assert(math.abs(madA - madE) / madE <= 0.05,
          s"$dir $k: mad approx=$madA exact=$madE")
      }
    }
  }
}
