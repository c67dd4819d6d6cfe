package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level properties of the relational tier that the oracle gate
  * can't express (approximate ops, equivalences between formulations). */
class RelationalSpec extends AnyFunSuite with SparkSuite {

  test("approx_count_distinct within 5% of exact (B4) at all three SFs") {
    // The two declared-approximate queries are the only rows-only
    // entries in the oracle gate; this quantifies their error bound at
    // every scale the driver exercises, so "no oracle" never means
    // "no check". The exact twin is agg_distinct's countDistinct.
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val exact = Tables.lineitem(spark, dir)
        .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val approx = SparkEntry.queries("agg_approx_distinct")(spark, dir)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, e) =>
        val a = approx(k)
        assert(math.abs(a - e).toDouble / e <= 0.05,
          s"$dir $k: approx=$a exact=$e")
      }
    }
  }

  test("sample_stats_approx quantiles/distinct within 5% of exact (B31b) " +
      "at all three SFs") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val li = Tables.lineitem(spark, dir)
      val Array(p50e, p95e) = li.stat
        .approxQuantile("l_extendedprice", Array(0.5, 0.95), 0.0) // exact
      val nde = li.select(countDistinct("l_partkey")).head.getLong(0)
      val r = SparkEntry.queries("sample_stats_approx")(spark, dir).head()
      assert(math.abs(r.getDouble(0) - p50e) / p50e <= 0.05,
        s"$dir p50: ${r.getDouble(0)} vs $p50e")
      assert(math.abs(r.getDouble(1) - p95e) / p95e <= 0.05,
        s"$dir p95: ${r.getDouble(1)} vs $p95e")
      assert(math.abs(r.getLong(2) - nde).toDouble / nde <= 0.05,
        s"$dir nd: ${r.getLong(2)} vs $nde")
    }
  }

  test("topk == orderBy.limit (B18 TakeOrdered equivalence)") {
    val viaTopk = SparkEntry.queries("topk")(spark, sf).collect()
    val viaSort = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .collect().take(100)
    assert(viaTopk.map(_.toSeq).toSeq == viaSort.map(_.toSeq).toSeq)
  }

  test("partial+final agg == single-partition agg (repartition invariance)") {
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(Det.dsum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
        .orderBy("l_returnflag").collect().map(_.toSeq).toSeq
    val li = Tables.lineitem(spark, sf)
    assert(agg(li.repartition(32)) == agg(li.coalesce(1)))
  }

  test("set-op algebra: (a∩b) and (a∖b) partition a (B19)") {
    val o = Tables.orders(spark, sf)
    val a = o.filter(year(col("o_orderdate")) === 1995).select(col("o_custkey")).distinct()
    val b = o.filter(year(col("o_orderdate")) === 1996).select(col("o_custkey")).distinct()
    val inter = a.intersect(b)
    val diff = a.except(b)
    assert(inter.intersect(diff).count() == 0)
    assert(inter.count() + diff.count() == a.count())
  }

  test("sample: hash-gated, bounded, deterministic (B32)") {
    val q = SparkEntry.queries("sample")
    val n1 = q(spark, sf).count()
    val n2 = q(spark, sf).count()
    assert(n1 == n2, "hash gate must give the same sample every run")
    val total = Tables.documents(spark, sf).count()
    assert(n1 > total * 0.3 && n1 < total * 0.7, s"n=$n1 of $total")
  }

  test("asof join: every event gets exactly one row, price matches order") {
    val out = SparkEntry.queries("join_asof")(spark, sf)
    val nEvents = Tables.events(spark, sf).count()
    assert(out.count() == nEvents)
    // spot-check one user: matched order must be that user's max-date order
    val row = out.filter(col("user_id") === 0).collect().head
    val expected = Tables.orders(spark, sf)
      .filter(col("o_custkey") === 0)
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      .select("o_orderkey").collect().head.getLong(0)
    assert(row.getAs[Long]("matched_order") == expected)
  }

  test("Dataset.observe collects pipeline metrics inline — no second " +
    "pass over the data (the 100 TB observability pattern)") {
    // quality counters (rows, nulls, sum) ride the SAME job as the
    // real computation via CollectMetrics; a separate .count()/.agg()
    // pass would re-scan the corpus
    val observed = Tables.orders(spark, sf).observe("order_metrics",
      count(lit(1)).as("n_rows"),
      sum(when(col("o_totalprice").isNull, 1L).otherwise(0L)).as("n_null"),
      max(col("o_totalprice")).as("max_price"))
    val filtered = observed.filter(col("o_totalprice") > 100000)
    // collect() (not count()) — count() spawns a separate plan whose
    // execution wouldn't register metrics on THIS queryExecution
    val kept = filtered.collect().length.toLong
    val m = filtered.queryExecution.observedMetrics("order_metrics")
    assert(m.getAs[Long]("n_rows") == Tables.orders(spark, sf).count())
    assert(m.getAs[Long]("n_null") == 0L)
    assert(m.getAs[Double]("max_price") > 0.0)
    assert(kept > 0 && kept < m.getAs[Long]("n_rows"))
  }

  test("PERMISSIVE csv scan captures malformed rows in a corrupt-record " +
    "column instead of failing the job") {
    // a 100 TB ingest always contains garbage lines; the job must
    // quarantine them, not die at hour three
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/part.csv"),
      "1|A|2.5\nnot_a_long|B|3.5\n3|C|xyz\n4|D|4.5\n")
    val df = spark.read
      .schema("k LONG, tag STRING, v DOUBLE, _corrupt_record STRING")
      .option("sep", "|").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache() // corrupt-record column requires a materialized frame
    try {
      val bad = df.filter(col("_corrupt_record").isNotNull)
      val good = df.filter(col("_corrupt_record").isNull)
      assert(bad.count() == 2, "both malformed lines quarantined")
      assert(good.count() == 2)
      assert(good.agg(sum(col("v"))).collect()(0).getDouble(0) == 7.0)
    } finally df.unpersist()
  }
}
