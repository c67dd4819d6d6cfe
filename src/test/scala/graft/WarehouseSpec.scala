package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Per-operator checks for the warehouse/analytics module (merge,
  * SCD2, funnel, cohorts, Z-order, bucketed join, reservoir sample,
  * connected components) + the new text/embedding pipeline ops.
  * Semantics at sf0.001; plan shapes where the operator's 100 TB story
  * depends on them.
  */
class WarehouseSpec extends AnyFunSuite with SparkSuite {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("merge_upsert: update/insert/carry-through row accounting") {
    val merged = q("merge_upsert").cache()
    val orders = Tables.orders(spark, sf)
    val n = orders.count()
    val nUpd = orders.filter(col("o_orderkey") % 10 === 0).count()
    val nIns = orders.filter(col("o_orderkey") % 7 === 0).count()
    // every snapshot row survives exactly once; inserts add fresh keys
    assert(merged.count() === n + nIns)
    assert(merged.filter(col("status") === "U").count() === nUpd)
    assert(merged.filter(col("status") === "I").count() === nIns)
    // updated rows carry the +500 price of the change set
    val k = merged.filter(col("status") === "U").limit(1)
      .select("o_orderkey").head.getLong(0)
    val before = orders.filter(col("o_orderkey") === k)
      .head.getAs[Double]("o_totalprice")
    val after = merged.filter(col("o_orderkey") === k)
      .head.getAs[Double]("totalprice")
    assert(after === before + 500.0)
    merged.unpersist()
  }

  test("dq_expectations_route: the split is physical — both route " +
      "directories exist on disk and their row counts reconcile with " +
      "the source gate") {
    val rep = q("dq_expectations_route").collect()
    val byRoute = rep.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val orders = Tables.orders(spark, sf)
    val nAll = orders.count()
    val nBad = orders.filter(col("o_totalprice") > 300000.0).count()
    // this fixture violates only the range gate, so the reconciliation
    // is exact: quarantine = priced-out rows, ok = the rest, no row
    // lost or double-routed
    assert(byRoute.getOrElse("quarantine", 0L) === nBad)
    assert(byRoute.getOrElse("ok", 0L) === nAll - nBad)
    assert(byRoute.values.sum === nAll)
    // the quarantine channel is a real sink, not a report row: both
    // partition directories exist with committed parquet files
    val routed = new java.io.File(Catalog.scratch(sf, "dq_route_orders"))
    for (r <- Seq("ok", "quarantine")) {
      val dir = new java.io.File(routed, s"route=$r")
      assert(dir.isDirectory, s"missing route directory: $dir")
      assert(dir.listFiles().exists(_.getName.endsWith(".parquet")),
        s"no parquet files under $dir")
    }
  }

  test("scd2_history: intervals chain and exactly one current row per user") {
    val h = q("scd2_history").cache()
    import spark.implicits._
    val perUser = h.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_current"), 1).otherwise(0)).as("cur"))
    assert(perUser.filter(col("cur") =!= 1).count() === 0)
    // valid_from strictly increases along each user's versions and
    // valid_to equals the next version's valid_from (no gaps/overlaps)
    val rows = h.select("user_id", "valid_from", "valid_to")
      .as[(Long, Long, Option[Long])].collect().groupBy(_._1)
    rows.values.foreach { vs =>
      val sorted = vs.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from2, _)) => assert(to === from2)
        case _ => ()
      }
      assert(sorted.init.forall(_._3.isDefined))
      assert(sorted.last._3.isEmpty)
    }
    h.unpersist()
  }

  test("event_funnel: stage counts monotonically decrease") {
    val r = q("event_funnel").head
    val (s1, s2, s3, s4) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(s1 >= s2 && s2 >= s3 && s3 >= s4)
    assert(s1 > 0)
  }

  test("retention_cohort: offset 0 row exists per cohort; users add up") {
    val r = q("retention_cohort").cache()
    // every cohort is active on its own first day
    val cohorts = r.select("cohort_day").distinct().count()
    assert(r.filter(col("offset_day") === 0).count() === cohorts)
    assert(r.filter(col("offset_day") < 0).count() === 0)
    r.unpersist()
  }

  test("zorder_cluster: morton code matches bit-interleave reference") {
    val rows = q("zorder_cluster")
      .select("x", "y", "zval").collect()
    def ref(x: Long, y: Long): Long =
      (0 until 8).map { k =>
        (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    rows.foreach { r =>
      assert(r.getLong(2) === ref(r.getLong(0), r.getLong(1)))
    }
    // clustered output is sorted by zval
    val zs = rows.map(_.getLong(2))
    assert(zs.sameElements(zs.sorted))
  }

  test("zorder_prune: the z-ordered layout's row-group stats skip most " +
    "of the table for a 2-D box, a key-ordered twin skips nothing") {
    // same rows, same filter, two layouts — the scan's output-row
    // metric (rows surviving parquet row-group min/max pruning) is the
    // direct measure of the layout's worth
    import org.apache.spark.sql.execution.FileSourceScanExec
    def scanRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      def flatten(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (p +: p.children.flatMap(flatten)) ++ (p match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            flatten(q.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => flatten(a.executedPlan)
          case _ => Nil
        })
      flatten(df.queryExecution.executedPlan).collectFirst {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.get
    }
    // sf0.01: at the suite's sf0.001 each of the 8 files holds only 25
    // rows, so the z-intervals are too coarse for the stats boxes to
    // separate (measured 100/200) — the layout needs enough rows per
    // file for "compact z-interval" to mean "tight box"
    val sfz = "/root/testdata/sf0.01"
    val z = graft.queries.Warehouse.zorderedPart(spark, sfz)
    val zPath = graft.queries.Warehouse.zorderedPartPath(spark, sfz)
    // the unclustered twin: identical rows in ARRIVAL (round-robin)
    // order — not key order, because the generator correlates price
    // with p_partkey, which would give a key sort tight y-stats for
    // free and poison the baseline
    val linPath = Catalog.scratch(sfz, "part_rrorder")
    z.repartition(8).write.mode("overwrite").parquet(linPath)
    val box = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(col("x").between(64, 127) && col("y").between(64, 127))
    val total = spark.read.schema(z.schema).parquet(zPath).count()
    val zRows = scanRows(box(spark.read.schema(z.schema).parquet(zPath)))
    val linRows = scanRows(box(spark.read.schema(z.schema).parquet(linPath)))
    info(s"total=$total z-ordered scan rows=$zRows key-ordered=$linRows")
    assert(linRows == total,
      "key-ordered twin unexpectedly skipped row groups — the " +
        "comparison baseline is broken")
    assert(zRows * 2 < linRows,
      s"z-ordered layout skipped too little: $zRows vs $linRows — " +
        "the morton sort is not producing tight stats boxes")
    // and the layout never changes the answer
    assert(box(spark.read.schema(z.schema).parquet(zPath)).count() ==
      box(spark.read.schema(z.schema).parquet(linPath)).count())
  }

  test("bucketed_join: co-located join has no exchange on either side") {
    // build the bucketed tables via the declared query first
    q("bucketed_join").collect()
    val ot = spark.catalog.listTables().collect()
      .map(_.name).find(_.startsWith("graft_bkt_orders")).get
    val lt = spark.catalog.listTables().collect()
      .map(_.name).find(_.startsWith("graft_bkt_lineitem")).get
    // force the sort-merge path (at sf0.001 AQE would otherwise pick a
    // broadcast join on both variants and hide the bucketing effect)
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(ot)
        .join(spark.table(lt), col("o_orderkey") === col("l_orderkey"))
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should read co-located buckets, got:\n$plan")
      // and the same join over raw parquet DOES shuffle — the bucket
      // layout, not the data size, is what removed the exchange
      val raw = Tables.orders(spark, sf)
        .join(Tables.lineitem(spark, sf),
          col("o_orderkey") === col("l_orderkey"))
      raw.collect()
      assert(raw.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("sample_reservoir: deterministic k-subset of the keyspace") {
    val a = q("sample_reservoir").collect()
    val b = q("sample_reservoir").collect()
    assert(a.length === 100)
    assert(a.map(_.getLong(0)).sameElements(b.map(_.getLong(0))))
    val keys = Tables.orders(spark, sf)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    assert(a.forall(r => keys.contains(r.getLong(0))))
  }

  test("graph_components: labels are fixpoint of min-propagation") {
    val comp = q("graph_components").cache()
    val labels = comp.select("node", "comp").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // rebuild the edge set the query used
    val li = Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 50 === 0)
      .select("l_orderkey", "l_suppkey")
    val edges = li.select(col("l_orderkey"), col("l_suppkey").as("x"))
      .join(li.select(col("l_orderkey"), col("l_suppkey").as("y")),
        "l_orderkey")
      .filter(col("x") =!= col("y"))
      .select("x", "y").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // fixpoint: neighbors share a component; label is the component min
    edges.foreach { case (x, y) => assert(labels(x) === labels(y)) }
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min === c)
    }
    comp.unpersist()
  }

  test("pii_redact: redaction fires on every row, tokens are scrubbed") {
    val r = q("pii_redact").cache()
    assert(r.filter(col("head").contains("<EMAIL>")).count() === r.count())
    assert(r.filter(col("head").contains("@")).count() === 0)
    r.unpersist()
  }

  test("stopword_filter: kept counts bounded and stopwords removed") {
    val r = q("stopword_filter").cache()
    assert(r.filter(col("n_kept") > col("n_tokens")).count() === 0)
    assert(r.filter(col("head").rlike("(^| )(a|the)( |$)")).count() === 0)
    r.unpersist()
  }

  test("vocab_coverage: 90% vocab is a prefix of the distinct vocab") {
    val r = q("vocab_coverage").head
    val (v90, total, tail) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v90 >= 1 && total > 0 && tail >= 1)
    val distinct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
      .distinct().count()
    assert(v90 <= distinct)
    assert(v90 + tail === distinct + 1) // tail starts AT the crossing rank
  }

  test("embed_quantize: int8 range and max-abs element hits ±127") {
    val r = q("embed_quantize").cache()
    assert(r.filter(col("q_max") > 127 || col("q_min") < -127).count() === 0)
    // the max-|x| element quantizes to exactly ±127 in every vector
    assert(r.filter(col("q_max") === 127 || col("q_min") === -127).count()
      === r.count())
    r.unpersist()
  }

  test("embed_normalize: norms positive, normalized element bounded") {
    val r = q("embed_normalize").cache()
    assert(r.filter(col("norm") <= 0.0).count() === 0)
    assert(r.filter(abs(col("e1n")) > 1.0).count() === 0)
    r.unpersist()
  }

  test("agg_entropy: bounded by ln(k), zero only for single-type buckets") {
    val r = q("agg_entropy").cache()
    import spark.implicits._
    r.select("n_types", "entropy").as[(Long, Double)].collect().foreach {
      case (k, h) =>
        assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9,
          s"entropy $h outside [0, ln($k)]")
    }
    r.unpersist()
  }

  test("agg_chi2: matches direct computation from counts") {
    val r = q("agg_chi2").head
    val counts = Tables.events(spark, sf).groupBy("event_type").count()
      .collect().map(_.getLong(1).toDouble)
    val n = counts.sum; val e = n / counts.length
    val chi2 = counts.map(o => (o - e) * (o - e) / e).sum
    assert(r.getLong(0) === n.toLong)
    assert(math.abs(r.getDouble(2) - chi2) < 1e-6)
  }

  test("window_running_distinct: non-decreasing, ends at the true count") {
    val r = q("window_running_distinct").cache()
    import spark.implicits._
    val byUser = r.select("user_id", "n_distinct")
      .as[(Long, Long)].collect().groupBy(_._1)
    val truth = Tables.events(spark, sf)
      .groupBy("user_id").agg(countDistinct("event_type").as("d"))
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    byUser.foreach { case (u, vs) =>
      val seq = vs.map(_._2) // already in (ts, event_id) output order
      assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
      assert(seq.last === truth(u))
    }
    r.unpersist()
  }

  test("incremental_agg: merged partials equal a direct full aggregate") {
    val inc = q("incremental_agg").collect()
    val full = Tables.events(spark, sf).groupBy("event_type")
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("total"))
      .orderBy("event_type").collect()
    assert(inc.length === full.length)
    inc.zip(full).foreach { case (a, b) =>
      assert(a.getString(0) === b.getString(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(a.getDouble(2) === b.getDouble(2)) // bit-exact: decimal merge
    }
  }

  test("time_ohlc: candle invariants low <= open,close <= high") {
    val r = q("time_ohlc").cache()
    assert(r.count() > 0)
    assert(r.filter(col("low") > col("high")).count() === 0)
    assert(r.filter(col("open") < col("low") || col("open") > col("high"))
      .count() === 0)
    assert(r.filter(col("close") < col("low") || col("close") > col("high"))
      .count() === 0)
    // single-event candles collapse to one price
    assert(r.filter(col("n") === 1 && (col("open") =!= col("close")))
      .count() === 0)
    r.unpersist()
  }

  test("attribution_last_touch: matched view precedes the purchase") {
    val r = q("attribution_last_touch").cache()
    assert(r.count() > 0)
    val matched = r.filter(col("attributed_src") =!= -1)
    assert(matched.count() > 0)
    assert(matched.filter(col("view_tus") > col("tus")).count() === 0)
    // unmatched purchases have no prior view at all
    val unmatchedUsers = r.filter(col("attributed_src") === -1)
    assert(unmatchedUsers.filter(col("view_tus") =!= -1).count() === 0)
    r.unpersist()
  }

  test("agg_gini: bounded in [0,1) and matches direct computation") {
    val rows = q("agg_gini").collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      val g = row.getDouble(2)
      assert(g >= 0.0 && g < 1.0)
    }
    // direct recompute for one priority class
    val p0 = rows.head.getString(0)
    val xs = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === p0)
      .select("o_totalprice").collect().map(_.getDouble(0)).sorted
    val n = xs.length.toDouble
    val gini = xs.zipWithIndex
      .map { case (x, i) => (2 * (i + 1) - n - 1) * x }.sum / (n * xs.sum)
    assert(math.abs(rows.head.getDouble(2) - gini) < 1e-9)
  }

  test("dedup_containment: containment >= jaccard on the same pairs") {
    val c = q("dedup_containment")
      .select(col("d1"), col("d2"), col("containment")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c.nonEmpty)
    assert(c.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("skyline_2d: no returned point is dominated, and every " +
    "non-returned point is dominated (brute-force cross-check)") {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val pts = Tables.lineitem(spark, sf).groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), max(cents).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val front = q("skyline_2d").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def dominated(a: (Long, Long, Long)) = pts.exists(b =>
      b._2 >= a._2 && b._3 >= a._3 && (b._2 > a._2 || b._3 > a._3))
    assert(front.nonEmpty)
    front.foreach(p => assert(!dominated(p), s"frontier point $p dominated"))
    pts.filterNot(front).foreach(p =>
      assert(dominated(p), s"missed frontier point $p"))
  }

  test("event_transitions: per-source probabilities sum to 1 and " +
    "counts account for every non-terminal event") {
    val t = q("event_transitions").cache()
    val sums = t.groupBy("src").agg(sum("p").as("sp")).collect()
    sums.foreach(r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-12, s"src ${r.get(0)}"))
    val total = t.agg(sum("n")).head.getLong(0)
    val ev = Tables.events(spark, sf)
    val expected = ev.count() -
      ev.select("user_id").distinct().count() // each user's last event
    assert(total === expected)
    t.unpersist()
  }

  test("graph_pagerank: rank mass is conserved up to integer-floor " +
    "loss (no dangling nodes in the symmetric co-order graph)") {
    val r = q("graph_pagerank").cache()
    val n = r.count()
    assert(n > 0)
    val total = r.agg(sum("pagerank")).head.getLong(0)
    val mass = n * 1000000000000L
    // 3 iterations × per-edge floor loss < 1 unit each; edges per node
    // are capped by order width × sampled co-orders — 10^6 units is a
    // generous bound, 10^-6 of one node's rank
    assert(total <= mass, s"mass grew: $total > $mass")
    assert(total >= mass - n * 1000000L,
      s"mass lost beyond floor bound: $total vs $mass")
    // damping floor: every node keeps at least the teleport share
    assert(r.filter(col("pagerank") < 150000000000L).count() === 0)
    r.unpersist()
  }

  test("graph_triangles: each triangle is seen once per vertex " +
    "(total divisible by 3) and counts are symmetric-consistent") {
    val t = q("graph_triangles").cache()
    assert(t.count() > 0)
    val total = t.agg(sum("triangles")).head.getLong(0)
    assert(total > 0 && total % 3 === 0,
      s"per-vertex counts must sum to 3 × #triangles, got $total")
    assert(t.filter(col("triangles") <= 0).count() === 0)
    t.unpersist()
  }

  test("sink_compact rewrites the 64-file fragmented copy into 2 files " +
    "with identical content") {
    q("sink_compact").collect() // arm the memoized write
    val frag = graft.Catalog.scratch(sf, "compact_in")
    val compact = graft.Catalog.scratch(sf, "compact_out")
    def parquetFiles(p: String): Int =
      spark.read.parquet(p).inputFiles.length
    assert(parquetFiles(frag) > 2, "fragmented input must be many files")
    // precondition for the file-count bound: repartition(2) only emits
    // 2 non-empty files when there are >= 2 rows to spread
    assert(spark.read.parquet(frag).count() >= 2)
    val nc = parquetFiles(compact)
    assert(nc <= 2 && nc < parquetFiles(frag),
      s"compacted layout must collapse the fragmentation, got $nc files")
    val a = spark.read.parquet(frag).orderBy("doc_id").collect()
    val b = spark.read.parquet(compact).orderBy("doc_id").collect()
    assert(a.sameElements(b), "compaction must preserve content")
  }
}
