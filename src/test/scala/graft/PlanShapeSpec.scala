package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions (SURVEY.md §5.2 item 2): the physical plans must
  * be the ones a 100 TB deployment needs — pushdown reaching the scan,
  * broadcast where hinted, TakeOrdered instead of global sort for top-k.
  * These catch silent regressions that correctness tests cannot (a query
  * can be right and still shuffle the fact table).
  */
class PlanShapeSpec extends AnyFunSuite with SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  /** Formatted explain (full PushedFilters, codegen spans), after
    * executing so AQE has finalized the plan. */
  private def formattedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.count()
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("topk plans as TakeOrderedAndProject, not a global sort") {
    assert(plan("topk").contains("TakeOrderedAndProject"))
  }

  test("join_multi top-10 also plans as TakeOrderedAndProject") {
    assert(plan("join_multi").contains("TakeOrderedAndProject"))
  }

  test("join_broadcast uses BroadcastHashJoin") {
    assert(plan("join_broadcast").contains("BroadcastHashJoin"))
  }

  test("join_5way broadcasts every dimension (single fact-side shuffle)") {
    val p = plan("join_5way")
    assert(p.contains("BroadcastHashJoin"))
    // orders⋈lineitem is the only shuffle join allowed
    val sortMerge = "SortMergeJoin".r.findAllIn(p).size
    val shuffledHash = "ShuffledHashJoin".r.findAllIn(p).size
    assert(sortMerge + shuffledHash <= 1,
      s"expected ≤1 shuffle join, plan:\n$p")
  }

  test("proj_filter pushes predicate and prunes columns at the scan") {
    val p = formattedPlan("proj_filter")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // pruned read schema: only the 6 referenced columns, not all 11
    val scanSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_tax"), scanSchema)
  }

  test("partitioned read prunes partitions on the filter") {
    val path = Catalog.scratch(sf, "orders_by_year")
    Tables.orders(spark, sf)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    val df = spark.read.parquet(path).filter(col("o_year") === 1996)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters"), p)
    // pruned scan reads strictly fewer files than the full table
    val all = spark.read.parquet(path).inputFiles.length
    val scan = df.queryExecution.executedPlan.collectLeaves()
      .collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.totalNumberOfFiles
      }
    assert(scan.exists(_ < all), s"scan=$scan all=$all")
  }

  test("agg_hash is a two-phase hash aggregate (partial + final)") {
    val p = plan("agg_hash")
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("custom WrapAffine expression registers as a SQL function") {
    import graft.functions.WrapAffine
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "wrap_affine", exprs => WrapAffine(exprs.head, 3L, 7L), "scala_udf")
    val r = spark.sql("SELECT wrap_affine(9L) AS v").collect()(0).getLong(0)
    assert(r == 3L * 9L + 7L)
    // wrap-around (the whole point): Long.MaxValue * 3 + 7 must not throw
    val big = spark.sql(s"SELECT wrap_affine(${Long.MaxValue}L) AS v")
      .collect()(0).getLong(0)
    assert(big == Long.MaxValue * 3L + 7L)
  }

  test("dedup_near: fused kernel once, shuffle-free signature stage") {
    // the banded frame is checkpointed inside nearDupPairs (so the
    // pipeline runs once across the size-split branches), which
    // truncates lineage — audit the signature stage on its own plan
    val sigPlan = queries.Dedup.bands(queries.Dedup.sigArray(
        Tables.documents(spark, sf)))
      .queryExecution.executedPlan.toString
    assert(sigPlan.contains("minhash_sig"),
      "signature stage must use the fused MinHashSig kernel")
    assert(!sigPlan.contains("Exchange hash"),
      s"signature stage must be a pure map — no shuffle:\n${sigPlan.take(1200)}")
    // the candidate stage's grouped-vs-self-join routing sits behind
    // two checkpoints (banded + pairs) and is invisible to whole-query
    // plans; DedupSpec's oversized-bucket test pins that behavior.
    // What remains visible is the verify stage: it must join the
    // checkpointed pair/shingle slices, never re-derive the corpus.
    val plan = SparkEntry.queries("dedup_near")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("minhash_sig"),
      "verify stage must read checkpointed candidates, not recompute " +
        s"the signature pipeline:\n${plan.take(1200)}")
  }

  test("label-propagation round: one join + one aggregation, no cartesian") {
    // nearDupComponents checkpoints between rounds, which truncates
    // lineage and hides the per-round shape from the whole-query plan
    // audit — so the step is audited on its own
    import org.apache.spark.sql.functions.lit
    val labels = spark.range(6).select(col("id").as("doc_id"),
      col("id").as("label"))
    val bidir = spark.range(5).select(col("id").as("d1"),
      (col("id") + lit(1)).as("d2"))
    val plan = queries.Dedup.propagateStep(labels, bidir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
    val shuffles = "Exchange (hash|range|Single)".r.findAllIn(plan).size
    assert(shuffles <= 4,
      s"propagation round plans $shuffles shuffles (> 4):\n${plan.take(800)}")
  }

  test("dedup_simhash: per-row fused signature, no token-table shuffle join") {
    val sigPlan = queries.Dedup.simhashBanded(Tables.documents(spark, sf))
      .queryExecution.executedPlan.toString
    assert(sigPlan.contains("simhash60"),
      "signature stage must use the fused SimHash60 kernel")
    assert(!sigPlan.contains("Exchange hash"),
      s"signature stage must be a pure map — no shuffle:\n${sigPlan.take(1200)}")
    val plan = SparkEntry.queries("dedup_simhash")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("collect_list"),
      s"small-bucket candidates must come from grouped expansion:\n" +
        plan.take(1200))
  }

  test("AQE + skew-join handling are armed (the 100 TB skew path)") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
    assert(spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled") == "true")
  }

  test("whole-stage codegen covers the proj_filter pipeline") {
    import org.apache.spark.sql.execution.WholeStageCodegenExec
    assert(spark.conf.get("spark.sql.codegen.wholeStage") == "true")
    // AQE wraps stages lazily and hides codegen nodes from the stored
    // plan; inspect the non-adaptive physical plan for the codegen spans.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("proj_filter")(spark, sf)
      val codegenNodes = df.queryExecution.executedPlan
        .collect { case w: WholeStageCodegenExec => w }
      assert(codegenNodes.nonEmpty,
        df.queryExecution.executedPlan.toString.take(800))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("tpch_q6 pushes all three filters into the parquet scan") {
    val p = formattedPlan("tpch_q6")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), p)
    assert(p.contains("GreaterThanOrEqual(l_discount"), p)
    assert(p.contains("LessThan(l_quantity"), p)
    // scan reads only the 4 referenced lineitem columns
    val scanSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanSchema.contains("l_orderkey"), scanSchema)
  }

  test("tpch_q3/q10/q18 top-k plan as TakeOrderedAndProject") {
    Seq("tpch_q3", "tpch_q10", "tpch_q18").foreach { q =>
      assert(plan(q).contains("TakeOrderedAndProject"), q)
    }
  }

  test("tpch_q5/q8 star joins broadcast every dimension") {
    Seq("tpch_q5", "tpch_q8").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), q)
      val shuffleJoins = "SortMergeJoin".r.findAllIn(p).size +
        "ShuffledHashJoin".r.findAllIn(p).size
      assert(shuffleJoins <= 1, s"$q: $shuffleJoins shuffle joins\n$p")
    }
  }

  test("CBO: ANALYZE'd column stats drive star-join reorder + unhinted " +
    "broadcasts (SURVEY §4.2)") {
    // temp views carry no catalog stats — ANALYZE needs real catalog
    // tables, so materialize the five star tables once (sf0.001, tiny)
    val tabs = Seq("lineitem", "orders", "customer", "nation", "region")
    def dropAll(): Unit = tabs.foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS graft_cbo_$t")
      // a previous JVM's managed-table location survives the in-memory
      // catalog — clear it or saveAsTable fails LOCATION_ALREADY_EXISTS
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), s"graft_cbo_$t")
      if (loc.exists())
        org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    dropAll()
    tabs.foreach { t =>
      Tables.t(spark, sf, t).write.saveAsTable(s"graft_cbo_$t")
      spark.sql(s"ANALYZE TABLE graft_cbo_$t COMPUTE STATISTICS " +
        "FOR ALL COLUMNS")
    }
    try {
    // deliberately fact-first literal order: a syntactic planner keeps
    // it; the cost-based reorder should restructure the tree from the
    // per-relation row counts the ANALYZE wrote
    val starSql =
      """SELECT r_name, count(*) AS n FROM graft_cbo_lineitem l
        |JOIN graft_cbo_orders o   ON l.l_orderkey = o.o_orderkey
        |JOIN graft_cbo_customer c ON o.o_custkey = c.c_custkey
        |JOIN graft_cbo_nation n   ON c.c_nationkey = n.n_nationkey
        |JOIN graft_cbo_region r   ON n.n_regionkey = r.r_regionkey
        |GROUP BY r_name""".stripMargin
    def joinTree(cbo: Boolean): String = {
      val keys = Seq("spark.sql.cbo.enabled",
        "spark.sql.cbo.joinReorder.enabled")
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      try {
        keys.foreach(k => spark.conf.set(k, cbo.toString))
        spark.sql(starSql).queryExecution.optimizedPlan.toString
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val cboTree = joinTree(cbo = true)
    val syntacticTree = joinTree(cbo = false)
    assert(cboTree != syntacticTree,
      "cost-based reorder must restructure the fact-first join tree:\n" +
        cboTree)
    // stats actually reached the leaves: every ANALYZE'd relation
    // reports an exact row count through the CBO stats visitor
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val leaves = spark.sql(starSql).queryExecution.optimizedPlan
        .collectLeaves()
      val expected = tabs.map(t =>
        Tables.t(spark, sf, t).count()).sorted
      val reported = leaves.flatMap(_.stats.rowCount).map(_.toLong).sorted
      assert(reported == expected,
        s"leaf rowCount stats $reported != table counts $expected")
      // physical: stats (not hints) pick broadcast for every dim — the
      // fact-side join is the only shuffle join allowed
      val phys = spark.sql(starSql).queryExecution.executedPlan.toString
      assert(!starSql.contains("broadcast"), "no hints in the SQL")
      assert("BroadcastHashJoin".r.findAllIn(phys).size == 4,
        s"all 4 dims must broadcast:\n$phys")
      assert("SortMergeJoin".r.findAllIn(phys).size +
        "ShuffledHashJoin".r.findAllIn(phys).size <= 1, phys)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None => spark.conf.unset("spark.sql.cbo.enabled")
    }
    } finally dropAll()
  }

  test("cached view scans InMemoryTableScan and uncaches cleanly") {
    val v = "graft_cache_probe"
    Tables.nation(spark, sf).createOrReplaceTempView(v)
    spark.catalog.cacheTable(v)
    try {
      val df = spark.table(v).filter(col("n_regionkey") === 0)
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("In-memory table"))
      assert(spark.catalog.isCached(v))
    } finally {
      spark.catalog.uncacheTable(v)
      assert(!spark.catalog.isCached(v))
      spark.catalog.dropTempView(v)
    }
  }

  test("runtime bloom-filter injection prunes the probe side of a " +
    "shuffle join (the 100 TB row-level runtime filter)") {
    // At cluster scale a selective dim-side filter should reach the fact
    // scan as an injected bloom might_contain BEFORE the shuffle. Local
    // thresholds (10 GB probe-side scan) are sized for clusters, so the
    // test arms the optimizer the way a deployment would and pins that
    // the rewrite actually fires on our join shape.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle join
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val ord = Tables.orders(spark, sf)
        .filter(col("o_totalprice") > 300000)
      val joined = Tables.lineitem(spark, sf)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected bloom runtime filter on lineitem:\n" +
          p.take(1500))
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dynamic partition pruning: the dim filter reaches the " +
    "partitioned fact scan as a runtime subquery (star-schema DPP)") {
    // join_dpp's pruning literal only exists after scanning the dim, so
    // static pruning cannot help — the optimizer must inject a
    // dynamicpruning subquery on the fact's partition column (reusing
    // the dim's broadcast exchange). useStats=false because the local
    // fixture has no table stats for the benefit estimate; a warehouse
    // deployment has ANALYZE stats and keeps the default.
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val df = SparkEntry.queries("join_dpp")(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("dynamicpruning"),
        s"expected a dynamicpruning subquery on the fact scan:\n${p.take(2000)}")
      // the fact scan must touch only the 2 'alert' directories of 5
      def flatten(pl: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.SparkPlan] =
        (pl +: pl.children.flatMap(flatten)) ++ (pl match {
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
            flatten(q.plan)
          case a: org.apache.spark.sql.execution.adaptive
              .AdaptiveSparkPlanExec => flatten(a.executedPlan)
          case _ => Nil
        })
      val factScan = flatten(df.queryExecution.executedPlan).collectFirst {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.partitionFilters.exists(
              _.toString.contains("dynamicpruning")) => f
      }
      assert(factScan.nonEmpty, "no dynamically-pruned fact scan found")
      val parts = factScan.get.metrics.get("numPartitions").map(_.value)
      assert(parts.contains(2L),
        s"fact scan read $parts partitions — expected exactly the 2 " +
          "dim-selected ones of 5")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join splits a pathologically skewed shuffle join at " +
    "runtime (the no-code-change alternative to manual salting)") {
    // 90% of the left side lands on ONE key — the shape that stalls a
    // cluster on a single straggler task. With thresholds sized to the
    // test data, AQE must detect the skew post-shuffle and split the
    // oversized partition (plan shows an AQEShuffleRead marked skewed
    // + coalesced). join_skew_salted demonstrates the manual fix; this
    // pins the automatic one.
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select(when(col("id") % 10 < 9, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload_"), col("id")).as("p"))
      val right = spark.range(5000).select(col("id").as("k"),
        col("id").as("v"))
      val joined = left.join(right, "k")
      // collect() (not count()) — count() builds a separate plan and
      // leaves THIS queryExecution unfinalized (isFinalPlan=false)
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") && p.contains("skewed"),
        s"expected an AQE skew-split join + shuffle read:\n${p.take(1500)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("tpch_q4/q21/q22 decorrelate EXISTS into semi/anti joins") {
    val q4 = plan("tpch_q4")
    assert(q4.contains("LeftSemi"), q4)
    val q21 = plan("tpch_q21")
    assert(q21.contains("LeftSemi") && q21.contains("LeftAnti"), q21)
    val q22 = plan("tpch_q22")
    assert(q22.contains("LeftAnti"), q22)
  }
}
