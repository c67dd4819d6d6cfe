package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface (SURVEY.md §2 tier B, rows B1-B10, B17-B20,
  * B30) — the operator set every table loaded by the reference exposes via
  * `dask.dataframe` (filter/assign/merge/groupby/sort/drop_duplicates...),
  * re-expressed as Catalyst-optimized DataFrame plans.
  *
  * Scale notes (100 TB):
  *  - every aggregate here is a partial+final HashAggregate (map-side
  *    combine), never a driver-side reduction;
  *  - dimension joins (`customer`, `part`, `region`...) are broadcast —
  *    explicitly hinted where the dimension is known small, so the big
  *    fact table never shuffles for them;
  *  - fact-fact joins shuffle on the join key only after filters are
  *    pushed below the join by Catalyst;
  *  - top-k uses TakeOrderedAndProject (per-partition heap + driver merge
  *    of k), never a global sort.
  */
object Relational {

  import Det._

  val revenueExpr = "l_extendedprice * (1.0 - l_discount)"

  def decls: Seq[Decl] = Seq(

    // B1: projection + arithmetic + predicate; filter and both projected
    // columns reach the parquet scan (PushedFilters + pruned ReadSchema).
    Decl("proj_filter",
      s"""SELECT l_orderkey, l_linenumber, $revenueExpr AS revenue, l_quantity
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1995-01-01'
         |  AND l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity < 25
         |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-01-01").cast("timestamp")
          && col("l_quantity") < 25)
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          col("l_quantity"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // B2: TPC-H-Q1-style hash aggregate (partial + final).
    Decl("agg_hash",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum(revenueExpr)} AS sum_disc_price,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B3: distinct aggregate (two-phase Expand + agg).
    Decl("agg_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps, COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // B4: HLL approximate distinct — sketches differ per engine, no
    // oracle; its deterministic exact twin is agg_distinct (same group,
    // same key, oracle-exact), and RelationalSpec pins this one within
    // ±5% of that exact count at sf0.001/0.01/0.1.
    Decl.noOracle("agg_approx_distinct") { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"))
        .orderBy("l_returnflag")
    },

    // B5: inner equi join. customer is sf-proportional, so no broadcast
    // hint: AQE converts to broadcast at small SF and falls back to a
    // shuffled join when the dim outgrows executor memory at 100 TB.
    Decl("join_inner",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"), "inner")
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    },

    // B6a: left outer join + aggregate (customers with zero orders kept).
    Decl("join_outer",
      s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
         |  ${sqlSum("coalesce(o_totalprice, 0.0)")} AS sum_price
         |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
         |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders"),
          dsum(coalesce(col("o_totalprice"), lit(0.0))).as("sum_price"))
        .orderBy("c_custkey")
    },

    // B6b: full outer join, null-side accounting.
    Decl("join_outer_full",
      """SELECT COUNT(*) AS n_rows, COUNT(c_custkey) AS n_cust,
        |  COUNT(o_orderkey) AS n_ord
        |FROM customer FULL JOIN orders ON o_custkey = c_custkey""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"), "full")
        .agg(count(lit(1)).as("n_rows"), count(col("c_custkey")).as("n_cust"),
          count(col("o_orderkey")).as("n_ord"))
    },

    // B7: semi/anti join — EXISTS / NOT EXISTS without materializing the
    // right side's columns (no duplication of matches).
    Decl("join_semi_anti",
      """SELECT c_custkey, 'has_orders' AS tag FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |UNION ALL
        |SELECT c_custkey, 'no_orders' AS tag FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY tag, c_custkey""".stripMargin) { (s, d) =>
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val semi = c.join(o, col("o_custkey") === col("c_custkey"), "left_semi")
        .select(col("c_custkey"), lit("has_orders").as("tag"))
      val anti = c.join(o, col("o_custkey") === col("c_custkey"), "left_anti")
        .select(col("c_custkey"), lit("no_orders").as("tag"))
      semi.unionByName(anti).orderBy("tag", "c_custkey")
    },

    // B8: broadcast join — the explicit map-side-join operator: the hint IS
    // the contract (the caller asserts the dimension fits in executor
    // memory), so this is the one deliberate broadcast of an sf-scaled
    // table in the repo; everywhere else AQE decides. lineitem never
    // shuffles here — at 100 TB that is the difference between a map-side
    // join and a full fact-table exchange.
    Decl("join_broadcast",
      s"""SELECT p_brand, ${sqlSum(revenueExpr)} AS revenue, COUNT(*) AS n
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("p_brand")
    },

    // B9: TPC-H-Q3-style 3-way join + agg + top-k revenue.
    Decl("join_multi",
      s"""SELECT l_orderkey, ${sqlSum(revenueExpr)} AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1995-03-15'
         |  AND l_shipdate > TIMESTAMP '1995-03-15'
         |GROUP BY l_orderkey, o_orderdate
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val ord = Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          dateStr(col("o_orderdate")).as("orderdate"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },

    // B10: 6-table star join — only nation/region (fixed 25/5 rows) carry
    // broadcast hints; customer and supplier are sf-proportional so AQE
    // picks their strategy (broadcast at test SF, shuffle at 100 TB).
    // Exercises Catalyst join reordering.
    Decl("join_5way",
      s"""SELECT r_name, n_name, ${sqlSum(revenueExpr)} AS revenue, COUNT(*) AS n
         |FROM region
         |JOIN nation ON n_regionkey = r_regionkey
         |JOIN customer ON c_nationkey = n_nationkey
         |JOIN orders ON o_custkey = c_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      val dim = Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(dim, col("o_custkey") === col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("r_name", "n_name")
    },

    // B17: global sort — range-partitioned SortExec, no single-node funnel.
    Decl("sort_limit",
      """SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderpriority", "o_orderkey")
    },

    // B18: top-k — TakeOrderedAndProject (per-partition heap of k, driver
    // merges k per partition; never a global sort even at 100 TB).
    Decl("topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },

    // B19: set ops — INTERSECT/EXCEPT are distinct-semantic in both
    // engines; implemented as aggregate-based set joins by Catalyst.
    Decl("set_ops",
      """SELECT ck, 'both_years' AS tag FROM (
        |  SELECT o_custkey AS ck FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT ck, 'only_1995' AS tag FROM (
        |  SELECT o_custkey AS ck FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |ORDER BY tag, ck""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val y95 = o.filter(year(col("o_orderdate")) === 1995)
        .select(col("o_custkey").as("ck"))
      val y96 = o.filter(year(col("o_orderdate")) === 1996)
        .select(col("o_custkey").as("ck"))
      y95.intersect(y96).withColumn("tag", lit("both_years"))
        .unionByName(y95.except(y96).withColumn("tag", lit("only_1995")))
        .orderBy("tag", "ck")
    },

    // B20: DISTINCT projection (hash-partitioned dedup, no global sort).
    Decl("dedup_rows",
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    },

    // B3-scale: skew-proof distinct count — two-phase: distinct on
    // (group, key) first (shuffle keyed by BOTH columns, so a heavy
    // group spreads over all partitions), then count per group. The
    // scalable alternative to Expand-based COUNT(DISTINCT) when one
    // group dominates; result is identical, so the oracle is the plain
    // COUNT(DISTINCT).
    Decl("agg_salted_distinct",
      """SELECT l_returnflag, COUNT(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .select("l_returnflag", "l_orderkey")
        .distinct() // phase 1: dedup on the full pair — no skewed key
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_orders")) // phase 2: tiny aggregation
        .orderBy("l_returnflag")
    },

    // B: typed Dataset flavor — case-class Encoders + groupByKey, the
    // compile-time-checked path the reference's pandas dtypes map onto.
    Decl("typed_dataset",
      s"""SELECT l_returnflag,
         |  ${sqlSum("l_quantity")} AS sum_qty, COUNT(*) AS n
         |FROM lineitem WHERE l_quantity < 30
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      import s.implicits._
      val ds = Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"))
        .as[(String, Double)]
      ds.filter(_._2 < 30)
        .groupByKey(_._1)
        .agg(
          dsum(col("l_quantity")).as("sum_qty").as[Double],
          count(lit(1)).as("n").as[Long])
        .toDF("l_returnflag", "sum_qty", "n")
        .orderBy("l_returnflag")
    },

    // B: fillna/dropna surface (dask `df.fillna` / `df.dropna`) — nulls
    // are minted with nullif, then repaired (na.fill) and filtered
    // (na.drop); counts prove both paths.
    Decl("null_handling",
      """WITH n AS (
        |  SELECT nullif(o_orderstatus, 'F') AS st,
        |    CASE WHEN o_totalprice > 200000 THEN NULL
        |         ELSE o_totalprice END AS price
        |  FROM orders)
        |SELECT COUNT(*) AS n_total,
        |  COUNT(st) AS st_nonnull,
        |  CAST(SUM(CASE WHEN coalesce(st, 'FILLED') = 'FILLED'
        |                THEN 1 ELSE 0 END) AS BIGINT) AS st_filled,
        |  COUNT(price) AS n_after_drop,
        |  CAST(CAST(SUM(CAST(coalesce(price, 0.0) AS DECIMAL(30,6)))
        |       AS VARCHAR) AS DOUBLE)
        |    AS sum_filled_price
        |FROM n""".stripMargin) { (s, d) =>
      val withNulls = Tables.orders(s, d).select(
        nullif(col("o_orderstatus"), lit("F")).as("st"),
        when(col("o_totalprice") > 200000, lit(null).cast("double"))
          .otherwise(col("o_totalprice")).as("price"))
      val filled = withNulls.na.fill("FILLED", Seq("st")).na.fill(0.0, Seq("price"))
      val dropped = withNulls.na.drop(Seq("price"))
      withNulls.agg(count(lit(1)).as("n_total"), count(col("st")).as("st_nonnull"))
        .crossJoin(filled.agg(
          sum(when(col("st") === "FILLED", 1L).otherwise(0L)).as("st_filled"),
          dsum(col("price")).as("sum_filled_price")))
        .crossJoin(dropped.agg(count(lit(1)).as("n_after_drop")))
        .select("n_total", "st_nonnull", "st_filled", "n_after_drop",
          "sum_filled_price")
    },

    // B7b: correlated scalar subquery — exercises Catalyst's
    // RewriteCorrelatedScalarSubquery decorrelation (the subquery becomes
    // an aggregate + join, no per-row re-execution). SQL path on both
    // engines; decimal avg keeps the threshold bit-identical.
    Decl("subquery_scalar",
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
         |WHERE o_totalprice > 1.5 * (
         |  SELECT ${sqlAvg("i.o_totalprice")} FROM orders i
         |  WHERE i.o_custkey = o.o_custkey)
         |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      graft.Catalog.registerAll(s, d)
      s.sql(
        s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
           |WHERE o_totalprice > 1.5 * (
           |  SELECT ${sparkSqlAvg("i.o_totalprice")} FROM orders i
           |  WHERE i.o_custkey = o.o_custkey)
           |ORDER BY o_orderkey""".stripMargin)
    },

    // B7c: LATERAL correlated subquery — per-row dependent subquery in
    // FROM (top-2 orders per customer), the SQL form of groupwise-top-k;
    // Catalyst decorrelates it into a window/join plan rather than
    // re-executing per row.
    Decl("join_lateral",
      """SELECT c_custkey, t.o_orderkey, t.o_totalprice
        |FROM customer, LATERAL (
        |  SELECT o_orderkey, o_totalprice FROM orders
        |  WHERE o_custkey = c_custkey
        |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        |ORDER BY c_custkey, o_orderkey""".stripMargin) { (s, d) =>
      graft.Catalog.registerAll(s, d)
      s.sql(
        """SELECT c_custkey, t.o_orderkey, t.o_totalprice
          |FROM customer, LATERAL (
          |  SELECT o_orderkey, o_totalprice FROM orders
          |  WHERE o_custkey = c_custkey
          |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
          |ORDER BY c_custkey, o_orderkey""".stripMargin)
    },

    // B7d: correlated EXISTS / NOT EXISTS in one predicate — the SQL
    // spelling of the semi⋈anti pair. Catalyst's
    // RewritePredicateSubquery decorrelates both into key-only
    // LeftSemi/LeftAnti joins against the same orders scan: at scale,
    // only o_custkey (plus the pushed filter column) ships, never order
    // payloads, and the two subquery scans share the exchange under AQE.
    Decl("subquery_exists",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      graft.Catalog.registerAll(s, d)
      s.sql(
        """SELECT c_custkey, c_name FROM customer c
          |WHERE EXISTS (SELECT 1 FROM orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderpriority = '1-URGENT')
          |  AND NOT EXISTS (SELECT 1 FROM orders o
          |    WHERE o.o_custkey = c.c_custkey
          |      AND o.o_orderstatus = 'F' AND o.o_totalprice > 300000)
          |ORDER BY c_custkey""".stripMargin)
    },

    // B30b: null-safe equality (<=> / IS NOT DISTINCT FROM).
    Decl("null_safe_eq",
      """SELECT
        |  CAST(SUM(CASE WHEN nullif(o_orderstatus, 'F')
        |           IS NOT DISTINCT FROM nullif(o_orderpriority, o_orderpriority)
        |           THEN 1 ELSE 0 END) AS BIGINT) AS both_null,
        |  CAST(SUM(CASE WHEN nullif(o_orderstatus, 'F')
        |           IS NOT DISTINCT FROM 'O' THEN 1 ELSE 0 END) AS BIGINT) AS eq_o
        |FROM orders""".stripMargin) { (s, d) =>
      val st = nullif(col("o_orderstatus"), lit("F"))
      val alwaysNull = nullif(col("o_orderpriority"), col("o_orderpriority"))
      Tables.orders(s, d).agg(
        sum(when(st <=> alwaysNull, 1L).otherwise(0L)).as("both_null"),
        sum(when(st <=> "O", 1L).otherwise(0L)).as("eq_o"))
    },

    // B: melt/unpivot (dask `dd.melt`) — wide measure columns to long
    // (measure, val) rows. Narrow before widening: only the id + measure
    // columns are scanned (pruned ReadSchema), and the 3× row expansion
    // happens after the filter.
    Decl("unpivot",
      """SELECT l_orderkey, l_linenumber, measure, val
        |FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax
        |      FROM lineitem WHERE l_orderkey < 200)
        |UNPIVOT (val FOR measure IN (l_quantity, l_discount, l_tax))
        |ORDER BY l_orderkey, l_linenumber, measure, val""".stripMargin) { (s, d) =>
      // val joins the sort key: (l_orderkey, l_linenumber) is NOT unique
      // in this data, so the measure rows of the duplicates interleave
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 200)
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          "measure", "val")
        .orderBy("l_orderkey", "l_linenumber", "measure", "val")
    },

    // B: ordered string aggregation (dask `groupby().agg(list)` /
    // pandas str join idiom). collect_set is shuffle-order-nondeterministic,
    // so the set is sorted before joining — both engines emit the same
    // canonical string.
    Decl("agg_string_concat",
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
            .as("statuses"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // B: Pearson correlation + sample covariance (dask `df.corr`/`df.cov`)
    // from exact decimal power sums. Built-in corr() reduces doubles in
    // partition order (engine-dependent bits); the five sums here are
    // order-independent decimals, and the final double formula is the
    // identical expression tree on both engines, so the result is
    // bit-exact without rounding.
    Decl("agg_corr", {
      val formula = "(cnt * sxy - sx * sy)"
      s"""WITH s AS (
         |  SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS cnt,
         |    ${sqlSum("l_quantity")} AS sx,
         |    ${sqlSum("l_extendedprice")} AS sy,
         |    ${sqlSumProd2("l_quantity", "l_extendedprice")} AS sxy,
         |    ${sqlSumProd2("l_quantity", "l_quantity")} AS sxx,
         |    ${sqlSumProd2("l_extendedprice", "l_extendedprice")} AS syy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  $formula / (sqrt(cnt * sxx - sx * sx) * sqrt(cnt * syy - sy * sy))
         |    AS corr_qty_price,
         |  $formula / (cnt * (cnt - 1.0)) AS covar_samp,
         |  CAST(cnt AS BIGINT) AS n
         |FROM s ORDER BY l_returnflag""".stripMargin
    }) { (s, d) =>
      val cnt = col("cnt").cast(DoubleType)
      val num = cnt * col("sxy") - col("sx") * col("sy")
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(lit(1)).as("cnt"),
          dsum(col("l_quantity")).as("sx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsumProd2(col("l_quantity"), col("l_extendedprice")).as("sxy"),
          dsumProd2(col("l_quantity"), col("l_quantity")).as("sxx"),
          dsumProd2(col("l_extendedprice"), col("l_extendedprice")).as("syy"))
        .select(col("l_returnflag"),
          (num / (sqrt(cnt * col("sxx") - col("sx") * col("sx")) *
            sqrt(cnt * col("syy") - col("sy") * col("sy"))))
            .as("corr_qty_price"),
          (num / (cnt * (cnt - lit(1.0)))).as("covar_samp"),
          col("cnt").as("n"))
        .orderBy("l_returnflag")
    },

    // B: argmax/argmin per group (pandas `idxmax`, SQL max_by) — via
    // lexicographic MAX over a (score, key) struct, which both engines
    // order identically; built-in max_by leaves ties unspecified, the
    // struct makes the tie-break (higher key wins) part of the value.
    Decl("agg_argmax",
      """SELECT o_custkey,
        |  (MAX(struct_pack(p := o_totalprice, k := o_orderkey))).k
        |    AS best_order,
        |  (MAX(struct_pack(p := o_totalprice, k := o_orderkey))).p
        |    AS best_price,
        |  (MIN(struct_pack(p := o_totalprice, k := o_orderkey))).k
        |    AS worst_order
        |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin) { (s, d) =>
      val rec = struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))
      Tables.orders(s, d)
        .groupBy("o_custkey")
        .agg(max(rec).getField("k").as("best_order"),
          max(rec).getField("p").as("best_price"),
          min(rec).getField("k").as("worst_order"))
        .orderBy("o_custkey")
    },

    // B: weighted mean (pandas `average(weights=)`) — both sums are
    // decimal-exact, the division is one double op on identical inputs,
    // so the ratio is bit-exact without rounding.
    Decl("agg_weighted_avg",
      s"""SELECT l_returnflag,
         |  ${sqlSumProd2("l_quantity", "l_extendedprice")} /
         |    ${sqlSum("l_quantity")} AS wavg_price,
         |  COUNT(*) AS n
         |FROM lineitem GROUP BY l_returnflag
         |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg((dsumProd2(col("l_quantity"), col("l_extendedprice")) /
          dsum(col("l_quantity"))).as("wavg_price"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    },

    // B-scale: explicit salted join — the skew mitigation for a fact⋈fact
    // join with a hot key: the probe side gets a deterministic salt, the
    // build side is replicated once per salt value, and the join key
    // becomes (key, salt) so one hot key spreads over R partitions. The
    // oracle is the plain join — salting must not change the result.
    Decl("join_skew_salted",
      s"""SELECT o_orderpriority, ${sqlSum(revenueExpr)} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val R = 8
      val li = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"),
          pmod(col("l_linenumber"), lit(R)).as("lsalt"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          explode(array((0 until R).map(lit): _*)).as("osalt"))
      li.join(ord,
          col("l_orderkey") === col("o_orderkey") && col("lsalt") === col("osalt"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // B-scale: Bloom-filter pre-join — the explicit form of runtime
    // row-level filtering: a compact sketch of the (selective) build
    // side's keys is broadcast and applied to the probe side BEFORE its
    // shuffle, so non-matching fact rows never hit the wire; the exact
    // join afterwards eliminates the sketch's false positives, so the
    // result (and the plain-join oracle) is exact regardless of fpp.
    Decl("join_bloom_prefilter",
      s"""SELECT o_orderpriority, ${sqlSum(revenueExpr)} AS revenue,
         |  COUNT(*) AS n
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_totalprice > 300000
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      // localCheckpoint, NOT persist: both materialize once for the
      // three consumers (guard count, bloom build, final join), but
      // persist registers the fragment in the session-wide cache
      // manager, which then substitutes an InMemoryRelation into ANY
      // other query containing the same filtered-orders subplan — a
      // global side effect that (measured) blocks InjectRuntimeFilter
      // from seeing the selective filter elsewhere. The checkpoint is
      // private to this frame; the count also sizes the sketch to the
      // actual key population.
      val ord = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
        .localCheckpoint()
      // Spark's bloomFilter NPEs on a zero-row build side; an empty
      // build set means the prefilter passes nothing — same semantics,
      // no sketch (an empty shard/day-zero table must not crash).
      val nBuild = ord.count()
      val pre =
        if (nBuild == 0L) Tables.lineitem(s, d).filter(lit(false))
        else {
          val bf = ord.stat.bloomFilter("o_orderkey", math.max(nBuild, 1L), 0.01)
          val bfBc = s.sparkContext.broadcast(bf)
          val mightContain = udf((k: Long) => bfBc.value.mightContain(k))
          Tables.lineitem(s, d).filter(mightContain(col("l_orderkey")))
        }
      pre
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
          count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },

    // B30: CASE WHEN / coalesce / nullif null handling.
    Decl("conditional",
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'high'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'low' END AS bucket,
        |  coalesce(nullif(o_orderstatus, 'F'), 'FINAL') AS status_or_final
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        when(col("o_totalprice") > 300000, "high")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("low").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("FINAL"))
          .as("status_or_final"))
        .orderBy("o_orderkey")
    }
  )
}
