package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped query suite over the driver's TPC-H-ish star schema.
  *
  * The reference's tables expose the full dask.dataframe surface, and the
  * canonical workload for "a user could run every query they run today"
  * over this exact schema is TPC-H. All 22 queries run here: the
  * fixture set ships no `partsupp`, so the five price/availability
  * queries (Q2, Q9, Q11, Q16, Q20) run over [[partsupp]], a table
  * derived deterministically from lineitem that the DuckDB oracle
  * reconstructs bit-identically.
  * Adaptations to the columns that exist: no l_commitdate/l_receiptdate
  * → lateness is proxied as "shipped > 60 days after order date"; no
  * l_shipmode → Q12's two-mode IN list runs over l_returnflag; no
  * o_shippriority → o_orderpriority; no c_phone → country code from the
  * customer-name suffix; no p_container → p_size bands; no p_mfgr →
  * p_brand; no s_comment → a deterministic s_suppkey residue for Q16's
  * complaints set. What each query *exercises* is unchanged — the
  * famous optimizer shapes:
  *
  *  - Q4/Q21/Q22: correlated EXISTS / NOT EXISTS → decorrelated
  *    left-semi / left-anti joins (RewritePredicateSubquery);
  *  - Q17/Q22: correlated scalar aggregate subqueries → aggregate+join
  *    (expressed pre-decorrelated in the DataFrame bodies — the exact
  *    plan Catalyst rewrites the SQL form into);
  *  - Q18: IN over a grouped-HAVING subquery → left-semi;
  *  - Q19: disjunction of conjunctions as a join predicate (pushed into
  *    a broadcast hash join's post-condition, not a cartesian filter);
  *  - Q5/Q7/Q8: multi-way star joins with cross-dimension correlation
  *    (c_nationkey = s_nationkey), directional nation pairs, and
  *    conditional market-share aggregation;
  *  - Q1/Q6/Q14: wide scan aggregates with exact-decimal money sums;
  *  - Q3/Q10: join → agg → TakeOrderedAndProject top-k;
  *  - Q13: outer join with an ON-clause filter + two-level aggregation;
  *  - Q15: aggregate view joined against its own global max.
  *
  * Scale notes (100 TB): every dimension side (customer, part, supplier,
  * nation, region, the q15 max, the q22 avg) is broadcast — the lineitem
  * fact table shuffles only for its own aggregations; semi/anti joins
  * ship only keys; top-k is TakeOrderedAndProject (per-partition heaps,
  * never a global sort). Money sums follow graft.Det's order-independent
  * decimal scheme, so results are partitioning-invariant — a correctness
  * property AND the thing that makes plans freely re-shufflable by AQE.
  */
object TpcH {

  import Det._

  private val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
  private val sqlRev = "l_extendedprice * (1.0 - l_discount)"

  /** Exact sum of price·(1−disc)·(1+tax): the true product has 6
    * decimals (2+2+2), so the double product (≤1-ulp ≈ 2e-11 off at 1e5
    * magnitude) rounds exactly back onto the scale-6 grid — same
    * argument as Det.dsum's 4-decimal case, one factor deeper. */
  private val charge =
    col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
      (lit(1.0) + col("l_tax"))
  private val sqlCharge =
    "l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)"

  def decls: Seq[Decl] = Seq(

    // Q1: pricing summary report — the full form of agg_hash (adds the
    // tax-compounded charge and the three averages).
    Decl("tpch_q1",
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sqlSum("l_quantity")} AS sum_qty,
         |  ${sqlSum("l_extendedprice")} AS sum_base_price,
         |  ${sqlSum(sqlRev)} AS sum_disc_price,
         |  ${sqlSum(sqlCharge)} AS sum_charge,
         |  ${sqlAvg("l_quantity")} AS avg_qty,
         |  ${sqlAvg("l_extendedprice")} AS avg_price,
         |  ${sqlAvg("l_discount")} AS avg_disc,
         |  COUNT(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(rev).as("sum_disc_price"),
          dsum(charge).as("sum_charge"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Q3: shipping priority — segment-filtered join → agg → top-10 by
    // revenue (TakeOrderedAndProject; revenue doubles are identical in
    // both engines, l_orderkey breaks any tie).
    Decl("tpch_q3",
      s"""SELECT l_orderkey, ${sqlSum(sqlRev)} AS revenue,
         |  strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < TIMESTAMP '1998-06-01'
         |  AND l_shipdate > TIMESTAMP '1998-06-01'
         |GROUP BY l_orderkey, odate, o_orderpriority
         |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1998-06-01").cast("timestamp"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") < lit("1998-06-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
            .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), dateStr(col("o_orderdate")).as("odate"),
          col("o_orderpriority"))
        .agg(dsum(rev).as("revenue"))
        .select("l_orderkey", "revenue", "odate", "o_orderpriority")
        .orderBy(desc("revenue"), col("l_orderkey")).limit(10)
    },

    // Q4: order priority checking — correlated EXISTS with a non-equi
    // lateness condition, decorrelated to a left-semi join (lateness
    // proxy: any line shipped >60 days after the order date).
    Decl("tpch_q4",
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      o.join(Tables.lineitem(s, d),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    },

    // Q5: local supplier volume — the star join with the cross-dimension
    // correlation c_nationkey = s_nationkey (customer and supplier from
    // the same nation). Adapted: no order-date window (the sf0.001
    // contract needs rows; the date filter is orthogonal to the shape).
    Decl("tpch_q5",
      s"""SELECT n_name, ${sqlSum(sqlRev)} AS revenue
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey")
            && col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(rev).as("revenue"))
        .orderBy(desc("revenue"), col("n_name"))
    },

    // Q6: forecasting revenue change — pure scan aggregate; the filter
    // triple reaches the parquet scan (PushedFilters), and the money sum
    // is the exact two-factor decimal product.
    Decl("tpch_q6",
      s"""SELECT ${sqlSumProd2("l_extendedprice", "l_discount")} AS revenue
         |FROM lineitem
         |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1997-01-01'
         |  AND l_discount BETWEEN 0.02 AND 0.04 AND l_quantity < 24""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp")
          && col("l_discount").between(0.02, 0.04) && col("l_quantity") < 24)
        .agg(dsumProd2(col("l_extendedprice"), col("l_discount")).as("revenue"))
    },

    // Q7: volume shipping — directional nation pairs (both directions of
    // NATION_3 ↔ NATION_8) by ship year.
    Decl("tpch_q7",
      s"""SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
         |  year(l_shipdate) AS l_year, ${sqlSum(sqlRev)} AS revenue
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_8')
         |    OR (n1.n_name = 'NATION_8' AND n2.n_name = 'NATION_3'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY cust_nation, supp_nation, l_year
         |ORDER BY cust_nation, supp_nation, l_year""".stripMargin) { (s, d) =>
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("c_nationkey") === col("c_nk"))
        .join(n2, col("s_nationkey") === col("s_nk"))
        .filter((col("cust_nation") === "NATION_3" && col("supp_nation") === "NATION_8")
          || (col("cust_nation") === "NATION_8" && col("supp_nation") === "NATION_3"))
        .groupBy(col("cust_nation"), col("supp_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(dsum(rev).as("revenue"))
        .orderBy("cust_nation", "supp_nation", "l_year")
    },

    // Q8: national market share — conditional numerator over the total,
    // per order year (share of NATION_3 suppliers in EUROPE-customer
    // ECONOMY-part revenue). The ratio divides two identical doubles.
    Decl("tpch_q8",
      s"""SELECT year(o_orderdate) AS o_year,
         |  ${sqlSum(s"CASE WHEN n2.n_name = 'NATION_3' THEN $sqlRev ELSE 0.0 END")} /
         |    ${sqlSum(sqlRev)} AS mkt_share
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN part ON p_partkey = l_partkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
         |GROUP BY o_year ORDER BY o_year""".stripMargin) { (s, d) =>
      val n1 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk")))
      val n2 = broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(s, d).filter(col("p_type") === "ECONOMY"),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey"))
        .join(n1, col("c_nationkey") === col("c_nk"))
        .join(n2, col("s_nationkey") === col("s_nk"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("c_rk") === col("r_regionkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg((dsum(when(col("supp_nation") === "NATION_3", rev).otherwise(0.0)) /
          dsum(rev)).as("mkt_share"))
        .orderBy("o_year")
    },

    // Q10: returned item reporting — revenue lost to returns per
    // customer over a quarter-window, top-20 (TakeOrderedAndProject).
    Decl("tpch_q10",
      s"""SELECT c_custkey, c_name, ${sqlSum(sqlRev)} AS revenue,
         |  c_acctbal, n_name
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN nation ON c_nationkey = n_nationkey
         |WHERE l_returnflag = 'R'
         |  AND o_orderdate >= TIMESTAMP '1997-01-01'
         |  AND o_orderdate < TIMESTAMP '1997-07-01'
         |GROUP BY c_custkey, c_name, c_acctbal, n_name
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp")
              && col("o_orderdate") < lit("1997-07-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(rev).as("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(desc("revenue"), col("c_custkey")).limit(20)
    },

    // Q12: shipping-mode priority split — join + conditional
    // aggregation by category. Adapted: no l_shipmode/l_receiptdate
    // columns exist, so the mode is proxied by l_returnflag (two of its
    // three values, mirroring Q12's two-mode IN list) and lateness by
    // the same shipped->60-days-after-order proxy Q4/Q21 use. The shape
    // is unchanged: fact⋈orders with the selective line-side filters
    // pushed to the scan, then CASE-conditional counts per mode.
    Decl("tpch_q12",
      """SELECT l_returnflag AS l_shipmode,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |      THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_returnflag IN ('A', 'R')
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin) { (s, d) =>
      val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R")
          && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(Tables.orders(s, d),
          col("l_orderkey") === col("o_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .groupBy(col("l_returnflag").as("l_shipmode"))
        .agg(
          sum(when(urgent, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!urgent, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_shipmode")
    },

    // Q13: customer order-count distribution — outer join with the
    // filter in the ON clause (kept rows still count as 0), then a
    // second aggregation over the first's result.
    Decl("tpch_q13",
      """SELECT c_count, COUNT(*) AS custdist
        |FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) dist
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin) { (s, d) =>
      Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey")
            && col("o_orderpriority") =!= "1-URGENT", "left")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    },

    // Q14: promotion effect — conditional-over-total revenue percentage
    // for PROMO-type parts in one ship month.
    Decl("tpch_q14",
      s"""SELECT 100.0 * ${sqlSum(s"CASE WHEN p_type = 'PROMO' THEN $sqlRev ELSE 0.0 END")} /
         |    ${sqlSum(sqlRev)} AS promo_revenue
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= TIMESTAMP '1996-09-01'
         |  AND l_shipdate < TIMESTAMP '1996-10-01'""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp")
          && col("l_shipdate") < lit("1996-10-01").cast("timestamp"))
        .join(Tables.part(s, d),
          col("l_partkey") === col("p_partkey"))
        .agg((lit(100.0) *
          dsum(when(col("p_type") === "PROMO", rev).otherwise(0.0)) /
          dsum(rev)).as("promo_revenue"))
    },

    // Q15: top supplier — quarterly revenue per supplier, kept where it
    // equals the global max (broadcast single-row max, exact-double
    // equality on identically-computed sums).
    Decl("tpch_q15",
      s"""WITH rev AS (SELECT l_suppkey AS supplier_no,
         |    ${sqlSum(sqlRev)} AS total_revenue
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = supplier_no
         |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin) { (s, d) =>
      val rv = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .groupBy(col("l_suppkey").as("supplier_no"))
        .agg(dsum(rev).as("total_revenue"))
      rv.join(broadcast(rv.agg(max(col("total_revenue")).as("mx"))))
        .filter(col("total_revenue") === col("mx"))
        .join(Tables.supplier(s, d),
          col("s_suppkey") === col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    },

    // Q17: small-quantity-order revenue — the correlated per-part
    // average-quantity scalar subquery, written pre-decorrelated
    // (aggregate + join: exactly the plan Catalyst rewrites the
    // correlated SQL into). Adapted threshold 0.5·avg (0.2 matches no
    // rows at sf0.001).
    Decl("tpch_q17",
      s"""SELECT ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE p_brand = 'Brand#13'
         |  AND l_quantity < (SELECT 0.5 * ${sqlAvg("l2.l_quantity")}
         |    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val avgQ = li.groupBy(col("l_partkey").as("ap_key"))
        .agg((lit(0.5) * davg(col("l_quantity"))).as("qty_lim"))
      li.join(Tables.part(s, d).filter(col("p_brand") === "Brand#13"),
          col("p_partkey") === col("l_partkey"))
        .join(avgQ, col("ap_key") === col("l_partkey"))
        .filter(col("l_quantity") < col("qty_lim"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
    },

    // Q18: large-volume customers — IN over a grouped-HAVING subquery
    // (left-semi after decorrelation); quantity sums are integer-valued
    // doubles, exact in both engines.
    Decl("tpch_q18",
      """SELECT c_custkey, c_name, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS odate, o_totalprice,
        |  SUM(l_quantity) AS sum_qty
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |  GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
        |GROUP BY c_custkey, c_name, o_orderkey, odate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("sq"))
        .filter(col("sq") > 250)
        .select(col("l_orderkey").as("big_key"))
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("big_key"), "left_semi")
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("o_orderkey"),
          dateStr(col("o_orderdate")).as("odate"), col("o_totalprice"))
        .agg(sum(col("l_quantity")).as("sum_qty"))
        .orderBy(desc("o_totalprice"), col("o_orderkey")).limit(100)
    },

    // Q19: discounted revenue — a disjunction of brand/size/quantity
    // conjunctions as the join predicate; Catalyst keeps the equi-key
    // (partkey) for a broadcast hash join and evaluates the OR as the
    // join's residual condition (p_size bands proxy p_container).
    Decl("tpch_q19",
      s"""SELECT ${sqlSum(sqlRev)} AS revenue
         |FROM lineitem JOIN part ON p_partkey = l_partkey
         |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
         |    AND l_quantity BETWEEN 1 AND 21)
         |  OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
         |    AND l_quantity BETWEEN 10 AND 30)
         |  OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
         |    AND l_quantity BETWEEN 20 AND 40)""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d),
          col("p_partkey") === col("l_partkey")
            && ((col("p_brand") === "Brand#12"
              && col("p_size").between(1, 15)
              && col("l_quantity").between(1, 21))
            || (col("p_brand") === "Brand#23"
              && col("p_size").between(1, 25)
              && col("l_quantity").between(10, 30))
            || (col("p_brand") === "Brand#34"
              && col("p_size").between(1, 35)
              && col("l_quantity").between(20, 40))))
        .agg(dsum(rev).as("revenue"))
    },

    // Q21: suppliers who kept orders waiting — the EXISTS + NOT EXISTS
    // pair over the same fact table (left-semi then left-anti), with the
    // lateness proxy. A supplier is "waiting-guilty" on an F-order line
    // it shipped late, where the order has other suppliers' lines but
    // none of THEM shipped late.
    Decl("tpch_q21",
      """SELECT s_name, COUNT(*) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY s_name ORDER BY numwait DESC, s_name""".stripMargin) { (s, d) =>
      val li = Tables.lineitem(s, d)
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("sd3"))
      li.join(Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
        .join(l2, col("k2") === col("l_orderkey")
          && col("s2") =!= col("l_suppkey"), "left_semi")
        .join(l3, col("k3") === col("l_orderkey")
          && col("s3") =!= col("l_suppkey")
          && col("sd3") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_anti")
        .join(Tables.supplier(s, d),
          col("s_suppkey") === col("l_suppkey"))
        .groupBy("s_name")
        .agg(count(lit(1)).as("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
    },

    // Q22: global sales opportunity — above-average account balance
    // (broadcast scalar aggregate) with no recent orders (left-anti);
    // country code proxied by the customer-name suffix (no c_phone).
    Decl("tpch_q22",
      s"""SELECT right(c_name, 2) AS cntrycode, COUNT(*) AS numcust,
         |  ${sqlSum("c_acctbal")} AS totacctbal
         |FROM customer
         |WHERE c_acctbal > (SELECT ${sqlAvg("c_acctbal")} FROM customer
         |  WHERE c_acctbal > 0.0)
         |  AND NOT EXISTS (SELECT 1 FROM orders
         |    WHERE o_custkey = c_custkey
         |      AND o_orderdate >= TIMESTAMP '2000-01-01')
         |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin) { (s, d) =>
      val cust = Tables.customer(s, d)
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg(davg(col("c_acctbal")).as("avg_bal"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(Tables.orders(s, d)
            .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .groupBy(expr("right(c_name, 2)").as("cntrycode"))
        .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy("cntrycode")
    },

    // Q2: minimum-cost supplier — for every sized/typed part in a
    // region, the supplier(s) at the part's minimum supply cost. The
    // min is a window over the part group (one shuffle on ps_partkey);
    // identical doubles both engines make the cost==min filter exact.
    // (s_name, p_partkey) is unique per row → the ORDER BY is total.
    Decl("tpch_q2",
      s"""WITH $sqlPartsupp,
         |j AS (SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
         |    ps_supplycost,
         |    min(ps_supplycost) OVER (PARTITION BY p_partkey) AS mc
         |  FROM partsupp
         |  JOIN part ON p_partkey = ps_partkey
         |  JOIN supplier ON s_suppkey = ps_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey
         |  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'
         |    AND r_name = 'EUROPE')
         |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
         |  ps_supplycost
         |FROM j WHERE ps_supplycost = mc
         |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val j = partsupp(s, d)
        .join(Tables.part(s, d)
            .filter(col("p_size").between(10, 20) && col("p_type") === "LARGE"),
          col("p_partkey") === col("ps_partkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("ps_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
          col("n_regionkey") === col("r_regionkey"))
        .withColumn("mc",
          min(col("ps_supplycost")).over(Window.partitionBy("p_partkey")))
      j.filter(col("ps_supplycost") === col("mc"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
          "ps_supplycost")
        .orderBy(desc("s_acctbal"), col("n_name"), col("s_name"),
          col("p_partkey"))
        .limit(100)
    },

    // Q9: product-type profit — revenue minus supply cost, per nation
    // and order year. The profit difference sits ≤2 ulp off its exact
    // 4-decimal value, so the scale-6 decimal sum is identical in both
    // engines (same argument as the q1 charge).
    Decl("tpch_q9",
      s"""WITH $sqlPartsupp
         |SELECT n_name AS nation, year(o_orderdate) AS o_year,
         |  ${sqlSum(s"$sqlRev - ps_supplycost * l_quantity")} AS sum_profit
         |FROM lineitem
         |JOIN part ON p_partkey = l_partkey
         |JOIN supplier ON s_suppkey = l_suppkey
         |JOIN partsupp ON ps_partkey = l_partkey
         |  AND ps_suppkey = l_suppkey
         |JOIN orders ON o_orderkey = l_orderkey
         |JOIN nation ON n_nationkey = s_nationkey
         |WHERE p_name LIKE '%widget'
         |GROUP BY n_name, o_year
         |ORDER BY nation, o_year DESC""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("%widget")),
          col("p_partkey") === col("l_partkey"))
        .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
        .join(partsupp(s, d),
          col("ps_partkey") === col("l_partkey")
            && col("ps_suppkey") === col("l_suppkey"))
        .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(dsum(rev - col("ps_supplycost") * col("l_quantity"))
          .as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },

    // Q11: important stock — per-part inventory value in a nation, kept
    // where it exceeds 2× the national average per part (TPC-H's
    // FRACTION rewritten scale-free: the 0.0001/SF literal presumes a
    // known SF; avg·2 expresses the same "disproportionate share" cut
    // at any scale). Both sides of the HAVING are exact-decimal sums →
    // identical doubles → identical cut.
    Decl("tpch_q11",
      s"""WITH $sqlPartsupp,
         |nps AS (SELECT ps_partkey, ps_supplycost * ps_availqty AS v
         |  FROM partsupp
         |  JOIN supplier ON s_suppkey = ps_suppkey
         |  JOIN nation ON n_nationkey = s_nationkey
         |  JOIN region ON r_regionkey = n_regionkey
         |  WHERE r_name = 'EUROPE'),
         |tot AS (SELECT ${sqlSum("v")} / COUNT(DISTINCT ps_partkey) * 2.0
         |    AS cut FROM nps)
         |SELECT ps_partkey, ${sqlSum("v")} AS value
         |FROM nps, tot GROUP BY ps_partkey, cut
         |HAVING ${sqlSum("v")} > cut
         |ORDER BY value DESC, ps_partkey""".stripMargin) { (s, d) =>
      val nps = partsupp(s, d)
        .join(Tables.supplier(s, d), col("s_suppkey") === col("ps_suppkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select(col("ps_partkey"),
          (col("ps_supplycost") * col("ps_availqty")).as("v"))
        // nps feeds both the national-average scalar and the per-part
        // grouping; unpinned, the partsupp scan and its three broadcast
        // joins execute once per consumer (measured plan: 8 table scans
        // for 4 tables). The pin carries only (ps_partkey, v) — the
        // region-filtered fraction of partsupp projected to two columns
        // — so it is the cheap side of the write-once/read-twice trade
        // at any scale (guide §2.4).
        .localCheckpoint(false)
      val tot = nps.agg(
        (dsum(col("v")) / countDistinct(col("ps_partkey")) * 2.0).as("cut"))
      nps.crossJoin(broadcast(tot))
        .groupBy("ps_partkey", "cut")
        .agg(dsum(col("v")).as("value"))
        .filter(col("value") > col("cut"))
        .select("ps_partkey", "value")
        .orderBy(desc("value"), col("ps_partkey"))
    },

    // Q16: parts/supplier relationship — distinct supplier count per
    // (brand, type, size) bucket, excluding one brand/type family and a
    // deterministic "complaints" supplier set (s_suppkey % 10 = 0 — the
    // fixture has no s_comment to LIKE against).
    Decl("tpch_q16",
      s"""WITH $sqlPartsupp
         |SELECT p_brand, p_type, p_size,
         |  COUNT(DISTINCT ps_suppkey) AS supplier_cnt
         |FROM partsupp JOIN part ON p_partkey = ps_partkey
         |WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
         |  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |                         WHERE s_suppkey % 10 = 0)
         |GROUP BY p_brand, p_type, p_size
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin) {
      (s, d) =>
      partsupp(s, d)
        .join(Tables.part(s, d)
            .filter(col("p_brand") =!= "Brand#13"
              && col("p_type") =!= "PROMO"
              && col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)),
          col("p_partkey") === col("ps_partkey"))
        .join(Tables.supplier(s, d).filter(col("s_suppkey") % 10 === 0),
          col("ps_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(countDistinct(col("ps_suppkey")).as("supplier_cnt"))
        .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
          col("p_size"))
    },

    // Q20: potential part promotion — suppliers in a nation whose
    // available quantity exceeds half of what they actually shipped of
    // blue parts in 1997 (correlated scalar subquery expressed
    // pre-decorrelated: the per-(part,supplier) shipped-qty aggregate
    // joins back to partsupp — ship-only-keys semi-join shapes).
    Decl("tpch_q20",
      s"""WITH $sqlPartsupp,
         |shipped AS (SELECT l_partkey AS sk_part, l_suppkey AS sk_supp,
         |    ${sqlSum("l_quantity")} AS qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         |    AND l_shipdate < TIMESTAMP '1998-01-01'
         |  GROUP BY sk_part, sk_supp),
         |bluep AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
         |cand AS (SELECT DISTINCT ps_suppkey
         |  FROM partsupp
         |  JOIN bluep ON p_partkey = ps_partkey
         |  JOIN shipped ON sk_part = ps_partkey AND sk_supp = ps_suppkey
         |  WHERE ps_availqty > 0.5 * qty)
         |SELECT s_name, s_acctbal, n_name
         |FROM supplier JOIN cand ON s_suppkey = ps_suppkey
         |JOIN nation ON n_nationkey = s_nationkey
         |JOIN region ON r_regionkey = n_regionkey
         |WHERE r_name = 'EUROPE'
         |ORDER BY s_name""".stripMargin) { (s, d) =>
      val shipped = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_partkey").as("sk_part"),
          col("l_suppkey").as("sk_supp"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val cand = partsupp(s, d)
        .join(Tables.part(s, d).filter(col("p_name").like("blue%"))
            .select("p_partkey"),
          col("p_partkey") === col("ps_partkey"), "left_semi")
        .join(shipped, col("sk_part") === col("ps_partkey")
          && col("sk_supp") === col("ps_suppkey"))
        .filter(col("ps_availqty") > lit(0.5) * col("qty"))
        .select("ps_suppkey").distinct()
      Tables.supplier(s, d)
        .join(cand, col("s_suppkey") === col("ps_suppkey"), "left_semi")
        .join(broadcast(Tables.nation(s, d)),
          col("n_nationkey") === col("s_nationkey"))
        .join(broadcast(Tables.region(s, d)
            .filter(col("r_name") === "EUROPE")),
          col("r_regionkey") === col("n_regionkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    }
  )

  /** Synthetic `partsupp`, derived deterministically from lineitem (the
    * fixture set ships no partsupp table): one row per distinct
    * (l_partkey, l_suppkey) pair, with ps_availqty and ps_supplycost
    * pure functions of the cross-engine sha60 hash of the pair — the
    * DuckDB oracle rebuilds the byte-identical table from the same
    * parquet ([[sqlPartsupp]]). availqty ∈ [1, 10000]; supplycost ∈
    * [1.00, 1001.00) on the 2-decimal money grid, so cost·qty products
    * round exactly onto Det's scale-6 decimal in both engines. Unlocks
    * Q2, Q9, Q11, Q16, Q20. */
  /** Derived `partsupp`, MATERIALIZED once per (session, data root):
    * five queries consume it, and recomputing the distinct-shuffle +
    * sha-60 projection per query is exactly the repeated-derived-
    * dimension waste a warehouse would avoid by writing the table —
    * which is what this does (scratch parquet; doubles/longs round-trip
    * parquet bit-exactly, so the oracle twin is unaffected). */
  private[graft] def partsupp(s: SparkSession, d: String): DataFrame = {
    val path = graft.Catalog.scratch(d, "partsupp")
    val derived = Tables.lineitem(s, d)
      .select(col("l_partkey").as("ps_partkey"),
        col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("h", graft.functions.XHash.sha60(
        concat_ws("_", col("ps_partkey"), col("ps_suppkey"))))
      .select(col("ps_partkey"), col("ps_suppkey"),
        (col("h") % 10000 + 1).as("ps_availqty"),
        (expr("h div 7 % 100000").cast("double") / 100.0 + 1.0)
          .as("ps_supplycost"))
    graft.Catalog.once(s, d, path) {
      derived.write.mode("overwrite").parquet(path)
    }
    // writer-schema read: scratch readbacks never depend on footer
    // inference (the producer knows what it wrote; inference can race
    // an overwrite's delete window under concurrent sessions/queries
    // and is the one failure mode a schema-explicit read removes)
    s.read.schema(derived.schema).parquet(path)
  }

  /** DuckDB twin of [[partsupp]] as a WITH-clause entry. */
  private val sqlPartsupp: String = {
    val h = graft.functions.XHash.sqlSha60(
      "CAST(ps_partkey AS VARCHAR) || '_' || CAST(ps_suppkey AS VARCHAR)")
    s"""partsupp AS (
       |  SELECT ps_partkey, ps_suppkey,
       |    h % 10000 + 1 AS ps_availqty,
       |    CAST((h // 7) % 100000 AS DOUBLE) / 100.0 + 1.0
       |      AS ps_supplycost
       |  FROM (SELECT ps_partkey, ps_suppkey, $h AS h
       |    FROM (SELECT DISTINCT l_partkey AS ps_partkey,
       |        l_suppkey AS ps_suppkey FROM lineitem)))""".stripMargin
  }
}
