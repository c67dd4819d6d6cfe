package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window functions + grouping extensions (SURVEY.md §2 rows B14-B16,
  * B21-B23) — the `groupby().rank()/rolling()/shift()/cumsum()` and
  * `pivot_table`/`explode` surface of the reference's dask tables.
  *
  * Determinism: every window ORDER BY carries a unique tiebreak column —
  * without it the frame contents (and thus moving aggregates) are
  * engine-dependent. Cumulative double sums go through the same scale-6
  * decimal trick as grouped sums (DuckDB evaluates running sums with a
  * segment tree, i.e. a different association order than Spark's
  * sequential accumulation).
  *
  * Scale: window functions shuffle once on partitionBy keys; frames are
  * evaluated streaming per partition (no materialization of the whole
  * partition for bounded frames). Skewed partition keys are the one
  * hazard at 100 TB — partitionBy(customer) is fine, partitionBy(nothing)
  * (global windows) is not and is avoided everywhere here.
  */
object Windows {

  import Det._

  def decls: Seq[Decl] = Seq(

    // B14: ranking trio, top-3 orders per customer.
    Decl("window_rank",
      """SELECT * FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn, rank() OVER w AS rk,
        |    dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey
        |               ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).as("rn"), rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    },

    // B15: moving average over a trailing 3-row frame.
    Decl("window_frame",
      """SELECT o_custkey, o_orderkey,
        |  ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mavg
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, 0)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          round(avg(col("o_totalprice")).over(w), 4).as("mavg"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B15b: value-based (RANGE) frame — trailing 90-day spend per
    // customer, bounds on the day number rather than row offsets.
    Decl("window_range",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY date_diff('day',
        |      DATE '1990-01-01', o_orderdate)
        |    RANGE BETWEEN 90 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS spend_90d
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val dayNum = datediff(col("o_orderdate"), lit("1990-01-01"))
      val w = Window.partitionBy("o_custkey").orderBy(dayNum)
        .rangeBetween(-90, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          sum(col("o_totalprice").cast(DecimalType(30, 6))).over(w)
            .cast(DoubleType).as("spend_90d"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B16: lag/lead + cumulative (exact decimal) sum per key.
    Decl("window_analytic",
      """SELECT o_custkey, o_orderkey,
        |  coalesce(lag(o_orderkey) OVER w, -1) AS prev_order,
        |  coalesce(lead(o_orderkey) OVER w, -1) AS next_order,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS cum_spend
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          coalesce(lag(col("o_orderkey"), 1).over(w), lit(-1L)).as("prev_order"),
          coalesce(lead(col("o_orderkey"), 1).over(w), lit(-1L)).as("next_order"),
          sum(col("o_totalprice").cast(DecimalType(30, 6))).over(wcum)
            .cast(DoubleType).as("cum_spend"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // Rank-distribution analytics: percent_rank and cume_dist per
    // priority class over a TOTAL order (price cents, then key). Both
    // are single IEEE divides of exact integer ranks — (rank−1)/(n−1)
    // and rank/n — so cross-engine bit-identical without quantization.
    // Scale: one window shuffle on the partition key, same profile as
    // every other ranked window here.
    Decl("window_cume_dist",
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS prank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT),
        |  o_orderkey)
        |ORDER BY o_orderpriority, prank, o_orderkey""".stripMargin) {
      (s, d) =>
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(cents, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          percent_rank().over(w).as("prank"),
          cume_dist().over(w).as("cdist"))
        .orderBy("o_orderpriority", "prank", "o_orderkey")
    },

    // B21: CUBE over (returnflag, linestatus) — all 4 grouping sets, with
    // a grouping id distinguishing subtotal levels ('(all)' marks rollups).
    Decl("rollup_cube",
      s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
         |  COUNT(*) AS n, ${sqlSum("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY gid, returnflag, linestatus""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("linestatus"),
          col("gid"), col("n"), col("sum_qty"))
        .orderBy("gid", "returnflag", "linestatus")
    },

    // B21b: explicit GROUPING SETS — the third grouping-extension form
    // (rollup/cube cover the hierarchical/full cases), via the SQL path.
    Decl("grouping_sets",
      s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
         |  coalesce(l_linestatus, '(all)') AS linestatus,
         |  COUNT(*) AS n, ${sqlSum("l_extendedprice")} AS sum_price
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY returnflag, linestatus""".stripMargin) { (s, d) =>
      graft.Catalog.registerAll(s, d)
      s.sql(
        s"""SELECT coalesce(l_returnflag, '(all)') AS returnflag,
           |  coalesce(l_linestatus, '(all)') AS linestatus,
           |  COUNT(*) AS n, ${sparkSqlSum("l_extendedprice")} AS sum_price
           |FROM lineitem
           |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
           |ORDER BY returnflag, linestatus""".stripMargin)
    },

    // B22: pivot — day × event_type count matrix. Spark `pivot` plans a
    // single pass (PivotFirst); the oracle is the conditional-agg idiom.
    Decl("pivot",
      """SELECT strftime(ts, '%Y-%m-%d') AS day,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
        |  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
        |  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
        |  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
        |FROM events GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      val types = Seq("click", "error", "purchase", "signup", "view")
      Tables.events(s, d)
        .withColumn("day", dateStr(col("ts")))
        .groupBy("day")
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy("day")
    },

    // B23: explode/unnest with element position (Generate node).
    Decl("explode",
      """SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings WHERE vec_id < 5 ORDER BY vec_id, pos""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 5)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy("vec_id", "pos")
    },

    // B16b: positional window values — first/last/nth over the full
    // partition frame (pandas `groupby().first()/last()/nth()` surface).
    Decl("window_nth",
      """SELECT o_custkey, o_orderkey,
        |  first_value(o_orderkey) OVER w AS first_ord,
        |  last_value(o_orderkey) OVER w AS last_ord,
        |  coalesce(nth_value(o_orderkey, 2) OVER w, -1) AS second_ord
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING
        |               AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("first_ord"),
          last(col("o_orderkey")).over(w).as("last_ord"),
          coalesce(nth_value(col("o_orderkey"), 2).over(w), lit(-1L))
            .as("second_ord"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B23b: null-preserving unnest — rows with empty arrays survive as
    // (pos, val) = NULL, pandas `explode`'s actual semantics (plain
    // explode drops them). Array lengths 0/1/2 are minted from vec_id
    // so the empty case is genuinely exercised; NULLS FIRST is explicit
    // because the engines' default null order differs.
    Decl("explode_outer",
      """WITH src AS (
        |  SELECT vec_id, embedding[1:CAST(vec_id % 3 AS INTEGER)] AS arr
        |  FROM embeddings WHERE vec_id < 30)
        |SELECT vec_id, generate_subscripts(arr, 1) - 1 AS pos,
        |  unnest(arr) AS val
        |FROM src WHERE len(arr) > 0
        |UNION ALL
        |SELECT vec_id, NULL, NULL FROM src
        |WHERE arr IS NULL OR len(arr) = 0
        |ORDER BY vec_id, pos NULLS FIRST""".stripMargin) { (s, d) =>
      Tables.embeddings(s, d)
        .filter(col("vec_id") < 30)
        .select(col("vec_id"),
          expr("slice(embedding, 1, CAST(vec_id % 3 AS INT))").as("arr"))
        .select(col("vec_id"),
          posexplode_outer(col("arr")).as(Seq("pos", "val")))
        .orderBy(col("vec_id"), col("pos").asc_nulls_first)
    },

    // B31c: EXACT type-7 quartiles per group (pandas `quantile`'s
    // default). Built-in percentile interpolates with engine-specific
    // double formulas, so the anchors are picked by row_number and the
    // interpolation `v_lo + (v_hi - v_lo) * frac` is the identical
    // expression tree on both engines; frac ∈ {0,.25,.5,.75} is exact
    // binary, so the quartiles are bit-exact without rounding.
    Decl("agg_percentiles", {
      def q(k: Int, alias: String) =
        s"""max(CASE WHEN i = ((n - 1) * $k) // 4 THEN v END) +
           |  (max(CASE WHEN i = least(((n - 1) * $k) // 4 + 1, n - 1)
           |       THEN v END) -
           |   max(CASE WHEN i = ((n - 1) * $k) // 4 THEN v END)) *
           |  max(CAST(((n - 1) * $k) % 4 AS DOUBLE) / 4.0) AS $alias""".stripMargin
      s"""WITH r AS (
         |  SELECT o_orderpriority, o_totalprice AS v,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice, o_orderkey) - 1 AS i,
         |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders)
         |SELECT o_orderpriority,
         |  ${q(1, "p25")},
         |  ${q(2, "p50")},
         |  ${q(3, "p75")},
         |  CAST(MAX(n) AS BIGINT) AS n_rows
         |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    }) { (s, d) =>
      val wOrd = Window.partitionBy("o_orderpriority")
        .orderBy("v", "o_orderkey")
      val wAll = Window.partitionBy("o_orderpriority")
      def q(k: Int) = expr(
        s"""max(CASE WHEN i = ((n - 1) * $k) div 4 THEN v END) +
           |  (max(CASE WHEN i = least(((n - 1) * $k) div 4 + 1, n - 1)
           |       THEN v END) -
           |   max(CASE WHEN i = ((n - 1) * $k) div 4 THEN v END)) *
           |  max(CAST(((n - 1) * $k) % 4 AS DOUBLE) / 4.0)""".stripMargin)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_totalprice").as("v"),
          col("o_orderkey"))
        .withColumn("i", row_number().over(wOrd) - 1)
        .withColumn("n", count(lit(1)).over(wAll))
        .groupBy("o_orderpriority")
        .agg(q(1).as("p25"), q(2).as("p50"), q(3).as("p75"),
          max(col("n")).as("n_rows"))
        .orderBy("o_orderpriority")
    },

    // B14b: distribution ranking — ntile / percent_rank / cume_dist
    // (pandas `qcut`/`rank(pct=True)` surface). The ratios are integer
    // counts divided per the SQL-standard formulas, so the doubles are
    // bit-identical across engines without rounding.
    Decl("window_ntile",
      """SELECT o_custkey, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |             ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy("o_custkey", "o_orderkey")
    },

    // B: mode / argmax-per-group (pandas `value_counts().idxmax()`) —
    // deterministic tie-break: highest count first, then smallest value.
    Decl("agg_mode",
      """SELECT l_returnflag, l_linestatus AS mode_status, n FROM (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY COUNT(*) DESC, l_linestatus) AS rn
        |  FROM lineitem GROUP BY l_returnflag, l_linestatus)
        |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("l_returnflag")
        .orderBy(col("n").desc, col("l_linestatus"))
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("l_returnflag"), col("l_linestatus").as("mode_status"),
          col("n"))
        .orderBy("l_returnflag")
    },

    // B31b: EXACT median per group (pandas `median`). Built-in median /
    // percentile interpolate with engine-specific formulas ((a+b)/2 vs
    // a+0.5*(b-a) differ in the last bit), so the middle one or two rows
    // are picked by row_number and averaged through the decimal-exact
    // sum/count path — the same davg/sqlAvg contract as everywhere else.
    Decl("agg_median",
      s"""WITH r AS (
         |  SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |                       ORDER BY o_totalprice, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders)
         |SELECT o_orderpriority,
         |  ${sqlSum("o_totalprice")} / COUNT(*) AS median_price,
         |  CAST(MAX(n) AS BIGINT) AS n_rows
         |FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      val wAll = Window.partitionBy("o_orderpriority")
      Tables.orders(s, d)
        .select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") === expr("(n + 1) div 2")
          || col("rn") === expr("(n + 2) div 2"))
        .groupBy("o_orderpriority")
        .agg(davg(col("o_totalprice")).as("median_price"),
          max(col("n")).as("n_rows"))
        .orderBy("o_orderpriority")
    },

    // Running DISTINCT count per user over time — COUNT(DISTINCT) OVER
    // isn't directly supported by Spark windows, so it's built from
    // first-occurrence flags (row_number = 1 per (user, type)) summed
    // cumulatively — two windows over the SAME user-key shuffle, pure
    // integer arithmetic. The standard incremental-cardinality window
    // recipe, and the exact-count sibling of a streaming HLL.
    Decl("window_running_distinct",
      """WITH m AS (SELECT user_id, event_id, ts,
        |    CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
        |      ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen
        |  FROM events)
        |SELECT user_id, event_id, epoch_us(ts) AS tus,
        |  CAST(SUM(first_seen) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS n_distinct
        |FROM m ORDER BY user_id, tus, event_id""".stripMargin) { (s, d) =>
      val wFirst = Window.partitionBy("user_id", "event_type")
        .orderBy("ts", "event_id")
      val wCum = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("first_seen",
          when(row_number().over(wFirst) === 1, 1).otherwise(0))
        .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("tus"),
          sum(col("first_seen")).over(wCum).as("n_distinct"))
        .orderBy("user_id", "tus", "event_id")
    },

    // Rolling correlation of quantity vs price over each supplier's
    // trailing 20 line items — pandas `rolling(20).corr()`. Five
    // windowed DECIMAL power sums over ONE (supplier, ship-order)
    // window (exact, order-independent), then the corr formula on
    // identical doubles; full frames only, zero-variance guarded to
    // NULL symmetrically. Partitioned by supplier (entity-keyed, not
    // the 3-value returnflag) so the window parallelizes at scale.
    // Output carries rn and orders by (supplier, rn): the synthetic
    // data REUSES (l_orderkey, l_linenumber) pairs, so the natural
    // keys alone are not a total output order (found the hard way —
    // the window itself totally orders on (shipdate, okey, line)).
    Decl("window_rolling_corr",
      """WITH r AS (SELECT l_suppkey, l_orderkey, l_linenumber,
        |    row_number() OVER w AS rn,
        |    CAST(COUNT(*) OVER w AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(3,0))) OVER w AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(3,0)) *
        |             CAST(l_quantity AS DECIMAL(3,0))) OVER w AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS syy,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(3,0)) *
        |             CAST(l_extendedprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sxy
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber,
        |      l_quantity, l_extendedprice
        |    ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
        |SELECT l_suppkey, CAST(rn AS INTEGER) AS rn, l_orderkey, l_linenumber,
        |  CASE WHEN (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
        |    THEN (n * sxy - sx * sy) /
        |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
        |  END AS roll_corr
        |FROM r WHERE rn >= 20
        |ORDER BY l_suppkey, rn""".stripMargin) { (s, d) =>
      // ...and the value columns join the frame ordering because even
      // (shipdate, okey, line) ties once per 6M rows; values differ on
      // the colliding pair, making the five-key order provably total
      val wRank = Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber",
          "l_quantity", "l_extendedprice")
      val w = wRank.rowsBetween(-19, Window.currentRow)
      val xd = col("l_quantity").cast(DecimalType(3, 0))
      val yd = col("l_extendedprice").cast(DecimalType(18, 2))
      val n = col("n"); val sx = col("sx"); val sy = col("sy")
      val varx = n * col("sxx") - sx * sx
      val vary = n * col("syy") - sy * sy
      Tables.lineitem(s, d)
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(wRank).as("rn"),
          count(lit(1)).over(w).cast(DoubleType).as("n"),
          sum(xd).over(w).cast(DoubleType).as("sx"),
          sum(yd).over(w).cast(DoubleType).as("sy"),
          sum(xd * xd).over(w).cast(DoubleType).as("sxx"),
          sum(yd * yd).over(w).cast(DoubleType).as("syy"),
          sum(xd * yd).over(w).cast(DoubleType).as("sxy"))
        .filter(col("rn") >= 20)
        .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
          col("l_linenumber"),
          when(varx > 0.0 && vary > 0.0,
            (n * col("sxy") - sx * sy) / (sqrt(varx) * sqrt(vary)))
            .as("roll_corr"))
        .orderBy("l_suppkey", "rn")
    },

    // Longest rising streak of event values per user — the classic
    // gaps-and-islands composition: a lag comparison starts islands, a
    // running sum names them, a per-island count and a per-user max
    // finish. Three windows + one aggregate, ALL on the same user-key
    // shuffle; everything integer-exact.
    Decl("window_streak",
      """WITH s AS (SELECT user_id, ts, event_id, value,
        |    CASE WHEN lag(value) OVER wo IS NULL
        |           OR value <= lag(value) OVER wo THEN 1 ELSE 0 END
        |      AS brk
        |  FROM events
        |  WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |isl AS (SELECT user_id, event_id,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        |  FROM s),
        |runs AS (SELECT user_id, island, count(*) AS run_len
        |  FROM isl GROUP BY user_id, island)
        |SELECT user_id, CAST(MAX(run_len) AS BIGINT) AS longest_streak,
        |  CAST(COUNT(*) AS BIGINT) AS n_runs
        |FROM runs GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      // island numbering must run in the SAME total order the lag saw
      val wCum = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev", lag(col("value"), 1).over(wo))
        .withColumn("brk",
          when(col("prev").isNull || col("value") <= col("prev"), 1)
            .otherwise(0))
        .withColumn("island", sum(col("brk")).over(wCum))
        .groupBy("user_id", "island")
        .agg(count(lit(1)).as("run_len"))
        .groupBy("user_id")
        .agg(max(col("run_len")).as("longest_streak"),
          count(lit(1)).as("n_runs"))
        .orderBy("user_id")
    },

    // Running-max drawdown per user — peak-tracking over the event
    // stream (the time-series risk metric; also the shape of "distance
    // below best checkpoint" monitoring). Running MAX is exact on any
    // ordering; the subtraction is one IEEE op on identical doubles.
    // Worst (most negative) drawdown summarized per user.
    Decl("window_drawdown",
      """WITH r AS (SELECT user_id, event_id, value,
        |    MAX(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS peak
        |  FROM events)
        |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(value - peak) AS worst_drawdown,
        |  MAX(peak) AS final_peak
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("peak", max(col("value")).over(w))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n"),
          min(col("value") - col("peak")).as("worst_drawdown"),
          max(col("peak")).as("final_peak"))
        .orderBy("user_id")
    },

    // Percent change between consecutive observations per user
    // (pandas `pct_change`): lag + one division on identical doubles;
    // zero previous guarded to NULL symmetrically. Emitted per event
    // (the window's natural grain), keyed totally by (user, ts, id).
    Decl("window_pct_change",
      """SELECT user_id, event_id, epoch_us(ts) AS tus,
        |  CASE WHEN lag(value) OVER wo IS NOT NULL
        |        AND lag(value) OVER wo <> 0.0
        |       THEN (value - lag(value) OVER wo) / lag(value) OVER wo
        |  END AS pct_change
        |FROM events
        |WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, tus, event_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val prev = lag(col("value"), 1).over(wo)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), epochUs(col("ts")).as("tus"),
          when(prev.isNotNull && prev =!= 0.0,
            (col("value") - prev) / prev).as("pct_change"))
        .orderBy("user_id", "tus", "event_id")
    },

    // Exponentially-weighted moving average (pandas `ewm(alpha=.5)`,
    // halflife smoothing) over the trailing 8 events per user. The
    // weights are DYADIC (2^(7−j) for the row j steps back), so every
    // product value·weight is exact in scale-2 decimal and the ≤8-term
    // sum is exact — cross-engine bit-identical without any tolerance,
    // which a float alpha^j could never give. Expressed as 8 lag()
    // columns over ONE window pass (not a collected array): all
    // per-row, stays in whole-stage codegen, same single user_id
    // shuffle as any other window query. The truncated-tail (finite
    // window) form is the standard streaming-friendly EWMA: the
    // dropped tail's total weight is < 1/128 of the current weight.
    Decl("window_ewma",
      """SELECT user_id, event_id, value,
        |  CAST(CAST((COALESCE(CAST(value AS DECIMAL(18,2)) * 128, 0)
        |    + COALESCE(CAST(lag(value, 1) OVER wo AS DECIMAL(18,2)) * 64, 0)
        |    + COALESCE(CAST(lag(value, 2) OVER wo AS DECIMAL(18,2)) * 32, 0)
        |    + COALESCE(CAST(lag(value, 3) OVER wo AS DECIMAL(18,2)) * 16, 0)
        |    + COALESCE(CAST(lag(value, 4) OVER wo AS DECIMAL(18,2)) * 8, 0)
        |    + COALESCE(CAST(lag(value, 5) OVER wo AS DECIMAL(18,2)) * 4, 0)
        |    + COALESCE(CAST(lag(value, 6) OVER wo AS DECIMAL(18,2)) * 2, 0)
        |    + COALESCE(CAST(lag(value, 7) OVER wo AS DECIMAL(18,2)), 0))
        |   AS VARCHAR) AS DOUBLE)
        |  / (128
        |    + CASE WHEN lag(value, 1) OVER wo IS NULL THEN 0 ELSE 64 END
        |    + CASE WHEN lag(value, 2) OVER wo IS NULL THEN 0 ELSE 32 END
        |    + CASE WHEN lag(value, 3) OVER wo IS NULL THEN 0 ELSE 16 END
        |    + CASE WHEN lag(value, 4) OVER wo IS NULL THEN 0 ELSE 8 END
        |    + CASE WHEN lag(value, 5) OVER wo IS NULL THEN 0 ELSE 4 END
        |    + CASE WHEN lag(value, 6) OVER wo IS NULL THEN 0 ELSE 2 END
        |    + CASE WHEN lag(value, 7) OVER wo IS NULL THEN 0 ELSE 1 END)
        |  AS ewma
        |FROM events
        |WINDOW wo AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
      def lagged(k: Int) =
        (if (k == 0) col("value") else lag(col("value"), k).over(wo))
      val num = (0 to 7).map { k =>
        coalesce(lagged(k).cast(DecimalType(18, 2)) * lit(1L << (7 - k)),
          lit(0).cast(DecimalType(18, 2)))
      }.reduce(_ + _)
      val den = (0 to 7).map { k =>
        if (k == 0) lit(128L)
        else when(lagged(k).isNull, 0L).otherwise(1L << (7 - k))
      }.reduce(_ + _)
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          (num.cast(DoubleType) / den).as("ewma"))
        .orderBy("user_id", "event_id")
    }
  )
}
