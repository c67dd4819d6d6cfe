package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Temporal joins Spark lacks as single primitives (SURVEY.md §2 rows
  * B11-B13): as-of (nearest-past) join and interval/range join, plus the
  * cartesian baseline. The reference surface is `pandas.merge_asof` and
  * the cross+mask idiom.
  *
  * Implementation choices, 100 TB first:
  *
  * B11 as-of — the union-tag trick: tag order rows 0 and event rows 1,
  * union them, and run `last(value, ignoreNulls)` over a window
  * partitioned by the key, ordered by (ts, tag). One shuffle on the key,
  * streaming window evaluation, no point lookups, no N×M expansion —
  * this is the plan a dedicated AsOfJoinExec would produce anyway
  * (sort-merge within key partitions), so no custom physical operator is
  * needed. Ties: tag 0 sorts before tag 1, giving `<=` (inclusive)
  * as-of semantics; orders are pre-deduped to one row per (key, ts) so
  * the match is unique and deterministic.
  *
  * B12 range join — equi-join on (key, time-bucket) with the build side
  * expanded to the two buckets each probe row can fall in, then the exact
  * range predicate as a post-filter. Candidate pairs are bounded by
  * bucket width ≈ window length, instead of the O(per-key²) blowup of a
  * naive key-only join — the standard interval-bucketing scheme.
  */
object AsofRange {

  /** The B11 backward as-of join over arbitrary event/order frames —
    * factored out so DeterminismSpec can drive it with repartitioned
    * sources (shuffle-order independence is the whole claim). */
  def asofBackward(eventsDf: org.apache.spark.sql.DataFrame,
      ordersDf: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val wDedup = Window.partitionBy("o_custkey", "o_orderdate")
      .orderBy(col("o_orderkey").desc)
    val orders = ordersDf
      .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
      .select(col("o_custkey").as("k"), col("o_orderdate").as("ts"),
        lit(0).as("tag"), col("o_orderkey"), col("o_totalprice"),
        lit(null).cast("long").as("event_id"))
    val events = eventsDf
      .select(col("user_id").as("k"), col("ts"), lit(1).as("tag"),
        lit(null).cast("long").as("o_orderkey"),
        lit(null).cast("double").as("o_totalprice"), col("event_id"))
    val w = Window.partitionBy("k").orderBy("ts", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders.unionByName(events)
      .withColumn("matched_order",
        last(col("o_orderkey"), ignoreNulls = true).over(w))
      .withColumn("matched_price",
        last(col("o_totalprice"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k").as("user_id"),
        coalesce(col("matched_order"), lit(-1L)).as("matched_order"),
        coalesce(col("matched_price"), lit(-1.0)).as("matched_price"))
      .orderBy("event_id")
  }

  def decls: Seq[Decl] = Seq(

    // B11: each event matched to the user's latest order at-or-before ts.
    Decl("join_asof",
      """WITH dorders AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id,
        |  coalesce(o.o_orderkey, -1) AS matched_order,
        |  coalesce(o.o_totalprice, -1.0) AS matched_price
        |FROM events e
        |ASOF LEFT JOIN dorders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      asofBackward(Tables.events(s, d), Tables.orders(s, d))
    },

    // B11-forward: pandas merge_asof(direction='forward') — each click
    // matched to the user's *earliest error at-or-after* it. Same
    // union-tag machinery run in reverse ts order; the oracle reverses
    // DuckDB's backward-only ASOF by negating epoch-µs keys.
    Decl("join_asof_forward",
      """WITH clk AS (SELECT event_id, user_id, epoch_us(ts) AS us
        |             FROM events WHERE event_type = 'click'),
        |err AS (SELECT * FROM (
        |  SELECT user_id, epoch_us(ts) AS us, event_id,
        |    row_number() OVER (PARTITION BY user_id, ts
        |                       ORDER BY event_id) AS rn
        |  FROM events WHERE event_type = 'error') WHERE rn = 1)
        |SELECT c.event_id, c.user_id,
        |  coalesce(e.event_id, -1) AS next_error
        |FROM clk c
        |ASOF LEFT JOIN err e
        |  ON c.user_id = e.user_id AND -c.us >= -e.us
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val wDedup = Window.partitionBy("user_id", "us").orderBy("event_id")
      val errs = ev.filter(col("event_type") === "error")
        .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
        .select(col("user_id").as("k"), col("us"), lit(0).as("tag"),
          col("event_id").as("err_id"),
          lit(null).cast("long").as("event_id"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), col("us"), lit(1).as("tag"),
          lit(null).cast("long").as("err_id"), col("event_id"))
      // reverse time order: "next at-or-after" = "last at-or-before" on -us
      val w = Window.partitionBy("k").orderBy(col("us").desc, col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      errs.unionByName(clicks)
        .withColumn("next_error", last(col("err_id"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("k").as("user_id"),
          coalesce(col("next_error"), lit(-1L)).as("next_error"))
        .orderBy("event_id")
    },

    // B11-nearest: pandas merge_asof(direction='nearest') — each click
    // matched to the same user's closest purchase in either time
    // direction, ties to the earlier one. Both direction passes run over
    // ONE union-tagged shuffle on user_id (two sorts, no second
    // exchange); the oracle composes DuckDB's backward-only ASOF twice
    // (forward = backward on negated epoch-µs) and picks the nearer.
    Decl("join_asof_nearest",
      """WITH pur AS (SELECT * FROM (
        |    SELECT user_id, epoch_us(ts) AS us, event_id,
        |      row_number() OVER (PARTITION BY user_id, ts
        |                         ORDER BY event_id) AS rn
        |    FROM events WHERE event_type = 'purchase') WHERE rn = 1),
        |clk AS (SELECT event_id, user_id, epoch_us(ts) AS eus
        |        FROM events WHERE event_type = 'click'),
        |b AS (SELECT c.event_id, p.event_id AS bk, p.us AS bus
        |      FROM clk c ASOF LEFT JOIN pur p
        |        ON c.user_id = p.user_id AND c.eus >= p.us),
        |f AS (SELECT c.event_id, p.event_id AS fk, p.us AS fus
        |      FROM clk c ASOF LEFT JOIN pur p
        |        ON c.user_id = p.user_id AND -c.eus >= -p.us)
        |SELECT c.event_id, c.user_id,
        |  CASE WHEN f.fk IS NULL
        |         OR (b.bk IS NOT NULL AND c.eus - b.bus <= f.fus - c.eus)
        |       THEN coalesce(b.bk, -1) ELSE f.fk END AS nearest_purchase,
        |  CASE WHEN f.fk IS NULL
        |         OR (b.bk IS NOT NULL AND c.eus - b.bus <= f.fus - c.eus)
        |       THEN coalesce(c.eus - b.bus, -1) ELSE f.fus - c.eus
        |       END AS dist_us
        |FROM clk c JOIN b ON b.event_id = c.event_id
        |           JOIN f ON f.event_id = c.event_id
        |ORDER BY c.event_id""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d).withColumn("us", unix_micros(col("ts")))
      val wDedup = Window.partitionBy("user_id", "us").orderBy("event_id")
      val pur = ev.filter(col("event_type") === "purchase")
        .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
        .select(col("user_id").as("k"), col("us"), lit(0).as("tag"),
          col("event_id").as("pur_id"), lit(null).cast("long").as("event_id"))
      val clk = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("k"), col("us"), lit(1).as("tag"),
          lit(null).cast("long").as("pur_id"), col("event_id"))
      // tag 0 < tag 1 at equal ts in BOTH sort directions ⇒ an exactly
      // coincident purchase is visible to both passes (inclusive <=/>=)
      val wB = Window.partitionBy("k").orderBy(col("us"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wF = Window.partitionBy("k").orderBy(col("us").desc, col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val pickB = col("fk").isNull ||
        (col("bk").isNotNull && col("us") - col("bus") <= col("fus") - col("us"))
      pur.unionByName(clk)
        .withColumn("bk", last(col("pur_id"), ignoreNulls = true).over(wB))
        .withColumn("bus", last(when(col("tag") === 0, col("us")),
          ignoreNulls = true).over(wB))
        .withColumn("fk", last(col("pur_id"), ignoreNulls = true).over(wF))
        .withColumn("fus", last(when(col("tag") === 0, col("us")),
          ignoreNulls = true).over(wF))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("k").as("user_id"),
          when(pickB, coalesce(col("bk"), lit(-1L))).otherwise(col("fk"))
            .as("nearest_purchase"),
          when(pickB, coalesce(col("us") - col("bus"), lit(-1L)))
            .otherwise(col("fus") - col("us")).as("dist_us"))
        .orderBy("event_id")
    },

    // B12: for each error event, clicks by the same user in the
    // preceding 10 minutes (events self range join, bucketed).
    Decl("join_range",
      """SELECT err.event_id, COUNT(clk.event_id) AS n_clicks
        |FROM (SELECT * FROM events WHERE event_type = 'error') err
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') clk
        |  ON err.user_id = clk.user_id
        |  AND clk.ts > err.ts - INTERVAL 10 MINUTE AND clk.ts <= err.ts
        |GROUP BY err.event_id ORDER BY err.event_id""".stripMargin) { (s, d) =>
      val BucketUs = 600L * 1000000L // bucket width = range width = 10 min
      val ev = Tables.events(s, d)
        .withColumn("ts_us", unix_micros(col("ts")))
      val err = ev.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts_us").as("err_us"),
          (col("ts_us") / BucketUs).cast("long").as("bucket"))
      // each click can match errors in its own bucket or the next one
      val clk = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("clk_id"), col("user_id").as("clk_user"),
          col("ts_us").as("clk_us"),
          explode(array((col("ts_us") / BucketUs).cast("long"),
            (col("ts_us") / BucketUs).cast("long") + 1)).as("bucket"))
      err.join(clk,
          col("user_id") === col("clk_user") && err("bucket") === clk("bucket") &&
            col("clk_us") > col("err_us") - BucketUs &&
            col("clk_us") <= col("err_us"),
          "left")
        .groupBy("event_id")
        .agg(count(col("clk_id")).as("n_clicks"))
        .orderBy("event_id")
    },

    // Last-touch attribution: every purchase attributed to the user's
    // most recent prior (or same-instant) view's campaign key — the
    // as-of backward join applied to product analytics, carrying a
    // JSON-extracted payload from the matched side. Spark: the union +
    // last(ignoreNulls) window trick (one user-key shuffle, no join);
    // oracle: DuckDB ASOF LEFT JOIN. Views deduped to one per (user,
    // ts) instant (max event_id) so the match is well-defined.
    Decl("attribution_last_touch",
      """WITH views AS (
        |  SELECT * FROM (
        |    SELECT user_id, ts, event_id,
        |      CAST(json_extract_string(props, '$.k') AS BIGINT) AS src,
        |      row_number() OVER (PARTITION BY user_id, ts
        |                         ORDER BY event_id DESC) AS rn
        |    FROM events WHERE event_type = 'view') WHERE rn = 1),
        |purch AS (SELECT user_id, ts, event_id FROM events
        |          WHERE event_type = 'purchase')
        |SELECT p.event_id, p.user_id, epoch_us(p.ts) AS tus,
        |  coalesce(v.src, -1) AS attributed_src,
        |  coalesce(epoch_us(v.ts), -1) AS view_tus
        |FROM purch p ASOF LEFT JOIN views v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      import Det.epochUs
      val ev = Tables.events(s, d)
      val wDedup = Window.partitionBy("user_id", "ts").orderBy(desc("event_id"))
      val views = ev.filter(col("event_type") === "view")
        .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
        .select(col("user_id"), epochUs(col("ts")).as("tus"),
          lit(null).cast(LongType).as("event_id"),
          get_json_object(col("props"), "$.k").cast(LongType).as("src"),
          lit(0).as("tag"))
      val purch = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), epochUs(col("ts")).as("tus"),
          col("event_id"), lit(null).cast(LongType).as("src"),
          lit(1).as("tag"))
      // views sort before purchases at the same instant (tag 0 < 1), so
      // the last view-tagged row at a purchase IS the as-of match. The
      // match is carried as ONE struct(src, tus) so both output columns
      // come from the same latest view even when its src is NULL (a
      // per-column last(src, ignoreNulls) would skip a NULL-src view and
      // attribute to an older one, diverging from ASOF JOIN semantics).
      val w = Window.partitionBy("user_id").orderBy("tus", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      views.unionAll(purch)
        .withColumn("vmatch",
          last(when(col("tag") === 0, struct(col("src"), col("tus"))),
            ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("tus"),
          coalesce(col("vmatch.src"), lit(-1L)).as("attributed_src"),
          coalesce(col("vmatch.tus"), lit(-1L)).as("view_tus"))
        .orderBy("event_id")
    },

    // B11c: as-of join WITH TOLERANCE — pandas merge_asof(tolerance=…):
    // the backward match is kept only when the event is within 7 days
    // of the matched order; staler matches revert to unmatched. Same
    // single-shuffle union-tag window as join_asof, one extra carried
    // column (the match's own timestamp) and a gap gate at the end.
    Decl("join_asof_tolerance",
      """WITH dorders AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderdate, o_orderkey,
        |      row_number() OVER (PARTITION BY o_custkey, o_orderdate
        |                         ORDER BY o_orderkey DESC) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT e.event_id, e.user_id,
        |  CASE WHEN o.o_orderkey IS NOT NULL
        |        AND epoch_us(e.ts) - epoch_us(o.o_orderdate)
        |            <= 604800000000 THEN o.o_orderkey ELSE -1 END
        |    AS matched_order,
        |  CASE WHEN o.o_orderkey IS NOT NULL
        |        AND epoch_us(e.ts) - epoch_us(o.o_orderdate)
        |            <= 604800000000
        |       THEN epoch_us(e.ts) - epoch_us(o.o_orderdate) ELSE -1 END
        |    AS gap_us
        |FROM events e
        |ASOF LEFT JOIN dorders o
        |  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      val TolUs = 604800000000L // 7 days
      val wDedup = Window.partitionBy("o_custkey", "o_orderdate")
        .orderBy(col("o_orderkey").desc)
      val orders = Tables.orders(s, d)
        .withColumn("rn", row_number().over(wDedup)).filter(col("rn") === 1)
        .select(col("o_custkey").as("k"),
          // o_orderdate reads as TIMESTAMP_NTZ; the session is pinned
          // UTC, so the NTZ→TZ cast yields exactly DuckDB's epoch_us
          // of the naive value
          Det.epochUs(col("o_orderdate").cast("timestamp")).as("tus"),
          lit(0).as("tag"), col("o_orderkey"),
          lit(null).cast(LongType).as("event_id"))
      val events = Tables.events(s, d)
        .select(col("user_id").as("k"), Det.epochUs(col("ts")).as("tus"),
          lit(1).as("tag"), lit(null).cast(LongType).as("o_orderkey"),
          col("event_id"))
      val w = Window.partitionBy("k").orderBy("tus", "tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gap = col("tus") - col("match_tus")
      orders.unionByName(events)
        .withColumn("match_key",
          last(col("o_orderkey"), ignoreNulls = true).over(w))
        .withColumn("match_tus",
          last(when(col("tag") === 0, col("tus")), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("k").as("user_id"),
          when(col("match_key").isNotNull && gap <= TolUs, col("match_key"))
            .otherwise(-1L).as("matched_order"),
          when(col("match_key").isNotNull && gap <= TolUs, gap)
            .otherwise(-1L).as("gap_us"))
        .orderBy("event_id")
    },

    // B13: cartesian product (BroadcastNestedLoopJoin; small sides only —
    // any big-side cross is a bug at scale, never a strategy).
    Decl("cross_join",
      """SELECT r_name, n_name FROM region CROSS JOIN nation
        |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
      Tables.region(s, d).select("r_name")
        .crossJoin(Tables.nation(s, d).select("n_name"))
        .orderBy("r_name", "n_name")
    }
  )
}
