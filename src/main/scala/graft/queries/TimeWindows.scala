package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Event-time windowing over the `events` stream table (SURVEY.md §2
  * rows B36-B38) — batch-first, with Structured-Streaming-identical
  * semantics: the same `window`/`session_window` expressions run
  * unchanged under `readStream` (streaming variants + watermark tests
  * live in graft.streaming / StreamingSpec).
  *
  * All timestamps go through Tables.events' nanos→µs normalization and
  * leave the query as epoch-µs longs (SURVEY.md §1.4 determinism rule).
  * Window starts are computed on the epoch grid (Spark aligns tumbling/
  * sliding windows to the 1970 epoch in UTC; the oracles reproduce that
  * arithmetically instead of relying on DuckDB's time_bucket origin).
  *
  * Scale: tumbling/sliding windows are plain hash aggregates on
  * (window, key) — partial+final, no skew hazard beyond the key itself.
  * Session windows shuffle once on user_id; Spark's session-window agg
  * merges adjacent sessions without materializing a user's full history.
  */
object TimeWindows {

  import Det._

  private val HourUs = 3600L * 1000000L
  private val SlideUs = 900L * 1000000L // 15 minutes

  /** Floor division for epoch-µs bucketing — matches DuckDB's `//` on
    * negative (pre-1970) epochs, where Spark's long `/`-then-cast (and
    * `DIV`) truncate toward zero instead. Subtracting the positive
    * modulus first keeps the arithmetic integral: the quotient is exact,
    * so truncation equals floor. (Exact for |epoch| < 2^53 µs, i.e.
    * years 1684–2255 — the timestamp range the µs grid itself covers.) */
  private def floorDivUs(c: org.apache.spark.sql.Column, n: Long) =
    ((c.cast(LongType) - pmod(c.cast(LongType), lit(n))) / lit(n))
      .cast(LongType)

  def decls: Seq[Decl] = Seq(

    // B36: 1-hour tumbling count+sum by event_type.
    Decl("time_tumbling",
      s"""SELECT (epoch_us(ts) // $HourUs) * $HourUs AS window_start,
         |  event_type, COUNT(*) AS n, ${sqlSum("value")} AS sum_value
         |FROM events GROUP BY window_start, event_type
         |ORDER BY window_start, event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(epochUs(col("window.start")).as("window_start"),
          col("event_type"), col("n"), col("sum_value"))
        .orderBy("window_start", "event_type")
    },

    // B37: 1-hour window sliding every 15 min — each event lands in 4
    // windows; the oracle expands the 4 slide offsets explicitly.
    Decl("time_sliding",
      s"""SELECT (epoch_us(ts) // $SlideUs) * $SlideUs
         |    - CAST(k.k AS BIGINT) * $SlideUs AS window_start,
         |  COUNT(*) AS n
         |FROM events CROSS JOIN (VALUES (0), (1), (2), (3)) k(k)
         |GROUP BY window_start ORDER BY window_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"))
        .agg(count(lit(1)).as("n"))
        .select(epochUs(col("window.start")).as("window_start"), col("n"))
        .orderBy("window_start")
    },

    // B38: per-user sessions with a 30-minute inactivity gap. The oracle
    // is the classic gaps-and-islands rewrite (lag + running break count).
    Decl("time_session",
      """WITH marked AS (
        |  SELECT user_id, ts,
        |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |sessions AS (
        |  SELECT user_id, ts,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM marked)
        |SELECT user_id, epoch_us(MIN(ts)) AS session_start,
        |  epoch_us(MAX(ts)) AS session_end, COUNT(*) AS n_events
        |FROM sessions GROUP BY user_id, sid
        |ORDER BY user_id, session_start""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(min(col("ts")).as("smin"), max(col("ts")).as("smax"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), epochUs(col("smin")).as("session_start"),
          epochUs(col("smax")).as("session_end"), col("n_events"))
        .orderBy("user_id", "session_start")
    },

    // B-resample: pandas/dask `resample('1h').sum().ffill()` — a dense
    // hourly grid per event_type over a fixed 2-day span, left-joined
    // with the hourly aggregate, empty buckets forward-filled from the
    // last observed hour via last(_, ignoreNulls) (leading gaps → -1).
    // Scale: grid = distinct keys × 48 rows (tiny, broadcast side of the
    // join); the fact side is one partial+final aggregate.
    Decl("time_resample_ffill",
      s"""WITH $sqlGridCtes
         |SELECT g.event_type, g.bucket_us,
         |  coalesce(a.n_ev, 0) AS n_ev,
         |  coalesce(last_value(a.v IGNORE NULLS) OVER (
         |    PARTITION BY g.event_type ORDER BY g.bucket_us
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1.0)
         |    AS ffilled_sum
         |FROM grid g LEFT JOIN agg a
         |  ON a.event_type = g.event_type AND a.bucket_us = g.bucket_us
         |ORDER BY g.event_type, g.bucket_us""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("event_type").orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hourlyGrid(s, d)
        .select(col("event_type"), col("bucket_us"),
          coalesce(col("n_ev"), lit(0L)).as("n_ev"),
          coalesce(last(col("v"), ignoreNulls = true).over(w), lit(-1.0))
            .as("ffilled_sum"))
        .orderBy("event_type", "bucket_us")
    },

    // B-resample-interp: pandas `resample().interpolate()` — missing
    // buckets get the linear interpolation between the nearest observed
    // hours on either side; edges with no neighbor stay -1. The
    // interpolation arithmetic is the IDENTICAL double expression tree
    // on both engines (anchor values are decimal-exact sums, the
    // weight is a ratio of exact integers), so no rounding is needed.
    Decl("time_resample_interp",
      s"""WITH $sqlGridCtes,
         |win AS (
         |  SELECT g.event_type, g.bucket_us, a.v,
         |    last_value(a.v IGNORE NULLS) OVER wp AS pv,
         |    last_value(CASE WHEN a.v IS NOT NULL THEN g.bucket_us END
         |               IGNORE NULLS) OVER wp AS pt,
         |    first_value(a.v IGNORE NULLS) OVER wn AS nv,
         |    first_value(CASE WHEN a.v IS NOT NULL THEN g.bucket_us END
         |                IGNORE NULLS) OVER wn AS nt
         |  FROM grid g LEFT JOIN agg a
         |    ON a.event_type = g.event_type AND a.bucket_us = g.bucket_us
         |  WINDOW
         |    wp AS (PARTITION BY g.event_type ORDER BY g.bucket_us
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY g.event_type ORDER BY g.bucket_us
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT event_type, bucket_us,
         |  CASE WHEN v IS NOT NULL THEN v
         |       WHEN pv IS NULL OR nv IS NULL THEN -1.0
         |       ELSE pv + (nv - pv) *
         |         (CAST(bucket_us - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
         |  END AS interp_sum
         |FROM win ORDER BY event_type, bucket_us""".stripMargin) { (s, d) =>
      val wp = Window.partitionBy("event_type").orderBy("bucket_us")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("event_type").orderBy("bucket_us")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsT = when(col("v").isNotNull, col("bucket_us"))
      hourlyGrid(s, d)
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wp))
        .withColumn("pt", last(obsT, ignoreNulls = true).over(wp))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wn))
        .withColumn("nt", first(obsT, ignoreNulls = true).over(wn))
        .select(col("event_type"), col("bucket_us"),
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull || col("nv").isNull, lit(-1.0))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              ((col("bucket_us") - col("pt")).cast("double") /
                (col("nt") - col("pt")).cast("double")))
            .as("interp_sum"))
        .orderBy("event_type", "bucket_us")
    },

    // OHLC downsample: open/high/low/close of `value` per (type, hour)
    // — the financial-candle resample of the time-series surface.
    // Open/close are picked by row_number over (ts, event_id) — an
    // argmin/argmax with a TOTAL tiebreak (engine-native min_by/arg_min
    // tie arbitrarily) — then folded in the same hash aggregate as
    // high/low/volume. One window + one partial+final agg, both on the
    // same (type, hour) key: a single shuffle.
    Decl("time_ohlc",
      s"""WITH b AS (SELECT event_type, value,
         |    (epoch_us(ts) // $HourUs) * $HourUs AS h,
         |    row_number() OVER (PARTITION BY event_type,
         |        (epoch_us(ts) // $HourUs)
         |      ORDER BY ts, event_id) AS rno,
         |    row_number() OVER (PARTITION BY event_type,
         |        (epoch_us(ts) // $HourUs)
         |      ORDER BY ts DESC, event_id DESC) AS rnc
         |  FROM events)
         |SELECT event_type, h,
         |  MAX(CASE WHEN rno = 1 THEN value END) AS open,
         |  MAX(value) AS high, MIN(value) AS low,
         |  MAX(CASE WHEN rnc = 1 THEN value END) AS close,
         |  COUNT(*) AS n, ${sqlSum("value")} AS volume
         |FROM b GROUP BY event_type, h
         |ORDER BY event_type, h""".stripMargin) { (s, d) =>
      val h = (floorDivUs(epochUs(col("ts")), HourUs) * HourUs).as("h")
      val hKey = floorDivUs(epochUs(col("ts")), HourUs)
      val wOpen = Window.partitionBy(col("event_type"), hKey)
        .orderBy(col("ts"), col("event_id"))
      val wClose = Window.partitionBy(col("event_type"), hKey)
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .select(col("event_type"), col("value"), h,
          row_number().over(wOpen).as("rno"),
          row_number().over(wClose).as("rnc"))
        .groupBy("event_type", "h")
        .agg(max(when(col("rno") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          max(when(col("rnc") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"), dsum(col("value")).as("volume"))
        .orderBy("event_type", "h")
    },

    // Lag-1 autocorrelation of the hourly event-count series per type —
    // the burstiness/trend diagnostic of stream QA. Counts are exact
    // ints, so ALL five power sums are exact decimals and the Pearson
    // formula runs on identical doubles — no libm anywhere. Lag pairs
    // are over OBSERVED hours (gap hours absent on both engines alike).
    Decl("time_autocorr",
      s"""WITH hcnt AS (SELECT event_type,
         |    (epoch_us(ts) // $HourUs) AS hb,
         |    CAST(count(*) AS DECIMAL(10,0)) AS c
         |  FROM events GROUP BY event_type, hb),
         |lagd AS (SELECT event_type, c AS y,
         |    lag(c) OVER (PARTITION BY event_type ORDER BY hb) AS x
         |  FROM hcnt),
         |p AS (SELECT event_type, x, y FROM lagd WHERE x IS NOT NULL),
         |st AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         |    CAST(SUM(x * x) AS DOUBLE) AS sxx,
         |    CAST(SUM(y * y) AS DOUBLE) AS syy,
         |    CAST(SUM(x * y) AS DOUBLE) AS sxy
         |  FROM p GROUP BY event_type)
         |SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
         |  CASE WHEN (n * sxx - sx * sx) > 0.0 AND (n * syy - sy * sy) > 0.0
         |    THEN (n * sxy - sx * sy) /
         |      (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
         |  END AS autocorr
         |FROM st ORDER BY event_type""".stripMargin) { (s, d) =>
      val hcnt = Tables.events(s, d)
        .groupBy(col("event_type"),
          floorDivUs(epochUs(col("ts")), HourUs).as("hb"))
        .agg(count(lit(1)).cast(DecimalType(10, 0)).as("c"))
      val wLag = Window.partitionBy("event_type").orderBy("hb")
      val p = hcnt
        .select(col("event_type"), col("c").as("y"),
          lag(col("c"), 1).over(wLag).as("x"))
        .filter(col("x").isNotNull)
      val st = p.groupBy("event_type")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum(col("x")).cast(DoubleType).as("sx"),
          sum(col("y")).cast(DoubleType).as("sy"),
          sum(col("x") * col("x")).cast(DoubleType).as("sxx"),
          sum(col("y") * col("y")).cast(DoubleType).as("syy"),
          sum(col("x") * col("y")).cast(DoubleType).as("sxy"))
      val n = col("n"); val sx = col("sx"); val sy = col("sy")
      val vx = n * col("sxx") - sx * sx
      val vy = n * col("syy") - sy * sy
      st.select(col("event_type"), n.cast(LongType).as("n_pairs"),
          when(vx > 0.0 && vy > 0.0,
            (n * col("sxy") - sx * sy) / (sqrt(vx) * sqrt(vy)))
            .as("autocorr"))
        .orderBy("event_type")
    },

    // Hour-of-day seasonality profile per type — counts and shares from
    // pure integer epoch arithmetic (no timezone functions: both
    // engines compute hod = (epoch_us // 1h) % 24 on the same longs).
    Decl("time_seasonality",
      s"""WITH b AS (SELECT event_type,
         |    CAST((epoch_us(ts) // $HourUs) % 24 AS BIGINT) AS hod
         |  FROM events),
         |c AS (SELECT event_type, hod, count(*) AS n FROM b
         |  GROUP BY event_type, hod),
         |t AS (SELECT event_type, CAST(SUM(CAST(n AS BIGINT)) AS BIGINT)
         |    AS total FROM c GROUP BY event_type)
         |SELECT c.event_type AS event_type, hod, CAST(n AS BIGINT) AS n,
         |  CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share
         |FROM c JOIN t ON c.event_type = t.event_type
         |ORDER BY c.event_type, hod""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy(col("event_type"),
          (floorDivUs(epochUs(col("ts")), HourUs) % 24).as("hod"))
        .agg(count(lit(1)).as("n"))
      val t = c.groupBy(col("event_type").as("te"))
        .agg(sum(col("n")).as("total"))
      c.join(broadcast(t), col("event_type") === col("te"))
        .select(col("event_type"), col("hod"), col("n"),
          (col("n").cast(DoubleType) / col("total").cast(DoubleType))
            .as("share"))
        .orderBy("event_type", "hod")
    },

    // Completeness audit: hours with NO events inside each type's own
    // [first, last] hour span — span size minus observed distinct
    // hours, all exact integer epoch arithmetic. The data-quality gate
    // a feed-monitoring pipeline runs before trusting a window agg.
    Decl("time_gap_count",
      s"""SELECT event_type,
         |  CAST(max(hb) - min(hb) + 1 AS BIGINT) AS span_hours,
         |  CAST(count(DISTINCT hb) AS BIGINT) AS observed_hours,
         |  CAST(max(hb) - min(hb) + 1 - count(DISTINCT hb) AS BIGINT)
         |    AS gap_hours
         |FROM (SELECT event_type, epoch_us(ts) // $HourUs AS hb
         |      FROM events)
         |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          floorDivUs(epochUs(col("ts")), HourUs).as("hb"))
        .groupBy("event_type")
        .agg((max(col("hb")) - min(col("hb")) + 1).as("span_hours"),
          countDistinct(col("hb")).as("observed_hours"),
          (max(col("hb")) - min(col("hb")) + 1 - countDistinct(col("hb")))
            .as("gap_hours"))
        .orderBy("event_type")
    },

    // Time-weighted average value per user (TWAP) — each observation
    // holds until the next one, so it is weighted by its holding
    // duration; the per-user last event has no successor and drops out
    // (standard left-open TWAP). One lead() window + one aggregate on
    // the same user_id partitioning — Spark reuses the window's
    // hash partitioning for the groupBy, so a single shuffle total.
    // Exactness: value is money-precision (2 dec) → DECIMAL(18,2)
    // factor; the µs gap is an exact integer DECIMAL — the product and
    // sum are exact, and the final division is one IEEE op over
    // identical doubles (the dsumProd2 argument with an integer
    // second factor).
    Decl("time_twap",
      """WITH g AS (SELECT user_id, value, epoch_us(ts) AS tus,
        |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS next_tus
        |  FROM events)
        |SELECT user_id, COUNT(*) AS n_spans,
        |  CAST(SUM(next_tus - tus) AS BIGINT) AS held_us,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)) *
        |                CAST(next_tus - tus AS DECIMAL(18,0)))
        |       AS VARCHAR) AS DOUBLE)
        |    / CAST(CAST(SUM(CAST(next_tus - tus AS DECIMAL(18,0)))
        |        AS VARCHAR) AS DOUBLE) AS twap
        |FROM g WHERE next_tus IS NOT NULL
        |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val gap = col("next_tus") - col("tus")
      Tables.events(s, d)
        .select(col("user_id"), col("value"), epochUs(col("ts")).as("tus"),
          lead(epochUs(col("ts")), 1).over(w).as("next_tus"))
        .filter(col("next_tus").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_spans"),
          sum(gap).as("held_us"),
          (sum(col("value").cast(DecimalType(18, 2)) *
              gap.cast(DecimalType(18, 0))).cast(DoubleType) /
            sum(gap.cast(DecimalType(18, 0))).cast(DoubleType)).as("twap"))
        .orderBy("user_id")
    },

    // Hourly-volume anomaly detection — flag hours whose event count
    // deviates > 3σ from that event type's mean hourly count (the
    // monitoring alarm a feed pipeline runs). Two stacked aggregates:
    // hourly counts (shuffle on type×hour), then per-type moments over
    // those counts. Counts are exact BIGINTs, so Σc and Σc² are exact
    // in both engines (≪ 2^53); mean/σ are the same left-associative
    // IEEE tree over identical operands — no tolerance needed. The
    // emitted rows are only the anomalies (alarm grain), with the
    // per-type stats carried for auditability.
    Decl("time_anomaly",
      s"""WITH hc AS (
         |  SELECT event_type, epoch_us(ts) // $HourUs AS hb,
         |    COUNT(*) AS c
         |  FROM events GROUP BY event_type, hb),
         |st AS (
         |  SELECT event_type,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    CAST(SUM(c) AS DOUBLE) AS s1,
         |    CAST(SUM(c * c) AS DOUBLE) AS s2
         |  FROM hc GROUP BY event_type)
         |SELECT hc.event_type AS event_type, hb, c,
         |  s.s1 / s.n AS mean_c,
         |  sqrt((s.n * s.s2 - s.s1 * s.s1) / (s.n * (s.n - 1.0))) AS sd_c
         |FROM hc JOIN st s ON hc.event_type = s.event_type
         |WHERE abs(c - s.s1 / s.n) >
         |  3.0 * sqrt((s.n * s.s2 - s.s1 * s.s1) / (s.n * (s.n - 1.0)))
         |ORDER BY event_type, hb""".stripMargin) { (s, d) =>
      val hc = Tables.events(s, d)
        .groupBy(col("event_type"),
          floorDivUs(epochUs(col("ts")), HourUs).as("hb"))
        .agg(count(lit(1)).as("c"))
      val st = hc.groupBy(col("event_type").as("se"))
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum(col("c")).cast(DoubleType).as("s1"),
          sum(col("c") * col("c")).cast(DoubleType).as("s2"))
      val mean = col("s1") / col("n")
      val sd = sqrt((col("n") * col("s2") - col("s1") * col("s1")) /
        (col("n") * (col("n") - lit(1.0))))
      hc.join(st, col("event_type") === col("se"))
        .filter(abs(col("c") - mean) > lit(3.0) * sd)
        .select(col("event_type"), col("hb"), col("c"),
          mean.as("mean_c"), sd.as("sd_c"))
        .orderBy("event_type", "hb")
    },

    // Overlapping-interval union (coalesce): each event spawns a
    // 10-minute interval; per user, overlapping/touching intervals
    // merge into maximal disjoint spans — the interval form of
    // gaps-and-islands (calendar coverage, on-call spans, session
    // stitching over genuine durations rather than point gaps).
    // Island break = start strictly beyond the running max of all
    // PRECEDING ends (the strictly-preceding frame makes the running
    // max self-exclusive); island id = running sum of breaks; the
    // merged span is then one min/max/count group per island. All
    // epoch-µs integer arithmetic — exact in both engines — and
    // everything after the scan rides ONE user-key shuffle: both
    // windows and the final group share the user partitioning.
    Decl("interval_merge",
      """WITH iv AS (SELECT user_id, epoch_us(ts) AS st,
        |    epoch_us(ts) + 600000000 AS en FROM events),
        |b AS (SELECT user_id, st, en,
        |    CASE WHEN max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      IS NULL THEN 1
        |    WHEN st > max(en) OVER (PARTITION BY user_id
        |        ORDER BY st, en
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |isl AS (SELECT user_id, st, en,
        |    CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY st, en
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) AS island
        |  FROM b)
        |SELECT user_id, island, MIN(st) AS span_start,
        |  MAX(en) AS span_end, COUNT(*) AS n_events,
        |  MAX(en) - MIN(st) AS span_us
        |FROM isl GROUP BY user_id, island
        |ORDER BY user_id, island""".stripMargin) { (s, d) =>
      val wPrev = Window.partitionBy("user_id").orderBy(col("st"), col("en"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy("user_id").orderBy(col("st"), col("en"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("user_id"), epochUs(col("ts")).as("st"),
          (epochUs(col("ts")) + 600000000L).as("en"))
        .withColumn("pm", max("en").over(wPrev))
        .withColumn("brk",
          when(col("pm").isNull || col("st") > col("pm"), 1).otherwise(0))
        .withColumn("island", sum("brk").over(wRun))
        .groupBy("user_id", "island")
        .agg(min("st").as("span_start"), max("en").as("span_end"),
          count(lit(1)).as("n_events"),
          (max("en") - min("st")).as("span_us"))
        .orderBy("user_id", "island")
    }
  )

  private val GridStartUs = java.time.Instant.parse("2024-01-05T00:00:00Z")
    .toEpochMilli * 1000L
  private val GridHours = 48

  /** Shared resample scaffold: (event_type, bucket_us, v, n_ev) — the
    * dense hourly grid left-joined with the hourly decimal-exact
    * aggregate; v/n_ev are NULL on empty buckets. DuckDB twin CTEs in
    * [[sqlGridCtes]]. */
  private def hourlyGrid(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp")
        && col("ts") < lit("2024-01-07 00:00:00").cast("timestamp"))
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
    val hourAgg = ev
      .groupBy(col("event_type"),
        (floorDivUs(col("us"), HourUs) * HourUs).as("bucket_us"))
      .agg(dsum(col("value")).as("v"), count(lit(1)).as("n_ev"))
    val grid = ev.select("event_type").distinct()
      .crossJoin(s.range(GridHours)
        .select((lit(GridStartUs) + col("id") * HourUs).as("bucket_us")))
    grid.join(hourAgg, Seq("event_type", "bucket_us"), "left")
  }

  private def sqlGridCtes: String =
    s"""ev AS (
       |  SELECT event_type, epoch_us(ts) AS us, value FROM events
       |  WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
       |    AND ts < TIMESTAMP '2024-01-07 00:00:00'),
       |agg AS (
       |  SELECT event_type, (us // $HourUs) * $HourUs AS bucket_us,
       |    ${sqlSum("value")} AS v, COUNT(*) AS n_ev
       |  FROM ev GROUP BY event_type, bucket_us),
       |grid AS (
       |  SELECT t.event_type, $GridStartUs + k.k * $HourUs AS bucket_us
       |  FROM (SELECT DISTINCT event_type FROM ev) t,
       |       UNNEST(range(0, $GridHours)) AS k(k))""".stripMargin
}
