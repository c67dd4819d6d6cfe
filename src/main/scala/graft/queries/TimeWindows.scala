package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.functions._

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
    }
  )
}
