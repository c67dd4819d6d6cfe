package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Statistical aggregates beyond mean/stddev — the `describe`-adjacent
  * moments (variance, skewness, kurtosis), least-squares regression, and
  * the boolean/bitwise aggregate family of the dask/pandas surface
  * (`skew()`, `kurt()`, `Series.all/any`, numpy bitwise reductions).
  *
  * Determinism design: Spark's `skewness`/`kurtosis`/`corr` and DuckDB's
  * equivalents stream central moments in engine-specific orders — their
  * doubles never hash-match. Instead every statistic here is derived
  * from RAW POWER SUMS computed exactly: the measure column is cast to
  * an integer-valued DECIMAL (quantities are integers ≤ 50, so
  * DECIMAL(3,0) powers up to x⁴ stay exact and far below 2^53), summed
  * exactly (decimal addition is associative → partitioning-invariant),
  * and the moment/regression formulas are evaluated over those identical
  * doubles with the SAME left-associative expression tree in both
  * engines — IEEE +,−,×,÷,sqrt are correctly rounded, so identical
  * operands + identical tree ⇒ bit-identical results, no rounding
  * fudge. (Money-valued sums ride graft.Det's scale-6 scheme as usual.)
  *
  * Scale notes (100 TB): power sums are one partial+final hash
  * aggregate over the group key — the same shuffle profile as a plain
  * SUM; nothing here adds a pass or a driver-side reduction.
  */
object Stats {

  import Det._

  /** Exact-profiler row ceiling for [[profileColumnsRouted]]: below it
    * the exact COUNT(DISTINCT)'s Expand ships a tolerable number of
    * distinct values; above it the HLL twin's output-bounded sketch is
    * the only shape that survives (SCALING.md: the exact profiler is
    * the registry's one NDV-linear operator by declared intent). 10M
    * rows ≈ tens of MB of Expand partials at these schemas — past that
    * the sketch wins outright. */
  private[graft] val ProfileExactMaxRows = 10_000_000L

  /** Shared body of `profile_columns` (exact = true: exact
    * COUNT(DISTINCT), DuckDB-oracled) and `profile_columns_approx`
    * (exact = false: HLL++ rsd-1% sketch per column, output-bounded —
    * declared-approximate). Identical single-scan aggregate + fixed
    * unpivot either way; only the NDV aggregate and its output column
    * name differ. */
  private def profileBody(s: SparkSession, d: String,
      exact: Boolean): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("v_big", when(col("value") > 400, col("value")))
      .withColumn("ts_us", Det.epochUs(col("ts")))
    def numS(c: Column) = c.cast(DecimalType(30, 6)).cast(StringType)
    def strS(c: Column) = c.cast(StringType)
    // (value column, post-agg min/max print function) per column
    val cols: Seq[(String, Column, Column => Column)] = Seq(
      ("event_id", col("event_id"), strS),
      ("event_type", col("event_type"), identity[Column]),
      ("props", col("props"), identity[Column]),
      ("ts", col("ts_us"), strS),
      ("user_id", col("user_id"), strS),
      ("v_big", col("v_big"), numS),
      ("value", col("value"), numS))
    val ndName = if (exact) "n_distinct" else "n_distinct_est"
    def nd(c: Column): Column =
      if (exact) countDistinct(c) else approx_count_distinct(c, 0.01)
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap {
      case (n, c, p) => Seq(
        count(c).as(s"${n}__nn"), nd(c).as(s"${n}__nd"),
        p(min(c)).as(s"${n}__min"), p(max(c)).as(s"${n}__max"))
    }
    val one = ev.agg(aggs.head, aggs.tail: _*)
    // constant-size unpivot of the single profile row
    val entries = cols.map { case (n, _, _) =>
      struct(lit(n).as("col_name"), col("n_rows"),
        (col("n_rows") - col(s"${n}__nn")).as("n_null"),
        col(s"${n}__nd").as(ndName),
        col(s"${n}__min").as("min_s"), col(s"${n}__max").as("max_s"))
    }
    one.select(explode(array(entries: _*)).as("p"))
      .select(col("p.*"))
      .orderBy("col_name")
  }

  /** The profiler routing rule AS CODE (r11 verdict item 7, previously
    * a doc comment): exact NDV while the table stays under
    * `exactMaxRows`, the HLL sketch twin above it — one COUNT(*) over
    * the scan makes the call (the same statistics-driven decision AQE
    * takes; a metadata-scale driver action, not a data collect). The
    * two DECLARED queries keep forcing their paths — the exact report
    * stays DuckDB-oracled, the sketch twin stays declared-approximate —
    * so oracle rows are untouched; this is the deployment entry point.
    * The routed output carries the unified `n_distinct` name plus an
    * `exact_ndv` marker so callers can tell which regime served them.
    * StatsApproxSpec pins the switchover in both directions. */
  private[graft] def profileColumnsRouted(s: SparkSession, d: String,
      exactMaxRows: Long = ProfileExactMaxRows): DataFrame = {
    val exact = Tables.events(s, d).count() <= exactMaxRows
    val body =
      if (exact) profileBody(s, d, exact = true)
      else profileBody(s, d, exact = false)
        .withColumnRenamed("n_distinct_est", "n_distinct")
    body.withColumn("exact_ndv", lit(exact))
  }

  /** Exact Σxᵏ for integer-valued x ≤ 999: decimal powers, associative
    * sum, exact double cast (all magnitudes ≪ 2^53). */
  private def ipow(c: Column, k: Int): Column = {
    val d = c.cast(DecimalType(3, 0))
    sum(Seq.fill(k)(d).reduce(_ * _)).cast(DoubleType)
  }
  private def sqlIpow(x: String, k: Int): String =
    "CAST(SUM(" + Seq.fill(k)(s"CAST($x AS DECIMAL(3,0))").mkString(" * ") +
      ") AS DOUBLE)"

  def decls: Seq[Decl] = Seq(

    // Moments of l_quantity per return flag: sample variance/stddev,
    // skewness, excess kurtosis — all from exact power sums s1..s4 with
    // mirrored expression trees (see object scaladoc).
    Decl("agg_moments",
      s"""WITH s AS (SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlIpow("l_quantity", 1)} AS s1,
         |    ${sqlIpow("l_quantity", 2)} AS s2,
         |    ${sqlIpow("l_quantity", 3)} AS s3,
         |    ${sqlIpow("l_quantity", 4)} AS s4
         |  FROM lineitem GROUP BY l_returnflag),
         |m AS (SELECT l_returnflag, n, s1 / n AS m, s1, s2, s3, s4 FROM s),
         |c AS (SELECT l_returnflag, n, m,
         |    s2 / n - m * m AS m2,
         |    s3 / n - 3.0 * m * (s2 / n) + 2.0 * m * m * m AS m3,
         |    s4 / n - 4.0 * m * (s3 / n) + 6.0 * m * m * (s2 / n)
         |      - 3.0 * m * m * m * m AS m4,
         |    (n * s2 - s1 * s1) / (n * (n - 1.0)) AS var_samp
         |  FROM m)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n, m AS mean,
         |  var_samp, sqrt(var_samp) AS stddev_samp,
         |  m3 / (sqrt(m2) * sqrt(m2) * sqrt(m2)) AS skewness,
         |  m4 / (m2 * m2) - 3.0 AS kurtosis
         |FROM c ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val q = col("l_quantity")
      val agg = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          ipow(q, 1).as("s1"), ipow(q, 2).as("s2"),
          ipow(q, 3).as("s3"), ipow(q, 4).as("s4"))
      val withM = agg.withColumn("m", col("s1") / col("n"))
      val m = col("m"); val n = col("n")
      val s1 = col("s1"); val s2 = col("s2")
      val s3 = col("s3"); val s4 = col("s4")
      val cen = withM
        .withColumn("m2", s2 / n - m * m)
        .withColumn("m3", s3 / n - lit(3.0) * m * (s2 / n)
          + lit(2.0) * m * m * m)
        .withColumn("m4", s4 / n - lit(4.0) * m * (s3 / n)
          + lit(6.0) * m * m * (s2 / n) - lit(3.0) * m * m * m * m)
        .withColumn("var_samp", (n * s2 - s1 * s1) / (n * (n - lit(1.0))))
      cen.select(col("l_returnflag"), n.cast(LongType).as("n"),
          m.as("mean"), col("var_samp"),
          sqrt(col("var_samp")).as("stddev_samp"),
          (col("m3") / (sqrt(col("m2")) * sqrt(col("m2")) * sqrt(col("m2"))))
            .as("skewness"),
          (col("m4") / (col("m2") * col("m2")) - lit(3.0)).as("kurtosis"))
        .orderBy("l_returnflag")
    },

    // Least-squares regression of extended price on quantity per return
    // flag: slope, intercept, r² from exact sums (the regr_slope /
    // regr_intercept / regr_r2 family, cross-engine-exact).
    Decl("agg_regr",
      s"""WITH s AS (SELECT l_returnflag,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlIpow("l_quantity", 1)} AS sx,
         |    ${sqlIpow("l_quantity", 2)} AS sxx,
         |    ${sqlSum("l_extendedprice")} AS sy,
         |    ${sqlSumProd2("l_extendedprice", "l_extendedprice")} AS syy,
         |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(3,0)) *
         |      CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR)
         |      AS DOUBLE) AS sxy
         |  FROM lineitem GROUP BY l_returnflag)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         |  (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         |  (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
         |    AS intercept,
         |  ((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
         |    ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
         |FROM s ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      val agg = Tables.lineitem(s, d).groupBy("l_returnflag")
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          ipow(col("l_quantity"), 1).as("sx"),
          ipow(col("l_quantity"), 2).as("sxx"),
          dsum(col("l_extendedprice")).as("sy"),
          dsumProd2(col("l_extendedprice"), col("l_extendedprice")).as("syy"),
          sum(col("l_quantity").cast(DecimalType(3, 0)) *
            col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast(DoubleType).as("sxy"))
      val n = col("n"); val sx = col("sx"); val sy = col("sy")
      val sxx = col("sxx"); val syy = col("syy"); val sxy = col("sxy")
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      agg.select(col("l_returnflag"), n.cast(LongType).as("n"),
          slope.as("slope"),
          ((sy - slope * sx) / n).as("intercept"),
          (((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
            ((n * sxx - sx * sx) * (n * syy - sy * sy))).as("r2"))
        .orderBy("l_returnflag")
    },

    // Boolean + bitwise aggregate family per order status (Series.all /
    // Series.any; numpy bitwise and/or/xor reductions) — integer-exact,
    // no determinism plumbing needed.
    Decl("agg_bool_bit",
      """SELECT o_orderstatus,
        |  bool_and(o_totalprice > 10000.0) AS all_over_10k,
        |  bool_or(o_totalprice > 400000.0) AS any_over_400k,
        |  bit_and(o_orderkey) AS key_and,
        |  bit_or(o_orderkey) AS key_or,
        |  bit_xor(o_orderkey) AS key_xor,
        |  COUNT(*) AS n
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
      Tables.orders(s, d).groupBy("o_orderstatus")
        .agg(bool_and(col("o_totalprice") > 10000.0).as("all_over_10k"),
          bool_or(col("o_totalprice") > 400000.0).as("any_over_400k"),
          bit_and(col("o_orderkey")).as("key_and"),
          bit_or(col("o_orderkey")).as("key_or"),
          bit_xor(col("o_orderkey")).as("key_xor"),
          count(lit(1)).as("n"))
        .orderBy("o_orderstatus")
    },

    // Fixed-width histogram of order totals (width_bucket semantics via
    // exact floor division; one hash aggregate — the 100 TB histogram).
    Decl("agg_histogram",
      s"""SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket,
         |  COUNT(*) AS n, ${sqlSum("o_totalprice")} AS total
         |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      Tables.orders(s, d)
        .groupBy(floor(col("o_totalprice") / 25000.0).cast(LongType)
          .as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket")
    },

    // Shannon entropy (nats) of each user-bucket's event-type mix — the
    // label-balance / diversity metric of training-data QA. ln is the
    // one function with NO exact cross-engine path: Spark's log is
    // StrictMath.log (fdlibm) while DuckDB rides libm, and they differ
    // by 1 ulp on some arguments (verified: ln(25/131) differs, ln of
    // the four sibling ratios agrees). So each p·ln p term is
    // quantized at scale 9 — quantum 1e-9, nine orders above the
    // ~5e-17 cross-engine drift, leaving a ~4e-7 per-term tie
    // probability — then summed exactly (order-independent) and cast
    // back (scaled integer ≪ 2^53, so the plain decimal→double cast
    // is correctly rounded in both engines). The oracle still casts
    // the TERM via VARCHAR (shortest-repr HALF_UP = Spark's Cast).
    // Two hash aggregates; no extra pass over the data.
    Decl("agg_entropy",
      """WITH c AS (SELECT user_id % 10 AS b, event_type,
        |    CAST(count(*) AS DOUBLE) AS c
        |  FROM events GROUP BY b, event_type),
        |n AS (SELECT b, CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_types
        |  FROM c GROUP BY b)
        |SELECT c.b AS bucket, CAST(n AS BIGINT) AS n_events, n_types,
        |  -CAST(SUM(CAST(CAST((c / n) * ln(c / n) AS VARCHAR)
        |    AS DECIMAL(20,9))) AS DOUBLE) AS entropy
        |FROM c JOIN n ON c.b = n.b
        |GROUP BY c.b, n, n_types ORDER BY bucket""".stripMargin) { (s, d) =>
      val cnt = Tables.events(s, d)
        .groupBy((col("user_id") % 10).as("b"), col("event_type"))
        .agg(count(lit(1)).cast(DoubleType).as("c"))
      val tot = cnt.groupBy(col("b").as("nb"))
        .agg(sum(col("c").cast(LongType)).cast(DoubleType).as("n"),
          count(lit(1)).as("n_types"))
      val p = col("c") / col("n")
      cnt.join(tot, col("b") === col("nb"))
        .groupBy(col("b").as("bucket"), col("n"), col("n_types"))
        .agg((-sum((p * log(p)).cast(DecimalType(20, 9)))
          .cast(DoubleType)).as("entropy"))
        .select(col("bucket"), col("n").cast(LongType).as("n_events"),
          col("n_types"), col("entropy"))
        .orderBy("bucket")
    },

    // Chi-square goodness-of-fit of the event-type mix against uniform:
    // observed counts are exact ints, expected = n/k in one double op,
    // each (o−e)²/e term is the identical IEEE tree, and the across-
    // term sum rides a decimal cast — order-independent, engine-exact.
    Decl("agg_chi2",
      """WITH c AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS o
        |  FROM events GROUP BY event_type),
        |t AS (SELECT CAST(count(*) AS DOUBLE) AS n,
        |    CAST(count(DISTINCT event_type) AS DOUBLE) AS k FROM events)
        |SELECT CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS df1,
        |  CAST(CAST(SUM(CAST(CAST((o - n / k) * (o - n / k) / (n / k)
        |    AS VARCHAR) AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS chi2
        |FROM c, t GROUP BY n, k""".stripMargin) { (s, d) =>
      val ev = Tables.events(s, d)
      val c = ev.groupBy("event_type")
        .agg(count(lit(1)).cast(DoubleType).as("o"))
      val t = ev.agg(count(lit(1)).cast(DoubleType).as("n"),
        countDistinct(col("event_type")).cast(DoubleType).as("k"))
      val e = col("n") / col("k")
      c.crossJoin(broadcast(t))
        .groupBy(col("n"), col("k"))
        .agg(sum(((col("o") - e) * (col("o") - e) / e)
          .cast(DecimalType(30, 12))).cast(DoubleType).as("chi2"))
        .select(col("n").cast(LongType).as("n_events"),
          col("k").cast(LongType).as("df1"), col("chi2"))
    },

    // Gini coefficient of order value per priority class — the
    // inequality/concentration measure of corpus and revenue QA, via
    // the sorted-rank formula G = Σ(2i−n−1)·xᵢ / (n·Σxᵢ). FULLY exact
    // cross-engine: ranks and n are ints, money is 2-decimal, so both
    // numerator and denominator are exact decimals; the single final
    // division runs on two correctly-rounded doubles (numerator's
    // scaled integer passes 2^53 at bench scale → the oracle takes the
    // VARCHAR hop, same as every big money sum).
    Decl("agg_gini",
      """WITH r AS (SELECT o_orderpriority,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS x,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice, o_orderkey) AS i,
        |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(CAST(SUM((2 * i - n - 1) * x) AS VARCHAR) AS DOUBLE) /
        |    CAST(CAST(MAX(n) * SUM(x) AS VARCHAR) AS DOUBLE) AS gini
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val wRank = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      val wAll = Window.partitionBy("o_orderpriority")
      Tables.orders(s, d)
        .select(col("o_orderpriority"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("x"),
          row_number().over(wRank).as("i"),
          count(lit(1)).over(wAll).as("n"))
        .groupBy("o_orderpriority")
        .agg(max(col("n")).as("n"),
          (sum((lit(2) * col("i") - col("n") - 1) * col("x"))
            .cast(DoubleType) /
            (max(col("n")) * sum(col("x"))).cast(DoubleType)).as("gini"))
        .select(col("o_orderpriority"), col("n"), col("gini"))
        .orderBy("o_orderpriority")
    },

    // Herfindahl–Hirschman concentration index of per-user activity
    // within each event type — entropy's market-share sibling, but with
    // NO libm: each share² is pure IEEE arithmetic on exact integer
    // ratios, decimal-cast per term (via-VARCHAR in the oracle — the
    // cast-semantics hop) for an order-independent sum.
    Decl("agg_hhi",
      """WITH c AS (SELECT event_type, user_id, count(*) AS c
        |  FROM events GROUP BY event_type, user_id),
        |t AS (SELECT event_type,
        |    CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM c GROUP BY event_type)
        |SELECT c.event_type, n_users,
        |  CAST(SUM(CAST(CAST(
        |      (CAST(c AS DOUBLE) / n) * (CAST(c AS DOUBLE) / n)
        |    AS VARCHAR) AS DECIMAL(20,15))) AS DOUBLE) AS hhi
        |FROM c JOIN t ON c.event_type = t.event_type
        |GROUP BY c.event_type, n_users ORDER BY c.event_type""".stripMargin) { (s, d) =>
      val c = Tables.events(s, d)
        .groupBy("event_type", "user_id")
        .agg(count(lit(1)).as("c"))
      val t = c.groupBy(col("event_type").as("te"))
        .agg(sum(col("c")).cast(DoubleType).as("n"),
          count(lit(1)).as("n_users"))
      val share = col("c").cast(DoubleType) / col("n")
      c.join(broadcast(t), col("event_type") === col("te"))
        .groupBy(col("event_type"), col("n_users"))
        .agg(sum((share * share).cast(DecimalType(20, 15)))
          .cast(DoubleType).as("hhi"))
        .orderBy("event_type")
    },

    // Revenue concentration: the top decile's share of total order
    // value — ntile over the price ordering (orderkey tiebreak), exact
    // decimal sums in numerator and denominator, one final division on
    // correctly-rounded doubles (VARCHAR hop past 2^53 on the oracle).
    // Scale note: the global ntile is a range-partitioned sort here for
    // EXACT decile bounds; the 100 TB form replaces it with a quantile
    // cutoff (percentile ≈ p90, broadcast) + filter — same two exact
    // sums, no global ordering.
    Decl("agg_topk_share",
      s"""WITH r AS (SELECT o_totalprice,
         |    ntile(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
         |      AS decile
         |  FROM orders)
         |SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         |  ${sqlSum("CASE WHEN decile = 1 THEN o_totalprice ELSE 0.0 END")} /
         |    ${sqlSum("o_totalprice")} AS top_decile_share
         |FROM r""".stripMargin) { (s, d) =>
      val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("decile", ntile(10).over(w))
        .agg(count(lit(1)).as("n_orders"),
          (dsum(when(col("decile") === 1, col("o_totalprice"))
            .otherwise(0.0)) / dsum(col("o_totalprice")))
            .as("top_decile_share"))
    },

    // Median absolute deviation per priority — the robust spread
    // statistic. Two stacked applications of the exact-median pick
    // (agg_median's rn ∈ {⌈n/2⌉, ⌈(n+1)/2⌉} + decimal-exact average):
    // once for the center, once over |x − med| (one IEEE subtract/abs
    // on identical doubles; dev ordering totalized by the order key).
    Decl("agg_mad",
      s"""WITH r AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders),
         |med AS (SELECT o_orderpriority,
         |    ${sqlSum("o_totalprice")} / COUNT(*) AS med
         |  FROM r WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
         |  GROUP BY o_orderpriority),
         |dev AS (SELECT o.o_orderpriority, o.o_orderkey,
         |    ABS(o.o_totalprice - m.med) AS dev
         |  FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority),
         |dr AS (SELECT o_orderpriority, dev,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY dev, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM dev)
         |SELECT dr.o_orderpriority, MAX(m.med) AS med,
         |  ${sqlSum("dev")} / COUNT(*) AS mad
         |FROM dr JOIN med m ON dr.o_orderpriority = m.o_orderpriority
         |WHERE rn IN ((n + 1) // 2, (n + 2) // 2)
         |GROUP BY dr.o_orderpriority ORDER BY dr.o_orderpriority""".stripMargin) { (s, d) =>
      def medianOf(df: DataFrame, key: String, v: String,
          tiebreak: String, out: String) = {
        val wOrd = Window.partitionBy(key).orderBy(v, tiebreak)
        val wAll = Window.partitionBy(key)
        df.withColumn("rn", row_number().over(wOrd))
          .withColumn("n", count(lit(1)).over(wAll))
          .filter(col("rn") === expr("(n + 1) div 2")
            || col("rn") === expr("(n + 2) div 2"))
          .groupBy(key).agg(davg(col(v)).as(out))
      }
      val orders = Tables.orders(s, d)
      // med feeds TWO consumers (the dev join and the final output
      // join); unpinned, Spark plans the whole scan→exchange→sort→
      // window median pipeline once PER consumer (no ReusedExchange
      // across the differently-projected subtrees — the measured plan
      // had 3 full window sorts of orders where 2 suffice). The frame
      // is group-cardinality rows (5 priorities), so the lazy pin is
      // free at any corpus scale (guide §2.4: share one computation).
      val med = medianOf(orders, "o_orderpriority", "o_totalprice",
        "o_orderkey", "med").localCheckpoint(false)
      val dev = orders.join(med.withColumnRenamed("o_orderpriority", "mp"),
          col("o_orderpriority") === col("mp"))
        .select(col("o_orderpriority"), col("o_orderkey"),
          abs(col("o_totalprice") - col("med")).as("dev"))
      medianOf(dev, "o_orderpriority", "dev", "o_orderkey", "mad")
        .join(med.withColumnRenamed("o_orderpriority", "mp"),
          col("o_orderpriority") === col("mp"))
        .select(col("o_orderpriority"), col("med"), col("mad"))
        .orderBy("o_orderpriority")
    },

    // The 100 TB MAD: both medians via percentile_approx (Greenwald-
    // Khanna style quantile sketch, accuracy 10³ — rank error 10⁻³, far
    // inside the ±5% bound, and small enough that the partial summaries
    // SATURATE at test scale: at 10⁴ the partials were still raw-sample
    // sized through sf0.1 and the audit read as input-linear) instead of the exact
    // window sorts above — two hash aggregates with BOUNDED per-group
    // sketch state and no global sort, so per-partition partials merge
    // map-side and the shuffle carries sketches, not rows. The exact
    // agg_mad stays as the oracle shape at test scale; this twin is
    // declared-approximate (SURVEY §2 rule 4: no DuckDB oracle — the
    // sketch's merge order is engine-specific), and StatsApproxSpec
    // pins med and mad within ±5% of exact at all three SFs.
    Decl.noOracle("agg_mad_approx") { (s, d) =>
      val orders = Tables.orders(s, d)
      val med = orders.groupBy("o_orderpriority")
        .agg(percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
          .as("med"))
      // EXPLICIT broadcast: med is 5 rows but sits behind an aggregate,
      // where the planner has no size estimate — without the hint this
      // planned as a sort-merge join that re-shuffled all of orders by
      // priority (ScaleAudit measured the twin input-linear, 8.6×/4.4×
      // across the sf hops; with the hint the orders side never
      // exchanges and only sketch partials ship)
      orders.join(broadcast(med.withColumnRenamed("o_orderpriority", "mp")),
          col("o_orderpriority") === col("mp"))
        .select(col("o_orderpriority"), col("med"),
          abs(col("o_totalprice") - col("med")).as("dev"))
        .groupBy("o_orderpriority")
        .agg(max(col("med")).as("med"),
          percentile_approx(col("dev"), lit(0.5), lit(1000)).as("mad"))
        .orderBy("o_orderpriority")
    },

    // 5%-trimmed mean per priority: drop the n/20 smallest and largest
    // by exact integer rank bounds, exact-decimal mean of the kept
    // middle — the outlier-robust center estimate.
    Decl("agg_trimmed_mean",
      s"""WITH r AS (SELECT o_orderpriority, o_totalprice,
         |    row_number() OVER (PARTITION BY o_orderpriority
         |      ORDER BY o_totalprice, o_orderkey) AS rn,
         |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
         |  FROM orders)
         |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_kept,
         |  ${sqlSum("o_totalprice")} / COUNT(*) AS trimmed_mean
         |FROM r WHERE rn > n // 20 AND rn <= n - n // 20
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
      val wOrd = Window.partitionBy("o_orderpriority")
        .orderBy("o_totalprice", "o_orderkey")
      val wAll = Window.partitionBy("o_orderpriority")
      Tables.orders(s, d)
        .withColumn("rn", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(wAll))
        .filter(col("rn") > expr("n div 20")
          && col("rn") <= col("n") - expr("n div 20"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_kept"),
          davg(col("o_totalprice")).as("trimmed_mean"))
        .orderBy("o_orderpriority")
    },

    // 3σ outlier counts of event values per type — the anomaly gate of
    // stream QA. Mean/σ come from scale-6-quantized decimal power sums
    // (the established events.value contract; factors hop via VARCHAR
    // in the oracle so both engines quantize the shortest repr), and
    // the flag comparison runs on identical doubles.
    Decl("agg_outlier_count",
      """WITH s AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(12,6)))
        |      AS VARCHAR) AS DOUBLE) AS s1,
        |    CAST(CAST(SUM(CAST(CAST(value AS VARCHAR) AS DECIMAL(12,6)) *
        |                  CAST(CAST(value AS VARCHAR) AS DECIMAL(12,6)))
        |      AS VARCHAR) AS DOUBLE) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT e.event_type, CAST(s.n AS BIGINT) AS n,
        |  s.s1 / s.n AS mean,
        |  CAST(SUM(CASE WHEN ABS(e.value - s.s1 / s.n) >
        |      3.0 * sqrt((s.n * s.s2 - s.s1 * s.s1) / (s.n * (s.n - 1.0)))
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM events e JOIN s ON e.event_type = s.event_type
        |GROUP BY e.event_type, s.n, s.s1, s.s2
        |ORDER BY e.event_type""".stripMargin) { (s, d) =>
      val vdec = col("value").cast(DecimalType(12, 6))
      val st = Tables.events(s, d).groupBy(col("event_type").as("se"))
        .agg(count(lit(1)).cast(DoubleType).as("n"),
          sum(vdec).cast(DoubleType).as("s1"),
          sum(vdec * vdec).cast(DoubleType).as("s2"))
      val mean = col("s1") / col("n")
      val sd = sqrt((col("n") * col("s2") - col("s1") * col("s1")) /
        (col("n") * (col("n") - lit(1.0))))
      Tables.events(s, d)
        .join(broadcast(st), col("event_type") === col("se"))
        .groupBy(col("event_type"), col("n"), col("s1"), col("s2"))
        .agg(sum(when(abs(col("value") - mean) > lit(3.0) * sd, 1)
          .otherwise(0)).cast(LongType).as("n_outliers"))
        .select(col("event_type"), col("n").cast(LongType).as("n"),
          mean.as("mean"), col("n_outliers"))
        .orderBy("event_type")
    },

    // Rolling EXACT median over the trailing 5 events per user — the
    // robust-smoothing window (spike rejection) a monitoring pipeline
    // runs over every metric stream. The frame is materialized as a
    // sorted 5-element array per row: constant-size state, so unlike a
    // global median this stays a single partitioned window pass at any
    // scale. Odd frames take the middle element verbatim; even (the
    // first ramp-up rows) average two elements — one IEEE division of
    // identical doubles, so cross-engine exact.
    Decl("window_rolling_median",
      // median of the NON-NULL values in the frame (missing
      // measurements don't vote); an all-null frame yields NULL —
      // matching Spark's collect_list, which skips nulls natively
      """WITH a AS (SELECT user_id, event_id, value,
        |    list_filter(list_sort(list(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)),
        |      x -> x IS NOT NULL) AS arr
        |  FROM events)
        |SELECT user_id, event_id, value,
        |  CASE WHEN len(arr) = 0 THEN NULL
        |       WHEN len(arr) % 2 = 1 THEN arr[(len(arr) + 1) // 2]
        |       ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) / 2.0
        |  END AS roll_med
        |FROM a ORDER BY user_id, event_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
      val arr = col("arr")
      val n = size(arr)
      Tables.events(s, d)
        .withColumn("arr", sort_array(collect_list(col("value")).over(w)))
        .select(col("user_id"), col("event_id"), col("value"),
          // Column `/` is double division — cast back for the index
          // (values are small positive ints, truncation == floor).
          // collect_list skips nulls, so an all-null frame is empty:
          // guard it to NULL before any element_at(…, 0) can throw.
          when(n === 0, lit(null))
            .when(n % 2 === 1,
              element_at(arr, ((n + 1) / 2).cast(IntegerType)))
            .otherwise((element_at(arr, (n / 2).cast(IntegerType)) +
              element_at(arr, (n / 2).cast(IntegerType) + 1)) / lit(2.0))
            .as("roll_med"))
        .orderBy("user_id", "event_id")
    },

    // Two-proportion z-test (A/B experiment readout): variant = user_id
    // parity, conversion = user ever fired a purchase event. The four
    // counts are exact integers; z is evaluated with the SAME
    // left-associative IEEE tree in both engines (each /,*,−,sqrt is
    // correctly rounded, so mirrored trees are bit-identical — the
    // agg_moments precedent), then passed through the decimal(20,9)
    // quantization hop as defense in depth. Scale: one partial+final
    // per-user aggregate, then a 4-integer reduce — the entire
    // statistical readout ships 2 rows regardless of corpus size.
    Decl("ab_test_z",
      """WITH u AS (SELECT user_id, user_id % 2 AS v,
        |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
        |  FROM events GROUP BY user_id),
        |g AS (SELECT
        |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        |    CAST(SUM(CASE WHEN v = 0 THEN c ELSE 0 END) AS BIGINT) AS c0,
        |    CAST(SUM(CASE WHEN v = 1 THEN c ELSE 0 END) AS BIGINT) AS c1
        |  FROM u)
        |SELECT n0, n1, c0, c1,
        |  CASE WHEN c0 + c1 = 0 OR c0 + c1 = n0 + n1 THEN NULL ELSE
        |  CAST(CAST(CAST(
        |    ((CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)) -
        |     (CAST(c0 AS DOUBLE) / CAST(n0 AS DOUBLE))) /
        |    sqrt((CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
        |      (1.0 - CAST(c0 + c1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)) *
        |      (1.0 / CAST(n0 AS DOUBLE) + 1.0 / CAST(n1 AS DOUBLE)))
        |    AS VARCHAR) AS DECIMAL(20,9)) AS DOUBLE) END AS z9
        |FROM g""".stripMargin) { (s, d) =>
      val u = Tables.events(s, d)
        .groupBy("user_id")
        .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("c"))
        .withColumn("v", col("user_id") % 2)
      val g = u.agg(
        sum(when(col("v") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("v") === 1, 1L).otherwise(0L)).as("n1"),
        sum(when(col("v") === 0, col("c").cast(LongType)).otherwise(0L))
          .as("c0"),
        sum(when(col("v") === 1, col("c").cast(LongType)).otherwise(0L))
          .as("c1"))
      val dbl = (c: Column) => c.cast(DoubleType)
      val p = dbl(col("c0") + col("c1")) / dbl(col("n0") + col("n1"))
      val z = ((dbl(col("c1")) / dbl(col("n1"))) -
        (dbl(col("c0")) / dbl(col("n0")))) /
        sqrt(p * (lit(1.0) - p) *
          (lit(1.0) / dbl(col("n0")) + lit(1.0) / dbl(col("n1"))))
      // degenerate experiment (nobody / everybody converted): se = 0,
      // z undefined — NULL in both engines, and ANSI mode must never
      // see the division (hence the guard OUTSIDE the cast chain)
      g.select(col("n0"), col("n1"), col("c0"), col("c1"),
        when(col("c0") + col("c1") === 0 ||
          col("c0") + col("c1") === col("n0") + col("n1"), lit(null))
          .otherwise(z.cast(DecimalType(20, 9)).cast(DoubleType))
          .as("z9"))
    },

    // Data profiler — the schema-quality report a pipeline runs before
    // trusting a new 100 TB drop: per column, row count, null count,
    // exact distinct count, lexical min/max (numerics via a fixed
    // DECIMAL(30,6) print so both engines format identically; the
    // timestamp via epoch-µs). `v_big` is a derived metric column
    // (value when > 400) so the null-accounting path is exercised by
    // GENUINE nulls, not a synthetic literal. One scan, one aggregate:
    // the n column-profiles are 4n agg expressions over a single pass
    // (Spark plans the multi-distinct via one Expand + one shuffle),
    // then a constant-size unpivot of the 1-row result — row count
    // never touches the unpivot, so this is a fixed-cost report at any
    // data size.
    Decl("profile_columns", {
      def num(x: String) = s"CAST(CAST($x AS DECIMAL(30,6)) AS VARCHAR)"
      def str(x: String) = s"CAST($x AS VARCHAR)"
      def row(name: String, c: String, print: String => String) =
        s"""SELECT '$name' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct,
           |  ${print(s"MIN($c)")} AS min_s,
           |  ${print(s"MAX($c)")} AS max_s FROM ev""".stripMargin
      s"""WITH ev AS (SELECT *,
         |    CASE WHEN value > 400 THEN value END AS v_big,
         |    epoch_us(ts) AS ts_us
         |  FROM events)
         |${Seq(
          row("event_id", "event_id", str),
          row("event_type", "event_type", identity[String]),
          row("props", "props", identity[String]),
          row("ts", "ts_us", str),
          row("user_id", "user_id", str),
          row("v_big", "v_big", num),
          row("value", "value", num)).mkString(
          "\n", "\nUNION ALL\n", "\n")}ORDER BY col_name""".stripMargin
    }) { (s, d) =>
      profileBody(s, d, exact = true)
    },

    // Sketch-backed profiler twin — the 100 TB form of profile_columns.
    // The exact profiler's COUNT(DISTINCT) per column is the one
    // NDV-linear operator left in the registry (SCALING.md r7: 7.5×
    // shuffle bytes at 10× rows — Spark plans multi-distinct via an
    // Expand that ships every distinct value); here each NDV is an
    // HLL++ register set (approx_count_distinct, rsd = 1%), so every
    // partial aggregate ships a FIXED-size sketch per column and the
    // shuffle is output-bounded at any corpus size. Everything else
    // (row/null counts, min/max prints) is identical to the exact
    // profiler, which serves as its oracle at test scale:
    // declared-approximate (SURVEY §2 rule 4 — no DuckDB oracle),
    // StatsApproxSpec pins every column's estimate within ±5% of exact
    // at all three SFs, and ScaleAudit records the flattened shuffle
    // fingerprint next to the exact profiler's.
    Decl.noOracle("profile_columns_approx") { (s, d) =>
      profileBody(s, d, exact = false)
    }
  )
}
