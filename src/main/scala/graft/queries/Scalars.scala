package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function surface (SURVEY.md §2 rows B24-B32) — the `.str`,
  * `.dt`, numeric-ufunc, JSON, and array accessors of the reference's
  * dask/pandas API, as codegen'd Spark built-ins (no UDFs in this file;
  * the deliberate-UDF rows B33-B35 live in Udx.scala).
  *
  * Cross-engine hazards handled here:
  *  - `ceil`/`floor` return LONG in Spark, DOUBLE in DuckDB → oracle casts;
  *  - transcendental fns (ln/exp/pow) are not correctly-rounded by libm,
  *    so results are rounded to 4 decimals (sqrt IS correctly rounded —
  *    IEEE 754 — and stays raw);
  *  - never ROUND at or below the data's true decimal precision (money
  *    has 2 decimals: round(x, 1) lands exactly on ties where the
  *    engines' rounding modes disagree — see graft.Det scaladoc);
  *  - float array elements are cast to double *before* arithmetic so
  *    both engines promote identically.
  */
object Scalars {

  import Det._

  def decls: Seq[Decl] = Seq(

    // B24: string functions on part names.
    Decl("scalar_string",
      """SELECT p_partkey, upper(p_name) AS up, substr(p_name, 1, 5) AS pre,
        |  length(p_name) AS len, concat_ws('-', p_brand, p_type) AS bt,
        |  (p_name LIKE '%red%') AS has_red,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS w1,
        |  len(string_split(p_name, ' ')) AS n_words,
        |  replace(p_name, ' ', '_') AS snake,
        |  trim(concat(' ', p_name, ' ')) AS trimmed
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, d) =>
      Tables.part(s, d).select(
        col("p_partkey"), upper(col("p_name")).as("up"),
        substring(col("p_name"), 1, 5).as("pre"),
        length(col("p_name")).as("len"),
        concat_ws("-", col("p_brand"), col("p_type")).as("bt"),
        col("p_name").like("%red%").as("has_red"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("w1"),
        size(split(col("p_name"), " ")).as("n_words"),
        regexp_replace(col("p_name"), " ", "_").as("snake"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trimmed"))
        .orderBy("p_partkey")
    },

    // B25: date/time functions on order dates.
    Decl("scalar_date",
      """SELECT o_orderkey, year(o_orderdate) AS y, month(o_orderdate) AS m,
        |  day(o_orderdate) AS dom, quarter(o_orderdate) AS q,
        |  date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"), year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        quarter(col("o_orderdate")).as("q"),
        datediff(col("o_orderdate"), lit("1995-01-01")).as("days_since"),
        dateStr(date_trunc("month", col("o_orderdate"))).as("month_start"),
        dateStr(add_months(col("o_orderdate"), 3)).as("plus3m"),
        dateStr(last_day(col("o_orderdate"))).as("month_end"))
        .orderBy("o_orderkey")
    },

    // B26: math functions on prices/keys.
    Decl("scalar_math",
      """SELECT o_orderkey,
        |  sqrt(o_totalprice) AS sq,
        |  round(ln(o_totalprice), 4) AS ln4,
        |  round(exp(o_totalprice / 100000.0), 4) AS ex4,
        |  round(pow(o_totalprice, 0.3), 4) AS pw4,
        |  abs(o_totalprice - 200000.0) AS ab,
        |  CAST(ceil(o_totalprice) AS BIGINT) AS ce,
        |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
        |  o_orderkey % 7 AS md
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      Tables.orders(s, d).select(
        col("o_orderkey"),
        sqrt(col("o_totalprice")).as("sq"),
        round(log(col("o_totalprice")), 4).as("ln4"),
        round(exp(col("o_totalprice") / 100000.0), 4).as("ex4"),
        round(pow(col("o_totalprice"), 0.3), 4).as("pw4"),
        abs(col("o_totalprice") - 200000.0).as("ab"),
        ceil(col("o_totalprice")).as("ce"),
        floor(col("o_totalprice")).as("fl"),
        pmod(col("o_orderkey"), lit(7)).as("md"))
        .orderBy("o_orderkey")
    },

    // B27: JSON extraction from events.props, aggregated by type.
    Decl("scalar_json",
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
        |    AS sum_k,
        |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
        |    / COUNT(*) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          (sum(col("k")).cast(DoubleType) / count(lit(1))).as("avg_k"))
        .orderBy("event_type")
    },

    // B27b: VARIANT (Spark 4's semi-structured type) — parse_json into
    // an open-schema variant, then typed-path extraction with
    // variant_get: the shredded binary encoding scans far faster than
    // per-row JSON string parsing at 100 TB, and one column serves
    // heterogeneous payloads without schema migration. The nested doc
    // round-trips a struct through to_json→parse_json (shortest-repr
    // doubles survive exactly); the oracle reads the same values
    // relationally, so matching hashes prove the variant path-typed
    // extraction is lossless.
    Decl("scalar_variant",
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
        |  event_type AS t, value AS x
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val v = parse_json(col("props"))
      val nested = parse_json(to_json(struct(
        col("event_type").as("t"), col("value").as("x"))))
      Tables.events(s, d)
        .select(col("event_id"),
          variant_get(v, "$.k", "bigint").as("k"),
          variant_get(nested, "$.t", "string").as("t"),
          variant_get(nested, "$.x", "double").as("x"))
        .orderBy("event_id")
    },

    // B29: MapType — props parsed into map<string,int>, key/value access.
    Decl("scalar_map",
      """SELECT event_id, json_keys(props)[1] AS key0,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
        |  len(json_keys(props)) AS n_keys
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      val m = from_json(col("props"), MapType(StringType, IntegerType))
      Tables.events(s, d).select(
        col("event_id"),
        element_at(map_keys(m), 1).as("key0"),
        element_at(m, "k").as("k_val"),
        size(map_keys(m)).as("n_keys"))
        .orderBy("event_id")
    },

    // B28: array functions + higher-order arithmetic on embeddings.
    // Elements cast to double before adding (float + float stays float in
    // both engines, but mixed promotion rules differ) — explicit left-
    // assoc double additions are bit-deterministic.
    Decl("scalar_array",
      """SELECT vec_id, len(embedding) AS dim,
        |  embedding[1] AS e1, embedding[64] AS e64,
        |  CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
        |    + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)
        |    AS head_sum
        |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, d) =>
      def e(i: Int) = element_at(col("embedding"), i).cast(DoubleType)
      Tables.embeddings(s, d).select(
        col("vec_id"), size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("e1"),
        element_at(col("embedding"), 64).as("e64"),
        (e(1) + e(2) + e(3) + e(4)).as("head_sum"))
        .orderBy("vec_id")
    },

    // B28b: array manipulation — sort, join-to-string, position, contains,
    // reverse — over the token arrays (the pandas object-column idioms).
    Decl("scalar_array_ops",
      """SELECT doc_id,
        |  list_sort(string_split(text, ' '))[1] AS first_tok,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3],
        |    ',') AS top3,
        |  list_contains(string_split(text, ' '), 'the') AS has_the,
        |  list_reverse(string_split(text, ' '))[1] AS last_tok
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (s, d) =>
      val tks = split(col("text"), " ")
      Tables.documents(s, d)
        .filter(col("doc_id") < 200)
        .select(col("doc_id"),
          element_at(array_sort(tks), 1).as("first_tok"),
          array_join(slice(array_sort(array_distinct(tks)), 1, 3), ",")
            .as("top3"),
          array_contains(tks, "the").as("has_the"),
          element_at(reverse(tks), 1).as("last_tok"))
        .orderBy("doc_id")
    },

    // B31: describe/summary statistics (exact; approx variant below).
    Decl("sample_stats",
      s"""SELECT COUNT(*) AS n, ${sqlAvg("l_quantity")} AS mean_qty,
         |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
         |  MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty,
         |  quantile_cont(l_quantity, 0.5) AS median_qty,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price
         |FROM lineitem""".stripMargin) { (s, d) =>
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n"), davg(col("l_quantity")).as("mean_qty"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        min(col("l_quantity")).as("min_qty"), max(col("l_quantity")).as("max_qty"),
        percentile(col("l_quantity"), lit(0.5)).as("median_qty"),
        min(col("l_extendedprice")).as("min_price"),
        max(col("l_extendedprice")).as("max_price"))
    },

    // B31b: t-digest-style approximate quantiles — engines' sketches
    // differ, no oracle; RelationalSpec bounds them against exact.
    Decl.noOracle("sample_stats_approx") { (s, d) =>
      Tables.lineitem(s, d).agg(
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(1000)).as("p50"),
        percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95"),
        approx_count_distinct(col("l_partkey")).as("nd_parts"))
    },

    // B32: deterministic bernoulli sample via a hash gate on the key.
    // df.sample(seed)'s XORShift stream is PARTITIONING-dependent — the
    // same seed gives a different sample after a repartition, which is
    // the wrong property for a reproducible 100 TB pipeline (and has no
    // DuckDB twin). Hashing the row key is partition-invariant, exactly
    // reproducible in any engine, and still an unbiased p=0.5 bernoulli
    // draw per row.
    Decl("sample",
      """SELECT doc_id, lang FROM documents
        |WHERE (CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))
        |       AS BIGINT) % 100) < 50
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      Tables.documents(s, d)
        .filter(sha60(col("doc_id").cast(StringType)) % 100 < 50)
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // B32b: STRATIFIED sampling — per-language keep rates, the
    // data-mixing primitive of a training pipeline (downsample the
    // dominant language, keep the tails whole). Same hash gate as
    // `sample`, so it is partition-invariant, exactly reproducible,
    // and the realized rate per stratum is independently checkable.
    Decl("sample_stratified",
      """SELECT lang, COUNT(*) AS n_kept FROM documents
        |WHERE (CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 15))
        |       AS BIGINT) % 1000) <
        |  CASE lang WHEN 'en' THEN 250 WHEN 'de' THEN 500 ELSE 1000 END
        |GROUP BY lang ORDER BY lang NULLS FIRST""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      val rate = when(col("lang") === "en", 250)
        .when(col("lang") === "de", 500).otherwise(1000)
      Tables.documents(s, d)
        .filter(sha60(col("doc_id").cast(StringType)) % 1000 < rate)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_kept"))
        .orderBy("lang")
    },

    // Fixed-SIZE per-group sample (the `groupby().sample(n=…)` /
    // stratified-n surface; sample_stratified above is rate-based):
    // the 20 hash-smallest docs per language — deterministic, uniform
    // within each group, and window-parallel per group key.
    Decl("sample_group_n", {
      val h = graft.functions.XHash
        .sqlSha60("'gs:' || CAST(doc_id AS VARCHAR)")
      s"""SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT lang, doc_id, row_number() OVER (
         |      PARTITION BY lang ORDER BY $h, doc_id) AS rk
         |  FROM documents)
         |WHERE rk <= 20 ORDER BY lang NULLS FIRST, rk""".stripMargin
    }) { (s, d) =>
      import graft.functions.XHash.sha60
      val w = Window.partitionBy("lang")
        .orderBy(sha60(concat(lit("gs:"), col("doc_id").cast(StringType))),
          col("doc_id"))
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"), row_number().over(w).as("rk"))
        .filter(col("rk") <= 20)
        .orderBy("lang", "rk")
    },

    // B25b: string↔typed parsing round-trips (pandas `to_datetime` /
    // `astype`): dates and numbers are rendered to strings and parsed
    // back. Only the REPARSED values are emitted — double→string
    // formatting has engine corners, but string→double parsing is an
    // exact round-trip in both, so the values are bit-identical.
    Decl("scalar_parse",
      """WITH s AS (
        |  SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS ds,
        |    CAST(o_totalprice AS VARCHAR) AS ps
        |  FROM orders)
        |SELECT o_orderkey,
        |  strftime(strptime(ds, '%Y-%m-%d'), '%Y-%m-%d') AS reparsed_date,
        |  year(strptime(ds, '%Y-%m-%d')) AS y,
        |  CAST(ps AS DOUBLE) AS reparsed_price
        |FROM s ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val parsed = to_timestamp(
        date_format(col("o_orderdate"), "yyyy-MM-dd"), "yyyy-MM-dd")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          date_format(parsed, "yyyy-MM-dd").as("reparsed_date"),
          year(parsed).as("y"),
          col("o_totalprice").cast(StringType).cast(DoubleType)
            .as("reparsed_price"))
        .orderBy("o_orderkey")
    },

    // B32c: deterministic train/valid/test split — THE dataset-prep
    // primitive: assignment is a pure function of the row key (salted so
    // it is independent of the `sample` gate), so it is reproducible
    // across runs, engines, partitionings, and re-shards; per-language
    // counts audit stratification drift.
    Decl("split_train_test",
      """WITH tagged AS (
        |  SELECT lang, n_chars,
        |    CASE WHEN (CAST(('0x' || substr(sha256('split' ||
        |           CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 80
        |         THEN 'train'
        |         WHEN (CAST(('0x' || substr(sha256('split' ||
        |           CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100) < 90
        |         THEN 'valid' ELSE 'test' END AS split
        |  FROM documents)
        |SELECT lang, split, COUNT(*) AS n,
        |  CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM tagged GROUP BY lang, split
        |ORDER BY lang NULLS FIRST, split""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      val gate = sha60(concat(lit("split"), col("doc_id").cast(StringType))) % 100
      Tables.documents(s, d)
        .withColumn("split",
          when(gate < 80, "train").when(gate < 90, "valid").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
        .orderBy("lang", "split")
    },

    // Corpus length histogram — doc-length distribution in fixed-width
    // buckets (the standard pre-training length diagnostic). Integer
    // bucket math only, so the oracle is exact.
    Decl("text_length_hist",
      """SELECT (n_chars // 100) * 100 AS bucket_lo,
        |  COUNT(*) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
        |FROM documents GROUP BY bucket_lo ORDER BY bucket_lo""".stripMargin) { (s, d) =>
      // integer division on BOTH engines: `/` is true division in each,
      // and casting the double back truncates in Spark but rounds
      // half-even in DuckDB (350/100 → 3 vs 4)
      Tables.documents(s, d)
        .withColumn("bucket_lo", expr("(n_chars DIV 100) * 100"))
        .groupBy("bucket_lo")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("bucket_lo")
    },

    // B26b: bitwise scalar ops (numpy `&|^<<>>` ufunc surface). Shifts
    // are masked first so ANSI mode can't overflow; DuckDB's `^` is
    // POWER, so its xor is the xor() function.
    Decl("scalar_bitwise",
      """SELECT event_id,
        |  event_id & 255 AS b_and,
        |  event_id | 4096 AS b_or,
        |  xor(event_id, 255) AS b_xor,
        |  (event_id & 255) << 3 AS b_shl,
        |  event_id >> 4 AS b_shr,
        |  bit_count(event_id) AS b_cnt
        |FROM events ORDER BY event_id""".stripMargin) { (s, d) =>
      Tables.events(s, d).select(col("event_id"),
          expr("event_id & 255").as("b_and"),
          expr("event_id | 4096").as("b_or"),
          expr("event_id ^ 255").as("b_xor"),
          shiftleft(expr("event_id & 255"), 3).as("b_shl"),
          shiftright(col("event_id"), 4).as("b_shr"),
          bit_count(col("event_id")).as("b_cnt"))
        .orderBy("event_id")
    },

    // B: struct (record) columns — construction, field access, arrays of
    // structs (the reference's pandas-object nested rows, first-class
    // here; SURVEY §1.1). All outputs unwrap to primitives so the driver
    // hash sees no nested types.
    Decl("scalar_struct",
      """SELECT o_orderkey,
        |  (struct_pack(st := o_orderstatus, price := o_totalprice)).st
        |    AS s_status,
        |  (struct_pack(st := o_orderstatus, price := o_totalprice)).price
        |    * 2.0 AS s_price2,
        |  ([struct_pack(p := o_totalprice)])[1].p AS arr_struct_price
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val rec = struct(col("o_orderstatus").as("st"),
        col("o_totalprice").as("price"))
      Tables.orders(s, d).select(col("o_orderkey"),
          rec.getField("st").as("s_status"),
          (rec.getField("price") * 2.0).as("s_price2"),
          element_at(array(struct(col("o_totalprice").as("p"))), 1)
            .getField("p").as("arr_struct_price"))
        .orderBy("o_orderkey")
    },

    // regexp_extract_all — every match, not just the first (the `.str
    // .findall` surface). Both engines share the name and semantics on
    // the RE2/Java-common subset; counts and boundary elements keep the
    // output scalar-typed for the hash gate.
    Decl("scalar_regex_all",
      """WITH m AS (SELECT doc_id,
        |    regexp_extract_all(text, '[a-z]{6,}') AS ms
        |  FROM documents)
        |SELECT doc_id, len(ms) AS n_long_words,
        |  COALESCE(ms[1], '') AS first_m,
        |  COALESCE(ms[len(ms)], '') AS last_m
        |FROM m ORDER BY doc_id""".stripMargin) { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("[a-z]{6,}"), lit(0))
            .as("ms"))
        .select(col("doc_id"), size(col("ms")).as("n_long_words"),
          // element_at(_, 0) THROWS under ANSI; guard the empty case
          // instead of leaning on coalesce like the DuckDB twin can
          when(size(col("ms")) > 0, element_at(col("ms"), 1))
            .otherwise("").as("first_m"),
          when(size(col("ms")) > 0,
            element_at(col("ms"), size(col("ms"))))
            .otherwise("").as("last_m"))
        .orderBy("doc_id")
    }
  )
}
