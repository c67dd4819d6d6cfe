package graft.queries

import graft.{Decl, Det, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data preparation operators — the steps between "cleaned
  * corpus" and "batches on the trainer": context-window chunking,
  * sequence packing, and feature scaling. (Dedup, similarity,
  * language-ID and quality scoring live in their own modules; these are
  * the remaining mandated pipeline stages.)
  *
  * Scale notes (100 TB):
  *  - chunking is a pure per-row flatMap (posexplode over a computed
  *    range) — no shuffle, streams through whatever partitioning the
  *    scan produced;
  *  - packing needs a running token count, which is ONLY scalable when
  *    the window is partitioned — we pack within language shards
  *    (PARTITION BY lang), the standard sharded-packing compromise: a
  *    global greedy pack is inherently sequential, a per-shard pack is
  *    embarrassingly parallel and loses at most one batch per shard
  *    boundary;
  *  - feature scaling broadcasts one 6-double stats row; the data pass
  *    is map-only.
  */
object MlPrep {

  import Det._

  /** The mix_temperature policy REALIZED as per-language keep rates
    * (ppm): multiplier m_i = temp_share/raw_share, normalized by the
    * max so the most-upsampled language keeps everything and the rest
    * downsample proportionally — a target mix reached by downsampling
    * only (the streaming-friendly direction: no row can be invented).
    * rate_ppm = least(1e6, floor(1e6 · m_i / max m)); every step is a
    * fixed-operand-order IEEE chain over the exactly-rounded sqrt, so
    * the rates replay bit-for-bit in the [[sqlTemperatureRates]] twin.
    * Model-sized everywhere: one lang-keyed count + broadcast scalars. */
  private[graft] def temperatureRatesPpm(
      s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val c = Tables.documents(s, d).filter(col("lang").isNotNull)
      .groupBy("lang").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    val t = broadcast(c.agg(sum("n").as("total"),
      sum(sqrt(col("n").cast(DoubleType)).cast(DecimalType(30, 12)))
        .cast(DoubleType).as("z")))
    val mult = (sqrt(col("n").cast(DoubleType)) / col("z")) /
      (col("n").cast(DoubleType) / col("total"))
    val m = c.crossJoin(t).select(col("lang"), mult.as("mult"))
      .localCheckpoint(false) // lang-cardinality; feeds max + output
    val mm = broadcast(m.agg(max(col("mult")).as("mmax")))
    m.crossJoin(mm).select(col("lang"),
      least(lit(1000000L),
        floor(lit(1000000.0) * col("mult") / col("mmax")))
        .as("rate_ppm"))
  }

  /** DuckDB CTE twin of [[temperatureRatesPpm]] — appends CTEs named
    * tc/tt/tm/tmm/trates; `trates(lang, rate_ppm)` is the result. */
  private[graft] def sqlTemperatureRates: String =
    """tc AS (SELECT lang, COUNT(*) AS n FROM documents
      |       WHERE lang IS NOT NULL GROUP BY lang),
      |tt AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
      |        CAST(CAST(SUM(CAST(CAST(
      |          sqrt(CAST(n AS DOUBLE)) AS VARCHAR)
      |          AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS z
      |      FROM tc),
      |tm AS (SELECT lang, (sqrt(CAST(n AS DOUBLE)) / z) /
      |         (CAST(n AS DOUBLE) / total) AS mult FROM tc, tt),
      |tmm AS (SELECT MAX(mult) AS mmax FROM tm),
      |trates AS (SELECT lang, LEAST(1000000,
      |    CAST(FLOOR(1000000 * mult / mmax) AS BIGINT)) AS rate_ppm
      |  FROM tm, tmm)""".stripMargin

  private val ChunkTok = 50 // tokens per chunk
  private val Stride = 40   // chunk start stride (10-token overlap)
  private[queries] val PackCap = 2048 // target tokens per packed batch

  /** Decontamination gram CTE chain (d → g → eg), shared between the
    * text_decontaminate oracle and the composed curation_pipeline_e2e
    * oracle: per-doc distinct sha60 8-gram hashes over docs with ≥8
    * tokens, plus the eval split's (doc_id % 20 = 0) distinct gram
    * set. ONE source of truth so the standalone stage and the
    * pipeline's chained replay can never drift apart. */
  private[queries] def sqlGramCtes: String =
    s"""d AS (SELECT doc_id, n_chars, string_split(text, ' ') AS tks
       |  FROM documents
       |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8),
       |g AS (SELECT doc_id, n_chars,
       |    list_distinct(list_transform(range(1, len(tks) - 7 + 1),
       |      i -> ${graft.functions.XHash.sqlSha60(
              "concat_ws(' ', tks[i], tks[i+1], tks[i+2], tks[i+3]," +
                " tks[i+4], tks[i+5], tks[i+6], tks[i+7])")})) AS gs
       |  FROM d),
       |eg AS (SELECT DISTINCT unnest(gs) AS h FROM g
       |       WHERE doc_id % 20 = 0)""".stripMargin

  def decls: Seq[Decl] = Seq(

    // Overlapping fixed-token-window chunking (pretraining / RAG prep):
    // doc → ceil(ntok/stride) chunks of ≤50 tokens starting every 40.
    Decl("text_chunk",
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS tks,
         |    len(string_split(text, ' ')) AS n
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, i AS chunk_idx,
         |  len(list_slice(tks, i * $Stride + 1, i * $Stride + $ChunkTok))
         |    AS chunk_ntok,
         |  array_to_string(list_slice(tks, i * $Stride + 1,
         |    i * $Stride + $ChunkTok), ' ') AS chunk_text
         |FROM toks, UNNEST(range(0, CAST(ceil(n / $Stride.0) AS BIGINT)))
         |  AS u(i)
         |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
      val tk = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tks"))
        .withColumn("n", size(col("tks")))
      tk.select(col("doc_id"), col("tks"),
          explode(sequence(lit(0L),
            ceil(col("n") / lit(Stride.toDouble)).cast(LongType) - 1))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          slice(col("tks"),
            (col("chunk_idx") * Stride + 1).cast(IntegerType),
            lit(ChunkTok)).as("chunk"))
        .select(col("doc_id"), col("chunk_idx"),
          size(col("chunk")).as("chunk_ntok"),
          concat_ws(" ", col("chunk")).as("chunk_text"))
        .orderBy("doc_id", "chunk_idx")
    },

    // Sequence packing: assign docs to ~2048-token training batches by
    // running token count within each language shard (offset-bucket
    // packing — deterministic, shuffle-parallel across shards; docs may
    // straddle a boundary, the standard approximation at scale).
    Decl("pack_sequences",
      s"""WITH toks AS (SELECT doc_id, lang,
         |    len(string_split(text, ' ')) AS ntok
         |  FROM documents WHERE text IS NOT NULL),
         |cum AS (SELECT lang, doc_id, ntok,
         |    SUM(ntok) OVER (PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM toks)
         |SELECT lang,
         |  CAST(FLOOR((cum - ntok) / $PackCap.0) AS BIGINT) AS pack_id,
         |  COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |  MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |FROM cum GROUP BY lang, pack_id
         |ORDER BY lang, pack_id""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("lang").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("lang"),
          size(split(col("text"), " ")).as("ntok"))
        .withColumn("cum", sum(col("ntok")).over(w))
        .groupBy(col("lang"),
          floor((col("cum") - col("ntok")) / lit(PackCap.toDouble))
            .cast(LongType).as("pack_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("total_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy("lang", "pack_id")
    },

    // Feature scaling: min-max to [0,1] and z-score of order totals from
    // one broadcast stats row (min/max exact; mean/std via exact decimal
    // sums — mirrored IEEE trees, see Stats).
    // Label encoding (dask `categorize` / sklearn LabelEncoder): map a
    // string column to dense integer codes via a DICTIONARY — lex-rank
    // over the distinct values, so the code table is deterministic and
    // engine-neutral (frequency-ranked codes would tie-break
    // arbitrarily). Scale: the dictionary is distinct-cardinality (a
    // label domain, not sf-proportional) built with one small shuffle;
    // the apply side is a dimension join AQE turns into a broadcast.
    // Codes are 0-based and dense — the embedding-table-index contract.
    Decl("feature_label_encode",
      """WITH dict AS (SELECT v,
        |    CAST(rank() OVER (ORDER BY v) - 1 AS BIGINT) AS code
        |  FROM (SELECT DISTINCT source AS v FROM documents))
        |SELECT doc_id, source, code
        |FROM documents JOIN dict ON source = v
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      // unpartitioned window is fine HERE only: it runs over the
      // distinct label dictionary (domain cardinality), never the corpus
      val dict = docs.select(col("source").as("v")).distinct()
        .withColumn("code",
          (dense_rank().over(Window.orderBy("v")) - 1).cast(LongType))
      docs.join(dict, col("source") === col("v"))
        .select(col("doc_id"), col("source"), col("code"))
        .orderBy("doc_id")
    },

    Decl("feature_minmax",
      s"""WITH st AS (SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx,
         |    CAST(COUNT(*) AS DOUBLE) AS n,
         |    ${sqlSum("o_totalprice")} AS s1,
         |    ${sqlSumProd2("o_totalprice", "o_totalprice")} AS s2
         |  FROM orders)
         |SELECT o_orderkey,
         |  (o_totalprice - mn) / (mx - mn) AS minmax,
         |  (o_totalprice - s1 / n) /
         |    sqrt((n * s2 - s1 * s1) / (n * (n - 1.0))) AS zscore
         |FROM orders, st ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      val o = Tables.orders(s, d)
      val st = o.agg(min(col("o_totalprice")).as("mn"),
        max(col("o_totalprice")).as("mx"),
        count(lit(1)).cast(DoubleType).as("n"),
        dsum(col("o_totalprice")).as("s1"),
        dsumProd2(col("o_totalprice"), col("o_totalprice")).as("s2"))
      val n = col("n"); val s1 = col("s1"); val s2 = col("s2")
      o.join(broadcast(st))
        .select(col("o_orderkey"),
          ((col("o_totalprice") - col("mn")) / (col("mx") - col("mn")))
            .as("minmax"),
          ((col("o_totalprice") - s1 / n) /
            sqrt((n * s2 - s1 * s1) / (n * (n - lit(1.0))))).as("zscore"))
        .orderBy("o_orderkey")
    },

    // Train/eval DECONTAMINATION — the benchmark-leakage check every
    // training pipeline runs before eval numbers mean anything: an eval
    // document is contaminated when any of its token 8-grams appears
    // verbatim in the training split (the 13-gram-overlap scheme of the
    // published LLM pipelines, sized to this corpus's 10-99-token
    // docs). Split is the deterministic doc_id residue (5% eval).
    // Scale shape: grams travel as sha60 HASHES, never strings —
    // train side explodes to (hash) and dedups (one shuffle), eval
    // explodes to (doc_id, hash), and contamination is a left-SEMI
    // equi-join on the hash (ships keys only, no gram text, no
    // broadcast of a 100-TB gram set); per-doc counts then aggregate on
    // doc_id. Every eval doc is reported (hit or not) — silence on
    // clean docs would make "no output" ambiguous with "didn't run".
    Decl("contamination_check",
      s"""WITH d AS (SELECT doc_id, string_split(text, ' ') AS tks
         |  FROM documents
         |  WHERE text IS NOT NULL AND len(string_split(text, ' ')) >= 8),
         |g AS (SELECT doc_id,
         |    list_distinct(list_transform(range(1, len(tks) - 7 + 1),
         |      i -> ${graft.functions.XHash.sqlSha60(
                 "concat_ws(' ', tks[i], tks[i+1], tks[i+2], tks[i+3]," +
                   " tks[i+4], tks[i+5], tks[i+6], tks[i+7])")})) AS gs
         |  FROM d),
         |tg AS (SELECT DISTINCT unnest(gs) AS h FROM g
         |       WHERE doc_id % 20 <> 0),
         |eg AS (SELECT doc_id, unnest(gs) AS h FROM g
         |       WHERE doc_id % 20 = 0),
         |hits AS (SELECT doc_id, COUNT(*) AS n_grams,
         |    CAST(SUM(CASE WHEN h IN (SELECT h FROM tg)
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM eg GROUP BY doc_id)
         |SELECT doc_id, n_grams, n_hit,
         |  CAST(n_hit AS DOUBLE) / n_grams AS hit_share,
         |  n_hit > 0 AS contaminated
         |FROM hits ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      // the >= 8 guard (mirrored in the oracle) keeps sequence() from
      // turning descending on sub-gram docs AND keeps every element_at
      // index in range under ANSI mode. The gram hash is computed AFTER
      // exploding the start index — as a row-level expression it stays
      // in whole-stage codegen, where the same hash inside a transform()
      // lambda runs interpreted per element (measured 8 s vs 0.6 s at
      // sf0.1 — the HOF-kernel lesson from the MinHash pipeline). The
      // (doc_id, h) distinct equals the oracle's per-doc list_distinct.
      val grams = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 8)
        .select(col("doc_id"), col("tks"),
          explode(sequence(lit(1), size(col("tks")) - 7)).as("i"))
        .select(col("doc_id"), sha60(concat_ws(" ", (0 until 8).map(k =>
          element_at(col("tks"), col("i") + k)): _*)).as("h"))
        .distinct()
      // one pass per split (the doc_id residue filter commutes below
      // the gram projection, so neither split computes the other's
      // grams), and ONE left join carrying a hit marker — counting
      // grams and hits in the same aggregation instead of a semi-join
      // plus a second scan of the eval grams
      val train = grams.filter(col("doc_id") % 20 =!= 0)
        .select("h").distinct().withColumn("hit", lit(1L))
      val eval_ = grams.filter(col("doc_id") % 20 === 0)
      eval_.join(train, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("doc_id"), col("n_grams"), col("n_hit"),
          (col("n_hit").cast(DoubleType) / col("n_grams")).as("hit_share"),
          (col("n_hit") > 0).as("contaminated"))
        .orderBy("doc_id")
    },

    // The DECONTAMINATION ACTION — contamination_check's reverse
    // direction, which is what the published pipelines actually
    // execute: scrub the TRAINING split of every document sharing a
    // verbatim token 8-gram with the eval split (the GPT-3-style
    // any-collision drop; C4 scrubs at line granularity — the span
    // machinery in text_span_scrub covers that flavor). Per train doc:
    // gram count, eval-collision count, the drop verdict, and the
    // document's char mass so the output carries what the scrub costs
    // the corpus. Scale shape identical to the check: hashed grams,
    // one distinct per side, one left join on the hash key — ships
    // keys, never gram text.
    Decl("text_decontaminate",
      s"""WITH $sqlGramCtes,
         |tg AS (SELECT doc_id, n_chars, unnest(gs) AS h FROM g
         |       WHERE doc_id % 20 <> 0),
         |hits AS (SELECT doc_id, MAX(n_chars) AS n_chars,
         |    COUNT(*) AS n_grams,
         |    CAST(SUM(CASE WHEN h IN (SELECT h FROM eg)
         |             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
         |  FROM tg GROUP BY doc_id)
         |SELECT doc_id, n_chars, n_grams, n_hit,
         |  n_hit > 0 AS dropped
         |FROM hits ORDER BY doc_id""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      // same gram kernel + ANSI guards as contamination_check (the >= 8
      // filter keeps sequence() ascending and element_at in range; the
      // hash runs as a row-level expression inside codegen, not a HOF
      // lambda)
      val grams = Tables.documents(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          split(col("text"), " ").as("tks"))
        .filter(size(col("tks")) >= 8)
        .select(col("doc_id"), col("n_chars"), col("tks"),
          explode(sequence(lit(1), size(col("tks")) - 7)).as("i"))
        .select(col("doc_id"), col("n_chars"),
          sha60(concat_ws(" ", (0 until 8).map(k =>
            element_at(col("tks"), col("i") + k)): _*)).as("h"))
        .distinct()
      val evalGrams = grams.filter(col("doc_id") % 20 === 0)
        .select("h").distinct().withColumn("hit", lit(1L))
      grams.filter(col("doc_id") % 20 =!= 0)
        .join(evalGrams, Seq("h"), "left")
        .groupBy("doc_id")
        .agg(max(col("n_chars")).as("n_chars"),
          count(lit(1)).as("n_grams"),
          sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("doc_id"), col("n_chars"), col("n_grams"),
          col("n_hit"), (col("n_hit") > 0).as("dropped"))
        .orderBy("doc_id")
    },

    // Domain-mix rebalancing — the data-mixing step of a pretraining
    // pipeline: cap every source at a uniform target share (total/
    // n_sources) by hash-gate downsampling the over-represented ones.
    // All the rate arithmetic is integer (DIV / least on longs), so the
    // per-source keep rate is bit-identical cross-engine, and the gate
    // itself is the same sha-60 residue used by `sample` — partition-
    // invariant and exactly reproducible. Scale: one count aggregation
    // (shuffle on source), a scalar total, and a map-only gated pass;
    // the per-source rate table is domain-cardinality-sized and AQE
    // broadcasts it on its own.
    Decl("mix_rebalance",
      """WITH c AS (SELECT source, COUNT(*) AS cnt FROM documents
        |           GROUP BY source),
        |t AS (SELECT SUM(cnt) // COUNT(*) AS target FROM c),
        |r AS (SELECT source,
        |        CAST(least(1000000, (target * 1000000) // cnt) AS BIGINT)
        |          AS rate_ppm
        |      FROM c, t)
        |SELECT d.source AS source, COUNT(*) AS n_docs, rate_ppm,
        |  CAST(SUM(CASE WHEN
        |      (CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)),
        |         1, 15)) AS BIGINT) % 1000000) < rate_ppm
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
        |FROM documents d JOIN r ON d.source = r.source
        |GROUP BY d.source, rate_ppm
        |ORDER BY d.source""".stripMargin) { (s, d) =>
      import graft.functions.XHash.sha60
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("cnt"))
      val target = counts.agg(expr("SUM(cnt) DIV COUNT(*)").as("target"))
      val rates = counts.crossJoin(target)
        .select(col("source"),
          least(lit(1000000L), expr("(target * 1000000) DIV cnt"))
            .as("rate_ppm"))
      // one gated pass over the corpus: the rate table is domain-
      // cardinality (one row per source — a nation-sized dimension,
      // NOT sf-proportional), so it broadcasts and the only shuffles
      // are the two tiny rate-side aggregates plus the output group —
      // kept-count and doc-count ride the SAME aggregation (conditional
      // sum) instead of a second corpus pass + re-join
      docs.join(broadcast(rates), Seq("source"))
        .groupBy("source", "rate_ppm")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(sha60(col("doc_id").cast(StringType)) % 1000000 <
            col("rate_ppm"), 1L).otherwise(0L)).as("n_kept"))
        .select(col("source"), col("n_docs"), col("rate_ppm"), col("n_kept"))
        .orderBy("source")
    },

    // Temperature-based language sampling (the multilingual-pretraining
    // mix recipe: sample language i with probability ∝ (n_i/N)^α so
    // low-resource languages are upsampled relative to their corpus
    // share — α = 0.5 here, the square-root flavor of the mT5/XLM-R
    // family, chosen because sqrt is an exactly-rounded IEEE primitive
    // in BOTH engines: the whole computation needs no libm
    // quantization except the one normalizing sum, which rides the
    // DECIMAL(30,12) discipline). Output per language: corpus share,
    // temperature share, and the sampling multiplier (α-share /
    // raw-share — the factor a batch sampler applies; > 1 means
    // upsampled). Scale: one lang-keyed count aggregate (domain
    // cardinality) + a broadcast 1-row normalizer — model-sized
    // everywhere, the data pass is the count.
    Decl("mix_temperature", {
      s"""WITH c AS (SELECT lang, COUNT(*) AS n FROM documents
         |           WHERE lang IS NOT NULL GROUP BY lang),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
         |        CAST(CAST(SUM(CAST(CAST(
         |          sqrt(CAST(n AS DOUBLE)) AS VARCHAR)
         |          AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS z
         |      FROM c)
         |SELECT lang, n AS n_docs,
         |  CAST(n AS DOUBLE) / total AS raw_share,
         |  sqrt(CAST(n AS DOUBLE)) / z AS temp_share,
         |  (sqrt(CAST(n AS DOUBLE)) / z) /
         |    (CAST(n AS DOUBLE) / total) AS multiplier
         |FROM c, t ORDER BY lang""".stripMargin
      // z = Σ sqrt(n_i): each sqrt is the same exactly-rounded double
      // in both engines, and because Σ sqrt(n)/sqrt(N) ≠ 1 the
      // normalizer is the SQRT SUM, not sqrt(total) — the decimal
      // quantization makes the sum order-free, mirroring Spark's cast
    }) { (s, d) =>
      val c = Tables.documents(s, d).filter(col("lang").isNotNull)
        .groupBy("lang").agg(count(lit(1)).as("n"))
        .localCheckpoint(false) // lang-cardinality; feeds t and the output
      val t = broadcast(c.agg(sum("n").as("total"),
        sum(sqrt(col("n").cast(DoubleType)).cast(DecimalType(30, 12)))
          .cast(DoubleType).as("z")))
      val raw = col("n").cast(DoubleType) / col("total")
      val temp = sqrt(col("n").cast(DoubleType)) / col("z")
      c.crossJoin(t)
        .select(col("lang"), col("n").as("n_docs"), raw.as("raw_share"),
          temp.as("temp_share"), (temp / raw).as("multiplier"))
        .orderBy("lang")
    },

    // Epoch allocation under a token budget — the data-constrained
    // scaling recipe (repeating a domain up to ~4 epochs is nearly
    // free, beyond that wasted): each language's DESIRED tokens come
    // from the temperature share (sqrt — the mix_temperature weights)
    // of a budget set to 2× the unique corpus, and its EPOCH count is
    // ceil(desired / available) capped at 4 — low-resource languages
    // repeat, the dominant one reads once. Every value is one IEEE
    // chain over exact integers (sqrt, one multiply, one divide,
    // floor/ceil — identical both engines; the sqrt-sum normalizer is
    // the one decimal-quantized reduction). served_tokens is what the
    // cap actually delivers; a deficit marks a language the budget
    // wants more of than 4 passes can give. Scale: the count is one
    // lang-keyed aggregate; everything after is |langs| rows.
    Decl("mix_epochs", {
      val tshare = "(sqrt(CAST(nt AS DOUBLE)) / z)"
      val desired = s"FLOOR((2.0 * total) * $tshare)"
      val epochs = s"least(4, greatest(1, CAST(ceil($desired / " +
        "CAST(nt AS DOUBLE)) AS BIGINT)))"
      s"""WITH c AS (SELECT lang,
         |        CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS nt
         |      FROM documents
         |      WHERE text IS NOT NULL AND lang IS NOT NULL
         |      GROUP BY lang),
         |t AS (SELECT CAST(SUM(nt) AS BIGINT) AS total,
         |        CAST(CAST(SUM(CAST(CAST(
         |          sqrt(CAST(nt AS DOUBLE)) AS VARCHAR)
         |          AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS z
         |      FROM c)
         |SELECT lang, nt AS avail_tokens,
         |  CAST($desired AS BIGINT) AS desired_tokens,
         |  CAST($epochs AS BIGINT) AS epochs,
         |  CAST(least($desired, CAST($epochs * nt AS DOUBLE)) AS BIGINT)
         |    AS served_tokens
         |FROM c, t ORDER BY lang""".stripMargin
    }) { (s, d) =>
      val c = Tables.documents(s, d)
        .filter(col("text").isNotNull && col("lang").isNotNull)
        .groupBy("lang")
        .agg(sum(size(split(col("text"), " "))).as("nt"))
        .localCheckpoint(false) // |langs| rows; feeds t and the output
      val t = broadcast(c.agg(sum("nt").as("total"),
        sum(sqrt(col("nt").cast(DoubleType)).cast(DecimalType(30, 12)))
          .cast(DoubleType).as("z")))
      val tshare = sqrt(col("nt").cast(DoubleType)) / col("z")
      val desired = floor(lit(2.0) * col("total") * tshare)
      val epochs = least(lit(4L), greatest(lit(1L),
        ceil(desired / col("nt").cast(DoubleType)).cast(LongType)))
      c.crossJoin(t)
        .select(col("lang"), col("nt").as("avail_tokens"),
          desired.cast(LongType).as("desired_tokens"),
          epochs.as("epochs"),
          least(desired, (epochs * col("nt")).cast(DoubleType))
            .cast(LongType).as("served_tokens"))
        .orderBy("lang")
    },

    // Importance-weighted data selection (the DSIR recipe — Data
    // Selection via Importance Resampling, Xie et al. 2023): fit
    // two hashed-unigram bag models — one on the
    // TARGET domain (lang = 'en', the quality-corpus proxy), one on
    // the full RAW corpus — and score every raw document by its log
    // importance weight Σ_b n_b·(ln p_target(b) − ln p_raw(b)) over
    // B = 1024 sha-60 token buckets. Selection is the paper's actual
    // Gumbel-top-k resample (not a plain sort): score = logw + Gumbel
    // noise keyed by the same cross-engine sha-60 residue the sample
    // family uses, so the draw is WITHOUT replacement ∝ exp(logw) yet
    // fully deterministic and value-oracled. ln() rides the NB/NLL
    // DECIMAL(20,9) VARCHAR-hop discipline; per-doc sums are exact
    // DECIMAL(30,12). Scale: the model pass is ONE corpus-sized
    // map + a 1024-row shuffle (both corpora counted in the same
    // conditional aggregate); λ is a 1024-row broadcast; scoring is a
    // map + (doc)-keyed partial+final aggregate; the resample is
    // TakeOrdered — model-bounded everywhere, the shape that lets
    // DSIR select from 100 TB with a model that fits in one executor.
    Decl("mix_importance_weights", {
      def ln9(x: String) =
        s"CAST(CAST(CAST(ln($x) AS VARCHAR) AS DECIMAL(20,9)) AS DOUBLE)"
      val u = "(CAST(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR))," +
        " 1, 15)) AS BIGINT) AS DOUBLE) + 0.5) / 1152921504606846976.0"
      s"""WITH tokb AS (SELECT doc_id, lang,
         |    CAST(('0x' || substr(sha256(tok), 1, 15)) AS BIGINT) % 1024
         |      AS b
         |  FROM (SELECT doc_id, lang,
         |          unnest(string_split(text, ' ')) AS tok
         |        FROM documents WHERE text IS NOT NULL)),
         |m AS (SELECT b, COUNT(*) AS cr,
         |        SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS ct
         |      FROM tokb GROUP BY b),
         |tot AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr,
         |               CAST(SUM(ct) AS BIGINT) AS nt FROM m),
         |lam AS (SELECT b,
         |    ${ln9("CAST(ct + 1 AS DOUBLE) / CAST(nt + 1024 AS DOUBLE)")} -
         |    ${ln9("CAST(cr + 1 AS DOUBLE) / CAST(nr + 1024 AS DOUBLE)")}
         |      AS lam
         |  FROM m, tot),
         |w AS (SELECT t.doc_id, t.lang,
         |        CAST(CAST(SUM(CAST(CAST(l.lam AS VARCHAR)
         |          AS DECIMAL(30,12))) AS VARCHAR) AS DOUBLE) AS logw9
         |      FROM tokb t JOIN lam l ON l.b = t.b
         |      GROUP BY t.doc_id, t.lang),
         |g AS (SELECT doc_id, lang, logw9,
         |        -${ln9(s"-${ln9(u)}")} AS gumbel9
         |      FROM w)
         |SELECT doc_id, lang, logw9, gumbel9,
         |  logw9 + gumbel9 AS score9
         |FROM g ORDER BY score9 DESC, doc_id LIMIT 50""".stripMargin
    }) { (s, d) =>
      import graft.functions.XHash.sha60
      def ln9(x: org.apache.spark.sql.Column) =
        log(x).cast(DecimalType(20, 9)).cast(DoubleType)
      val docs = Tables.documents(s, d).filter(col("text").isNotNull)
      val tokb = docs.select(col("doc_id"), col("lang"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("lang"),
          (sha60(col("tok")) % 1024).as("b"))
      // the 1024-row model table feeds both the totals and λ —
      // checkpoint so the corpus-sized count pass runs once (the
      // text_nb_train consumer-sharing discipline)
      val m = tokb.groupBy("b")
        .agg(count(lit(1)).as("cr"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("ct"))
        .localCheckpoint(false)
      val tot = broadcast(m.agg(sum("cr").as("nr"), sum("ct").as("nt")))
      val lam = m.crossJoin(tot)
        .select(col("b"),
          (ln9((col("ct") + 1).cast(DoubleType) /
              (col("nt") + 1024).cast(DoubleType)) -
            ln9((col("cr") + 1).cast(DoubleType) /
              (col("nr") + 1024).cast(DoubleType))).as("lam"))
      val w = tokb.join(broadcast(lam), "b")
        .groupBy("doc_id", "lang")
        .agg(sum(col("lam").cast(DecimalType(30, 12)))
          .cast(DoubleType).as("logw9"))
      val u = (sha60(col("doc_id").cast(StringType)).cast(DoubleType)
        + 0.5) / 1152921504606846976.0
      val g9 = -ln9(-ln9(u))
      w.select(col("doc_id"), col("lang"), col("logw9"),
          g9.as("gumbel9"), (col("logw9") + g9).as("score9"))
        .orderBy(col("score9").desc, col("doc_id")).limit(50)
    },

    // Lag-feature generation for forecasting training sets: per-user
    // series ordered by (ts, event_id) — event_id breaks timestamp
    // ties, making every window pick deterministic — with lag-1/lag-2
    // values, the first difference, and a 3-point rolling sum. The
    // rolling sum is deliberately NOT a window SUM: windowed double
    // summation is engine-order-dependent (DuckDB may use a segment
    // tree), so it is written as the explicit left-associated
    // (value + lag1) + lag2 — the same IEEE additions in the same order
    // in both engines, bit-identical, NULL while the frame is short
    // (exactly the rows a trainer masks out anyway). Scale: one
    // shuffle on user_id, every window runs inside that partition;
    // map-side output, no second pass.
    Decl("feature_lags",
      """SELECT user_id, epoch_us(ts) AS tus, value,
        |  lag(value, 1) OVER w AS lag1,
        |  lag(value, 2) OVER w AS lag2,
        |  value - lag(value, 1) OVER w AS delta1,
        |  (value + lag(value, 1) OVER w) + lag(value, 2) OVER w
        |    AS roll3_sum,
        |  row_number() OVER w AS rn
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, rn""".stripMargin) { (s, d) =>
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(col("user_id"),
        epochUs(col("ts")).as("tus"), col("value"),
        lag("value", 1).over(w).as("lag1"),
        lag("value", 2).over(w).as("lag2"),
        (col("value") - lag("value", 1).over(w)).as("delta1"),
        ((col("value") + lag("value", 1).over(w)) +
          lag("value", 2).over(w)).as("roll3_sum"),
        row_number().over(w).as("rn"))
        .orderBy("user_id", "rn")
    },

    // Hashing-trick featurization (the fixed-dimension bag-of-words
    // encoder): token → dim = sha60 % 256, sign = parity of a second
    // sha60 — collisions cancel in expectation, the signed-sum trick
    // from Weinberger et al.'s feature hashing. The featurize pass is
    // map-side (explode + two hashes); the per-(doc,dim) signed count
    // and the per-dim profile emitted here are ordinary partial+final
    // aggregates. All-integer → hash-exact cross-engine. Scale: no
    // vocabulary dictionary exists at all — that is the point of the
    // hashing trick at 100 TB; dimensionality is fixed up front and no
    // driver-side vocab broadcast is ever built.
    Decl("feature_hash", {
      import graft.functions.XHash.sqlSha60
      val hd = sqlSha60("'fh:' || tok")
      val hs = sqlSha60("'fs:' || tok")
      s"""WITH occ AS (SELECT doc_id,
         |    unnest(string_split(text, ' ')) AS tok FROM documents),
         |f AS (SELECT doc_id, $hd % 256 AS dim,
         |    CASE WHEN $hs % 2 = 0 THEN 1 ELSE -1 END AS sgn FROM occ),
         |v AS (SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS val
         |      FROM f GROUP BY doc_id, dim)
         |SELECT dim, COUNT(*) AS n_docs, CAST(SUM(val) AS BIGINT) AS sum_val,
         |  MIN(val) AS min_val, MAX(val) AS max_val
         |FROM v GROUP BY dim ORDER BY dim""".stripMargin
    }) { (s, d) =>
      import graft.functions.XHash.sha60
      val hd = (sha60(concat(lit("fh:"), col("tok"))) % 256).as("dim")
      val hs = when(sha60(concat(lit("fs:"), col("tok"))) % 2 === 0, 1)
        .otherwise(-1).as("sgn")
      Tables.documents(s, d)
        .select(col("doc_id"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), hd, hs)
        .groupBy("doc_id", "dim")
        .agg(sum("sgn").as("val"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n_docs"), sum("val").as("sum_val"),
          min("val").as("min_val"), max("val").as("max_val"))
        .orderBy("dim")
    },

    // Smoothed mean-target encoding of a categorical feature (priority
    // → expected order value), m = 10 pseudo-observations of the global
    // prior — the leakage-resistant categorical encoder. Exactness:
    // sums are exact integer cents (decimal(18,2)·100), the smoothing
    // algebra is rearranged to ONE IEEE divide of two integer-valued
    // doubles: enc = (sum_c·N + m·tot_c) / ((n+m)·N). Numerators stay
    // < 2^63 as exact BIGINTs; the BIGINT→DOUBLE cast rounds half-even
    // identically in both engines. Scale: one partial+final aggregate
    // over the fact table plus a 1-row global side — the map-side
    // combine means the shuffle carries |categories| rows.
    Decl("target_encode",
      """WITH c AS (SELECT o_orderpriority AS cat,
        |    CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |      AS BIGINT)) AS BIGINT) AS sum_c
        |  FROM orders GROUP BY cat),
        |g AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
        |    CAST(SUM(sum_c) AS BIGINT) AS tot_c FROM c)
        |SELECT cat, n, sum_c,
        |  CAST(sum_c * nn + 10 * tot_c AS DOUBLE) /
        |    CAST((n + 10) * nn AS DOUBLE) AS enc_cents
        |FROM c, g ORDER BY cat""".stripMargin) { (s, d) =>
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      val c = Tables.orders(s, d)
        .groupBy(col("o_orderpriority").as("cat"))
        .agg(count(lit(1)).as("n"), sum(cents).as("sum_c"))
      val g = c.agg(sum("n").as("nn"), sum("sum_c").as("tot_c"))
      c.crossJoin(broadcast(g))
        .select(col("cat"), col("n"), col("sum_c"),
          ((col("sum_c") * col("nn") + lit(10) * col("tot_c"))
            .cast(DoubleType) /
            ((col("n") + 10) * col("nn")).cast(DoubleType)).as("enc_cents"))
        .orderBy("cat")
    },

    // Equal-frequency binning (decile bucketing) of a numeric feature —
    // the discretizer feeding gradient-boosted trees and calibration
    // curves. ntile over a TOTAL order (price cents, then key — the
    // tie-break makes bucket membership deterministic), then per-bucket
    // edges/counts. All integers. Scale: a global ntile is a full sort;
    // the production path is approx quantile cutpoints + a map-side
    // bucket lookup — this exact form is the oracle for that path, and
    // the output (10 rows of edges) is what actually ships.
    Decl("feature_quantile_bucket",
      """WITH t AS (SELECT o_orderkey,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |      AS cents,
        |    ntile(10) OVER (ORDER BY CAST(CAST(o_totalprice AS
        |      DECIMAL(18,2)) * 100 AS BIGINT), o_orderkey) AS bucket
        |  FROM orders)
        |SELECT bucket, COUNT(*) AS n, MIN(cents) AS lo, MAX(cents) AS hi
        |FROM t GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast(LongType)
      Tables.orders(s, d)
        .select(col("o_orderkey"), cents.as("cents"))
        .withColumn("bucket",
          ntile(10).over(Window.orderBy("cents", "o_orderkey")))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("cents").as("lo"),
          max("cents").as("hi"))
        .orderBy("bucket")
    }
  )
}
