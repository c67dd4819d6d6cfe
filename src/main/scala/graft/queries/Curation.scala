package graft.queries

import graft.{Decl, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** The END-TO-END curation pipeline as ONE declared, oracled dataflow
  * (r13 verdict item 1) — the operator a training-data team actually
  * runs, composing the already-proven stages into a single lineage:
  *
  *   quality gate (text_gopher_rules' keep conjunction)
  *   → exact dedup (dedup_exact_keep's min-doc_id-per-sha256 action)
  *   → near dedup (dedup_near_keep's cluster representatives)
  *   → decontamination (text_decontaminate's eval-8-gram drop,
  *     restricted to the train split — the pipeline's product is
  *     TRAINING data, so the eval split itself exits here)
  *   → PII scrub (text_pii_scrub's planted-PII redaction, map-only)
  *   → dedup-aware mix weights (mix_dedup_weights' 1/|cluster| mass)
  *   → sequence packing (pack_sequences' offset-bucket packing over
  *     the SCRUBBED text).
  *
  * Output: one row per stage — (stage_id, stage, n_in, n_out, metric)
  * — plus a `packed_sample` row (the pack holding the smallest doc_id,
  * with its doc/token counts), so per-stage survivor counts make
  * truncation impossible to hide and the packed product is witnessed
  * with real numbers, not just a count.
  *
  * Composition semantics, stated precisely:
  *  - Near-dup CLUSTERS are the ones computed on the raw corpus (the
  *    memoized component frame every dedup action shares): membership
  *    is decided once upstream, gates apply downstream. Within each
  *    cluster the pipeline keeps the smallest SURVIVING doc_id — two
  *    survivors connected only through a quality-dropped intermediate
  *    still dedup (the conservative choice, and the one that reuses
  *    one LSH pass across every pipeline variant at 100 TB).
  *  - Exact-dedup needs no such caveat: identical text ⇒ identical
  *    quality flags, so min-per-hash among survivors equals the
  *    global action restricted to survivors.
  *  - Contamination is judged against the RAW eval split's gram set
  *    (benchmark data is external — it does not pass quality gates).
  *  - mix weights use the GLOBAL cluster size (the crawl-frequency
  *    signal of Lee et al. 2021): after near-dedup each survivor
  *    represents its whole cluster, so its sampling mass is
  *    1/|cluster| of the duplication it stands for; the total mass is
  *    the metric (scale-12 decimal sum — order-free, the Det rule).
  *
  * Scale: every stage is the declared operator's own dataflow — the
  * LSH/component frames are memoized and label-bounded, the gram join
  * ships sha60 hashes, the scrub is map-only, packing shuffles one
  * (doc, lang, ntok) row per survivor. The per-stage count frames are
  * single-row aggregates over lineage-cut ID frames (localCheckpoint
  * — each stage's expensive subtree runs once, not once per
  * downstream reference), assembled with broadcast single-row
  * crossJoins. The oracle chains the stages' EXISTING DuckDB twins
  * (shared CTE constants — sqlGopherCtes, sqlNearDupCtes, sqlGramCtes,
  * piiAugSql/piiCleanSql — so the standalone stage and the pipeline
  * replay can never drift apart) plus the recursive-CTE transitive
  * closure, CTE by CTE.
  */
object Curation {

  import graft.SparkEntry.{queries => q}

  /** The pipeline's intermediate survivor-ID frames plus the shared
    * weights/packs frames — exposed so CurationSpec can pin the
    * conservation claims the oracle cannot (set NESTING of the
    * survivor chain, report-vs-frame count coherence, the eval-split
    * and contamination exclusions). Each ID frame is lineage-cut; the
    * declared query consumes exactly these. */
  private[graft] final case class Stages(qk: DataFrame, ek: DataFrame,
      nk: DataFrame, dk: DataFrame, contaminated: DataFrame,
      mw: DataFrame, packs: DataFrame)

  // per-(app, data root) stage-frame memo: the survivor-ID frames are
  // lineage-cut (localCheckpoint) and deterministic, so the pipeline
  // report and the per-language slice share ONE computation of the
  // expensive chain (LSH components, gram joins) instead of paying it
  // per declared query — the same memo discipline as the fitted index.
  // r16: graft.SessionMemo — weak per-context outer layer (r15 ADVICE),
  // see the class scaladoc for the lifetime + conf-capture contract.
  private val stageMemo = new graft.SessionMemo[Stages]

  private[graft] def stages(s: SparkSession, d: String): Stages =
    stageMemo.getOrCompute(
      s, s"${s.sparkContext.applicationId}@$d")(stagesUncached(s, d))

  private def stagesUncached(s: SparkSession, d: String): Stages = {
    val docs = Tables.documents(s, d)
    // Guide §2.6 — overlap independent jobs from driver threads. The
    // chain's data dependencies are qk→ek→nk→dk→packs with mw joining
    // at nk and the contamination verdicts joining at dk, so THREE
    // branches are mutually independent up to the nk barrier:
    //   (a) gopher gate → exact-dedup survivors   (qk, ek)
    //   (b) mix_dedup_weights                      (mw — the memoized
    //       LSH/component labels + cluster sizes)
    //   (c) decontamination verdicts               (contaminated)
    // Sequential, each branch pays its OWN planning + janino codegen +
    // stage jobs back to back on the driver thread (measured r17:
    // first execution ≈ 4.2 s of codegen compile + 3.5 s of jobs + the
    // planning gaps, sum ≈ 8 s — driver latency, not compute).
    // Submitting the branches from a 3-thread pool overlaps all three
    // cost kinds (planning and codegen happen on the calling thread;
    // concurrent jobs back-fill the executor tail, FIFO by default).
    // Each branch's OWN dataflow is byte-identical to the sequential
    // version — only the submission order changes, and the nk/dk/packs
    // consumers still join at the same barriers, so the declared
    // results cannot change. Branch memos (Dedup components, gram
    // sets) are SessionMemo/computeIfAbsent — atomic per key, so a
    // concurrent standalone query would block on, not duplicate, the
    // shared fit.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    val (qk, ek, mw, contaminated) =
      try {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext =
          ExecutionContext.fromExecutorService(pool)
        val fQkEk = Future {
          // stage 1: the declared Gopher gate's keep set
          val qk = q("text_gopher_rules")(s, d).filter(col("keep"))
            .select("doc_id").localCheckpoint(false)
          // stage 2: exact-dedup action among survivors (min id per hash)
          val ek = docs.join(qk, Seq("doc_id"), "left_semi")
            .groupBy(sha2(col("text"), 256).as("h"))
            .agg(min(col("doc_id")).as("doc_id"))
            .select("doc_id").localCheckpoint(false)
          (qk, ek)
        }
        // stage 3's cluster input: mw carries the memoized component
        // labels + global cluster sizes, shared with stage 6
        val fMw = Future { q("mix_dedup_weights")(s, d) }
        // stage 4's verdicts: the declared decontamination drops
        val fCt = Future {
          q("text_decontaminate")(s, d)
            .filter(col("dropped")).select("doc_id").localCheckpoint(false)
        }
        val (qk, ek) = Await.result(fQkEk, Duration.Inf)
        (qk, ek, Await.result(fMw, Duration.Inf),
          Await.result(fCt, Duration.Inf))
      } finally pool.shutdown()
    // stage 3: near-dedup action — smallest SURVIVING member per
    // (raw-corpus) cluster
    val nk = mw.join(ek, Seq("doc_id"), "left_semi")
      .groupBy("label").agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id").localCheckpoint(false)
    // stage 4: train split only, minus eval-gram collisions (the
    // declared decontamination verdicts, filtered to survivors)
    val dk = nk.filter(col("doc_id") % 20 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .localCheckpoint(false)
    // stage 7: pack_sequences' offset-bucket packing over the
    // SCRUBBED survivor text (the pipeline's actual product)
    val clean = Text.piiCleanCol(Text.piiAugCol)
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packs = docs.join(dk, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), col("lang"),
        size(split(clean, " ")).as("ntok"))
      .withColumn("cum", sum(col("ntok")).over(w))
      .groupBy(col("lang"),
        floor((col("cum") - col("ntok")) / lit(MlPrep.PackCap.toDouble))
          .cast(LongType).as("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ntok")).cast(LongType).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .localCheckpoint(false)
    Stages(qk, ek, nk, dk, contaminated, mw, packs)
  }

  /** The survivor-chain CTE prefix (raw corpus → qk → ek → nk → dk,
    * plus the asg/sizes cluster frames) shared VERBATIM by the
    * end-to-end report and the per-language slice — one source of
    * truth, so the two declared views of the same pipeline cannot
    * drift (the same discipline as the stage twins' shared CTE
    * constants). */
  private val sqlStageCtes: String =
    s"""${Dedup.sqlNearDupCtes},
       |${Text.sqlGopherCtes},
       |qk AS MATERIALIZED (SELECT doc_id FROM f
       |  WHERE ${Text.sqlGopherKeep}),
       |ek AS MATERIALIZED (SELECT MIN(dd.doc_id) AS doc_id
       |  FROM documents dd JOIN qk ON qk.doc_id = dd.doc_id
       |  GROUP BY sha256(dd.text)),
       |edges AS (SELECT d1, d2 FROM jac WHERE jaccard >= 0.3),
       |bidir AS (SELECT d1, d2 FROM edges
       |          UNION SELECT d2, d1 FROM edges),
       |reach(src, dst) AS (
       |  SELECT doc_id, doc_id FROM sh
       |  UNION
       |  SELECT r.src, b.d2 FROM reach r JOIN bidir b ON r.dst = b.d1),
       |comp AS (SELECT src AS doc_id, MIN(dst) AS label
       |         FROM reach GROUP BY src),
       |asg AS MATERIALIZED (SELECT dd.doc_id,
       |    COALESCE(c.label, dd.doc_id) AS label
       |  FROM documents dd LEFT JOIN comp c ON c.doc_id = dd.doc_id),
       |sizes AS (SELECT label, COUNT(*) AS cluster_size
       |          FROM asg GROUP BY label),
       |nk AS MATERIALIZED (SELECT MIN(a.doc_id) AS doc_id
       |  FROM asg a JOIN ek ON ek.doc_id = a.doc_id
       |  GROUP BY a.label),
       |${MlPrep.sqlGramCtes},
       |ct AS (SELECT DISTINCT t.doc_id FROM (
       |    SELECT g.doc_id, unnest(g.gs) AS h FROM g
       |    JOIN nk ON nk.doc_id = g.doc_id
       |    WHERE g.doc_id % 20 <> 0) t
       |  WHERE t.h IN (SELECT h FROM eg)),
       |dk AS MATERIALIZED (SELECT doc_id FROM nk
       |  WHERE doc_id % 20 <> 0
       |    AND doc_id NOT IN (SELECT doc_id FROM ct))""".stripMargin

  def decls: Seq[Decl] = Seq(

    Decl("curation_pipeline_e2e",
      s"""WITH RECURSIVE $sqlStageCtes,
         |pa AS (SELECT doc_id, lang, ${Text.piiAugSql} AS t
         |       FROM documents
         |       WHERE doc_id IN (SELECT doc_id FROM dk)),
         |pii AS MATERIALIZED (SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(t, '${Text.PiiEmailRe}'))
         |      AS BIGINT) +
         |    CAST(len(regexp_extract_all(t, '${Text.PiiPhoneRe}'))
         |      AS BIGINT) AS red,
         |    ${Text.piiCleanSql("t")} AS clean
         |  FROM pa),
         |pcum AS (SELECT lang, doc_id,
         |    len(string_split(clean, ' ')) AS ntok,
         |    SUM(len(string_split(clean, ' '))) OVER (
         |      PARTITION BY lang ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM pii),
         |packs AS MATERIALIZED (SELECT lang,
         |    CAST(FLOOR((cum - ntok) / ${MlPrep.PackCap}.0) AS BIGINT)
         |      AS pack_id,
         |    COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS total_tokens,
         |    MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
         |  FROM pcum GROUP BY lang, pack_id),
         |n0 AS (SELECT COUNT(*) AS c FROM documents),
         |n1 AS (SELECT COUNT(*) AS c FROM qk),
         |n2 AS (SELECT COUNT(*) AS c FROM ek),
         |n3 AS (SELECT COUNT(*) AS c FROM nk),
         |n4 AS (SELECT COUNT(*) AS c FROM dk),
         |nct AS (SELECT COUNT(*) AS c FROM ct),
         |redt AS (SELECT COALESCE(CAST(SUM(red) AS BIGINT), 0) AS r
         |         FROM pii),
         |masst AS (SELECT CAST(CAST(COALESCE(SUM(CAST(
         |      CAST(1.0 AS DOUBLE) / CAST(s.cluster_size AS DOUBLE)
         |      AS DECIMAL(30,12))), 0) AS VARCHAR) AS DOUBLE) AS m
         |  FROM dk JOIN asg a ON a.doc_id = dk.doc_id
         |          JOIN sizes s ON s.label = a.label),
         |pk AS (SELECT COUNT(*) AS np,
         |    COALESCE(CAST(SUM(total_tokens) AS BIGINT), 0) AS tt
         |  FROM packs)
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_id, 'input' AS stage,
         |    n0.c AS n_in, n0.c AS n_out, CAST(0.0 AS DOUBLE) AS metric
         |  FROM n0
         |  UNION ALL SELECT 1, 'quality_gate', n0.c, n1.c,
         |    CASE WHEN n0.c = 0 THEN 0.0 ELSE
         |      CAST(n1.c AS DOUBLE) / CAST(n0.c AS DOUBLE) END
         |  FROM n0, n1
         |  UNION ALL SELECT 2, 'dedup_exact', n1.c, n2.c,
         |    CAST(n1.c - n2.c AS DOUBLE) FROM n1, n2
         |  UNION ALL SELECT 3, 'dedup_near', n2.c, n3.c,
         |    CAST(n2.c - n3.c AS DOUBLE) FROM n2, n3
         |  UNION ALL SELECT 4, 'decontaminate', n3.c, n4.c,
         |    CAST(nct.c AS DOUBLE) FROM n3, n4, nct
         |  UNION ALL SELECT 5, 'pii_scrub', n4.c, n4.c,
         |    CAST(redt.r AS DOUBLE) FROM n4, redt
         |  UNION ALL SELECT 6, 'mix_weights', n4.c, n4.c, masst.m
         |  FROM n4, masst
         |  UNION ALL SELECT 7, 'pack', n4.c, pk.np,
         |    CAST(pk.tt AS DOUBLE) FROM n4, pk
         |  UNION ALL SELECT 8, 'packed_sample', n_docs, total_tokens,
         |    CAST(last_doc AS DOUBLE)
         |  FROM (SELECT * FROM packs ORDER BY first_doc LIMIT 1)
         |) ORDER BY stage_id""".stripMargin) { (s, d) =>
      val docs = Tables.documents(s, d)
      val st = stages(s, d)
      val nkTrain = st.nk.filter(col("doc_id") % 20 =!= 0)
      val nct = nkTrain.join(st.contaminated, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)).as("contam"))
      // stage 5: the declared scrub's redaction counts over survivors
      val red = q("text_pii_scrub")(s, d)
        .join(st.dk, Seq("doc_id"), "left_semi")
        .agg(coalesce(sum(col("n_emails") + col("n_phones")), lit(0L))
          .as("red"))
      // stage 6: total sampling mass (order-free scale-12 decimal sum)
      val mass = st.mw.join(st.dk, Seq("doc_id"), "left_semi")
        .agg(coalesce(
          sum(col("weight").cast(DecimalType(30, 12))).cast(DoubleType),
          lit(0.0)).as("mass"))
      val packs = st.packs
      val packAgg = packs.agg(count(lit(1)).as("np"),
        coalesce(sum(col("total_tokens")), lit(0L)).as("tt"))
      def cnt(df: DataFrame, n: String) =
        df.agg(count(lit(1)).as(n))
      // ONE single-row frame carrying every scalar: broadcast
      // crossJoins of 1-row aggregates (the model-frame discipline)
      val base = cnt(docs, "c0")
        .crossJoin(broadcast(cnt(st.qk, "c1")))
        .crossJoin(broadcast(cnt(st.ek, "c2")))
        .crossJoin(broadcast(cnt(st.nk, "c3")))
        .crossJoin(broadcast(cnt(st.dk, "c4")))
        .crossJoin(broadcast(nct))
        .crossJoin(broadcast(red))
        .crossJoin(broadcast(mass))
        .crossJoin(broadcast(packAgg))
        .localCheckpoint(false)
      def row(id: Long, name: String, nIn: Column, nOut: Column,
          metric: Column): DataFrame =
        base.select(lit(id).as("stage_id"), lit(name).as("stage"),
          nIn.as("n_in"), nOut.as("n_out"),
          metric.cast(DoubleType).as("metric"))
      val dbl = (c: Column) => c.cast(DoubleType)
      val row8 = packs.orderBy("first_doc").limit(1)
        .select(lit(8L).as("stage_id"), lit("packed_sample").as("stage"),
          col("n_docs").as("n_in"), col("total_tokens").as("n_out"),
          dbl(col("last_doc")).as("metric"))
      row(0L, "input", col("c0"), col("c0"), lit(0.0))
        // day-zero guard (EmptyInputSpec): ANSI division errors on a
        // zero divisor even for doubles — an empty corpus reports
        // keep-rate 0, it doesn't throw
        .unionByName(row(1L, "quality_gate", col("c0"), col("c1"),
          when(col("c0") === 0, lit(0.0))
            .otherwise(dbl(col("c1")) / dbl(col("c0")))))
        .unionByName(row(2L, "dedup_exact", col("c1"), col("c2"),
          dbl(col("c1") - col("c2"))))
        .unionByName(row(3L, "dedup_near", col("c2"), col("c3"),
          dbl(col("c2") - col("c3"))))
        .unionByName(row(4L, "decontaminate", col("c3"), col("c4"),
          dbl(col("contam"))))
        .unionByName(row(5L, "pii_scrub", col("c4"), col("c4"),
          dbl(col("red"))))
        .unionByName(row(6L, "mix_weights", col("c4"), col("c4"),
          col("mass")))
        .unionByName(row(7L, "pack", col("c4"), col("np"),
          dbl(col("tt"))))
        .unionByName(row8)
        .orderBy("stage_id")
    },

    // Per-LANGUAGE curation report (r14 verdict item 7): the slice a
    // data team reviews before changing a gate — survivor counts per
    // (stage × lang) for the five count-bearing stages, DENSE (a
    // language extinct at a stage reports 0, it doesn't vanish from
    // the report; extinction IS the signal a reviewer is looking for).
    // One pass: the raw corpus left-joins the four survivor-ID frames
    // on doc_id (all key-aligned — one exchange shape, reused), per-doc
    // membership flags aggregate in a single lang-bounded groupBy, and
    // stack() unpivots the five counters — rows = 5 × |langs|, output-
    // bounded at any corpus size. The oracle chains the IDENTICAL
    // shared stage CTEs (sqlStageCtes — pipeline and slice cannot
    // drift) with the same flag/sum shape. NULL lang is a real group
    // (the null twin plants them); both engines sort it first.
    Decl("curation_by_lang",
      s"""WITH RECURSIVE $sqlStageCtes,
         |lf AS (SELECT dd.lang,
         |    CASE WHEN qk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f1,
         |    CASE WHEN ek.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f2,
         |    CASE WHEN nk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f3,
         |    CASE WHEN dk.doc_id IS NOT NULL THEN 1 ELSE 0 END AS f4
         |  FROM documents dd
         |  LEFT JOIN qk ON qk.doc_id = dd.doc_id
         |  LEFT JOIN ek ON ek.doc_id = dd.doc_id
         |  LEFT JOIN nk ON nk.doc_id = dd.doc_id
         |  LEFT JOIN dk ON dk.doc_id = dd.doc_id),
         |lg AS (SELECT lang, COUNT(*) AS n0,
         |    COALESCE(SUM(f1), 0) AS n1, COALESCE(SUM(f2), 0) AS n2,
         |    COALESCE(SUM(f3), 0) AS n3, COALESCE(SUM(f4), 0) AS n4
         |  FROM lf GROUP BY lang)
         |SELECT stage_id, stage, lang, n_docs FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage_id, 'input' AS stage,
         |    lang, CAST(n0 AS BIGINT) AS n_docs FROM lg
         |  UNION ALL SELECT 1, 'quality_gate', lang, CAST(n1 AS BIGINT)
         |  FROM lg
         |  UNION ALL SELECT 2, 'dedup_exact', lang, CAST(n2 AS BIGINT)
         |  FROM lg
         |  UNION ALL SELECT 3, 'dedup_near', lang, CAST(n3 AS BIGINT)
         |  FROM lg
         |  UNION ALL SELECT 4, 'decontaminate', lang, CAST(n4 AS BIGINT)
         |  FROM lg
         |) ORDER BY stage_id, lang NULLS FIRST""".stripMargin) { (s, d) =>
      val st = stages(s, d)
      def flag(ids: DataFrame, n: String) =
        ids.withColumn(n, lit(1L))
      val flagged = Tables.documents(s, d).select("doc_id", "lang")
        .join(flag(st.qk, "f1"), Seq("doc_id"), "left")
        .join(flag(st.ek, "f2"), Seq("doc_id"), "left")
        .join(flag(st.nk, "f3"), Seq("doc_id"), "left")
        .join(flag(st.dk, "f4"), Seq("doc_id"), "left")
      val g = flagged.groupBy("lang").agg(
        count(lit(1)).as("n0"),
        coalesce(sum(col("f1")), lit(0L)).as("n1"),
        coalesce(sum(col("f2")), lit(0L)).as("n2"),
        coalesce(sum(col("f3")), lit(0L)).as("n3"),
        coalesce(sum(col("f4")), lit(0L)).as("n4"))
      g.select(col("lang"), expr(
        """stack(5,
          |  CAST(0 AS BIGINT), 'input', n0,
          |  CAST(1 AS BIGINT), 'quality_gate', n1,
          |  CAST(2 AS BIGINT), 'dedup_exact', n2,
          |  CAST(3 AS BIGINT), 'dedup_near', n3,
          |  CAST(4 AS BIGINT), 'decontaminate', n4
          |) AS (stage_id, stage, n_docs)""".stripMargin))
        .select("stage_id", "stage", "lang", "n_docs")
        .orderBy(col("stage_id"), col("lang").asc_nulls_first)
    }
  )
}
