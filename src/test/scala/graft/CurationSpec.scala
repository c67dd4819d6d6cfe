package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `curation_pipeline_e2e` — conservation claims the DuckDB oracle
  * cannot reach (both engines could agree on a wrong composition; set
  * NESTING and exclusion claims need the intermediate frames):
  *
  *  - the survivor chain is nested: qk ⊇ ek ⊇ nk ⊇ dk as ID sets;
  *  - the declared report's per-stage counts EQUAL the frames' counts
  *    (the report cannot drift from the dataflow it claims to count);
  *  - the final corpus excludes the eval split and every contaminated
  *    doc, and contains NO two docs sharing a near-dup cluster label
  *    or a content hash (each dedup action actually closed);
  *  - mass bounds: n_survivors / max_cluster ≤ total mass ≤
  *    n_survivors (weights are 1/|cluster| ∈ (0, 1]);
  *  - pack totals: Σ packs.total_tokens = the report's pack metric,
  *    and Σ packs.n_docs = the survivor count (packing loses no doc).
  */
class CurationSpec extends AnyFunSuite with SparkSuite {

  private lazy val st = graft.queries.Curation.stages(spark, sf)
  private lazy val report =
    SparkEntry.queries("curation_pipeline_e2e")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("survivor chain is nested (qk ⊇ ek ⊇ nk ⊇ dk) and the report's " +
      "counts equal the frames' counts") {
    val (qk, ek, nk, dk) = (ids(st.qk), ids(st.ek), ids(st.nk), ids(st.dk))
    assert(ek.subsetOf(qk), "exact-dedup emitted a non-survivor")
    assert(nk.subsetOf(ek), "near-dedup emitted a non-survivor")
    assert(dk.subsetOf(nk), "decontamination emitted a non-survivor")
    assert(report(1L)._3 == qk.size && report(2L)._3 == ek.size &&
      report(3L)._3 == nk.size && report(4L)._3 == dk.size,
      s"report counts ${(report(1L)._3, report(2L)._3, report(3L)._3,
        report(4L)._3)} != frame counts " +
        s"${(qk.size, ek.size, nk.size, dk.size)}")
    // n_in chaining: each stage's n_in is the previous stage's n_out
    (1L to 7L).foreach { i =>
      assert(report(i)._2 == report(i - 1)._3,
        s"stage $i n_in ${report(i)._2} != stage ${i - 1} n_out")
    }
  }

  test("the final corpus excludes the eval split and contaminated " +
      "docs, and carries no duplicate cluster label or content hash") {
    val dk = st.dk
    assert(dk.filter(col("doc_id") % 20 === 0).count() == 0,
      "an eval-split doc survived into the training corpus")
    assert(dk.join(st.contaminated, Seq("doc_id"), "left_semi")
      .count() == 0, "a contaminated doc survived decontamination")
    val dupLabels = st.mw.join(dk, Seq("doc_id"), "left_semi")
      .groupBy("label").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupLabels == 0,
      s"$dupLabels near-dup clusters still hold >1 survivor")
    val dupHashes = Tables.documents(spark, sf)
      .join(dk, Seq("doc_id"), "left_semi")
      .groupBy(sha2(col("text"), 256)).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dupHashes == 0,
      s"$dupHashes content hashes still hold >1 survivor")
  }

  test("mass bounds and pack conservation hold against the report") {
    val n4 = report(4L)._3
    val mass = report(6L)._4
    val maxCluster = st.mw.join(st.dk, Seq("doc_id"), "left_semi")
      .agg(max(col("cluster_size"))).head.getLong(0)
    assert(mass <= n4 + 1e-9 && mass >= n4.toDouble / maxCluster - 1e-9,
      f"total mass $mass%.6f outside [n/maxCluster, n] = " +
        f"[${n4.toDouble / maxCluster}%.3f, $n4]")
    val packed = st.packs
      .agg(coalesce(sum("total_tokens"), lit(0L)).as("tt"),
        coalesce(sum("n_docs"), lit(0L)).as("nd"))
      .head
    assert(packed.getLong(0).toDouble == report(7L)._4,
      s"Σ pack tokens ${packed.getLong(0)} != report metric " +
        s"${report(7L)._4}")
    assert(packed.getLong(1) == n4,
      s"packing lost docs: Σ n_docs ${packed.getLong(1)} != $n4")
    assert(report(7L)._3 == st.packs.count(),
      "report pack count != packs frame count")
  }
}
