package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The explicit in-app invalidation path (r10 verdict item 8 + ADVICE):
  * `Tables.invalidate(path)` must (a) serve the rewritten schema on the
  * very next read — no TTL wait — and (b) fan out to the family memos
  * (Dedup.frameMemo, Multimodal.pcaMemo) that cache CHECKPOINTED frames
  * derived from the table, which the schema memo alone cannot refresh. */
class TablesInvalidateSpec extends AnyFunSuite with SparkSuite {

  private def tmpRoot(): String =
    Files.createTempDirectory("graft_inval").toFile.getAbsolutePath

  test("invalidate serves a same-tick rewrite's schema with no sleep") {
    val dir = tmpRoot()
    import spark.implicits._
    Seq((1L, "a")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$dir/tbl.parquet")
    assert(Tables.t(spark, dir, "tbl").schema.fieldNames.toSeq ==
      Seq("id", "v"))
    val memoAt = System.currentTimeMillis()
    Seq((1L, "a", 0.5)).toDF("id", "v", "w")
      .write.mode("overwrite").parquet(s"$dir/tbl.parquet")
    // within the TTL window an uninvalidated reader trusts the memo —
    // that staleness is the documented trade-off invalidate() resolves.
    // Only assert it when we're provably still inside the window, so a
    // slow box can't flake the test.
    val widthNoInval = Tables.t(spark, dir, "tbl").schema.size
    if (System.currentTimeMillis() - memoAt < 1500)
      assert(widthNoInval == 2,
        "TTL semantics changed: expected the memoized schema inside the window")
    Tables.invalidate(s"$dir/tbl.parquet")
    assert(Tables.t(spark, dir, "tbl").schema.fieldNames.toSeq ==
      Seq("id", "v", "w"), "stale schema served after explicit invalidate")
  }

  test("invalidate drops Dedup's memoized frames for the rewritten dir") {
    val dir = tmpRoot()
    spark.read.parquet(s"$sf/documents.parquet")
      .write.parquet(s"$dir/documents.parquet")
    val f1 = graft.queries.Dedup.candidatePairsFor(spark, dir)
    assert(graft.queries.Dedup.candidatePairsFor(spark, dir) eq f1,
      "memo miss on an unchanged dir")
    Tables.invalidate(s"$dir/documents.parquet")
    assert(!(graft.queries.Dedup.candidatePairsFor(spark, dir) eq f1),
      "stale dedup candidate frame served after invalidate")
    // an invalidation for an unrelated root must NOT drop the rebuilt
    // frame (keyCoversPath scopes the fan-out per data dir)
    val f2 = graft.queries.Dedup.candidatePairsFor(spark, dir)
    Tables.invalidate(s"${tmpRoot()}/documents.parquet")
    assert(graft.queries.Dedup.candidatePairsFor(spark, dir) eq f2,
      "unrelated invalidate dropped another dir's frames")
    // a SIBLING table rewrite in the same dir must not evict frames
    // derived solely from documents.parquet (r11 ADVICE: the fan-out is
    // table-scoped, not dir-scoped)
    Tables.invalidate(s"$dir/embeddings.parquet")
    assert(graft.queries.Dedup.candidatePairsFor(spark, dir) eq f2,
      "sibling-table invalidate evicted documents-derived frames")
    // but the whole-dir form still evicts everything under it
    Tables.invalidate(dir)
    assert(!(graft.queries.Dedup.candidatePairsFor(spark, dir) eq f2),
      "whole-dir invalidate no longer reaches the family memo")
  }

  test("invalidate drops Multimodal's PCA frames: rewritten corpus " +
      "changes the fitted axis") {
    val dir = tmpRoot()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    docs.where("doc_id % 7 = 0").limit(40)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val fit = SparkEntry.queries("multimodal_pca_fit")
    val before = fit(spark, dir).collect().toSeq
    // rewrite with a different corpus; without the pcaMemo hook the
    // memoized covariance/axis frames would keep serving the old fit
    docs.where("doc_id % 7 = 3").limit(60)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    Tables.invalidate(s"$dir/documents.parquet")
    val after = fit(spark, dir).collect().toSeq
    assert(before.nonEmpty && after.nonEmpty)
    assert(before != after,
      "PCA fit unchanged after the corpus was rewritten + invalidated")
  }

  test("SessionMemo: sibling sessions of one context share entries, " +
    "invalidateKeys is predicate-scoped, failed computes don't poison") {
    val m = new SessionMemo[String]
    var builds = 0
    def build(v: String): String = { builds += 1; v }
    assert(m.getOrCompute(spark, "k1")(build("v1")) == "v1")
    // same context, same key: memoized (a sibling newSession shares —
    // the Dedup.frameMemo contract: checkpoint blocks are app-wide)
    val sibling = spark.newSession()
    assert(m.getOrCompute(sibling, "k1")(build("OTHER")) == "v1")
    assert(builds == 1)
    // predicate invalidation drops exactly the matching keys
    assert(m.getOrCompute(spark, "k2")(build("v2")) == "v2")
    m.invalidateKeys(_ == "k1")
    assert(m.getOrCompute(spark, "k2")(build("OTHER")) == "v2",
      "non-matching key must survive invalidateKeys")
    assert(m.getOrCompute(spark, "k1")(build("v1b")) == "v1b",
      "matching key must recompute after invalidateKeys")
    // computeIfAbsent contract: a THROWING compute records nothing,
    // the next call retries (the Catalog.once poisoning rule)
    intercept[RuntimeException] {
      m.getOrCompute(spark, "k3")(throw new RuntimeException("boom"))
    }
    assert(m.getOrCompute(spark, "k3")(build("v3")) == "v3",
      "a failed compute must not poison the key")
  }

  test("SchemaBridge footer probe equals Spark's job-based inference " +
      "on every fixture table at every SF (r17)") {
    // the driver-direct probe (single footer + Spark's own converter
    // under the session SQLConf) must be indistinguishable from
    // spark.read.parquet(path).schema — including nullability and
    // field metadata — or explicit-schema reads could change plans.
    // events needs the same conf Tables.events sets before inference.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    for {
      sfDir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")
      name <- Tables.names
    } {
      val path = s"$sfDir/$name.parquet"
      val bridge = org.apache.spark.sql.graftbridge.SchemaBridge
        .inferSingleFooter(spark, path)
      assert(bridge.isDefined,
        s"$path: single-footer probe unexpectedly fell back")
      val inferred = spark.read.parquet(path).schema
      assert(bridge.get == inferred,
        s"$path: bridge schema != job-based inference\n" +
          s"bridge:   ${bridge.get.toDDL}\ninferred: ${inferred.toDDL}")
    }
    // layouts the probe must REFUSE (fall back to the job): multi-file
    // and partitioned dirs
    val dir = tmpRoot()
    import spark.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").repartition(2)
      .write.mode("overwrite").parquet(s"$dir/multi.parquet")
    assert(org.apache.spark.sql.graftbridge.SchemaBridge
      .inferSingleFooter(spark, s"$dir/multi.parquet").isEmpty,
      "multi-file layout must fall back to job-based inference")
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "v", "k")
      .write.mode("overwrite").partitionBy("k")
      .parquet(s"$dir/part.parquet")
    assert(org.apache.spark.sql.graftbridge.SchemaBridge
      .inferSingleFooter(spark, s"$dir/part.parquet").isEmpty,
      "partitioned layout must fall back (inference injects key columns)")
  }
}
