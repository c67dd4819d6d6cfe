package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Quantified error bounds for the hash-family sketches whose register /
  * bit / counter CONTENTS are value-level oracled (Sketches.scala,
  * sketch_cms): the oracle pins the sketch bits; these tests pin that
  * the estimates derived from those bits actually work. */
class SketchSpec extends AnyFunSuite with SparkSuite {

  private val sf01 = "/root/testdata/sf0.01"

  test("sketch_bloom: zero false negatives, false-positive rate within " +
    "the (k, m, n) budget") {
    val r = SparkEntry.queries("sketch_bloom")(spark, sf01).cache()
    val n = r.count()
    assert(n > 0)
    // one-sided guarantee: every member tests positive
    assert(r.filter(col("truth") === 1 && col("bf") === 0).count() === 0)
    assert(r.filter(col("ok") =!= 1).count() === 0)
    // fpr bound: fill = 1 - exp(-kn/m) ~ 3.1% at sf0.01 (n=522, k=4,
    // m=65536) -> fpr = fill^4 ~ 1e-6; allow 100x slack on ~1k probes
    val fp = r.filter(col("truth") === 0 && col("bf") === 1).count()
    val nonMembers = r.filter(col("truth") === 0).count()
    assert(nonMembers > 0, "fixture must include a negative class")
    assert(fp.toDouble / nonMembers < 0.01,
      s"false-positive rate ${fp.toDouble / nonMembers} out of budget")
    r.unpersist()
  }

  test("sketch_hll_registers: standard estimator over the oracled " +
    "register file lands within 15% of exact NDV (2.3 sigma at p=8)") {
    val m = 256
    val regs = SparkEntry.queries("sketch_hll_registers")(spark, sf01)
      .select("reg", "max_rho").collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue).toMap
    // absent registers never saw a key -> register value 0
    val all = (0 until m).map(j => regs.getOrElse(j.toLong, 0L))
    val v = all.count(_ == 0L)
    val rawE = {
      val alpha = 0.7213 / (1 + 1.079 / m)
      alpha * m * m / all.map(r => math.pow(2.0, -r.toDouble)).sum
    }
    val est =
      if (rawE <= 2.5 * m && v > 0) m * math.log(m.toDouble / v) // linear counting
      else rawE
    val truth = Tables.orders(spark, sf01)
      .agg(countDistinct("o_custkey")).head.getLong(0).toDouble
    val relErr = math.abs(est - truth) / truth
    assert(relErr < 0.15, s"HLL est $est vs truth $truth (relErr $relErr)")
  }

  test("sketch_kmv: bottom-k estimator lands within 2.5 sigma of exact " +
    "NDV at all three SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", sf01, "/root/testdata/sf0.1")) {
      val rows = SparkEntry.queries("sketch_kmv")(spark, sf)
        .orderBy("rank").collect()
      val truth = Tables.orders(spark, sf)
        .agg(countDistinct("o_custkey")).head.getLong(0).toDouble
      assert(rows.length === 64, s"$sf: sketch must hold k rows (NDV > k)")
      // classic KMV estimator: (k-1) * 2^60 / h_k, exact via BigInt
      val hk = rows.last.getLong(1)
      val est = (BigInt(63) << 60).toDouble / hk.toDouble
      val relErr = math.abs(est - truth) / truth
      // stderr ~ 1/sqrt(k-2) = 12.7% at k=64; 2.5 sigma
      assert(relErr < 0.32, s"$sf: KMV est $est vs $truth (relErr $relErr)")
      // sketch content sanity: strictly increasing positive hashes
      assert(rows.map(_.getLong(1)).sliding(2).forall(p => p(0) < p(1)))
    }
  }

  test("sketch_kmv_jaccard: union-sketch estimator lands within 3 sigma " +
    "of the exact Jaccard at all three SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", sf01, "/root/testdata/sf0.1")) {
      val r = SparkEntry.queries("sketch_kmv_jaccard")(spark, sf).cache()
      val k = r.count().toDouble
      assert(k === 64.0, s"$sf: union sketch must be full at this corpus")
      val est = r.filter(col("in_a") === 1 && col("in_b") === 1)
        .count().toDouble / k
      val o = Tables.orders(spark, sf)
      def keys(p: String) = o.filter(col("o_orderpriority") === p)
        .select("o_custkey").distinct()
      val a = keys("1-URGENT").cache()
      val b = keys("2-HIGH").cache()
      val inter = a.intersect(b).count().toDouble
      val truth = inter / (a.count() + b.count() - inter)
      // stderr ~ sqrt(J(1-J)/k) ≈ 0.054 at J≈0.76, k=64; 3 sigma
      assert(math.abs(est - truth) < 0.17,
        s"$sf: KMV Jaccard est $est vs exact $truth")
      Seq(r, a, b).foreach(_.unpersist())
    }
  }

  test("sketch_kmv_merge: merged bottom-k equals direct bottom-k on " +
    "every rank at all three SFs") {
    for (sf <- Seq("/root/testdata/sf0.001", sf01, "/root/testdata/sf0.1")) {
      val r = SparkEntry.queries("sketch_kmv_merge")(spark, sf).cache()
      assert(r.count() === 64)
      assert(r.filter(col("agree") =!= 1).count() === 0,
        s"$sf: merged and direct KMV sketches diverge")
      r.unpersist()
    }
  }

  test("feature_hash: signed-sum mass balances the token stream " +
    "(sum over dims of sum_val == sum over tokens of sign * count)") {
    import graft.functions.XHash.sha60
    val byDim = SparkEntry.queries("feature_hash")(spark, sf01)
      .agg(sum("sum_val")).head.getLong(0)
    val byTok = Tables.documents(spark, sf01)
      .select(explode(split(col("text"), " ")).as("tok"))
      .select(when(sha60(concat(lit("fs:"), col("tok"))) % 2 === 0, 1L)
        .otherwise(-1L).as("sgn"))
      .agg(sum("sgn")).head.getLong(0)
    assert(byDim === byTok)
  }

  test("join_fuzzy: finds a true near-dup pair with distant ids, and " +
    "every emitted pair respects the threshold and ordering") {
    val r = SparkEntry.queries("join_fuzzy")(spark, sf01).cache()
    assert(r.count() > 0)
    assert(r.filter(col("lev") > 10).count() === 0)
    assert(r.filter(col("d1") >= col("d2")).count() === 0)
    // content blocking (not id-adjacency): some pair is far apart in id
    assert(r.filter(col("d2") - col("d1") > 100).count() > 0,
      "expected at least one distant-id candidate pair")
    r.unpersist()
  }
}
