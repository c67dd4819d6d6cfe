package graft

import graft.functions.{IvfTopCells, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused IVF scan kernel must be value-identical to the declarative
  * formulation it replaced (transform → struct(dot, cid) → array_sort /
  * array_max + slice) — the DecimalDotSpec discipline applied to the
  * fitted-ANN hot path. The ordering convention (dot DESC, cid ASC,
  * java.lang.Double.compare) and the DecimalDot-per-pair contract are
  * what the DuckDB twins replay, so drift here would break oracles
  * silently on tie-heavy data long before the fixtures noticed. */
class IvfTopCellsSpec extends AnyFunSuite with SparkSuite {

  /** Declarative ground truth: ascending (−dot, cid) struct sort, top
    * k cids. Built OUTSIDE HOF lambdas per centroid so field names
    * survive (the lambda form strips aliases — the r12 lesson). */
  private def declarativeTopK(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], k: Int) = {
    val scored = cents.map { case (cid, cv) =>
      struct(
        (-VectorOps.dot(col("emb"),
          array(cv.map(lit): _*).cast("array<float>"))).as("s"),
        lit(cid).as("c"))
    }
    df.select(col("id"),
      transform(slice(array_sort(array(scored: _*)), 1, k),
        x => x.getField("c")).as("cells"))
  }

  private def kernelTopK(df: org.apache.spark.sql.DataFrame,
      cents: Seq[(Long, Seq[Float])], k: Int) = {
    val cs = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"),
        array(cv.map(lit): _*).cast("array<float>").as("cvec"))
    }: _*)
    df.select(col("id"), IvfTopCells(col("emb"), cs, k).as("cells"))
  }

  private def compare(vecs: Seq[Seq[Float]],
      cents: Seq[(Long, Seq[Float])], k: Int): Unit = {
    import spark.implicits._
    val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "emb")
    val got = kernelTopK(df, cents, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val want = declarativeTopK(df, cents, k).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, w) =>
      assert(got(id) == w, s"row $id: kernel=${got(id)} declarative=$w")
    }
  }

  test("kernel ≡ declarative sort on random vectors and centroids, " +
      "k ∈ {1, 3, 5, |cents|, > |cents|}") {
    val rnd = new scala.util.Random(77)
    def v(n: Int) = Seq.fill(n)((rnd.nextGaussian() * 0.15).toFloat)
    val cents = (0 until 17).map(i => (i * 31L + 5L, v(16)))
    val vecs = Seq.fill(40)(v(16))
    for (k <- Seq(1, 3, 5, 17, 25)) compare(vecs, cents, k)
  }

  test("ties break to the MIN cid at every rank (duplicate centroids " +
      "force exact-equal decimal dots)") {
    val rnd = new scala.util.Random(78)
    def v(n: Int) = Seq.fill(n)((rnd.nextGaussian() * 0.15).toFloat)
    val shared = v(8)
    // three ids share one centroid vector, two share another — their
    // dots are bit-equal by construction, so ordering is pure tie-break
    val cents = Seq(9L -> shared, 3L -> shared, 7L -> shared,
      20L -> v(8), 11L -> v(8), 15L -> v(8).map(_ => 0f),
      2L -> v(8)) ++ Seq(30L -> centsDup, 25L -> centsDup)
    val vecs = Seq.fill(25)(v(8))
    for (k <- Seq(1, 2, 4, 9)) compare(vecs, cents, k)
  }
  private val centsDup: Seq[Float] = {
    val rnd = new scala.util.Random(79)
    Seq.fill(8)((rnd.nextGaussian() * 0.15).toFloat)
  }

  test("null contract mirrors the declarative form's degradation: null " +
      "embedding, null element, length mismatch all null the result") {
    import spark.implicits._
    val cents = Seq(1L -> Seq(0.5f, -0.25f), 2L -> Seq(0.125f, 1f))
    val cs = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("cid"),
        array(cv.map(lit): _*).cast("array<float>").as("cvec"))
    }: _*)
    val df = Seq(
      (0L, Some(Seq(Some(1f), Some(2f)))), // clean
      (1L, None), // null embedding
      (2L, Some(Seq(Some(1f), None))), // null element
      (3L, Some(Seq(Some(1f), Some(2f), Some(3f)))) // length mismatch
    ).toDF("id", "emb")
    val out = df.select(col("id"), IvfTopCells(col("emb"), cs, 2).as("c"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(out(0L).isDefined, "clean row must not null")
    assert(out(1L).isEmpty, "null embedding must null the result")
    assert(out(2L).isEmpty, "null element must null the result")
    assert(out(3L).isEmpty, "length mismatch must null the result")
  }

  test("k > |cents| returns all cents ordered; empty centroid array " +
      "returns an empty list") {
    import spark.implicits._
    val df = Seq((0L, Seq(1f, 1f))).toDF("id", "emb")
    val cents = Seq(5L -> Seq(1f, 0f), 3L -> Seq(0f, 1f))
    val all = kernelTopK(df, cents, 10).head.getSeq[Long](1)
    assert(all.size == 2 && all.toSet == Set(3L, 5L))
    val cs = array().cast(
      "array<struct<cid: bigint, cvec: array<float>>>")
    val empty = df.select(IvfTopCells(col("emb"), cs, 3).as("c"))
      .head.getSeq[Long](0)
    assert(empty.isEmpty, "empty centroid set must yield an empty list")
  }
}
