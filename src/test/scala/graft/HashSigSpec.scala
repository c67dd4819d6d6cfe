package graft

import graft.functions.{HashSig, WrapArith}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused signature kernels (graft.functions.HashSig) promise the
  * exact values of their declarative formulations — that contract is
  * what keeps the DuckDB oracles valid — and a custom Expression has
  * two execution paths (generated Java vs interpreted nullSafeEval)
  * that can silently diverge. Both are pinned here.
  */
class HashSigSpec extends AnyFunSuite with SparkSuite {

  private val rnd = new scala.util.Random(7)
  private val a = Array.fill(64)((rnd.nextLong() >>> 3) | 1L)
  private val b = Array.fill(64)(rnd.nextLong() >>> 3)

  private def hashesDf = {
    import spark.implicits._
    Seq.tabulate(50)(i =>
      (i.toLong, Seq.fill(1 + rnd.nextInt(40))(rnd.nextLong() >>> 4)))
      .toDF("id", "bases")
  }

  test("MinHashSig equals 64 × (wrapAffine → array_min)") {
    val df = hashesDf
    val fused = df.select(col("id"),
      HashSig.minhashSig(col("bases"), a, b).as("sig"))
    val declarative = df.select(col("id") +: (0 until 64).map(i =>
      array_min(transform(col("bases"),
        h => WrapArith.wrapAffine(h, a(i), b(i)))).as(s"h$i")): _*)
    val f = fused.collect().map(r =>
      r.getLong(0) -> r.getSeq[Long](1)).toMap
    val d = declarative.collect().map(r =>
      r.getLong(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    assert(f.keySet == d.keySet)
    f.foreach { case (k, v) => assert(v == d(k), s"row $k diverges") }
  }

  test("SimHash60 equals the declarative bit-majority formulation") {
    val df = hashesDf
    val fused = df.select(col("id"),
      HashSig.simhash60(col("bases")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val decl = df.select(col("id"), expr(
      """aggregate(sequence(0, 59), 0L, (acc, j) ->
        |  acc + IF(2 * size(filter(bases, h -> ((h >> j) & 1) = 1))
        |             > size(bases),
        |           shiftleft(1L, j), 0L))""".stripMargin).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fused == decl)
  }

  test("LshBandKeys equals sha60 over the declarative concat rendering") {
    import graft.functions.XHash.sha60
    val df = hashesDf.select(col("id"),
      HashSig.minhashSig(col("bases"), a, b).as("sig"))
    val fused = df.select(col("id"),
      HashSig.lshBandKeys(col("sig"), 4).as("keys"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val decl = df.select(col("id") +: (0 until 16).map { bd =>
      sha60(concat_ws("_",
        lit(bd) +: (0 until 4).map(r => col("sig").getItem(bd * 4 + r)): _*))
        .as(s"k$bd")
    }: _*).collect()
      .map(r => r.getLong(0) -> r.toSeq.tail.map(_.asInstanceOf[Long])).toMap
    assert(fused.keySet == decl.keySet)
    fused.foreach { case (k, v) => assert(v == decl(k), s"row $k diverges") }
  }

  test("MinHashSig skips null elements exactly like the declarative twin") {
    import spark.implicits._
    val df = Seq((0L, Seq[java.lang.Long](5L, null, 9L)))
      .toDF("id", "bases")
    val fused = df.select(HashSig.minhashSig(col("bases"), a, b))
      .collect()(0).getSeq[Long](0)
    val decl = df.select((0 until 64).map(i =>
      array_min(transform(col("bases"),
        h => WrapArith.wrapAffine(h, a(i), b(i)))).as(s"h$i")): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long])
    assert(fused == decl, "null element must be skipped, not hashed as 0")
  }

  test("LshBandKeys refuses a signature length not divisible by bandRows") {
    import spark.implicits._
    val df = Seq((0L, Seq(1L, 2L, 3L))).toDF("id", "sig")
    val e = intercept[Exception](
      df.select(HashSig.lshBandKeys(col("sig"), 2)).collect())
    assert(e.getMessage != null)
  }

  test("kernels agree between codegen and interpreted eval") {
    val df = hashesDf
    def run(): Seq[(Seq[Long], Long)] =
      df.select(HashSig.minhashSig(col("bases"), a, b).as("m"),
          HashSig.simhash60(col("bases")).as("s"))
        .collect().map(r => (r.getSeq[Long](0), r.getLong(1))).toSeq
    val gen = run()
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() == gen, "interpreted eval diverges from codegen")
    finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("ShingleBases equals the declarative tokenize→shingle→distinct→" +
      "sha60 chain on the real corpus and adversarial strings") {
    import graft.functions.XHash.sha60
    import spark.implicits._
    // adversarial shapes: empty string, single token, two tokens
    // (least() clamp), multi-space runs (split keeps empty tokens),
    // leading/trailing spaces, repeated text (array_distinct)
    val tricky = Seq("", "one", "two tokens", "a  b   c", " lead",
      "trail ", "x x x x x", "a b c a b c a b c").zipWithIndex
      .map { case (t, i) => (10000L + i, t) }.toDF("doc_id", "text")
    val corpus = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("doc_id", "text")
    for (df <- Seq(tricky, corpus)) {
      val fused = df.select(col("doc_id"),
          HashSig.shingleBases(col("text")).as("bs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val decl = df.withColumn("tks", queries.Dedup.toks)
        .withColumn("sh", queries.Dedup.shinglesOfTks)
        .select(col("doc_id"), transform(col("sh"), s => sha60(s)).as("bs"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(fused.keySet == decl.keySet)
      fused.foreach { case (k, v) =>
        assert(v == decl(k), s"doc $k: kernel diverges from declarative") }
    }
  }
}
