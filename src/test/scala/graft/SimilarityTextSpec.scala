package graft

import graft.functions.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search and text-analysis properties. */
class SimilarityTextSpec extends AnyFunSuite with SparkSuite {

  test("fused DecimalDot is bit-identical to the declarative decimal fold") {
    val e = Tables.embeddings(spark, sf)
    val both = e.crossJoin(broadcast(
        e.filter(col("vec_id") === 0).select(col("embedding").as("qv"))))
      .select(
        VectorOps.dot(col("embedding"), col("qv")).as("fused"),
        VectorOps.dotDeclarative(col("embedding"), col("qv")).as("decl"))
      .collect()
    assert(both.nonEmpty)
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fused=${r.getDouble(0)} decl=${r.getDouble(1)}"))
    // interpreted path too (covers nullSafe eval divergence)
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interp = e.limit(50).select(
          VectorOps.dot(col("embedding"), col("embedding")).as("f"),
          VectorOps.dotDeclarative(col("embedding"), col("embedding")).as("d"))
        .collect()
      interp.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("embed_quantize maps an all-zero vector to all-zero codes") {
    // The real table has no zero vectors (and PropertySpec filters them),
    // so pin the 127/0 = Inf → 0·Inf = NaN guard on a synthetic table.
    val dir = java.nio.file.Files.createTempDirectory("qzero").toString
    val schema = Tables.embeddings(spark, sf).schema
    val src = Tables.embeddings(spark, sf).limit(3).collect().toSeq
    val zeroed = src.zipWithIndex.map { case (r, i) =>
      if (i == 0) {
        val vals = r.toSeq.toArray
        val vi = schema.fieldIndex("embedding")
        val dim = r.getSeq[Float](vi).length
        vals(vi) = Seq.fill(dim)(0.0f)
        org.apache.spark.sql.Row.fromSeq(vals.toSeq)
      } else r
    }
    spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(zeroed).asJava), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("embed_quantize")(spark, dir)
      .orderBy("vec_id").collect()
    assert(out.length == 3)
    val z = out.head
    assert(z.getLong(z.fieldIndex("q_sum")) == 0L
      && z.getLong(z.fieldIndex("q_min")) == 0L
      && z.getLong(z.fieldIndex("q_max")) == 0L,
      s"zero vector must quantize to zeros, got $z")
    // non-zero rows still produce a full-range code (max |q| = 127)
    out.tail.foreach { r =>
      assert(math.max(math.abs(r.getLong(r.fieldIndex("q_min"))),
        math.abs(r.getLong(r.fieldIndex("q_max")))) == 127L, r.toString)
    }
  }

  test("cosine(v, v) == 1 within double tolerance") {
    val e = Tables.embeddings(spark, sf).limit(20)
    val sims = e.select(VectorOps.cosine(col("embedding"), col("embedding")).as("s"))
      .collect().map(_.getDouble(0))
    sims.foreach(s => assert(math.abs(s - 1.0) < 1e-9, s))
  }

  test("ann lsh results are a subset of the exact ranking with true sims") {
    val brute = SparkEntry.queries("sim_topk_cosine")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim")).toMap
    val ann = SparkEntry.queries("sim_ann_lsh")(spark, sf).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Double]("sim"))
    // the query vector itself must be its own nearest neighbor
    assert(ann.head._1 == 0L && math.abs(ann.head._2 - 1.0) < 1e-9)
    // any ann hit that appears in the exact top-10 must carry the same sim
    ann.foreach { case (id, s) =>
      brute.get(id).foreach(bs => assert(math.abs(bs - s) < 1e-12)) }
  }

  test("knn_classify_ann on the FITTED gate: label agreement vs brute " +
      "force ≥ 0.9 on a clustered corpus; uniform fixture floored at " +
      "its probe-fraction bound") {
    // Deterministic both ways: fitted centroids are a constant of the
    // code+data, probes are the first 50 vec_ids, and the vote head is
    // shared between the two classifiers — any disagreement is purely
    // candidate recall. The production claim attaches to the CLUSTERED
    // corpus (the regime real embedding corpora live in): the probe's
    // KnnFittedNProbe fitted cells hold its cluster, so the 10-vote
    // majority survives the sublinear gate.
    import graft.queries.Similarity
    def agreement(d: String, n: Long): Double = {
      val brute = Similarity.knnClassifyBrute(spark, d, n).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      val ann = Similarity.knnClassifyAnn(spark, d, n).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
      assert(brute.nonEmpty)
      brute.keysIterator
        .count(q => ann.get(q).contains(brute(q))).toDouble / brute.size
    }
    val clustered = agreement(clusteredEmbDir(), 50)
    info(f"clustered-corpus ann-vs-brute agreement: $clustered%.3f " +
      "over 50 probes")
    assert(clustered >= 0.9, f"clustered agreement $clustered%.3f < 0.9 " +
      "— the fitted cells no longer hold the majority vote where the " +
      "corpus HAS structure")
    // The uniform fixture has no geometry for any index to exploit:
    // labels are independent of position, so agreement is bounded by
    // candidate recall ≈ nProbe/cells (16 of ~61 fitted cells at
    // sf0.1 ≈ 26 %, measured agreement 0.34 — the old sign-LSH gate's
    // 0.9 here was bought by scanning ~94 % of the corpus, which is
    // not an index). Floor it well above the 10-label chance rate to
    // catch gate regressions without promising what no sublinear
    // candidate gate can deliver on structureless data.
    val uniform = agreement("/root/testdata/sf0.1", 50)
    info(f"uniform-fixture ann-vs-brute agreement: $uniform%.3f " +
      "over 50 probes")
    assert(uniform >= 0.2, f"uniform agreement $uniform%.3f < 0.2 — " +
      "below even the probe-fraction bound; the gate itself regressed")
  }

  test("ANN recall@10 vs brute force ≥ 0.8 at sf0.1 (LSH and IVF)") {
    // Deterministic measurement: fixed planes/centroids, fixed corpus,
    // 20 fixed query ids — the recall is a constant of the code+data,
    // not a flaky statistic. The corpus is uniform random (no planted
    // near-dups), the hardest case for ANN: this bound certifies the
    // multi-probe parameterization actually buys recall, not just the
    // lucky bucket.
    import graft.queries.Similarity
    val d = "/root/testdata/sf0.1"
    def recall(ann: (org.apache.spark.sql.SparkSession, String, Long, Int)
        => org.apache.spark.sql.DataFrame): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = ann(spark, d, qid, 10).collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val lsh = recall(Similarity.annLshTopK)
    val ivf = recall(Similarity.annIvfTopK(_, _, _, _))
    info(f"recall@10: lsh=$lsh%.3f ivf=$ivf%.3f")
    assert(lsh >= 0.8, f"LSH multi-probe recall@10 $lsh%.3f < 0.8")
    assert(ivf >= 0.8, f"IVF nProbe=${Similarity.IvfNProbe} recall@10 " +
      f"$ivf%.3f < 0.8")
  }

  test("PQ/ADC recall@10 vs brute force at sf0.1 (sim_topk_pq path)") {
    // Same deterministic harness as the LSH/IVF bound: fixed codebooks,
    // fixed corpus, 20 fixed query ids. Uniform random vectors are the
    // WORST case for 4-bit product quantization (no cluster structure
    // for codebooks to exploit), so this floor certifies the ADC
    // table-lookup scoring still concentrates the true neighbors into
    // the 100-candidate re-rank set far above the 100/2000 = 5%
    // random-selection baseline (measured 0.56 ≈ 11× random).
    import graft.queries.Similarity
    val d = "/root/testdata/sf0.1"
    val per = (0L until 20L).map { qid =>
      val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
        .map(_.getLong(0)).toSet
      val got = Similarity.pqTopK(spark, d, qid, 100, 10).collect()
        .map(_.getLong(0)).toSet
      (exact intersect got).size / 10.0
    }
    val rec = per.sum / per.size
    info(f"PQ recall@10: $rec%.3f over 20 probes (candidates = 100)")
    assert(rec >= 0.5, f"PQ/ADC recall@10 $rec%.3f < 0.5")
  }

  test("IVF+PQ (sim_ann_ivfpq): cell pruning cuts the ADC scan to the " +
    "probe fraction without dropping below the PQ-alone recall floor") {
    import graft.queries.Similarity
    val d = "/root/testdata/sf0.1"
    // measured scan fraction: corpus rows whose cell lands in vec 0's
    // probed cells / corpus rows — the rows the ADC scan actually reads
    // (deterministic: fixed centroids). nProbe/nCells = 5/8 is the
    // uniform-corpus expectation; clustered real corpora probe less.
    val st = Similarity.ivfScanStats(spark, d, 0L).head()
    val frac = st.getLong(0).toDouble / st.getLong(1)
    val perPq = (0L until 20L).map { qid =>
      val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
        .map(_.getLong(0)).toSet
      val got = Similarity.pqTopK(spark, d, qid, 100, 10).collect()
        .map(_.getLong(0)).toSet
      (exact intersect got).size / 10.0
    }
    val perIvfPq = (0L until 20L).map { qid =>
      val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
        .map(_.getLong(0)).toSet
      val got = Similarity.ivfPqTopK(spark, d, qid, 100, 10).collect()
        .map(_.getLong(0)).toSet
      (exact intersect got).size / 10.0
    }
    def recallOf(top: Long => org.apache.spark.sql.DataFrame): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = top(qid).collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val pq = perPq.sum / perPq.size
    val ivfpq = recallOf(qid => Similarity.ivfPqTopK(spark, d, qid, 100, 10))
    val res = recallOf(qid =>
      Similarity.ivfPqResidualTopK(spark, d, qid, 100, 10))
    info(f"IVF+PQ recall@10: $ivfpq%.3f | residual-encoded $res%.3f | " +
      f"PQ-alone $pq%.3f, scan fraction $frac%.3f (query 0)")
    assert(frac < 0.8, f"cell pruning scanned $frac%.3f of the corpus — " +
      "no read win over PQ-alone")
    // same candidate budget over a pruned scan: recall must hold the
    // PQ-alone floor (the true neighbors IVF keeps face fewer ADC
    // competitors, offsetting the ones pruning loses)
    assert(ivfpq >= 0.5, f"IVF+PQ recall@10 $ivfpq%.3f < 0.5")
    // the residual layout's honest floor on THIS corpus: uniform
    // vectors give cells no structure, so the residual is LONGER than
    // the raw vector and 4-bit codes quantize it noisier — residual
    // coding here trails raw (0.405 vs 0.545 measured) while still
    // beating the 5% random-candidate baseline 8x. The geometry claim
    // residual IVFADC exists for is witnessed on a corpus that HAS
    // cluster structure in the next test.
    assert(res >= 0.3, f"residual IVFADC recall@10 $res%.3f < 0.3")
  }

  /** Driver-side per-subspace k-means (the fit produces CONSTANTS,
    * exactly like a production training job; retrieval then runs the
    * same declared-query machinery with the fit books). */
  private def fitSubBooks(data: Array[Array[Double]],
      init: Seq[Seq[Seq[Float]]]): Seq[Seq[Seq[Float]]] = {
    import graft.queries.Similarity.{PqSubDim, PqSubspaces}
    (0 until PqSubspaces).map { s2 =>
      val lo = s2 * PqSubDim
      val sub = data.map(_.slice(lo, lo + PqSubDim))
      var books = init(s2).map(_.map(_.toDouble).toArray)
      for (_ <- 1 to 5) {
        val assign = sub.map { r =>
          books.zipWithIndex.minBy { case (b, _) =>
            r.indices.foldLeft(0.0) { (acc, j) =>
              val dlt = r(j) - b(j); acc + dlt * dlt }
          }._2
        }
        books = books.indices.map { i =>
          val mine = sub.indices.filter(assign(_) == i)
          if (mine.isEmpty) books(i)
          else {
            val m = new Array[Double](PqSubDim)
            mine.foreach(r => m.indices.foreach(j => m(j) += sub(r)(j)))
            m.map(_ / mine.size)
          }
        }
      }
      books.map(_.map(_.toFloat).toSeq).toSeq
    }
  }

  /** Synthetic CLUSTERED labeled corpus: each vector = its cluster
    * center (the 8 fixed ivfCentroids) + small isotropic noise,
    * deterministic seed — the regime real embedding corpora live in.
    * Labels are CLUSTER-DETERMINED (label = "l" + id % 4 = center % 4,
    * two clusters per label), so a majority vote over true neighbors
    * equals the cluster's label — the agreement witness's ground
    * truth. Built once per JVM; shared by the residual-IVFADC and the
    * knn-agreement tests. */
  private def clusteredEmbDir(): String = {
    import graft.queries.Similarity
    val base = "/root/testdata/sf0.1"
    val synth = Catalog.scratch(base, "clustered_emb")
    Catalog.once(spark, base, "clustered_emb") {
      val rnd = new scala.util.Random(123L)
      val rows = (0 until 2000).map { id =>
        val c = Similarity.ivfCentroids(id % 8)
        (id.toLong, c.map(v => (v + rnd.nextGaussian() * 0.06).toFloat),
          s"l${id % 4}")
      }
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label").coalesce(1)
        .write.mode("overwrite").parquet(s"$synth/embeddings.parquet")
    }
    synth
  }

  test("residual IVFADC on a CLUSTERED corpus: when cells carry " +
    "structure, residual codes beat raw-vector codes at the same bit " +
    "budget — the geometry claim the production layout rests on") {
    import graft.queries.Similarity
    val synth = clusteredEmbDir()
    val rows = Tables.embeddings(spark, synth)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    def dot(a: Array[Float], b: Seq[Float]): Double =
      a.iterator.zip(b.iterator)
        .foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
    // engine tie convention: max score, tie -> max cell index
    def cellOf(x: Array[Float]): Int =
      Similarity.ivfCentroids.zipWithIndex
        .maxBy { case (c, i) => (dot(x, c), i) }._2
    val raw = rows.map(_.map(_.toDouble))
    val residuals = rows.map { x =>
      val c = Similarity.ivfCentroids(cellOf(x))
      x.indices.map(j => x(j).toDouble - c(j).toDouble).toArray
    }
    // both contenders get the SAME fit treatment and bit budget
    val rawFit = fitSubBooks(raw, Similarity.pqCodebooks)
    val resFit = fitSubBooks(residuals, Similarity.pqResCodebooks)
    def recallOf(top: Long => org.apache.spark.sql.DataFrame): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, synth, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = top(qid).collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val rawRecall = recallOf(qid =>
      Similarity.pqTopK(spark, synth, qid, 100, 10, rawFit))
    val resRecall = recallOf(qid =>
      Similarity.ivfPqResidualTopK(spark, synth, qid, 100, 10, resFit))
    info(f"clustered corpus recall@10: residual-fit $resRecall%.3f vs " +
      f"raw-fit $rawRecall%.3f (same 8x4-bit budget)")
    assert(resRecall > rawRecall,
      f"residual-fit $resRecall%.3f did not beat raw-fit $rawRecall%.3f " +
        "on clustered data — the residual layout's premise fails")
  }

  test("PQ codebooks refit from data (pq_fit_codebooks): one Lloyd " +
    "update lifts retrieval recall strictly above the fixed-codebook pin") {
    import graft.queries.Similarity
    val d = "/root/testdata/sf0.1"
    // refit = the declared (oracled) fit query's means fed back as the
    // codebooks; (sub, code) cells no vector mapped to keep their fixed
    // entry (Lloyd leaves empty cells in place)
    val means = SparkEntry.queries("pq_fit_codebooks")(spark, d).collect()
      .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)), r.getDouble(4)))
      .toMap
    val refit = (0 until Similarity.PqSubspaces).map(sub =>
      (0 until Similarity.PqCodes).map(code =>
        (0 until Similarity.PqSubDim).map(dim =>
          means.get((sub, code, dim)).map(_.toFloat)
            .getOrElse(Similarity.pqCodebooks(sub)(code)(dim)))))
    def recall(books: Seq[Seq[Seq[Float]]]): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = Similarity.pqTopK(spark, d, qid, 100, 10, books)
          .collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val fixed = recall(Similarity.pqCodebooks)
    val refitted = recall(refit)
    info(f"PQ recall@10: fixed=$fixed%.3f refit=$refitted%.3f")
    assert(refitted > fixed,
      f"refit recall $refitted%.3f did not improve on fixed $fixed%.3f")
  }

  test("sim_topk_pq_fitted: the DECLARED refit-ADC path holds the " +
    "spec-witnessed lift over the fixed-codebook floor (r11 item 3 — " +
    "fit feeds the declared dataflow, not just a witness)") {
    import graft.queries.{Similarity, SimilarityFitted}
    val d = "/root/testdata/sf0.1"
    def recallOf(top: Long => org.apache.spark.sql.DataFrame): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = top(qid).collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val fixed = recallOf(qid => Similarity.pqTopK(spark, d, qid, 100, 10))
    val fitted = recallOf(qid =>
      SimilarityFitted.fittedPqTopK(spark, d, qid, 100, 10))
    info(f"declared-path PQ recall@10: fixed=$fixed%.3f fitted=$fitted%.3f")
    // the declared path quantizes refit entries to float32 and keeps
    // empty cells at their seed — recall must still strictly beat the
    // fixed books (the whole point of wiring the fit in)
    assert(fitted > fixed,
      f"declared fitted-ADC recall $fitted%.3f does not beat the " +
        f"fixed-codebook $fixed%.3f")
    // the fully-fitted IVFADC composition prunes the ADC scan to the
    // fitted probe cells at the SAME 100-candidate re-rank budget:
    // recall over the pruned scan must stay in the fitted-ADC band
    // (the sim_ann_ivfpq adjudication — cell pruning trades scan cost,
    // not the re-rank budget; the uniform corpus is the worst case)
    val ivfpq = recallOf(qid =>
      SimilarityFitted.fittedIvfPqTopK(spark, d, qid, 100, 10))
    info(f"fully-fitted IVFADC recall@10: $ivfpq%.3f (fitted-ADC " +
      f"unpruned: $fitted%.3f)")
    assert(ivfpq >= 0.4,
      f"fully-fitted IVFADC recall $ivfpq%.3f below the floor")
  }

  test("two-regime witness: the sqrt(n)-cells seed rule runs the SAME " +
    "fitted machinery — only the stride changes (the SimilarityFitted " +
    "scaladoc's past-the-broadcast-budget claim, executable)") {
    import org.apache.spark.sql.functions._
    import graft.queries.{Similarity, SimilarityFitted}
    val d = "/root/testdata/sf0.1"
    val ne = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding")
    val n = ne.count()
    // √n regime: stride = n/√n = √n ⇒ ~√n cells at ~√n occupancy —
    // the always-broadcastable centroid-set rule for corpora whose
    // n/32 cells would blow the broadcast budget
    val stride = math.round(math.sqrt(n.toDouble))
    val cs = SimilarityFitted.fitCentArrWithStride(ne, stride)
      .localCheckpoint(true)
    val nCells = cs.select(size(col("cs"))).head.getInt(0)
    info(s"n=$n stride=$stride -> $nCells fitted cells (√n ≈ $stride)")
    assert(math.abs(nCells - stride) <= stride / 2,
      s"seed rule did not drive the cell count: $nCells cells at " +
        s"stride $stride")
    def recallOf(qid: Long): Double = {
      val exact = Similarity.bruteTopK(spark, d, qid, 10).collect()
        .map(_.getLong(0)).toSet
      val got = SimilarityFitted.fittedTopKWith(ne, cs, qid, 10)
        .collect().map(_.getLong(0)).toSet
      (exact intersect got).size / 10.0
    }
    val recall = (0L until 20L).map(recallOf).sum / 20.0
    val fraction = SimilarityFitted.FittedNProbe.toDouble / nCells
    info(f"√n-regime recall@10: $recall%.3f at probe fraction " +
      f"$fraction%.3f (uniform corpus — the ANN worst case)")
    // on uniform data recall ≈ probe fraction + the angular bonus; the
    // pin is that the machinery delivers the bonus (retrieval beats
    // the scanned fraction) — clustered corpora hold far more (the
    // fit-feeds-the-index witness measures 1.000 at nProbe=1 there)
    assert(recall > fraction,
      f"√n-regime recall $recall%.3f does not beat the scanned " +
        f"fraction $fraction%.3f — the index adds nothing")
  }

  test("declared fitted-index retrieval holds recall on a CLUSTERED " +
    "corpus: the sim_ann_ivf_fitted / sim_ann_ivfpq_fitted bodies over " +
    "the clustered synth (r12 item 6 — the recall claim attaches to " +
    "the DECLARED path, not just the fit machinery)") {
    import graft.queries.{Similarity, SimilarityFitted}
    import org.apache.spark.sql.functions._
    val synth = clusteredEmbDir()
    // the declared entries themselves first (their fixed qid = 0)
    def topIds(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.collect().map(_.getLong(0)).toSet
    val exact0 = topIds(Similarity.bruteTopK(spark, synth, 0, 10))
    val ivf0 = topIds(
      SparkEntry.queries("sim_ann_ivf_fitted")(spark, synth))
    val ivfpq0 = topIds(
      SparkEntry.queries("sim_ann_ivfpq_fitted")(spark, synth))
    assert((exact0 intersect ivf0).size >= 9,
      s"declared sim_ann_ivf_fitted recalls ${(exact0 intersect ivf0).size}" +
        "/10 on clustered data")
    // the same declared machinery across 20 probes (the decl bodies
    // call exactly these functions with a literal qid)
    val ne = spark.read.parquet(s"$synth/embeddings.parquet")
      .filter(col("embedding").isNotNull).select("vec_id", "embedding")
    val cs = SimilarityFitted.fittedCsFull(spark, synth)
    def recallOf(top: Long => org.apache.spark.sql.DataFrame): Double =
      (0L until 20L).map { qid =>
        val exact = topIds(Similarity.bruteTopK(spark, synth, qid, 10))
        (exact intersect topIds(top(qid))).size / 10.0
      }.sum / 20.0
    val ivf = recallOf(qid =>
      SimilarityFitted.fittedTopKWith(ne, cs, qid, 10))
    val ivfpq = recallOf(qid =>
      SimilarityFitted.fittedIvfPqTopK(spark, synth, qid, 100, 10))
    info(f"clustered recall@10 over 20 probes: fitted IVF $ivf%.3f, " +
      f"fully-fitted IVFADC $ivfpq%.3f " +
      f"(ivfpq@qid0: ${(exact0 intersect ivfpq0).size}/10)")
    assert(ivf >= 0.9, f"fitted-IVF clustered recall $ivf%.3f < 0.9 — " +
      "the occupancy-scaled cells no longer capture cluster structure")
    assert(ivfpq >= 0.6,
      f"fully-fitted IVFADC clustered recall $ivfpq%.3f < 0.6")
  }

  test("fitCentArrRouted: the regime choice is statistics-driven and " +
    "switches in BOTH directions around the row ceiling (r12 verdict " +
    "item 2)") {
    import org.apache.spark.sql.functions._
    import graft.queries.SimilarityFitted
    // the pure rule first: occupancy stride at/below the ceiling, √n
    // stride above it, from both sides of the boundary
    val c = SimilarityFitted.AnnOccupancyRegimeMaxRows
    assert(SimilarityFitted.fittedStrideFor(c) ===
      SimilarityFitted.IvfOccupancy.toLong)
    assert(SimilarityFitted.fittedStrideFor(c + 1) ===
      math.round(math.sqrt((c + 1).toDouble)))
    assert(SimilarityFitted.fittedStrideFor(4L * c) ===
      math.round(math.sqrt((4L * c).toDouble)))
    // then the routed FIT itself on real data, ceiling pinched to the
    // fixture so both regimes actually execute: below the ceiling the
    // routed index IS the occupancy index (same cell count as stride
    // 32); above it the routed index is the √n index
    val ne = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .select("vec_id", "embedding")
    val n = ne.count()
    def cellsOf(cs: org.apache.spark.sql.DataFrame): Int =
      cs.select(size(col("cs"))).head.getInt(0)
    val occ = cellsOf(SimilarityFitted.fitCentArrRouted(ne, ceiling = n))
    val occRef = cellsOf(SimilarityFitted.fitCentArrWithStride(ne, 32))
    assert(occ === occRef,
      s"routed fit under the ceiling is not the occupancy index " +
        s"($occ vs $occRef cells)")
    val rt = cellsOf(SimilarityFitted.fitCentArrRouted(ne, ceiling = n - 1))
    val rtRef = cellsOf(SimilarityFitted.fitCentArrWithStride(ne,
      math.round(math.sqrt(n.toDouble))))
    assert(rt === rtRef,
      s"routed fit above the ceiling is not the √n index " +
        s"($rt vs $rtRef cells)")
    info(s"n=$n: routed cells $occ (occupancy regime) / $rt (√n regime)")
    assert(occ > rt, "regimes indistinguishable at this fixture size — " +
      "the switchover pin is vacuous")
  }

  test("text_nb_classify: the in-engine-trained Naive Bayes beats the " +
    "fixed text_lang_id heuristic on held-out docs at sf0.1") {
    // The learned-vs-fixed comparison runs at sf0.1 (4000 train / 1000
    // held-out docs): the corpus's language signal is weak by design
    // (shared tech vocabulary), so at sf0.001 the 400-doc train split
    // is sample-noise-dominated and NB ≈ majority-class; from sf0.01 up
    // the learned counts beat the hand-written marker heuristic — the
    // honest shape of a trained filter: it needs data to earn its keep.
    val d = "/root/testdata/sf0.1"
    val nb = SparkEntry.queries("text_nb_classify")(spark, d).collect()
    val nbAcc = nb.count(r => r.getString(1) == r.getString(2))
      .toDouble / nb.length
    val heur = SparkEntry.queries("text_lang_id")(spark, d)
      .filter(col("doc_id") % 5 === 0).collect()
    val hAcc = heur.count(r => r.getString(1) == r.getString(2))
      .toDouble / heur.length
    info(f"held-out accuracy: nb=$nbAcc%.3f vs heuristic=$hAcc%.3f " +
      f"over ${nb.length} docs")
    assert(nb.length == 1000, s"expected 1000 held-out docs, got ${nb.length}")
    assert(nbAcc > hAcc,
      f"learned NB $nbAcc%.3f must beat the fixed heuristic $hAcc%.3f")
  }

  test("embed_project: JL distortion — projected cosine tracks full " +
    "cosine at the 1/sqrt(16) scale over sampled pairs") {
    val sf01 = "/root/testdata/sf0.01"
    val proj = SparkEntry.queries("embed_project")(spark, sf01)
    val pcols = (1 to 16).map(j => col(s"p$j"))
    val p = proj.select(col("vec_id"),
      array(pcols: _*).as("pv"))
    val full = Tables.embeddings(spark, sf01).select(col("vec_id"),
      col("embedding").cast("array<double>").as("fv"))
    val both = p.join(full, "vec_id")
    // consecutive-id pairs: a deterministic sample of 250 pairs
    val a = both.withColumn("pid", floor(col("vec_id") / 2))
      .filter(col("vec_id") % 2 === 0)
    val b = both.withColumn("pid", floor(col("vec_id") / 2))
      .filter(col("vec_id") % 2 === 1)
    def cos(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
      def dot(u: org.apache.spark.sql.Column, v: org.apache.spark.sql.Column) =
        aggregate(zip_with(u, v, (s, t) => s * t), lit(0.0), (acc, z) => acc + z)
      dot(x, y) / sqrt(dot(x, x) * dot(y, y))
    }
    val d = a.join(b.select(col("pid"), col("pv").as("pv2"),
        col("fv").as("fv2")), "pid")
      .select(abs(cos(col("pv"), col("pv2")) - cos(col("fv"), col("fv2")))
        .as("dev"))
      .agg(avg("dev").as("mean"), max("dev").as("mx")).head()
    val (mean, mx) = (d.getDouble(0), d.getDouble(1))
    // E|dev| ~ sqrt(2/pi)/sqrt(16) = 0.20 for near-orthogonal pairs;
    // bound mean with headroom and the max at 4 sigma
    assert(mean < 0.25, s"mean cosine distortion $mean too large")
    assert(mx < 0.85, s"max cosine distortion $mx too large")
  }

  test("sim_topk_projected: the 50-candidate JL prefilter recalls most " +
    "of the exact brute-force top-10") {
    val sf01 = "/root/testdata/sf0.01"
    val exact = SparkEntry.queries("sim_topk_cosine")(spark, sf01)
      .collect().map(_.getLong(0)).toSet
    val twoStage = SparkEntry.queries("sim_topk_projected")(spark, sf01)
      .collect()
    val got = twoStage.map(_.getLong(0)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    // This corpus is uniform random vectors — the WORST case for JL
    // ranking: true neighbor cosines sit ~1σ (σ=1/√64≈0.13) above the
    // bulk while 16-dim projection adds ~1/√16≈0.25 ranking noise, so
    // margins drown. Even so the prefilter must beat chance decisively:
    // a random 50-of-500 candidate set recalls 10% in expectation; pin
    // ≥ 3× that. (On a clustered real corpus the neighbor margin is
    // large vs the JL noise and recall approaches 1 — same reasoning
    // as the LSH/IVF recall notes above.)
    assert(recall >= 0.3, s"two-stage recall $recall < 3x chance (0.3)")
    // exact sims of the returned rows are true cosines: spot-check one
    // against sim_topk_cosine's value for a shared id
    val exactSims = SparkEntry.queries("sim_topk_cosine")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    twoStage.filter(r => exactSims.contains(r.getLong(0))).foreach { r =>
      assert(r.getDouble(2) == exactSims(r.getLong(0)),
        s"re-ranked sim differs from brute force for vec ${r.getLong(0)}")
    }
  }

  test("sim_hard_negatives: triplets are label-valid, the positive is " +
      "the true same-label argmax, and IVF mining recalls most global " +
      "hard negatives") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("sim_hard_negatives")(spark, d).collect()
    assert(rows.nonEmpty)
    // brute-force ground truth from collected vectors (500 × 25 — cheap)
    val all = Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dp / math.sqrt(na * nb)
    }
    val byId = all.map(t => t._1 -> t).toMap
    var negHits = 0
    rows.foreach { r =>
      val aid = r.getLong(r.fieldIndex("anchor_id"))
      val pid = r.getLong(r.fieldIndex("pos_id"))
      val nid = r.getLong(r.fieldIndex("neg_id"))
      val (_, albl, av) = byId(aid)
      // label validity
      assert(byId(pid)._2 == albl, s"anchor $aid: positive $pid crosses label")
      assert(byId(nid)._2 != albl, s"anchor $aid: negative $nid shares label")
      assert(r.getDouble(r.fieldIndex("margin")) ==
        r.getDouble(r.fieldIndex("pos_sim")) -
          r.getDouble(r.fieldIndex("neg_sim")))
      // positive optimality: label-blocked candidates are exhaustive, so
      // the mined positive must BE the brute-force same-label argmax
      // (tie → smallest id; float-sum tolerance on the test's own cosine)
      val bestPos = all.filter(t => t._2 == albl && t._1 != aid)
        .maxBy(t => (cos(av, t._3), -t._1.toDouble))._1
      assert(pid == bestPos ||
        math.abs(cos(av, byId(pid)._3) - cos(av, byId(bestPos)._3)) < 1e-9,
        s"anchor $aid: positive $pid is not the same-label argmax $bestPos")
      // negative: counted against the GLOBAL cross-label argmax — probe
      // mining is allowed to miss (that is the nProbe/nCells trade), but
      // must land the true hardest negative most of the time
      val bestNeg = all.filter(_._2 != albl)
        .maxBy(t => (cos(av, t._3), -t._1.toDouble))._1
      if (nid == bestNeg) negHits += 1
    }
    val hitRate = negHits.toDouble / rows.length
    info(f"anchors=${rows.length} global-hard-negative hit rate $hitRate%.3f")
    assert(hitRate >= 0.6,
      f"IVF-mined hard negatives recall only $hitRate%.3f of global argmaxes")
  }

  test("text_bigram_nll: scores match a brute-force interpolated " +
      "bigram LM and every term is a finite positive surprisal") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("text_bigram_nll")(spark, d).collect()
    assert(rows.nonEmpty)
    val docs = Tables.documents(spark, d)
      .filter(col("text").isNotNull)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    val train = docs.filter(_._1 % 5 != 0)
    val big = scala.collection.mutable.Map[(String, String), Long]()
    val uni = scala.collection.mutable.Map[String, Long]()
    train.foreach { case (_, tks) =>
      tks.foreach(t => uni(t) = uni.getOrElse(t, 0L) + 1)
      tks.sliding(2).filter(_.length == 2).foreach(p =>
        big((p(0), p(1))) = big.getOrElse((p(0), p(1)), 0L) + 1)
    }
    val ctx = big.groupBy(_._1._1).map { case (w, m) => w -> m.values.sum }
    val n = uni.values.sum.toDouble; val v = uni.size.toDouble
    rows.foreach { r =>
      val id = r.getLong(0)
      val tks = docs.find(_._1 == id).get._2
      val terms = tks.sliding(2).filter(_.length == 2).map { p =>
        val c1 = ctx.getOrElse(p(0), 0L)
        val cond = if (c1 > 0)
          big.getOrElse((p(0), p(1)), 0L).toDouble / c1 else 0.0
        val ph = 0.75 * cond + 0.25 * ((uni.getOrElse(p(1), 0L) + 1) / (n + v))
        assert(ph > 0 && ph < 1, s"doc $id: p-hat $ph out of (0,1)")
        -math.log(ph)
      }.toSeq
      assert(r.getLong(1) == terms.length,
        s"doc $id: bigram count ${r.getLong(1)} vs ${terms.length}")
      assert(math.abs(r.getDouble(2) - terms.sum) < 1e-6,
        s"doc $id: nll ${r.getDouble(2)} vs brute ${terms.sum}")
      assert(r.getDouble(3) == r.getDouble(2) / r.getLong(1))
    }
  }

  test("sim_bitext_mine: mined pairs track the full-candidate margin " +
      "ranking (best-target hit rate and mutual-flag precision)") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("sim_bitext_mine")(spark, d).collect()
    assert(rows.nonEmpty)
    // brute-force ground truth: margins over ALL A×B pairs (no probe
    // restriction), k = 4 neighborhoods — what a single-box miner
    // would compute; the operator approximates it through IVF probes
    val sides = Tables.embeddings(spark, d)
      .filter(col("embedding").isNotNull && col("label").isin(0, 1))
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val aS = sides.filter(_._2 == 0); val bS = sides.filter(_._2 == 1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dp = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dp += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dp / math.sqrt(na * nb)
    }
    val cm = aS.map(x => bS.map(y => cos(x._3, y._3)))
    def topAvg(v: Seq[Double]) =
      v.sorted(Ordering[Double].reverse).take(4).sum / 4.0
    val dx = cm.map(r => topAvg(r.toSeq))
    val dy = bS.indices.map(j => topAvg(cm.map(_(j)).toSeq))
    def margin(i: Int, j: Int) = cm(i)(j) / (0.5 * (dx(i) + dy(j)))
    val bestY = aS.indices.map(i =>
      bS(bS.indices.maxBy(j => (margin(i, j), -bS(j)._1.toDouble)))._1)
    val bestX = bS.indices.map(j =>
      aS(aS.indices.maxBy(i => (margin(i, j), -aS(i)._1.toDouble)))._1)
    val aIdx = aS.map(_._1).zipWithIndex.toMap
    val bIdx = bS.map(_._1).zipWithIndex.toMap
    val hits = rows.count { r =>
      bestY(aIdx(r.getLong(r.fieldIndex("src_id")))) ==
        r.getLong(r.fieldIndex("tgt_id"))
    }
    val hitRate = hits.toDouble / rows.length
    val mutualRows = rows.filter(_.getInt(4) == 1)
    val trueMutual = mutualRows.count { r =>
      val (x, y) = (r.getLong(0), r.getLong(1))
      bestY(aIdx(x)) == y && bestX(bIdx(y)) == x
    }
    val prec =
      if (mutualRows.isEmpty) 1.0 else trueMutual.toDouble / mutualRows.length
    info(f"pairs=${rows.length} mutual=${mutualRows.length} " +
      f"best-target hit rate $hitRate%.3f mutual precision $prec%.3f")
    assert(hitRate >= 0.6,
      f"probe-mined best targets recall only $hitRate%.3f of full ranking")
    assert(mutualRows.nonEmpty, "no mutual pairs mined on this corpus")
    assert(prec >= 0.7,
      f"mutual flag precision $prec%.3f vs full-candidate mutual bests")
    // margins must sit around 1 (the neighborhood-normalized scale):
    // a systematic drift means a denominator bug, not corpus noise
    val ms = rows.map(_.getDouble(3))
    assert(ms.min > 0.5 && ms.max < 3.0,
      s"margin range [${ms.min}, ${ms.max}] off the normalized scale")
  }

  test("knn predictions are valid labels with ≥1 vote") {
    SparkEntry.queries("knn_classify")(spark, sf).collect().foreach { r =>
      assert((0 to 9).contains(r.getAs[Int]("pred_label")))
      assert(r.getAs[Long]("n_votes") >= 1)
    }
  }

  test("sim_join pairs are label-consistent and above threshold") {
    SparkEntry.queries("sim_join")(spark, sf).collect().foreach { r =>
      assert(r.getAs[Double]("sim") >= 0.2)
      assert(r.getAs[Long]("v1") < r.getAs[Long]("v2"))
    }
  }

  test("fingerprints: deterministic and bounded by k-gram count") {
    val a = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
    val b = SparkEntry.queries("text_fingerprint")(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
    a.foreach { r => assert(r.getAs[Int]("n_fp") >= 1) }
  }

  test("quality scores live in (0, 1]") {
    SparkEntry.queries("text_quality")(spark, sf).collect().foreach { r =>
      val q = r.getAs[Double]("quality")
      assert(q > 0 && q <= 1.0, s"quality=$q")
      val u = r.getAs[Double]("uniq_ratio")
      assert(u > 0 && u <= 1.0)
    }
  }

  test("tfidf: common tokens weigh less than rare ones within a doc") {
    val rows = SparkEntry.queries("text_tfidf")(spark, sf)
      .filter(col("doc_id") === 0).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("tfidf") >= 0.0 ||
      r.getAs[Long]("tf") > 0))
  }

  test("text_tf: at most 20 tokens per language, ranks contiguous") {
    val byLang = SparkEntry.queries("text_tf")(spark, sf).collect()
      .groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) =>
      assert(rows.length <= 20)
      assert(rows.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to rows.length))
    }
  }

  test("dedup_semantic blocking is sound: per-bucket pair counts equal " +
    "a direct recount, and an exact duplicate shares its bucket") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val buckets = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        graft.queries.Similarity.lshBucketOf(col("embedding")).as("bucket"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // an identical vector trivially hashes to the same bucket — the
    // zero-false-negative floor of sign-LSH blocking
    assert(buckets.nonEmpty)
    val expected = buckets.toSeq.groupBy(_._2).map { case (b, vs) =>
      val ids = vs.map(_._1)
      val probes = ids.filter(_ % 20 == 0)
      b -> probes.map(p => ids.count(v => v > p)).sum.toLong
    }.filter(_._2 > 0)
    val got = SparkEntry.queries("dedup_semantic")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected,
      s"blocked-join pair counts diverge from recount:\n$got\nvs $expected")
  }

  test("dedup_embedding_ann: the IVF cell gate recovers near-dup pairs " +
      "label-free — recall and candidate fraction vs brute force") {
    // Deterministic measurement (fixed centroids, fixed corpus, hash
    // probe sample). The uniform corpus has NO pairs above the 0.5
    // near-dup threshold (both variants correctly report 0 — oracled),
    // so the honest ground truth for the GATE is each probe's true
    // nearest neighbor: a candidate generator that keeps the top-1
    // partner finds whatever near-dups a real corpus plants. Pinned:
    //  - the multi-probe cell gate scans a FRACTION of the pair space
    //    (nProbe/nCells by construction — what makes it viable at
    //    100 TB, where nCells grows with the corpus);
    //  - its top-1 recall beats the label-blocked variant's, because
    //    labels are metadata the cosine geometry does not respect
    //    (measured: labels here carry ~no cosine signal, the hardest
    //    honest case for the comparison).
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps.{cosineWithNorms, norm2}
    import graft.queries.Similarity
    val d = "/root/testdata/sf0.01"
    val ne = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .withColumn("n2", norm2(col("embedding")))
    val probe = ne.filter(col("vec_id") % 20 === 0)
      .select(col("vec_id").as("pv"), col("label").as("pl"),
        col("embedding").as("pe"), col("n2").as("pn"))
    val corpus = ne.select(col("vec_id").as("cv"), col("label").as("cl"),
      col("embedding").as("ce"), col("n2").as("cn"))
    // per-probe true nearest neighbor + whether it shares the label
    val top1 = probe.crossJoin(corpus)
      .filter(col("pv") =!= col("cv"))
      .withColumn("sim", cosineWithNorms(col("pe"), col("ce"),
        col("pn"), col("cn")))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("pv")
          .orderBy(col("sim").desc, col("cv"))))
      .filter(col("rn") === 1)
      .select(col("pv"), col("cv"), (col("pl") === col("cl")).as("sameLabel"))
      .collect()
    val gt = top1.map(r => {
      val (a, b) = (r.getLong(0), r.getLong(1))
      (math.min(a, b), math.max(a, b))
    }).toSet
    val sameLabelGt = top1.count(_.getBoolean(2))
    val ann = graft.queries.SimilarityFitted.annDedupCandidates(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nProbes = probe.count().toDouble
    val nCorpus = corpus.count().toDouble
    val exhaustive = nProbes * (nCorpus - 1)
    val frac = ann.size / exhaustive
    val annRecall = (ann intersect gt).size.toDouble / gt.size
    // the label-blocked variant's candidates contain the true top-1
    // exactly when it shares the probe's label
    val blockedRecall = sameLabelGt.toDouble / gt.size
    val nCells = math.ceil(nCorpus /
      graft.queries.SimilarityFitted.IvfOccupancy).toLong
    info(f"ann candidates: ${ann.size} (${frac * 100}%.1f%% of the " +
      f"${exhaustive.toLong} probe-pair space; nProbe/~nCells = " +
      f"${graft.queries.SimilarityFitted.FittedNProbe}/$nCells, " +
      "occupancy-scaled)")
    info(f"top-1 recall: ann=$annRecall%.3f blocked=$blockedRecall%.3f " +
      f"over ${gt.size} probes")
    assert(gt.nonEmpty, "no probes — corpus changed?")
    assert(frac < 0.8, f"cell gate scans ${frac * 100}%.1f%% of the " +
      "pair space — no longer a candidate gate")
    assert(annRecall > blockedRecall,
      f"ANN recall $annRecall%.3f does not beat label blocking " +
        f"$blockedRecall%.3f")
    assert(annRecall >= 0.8, f"ANN top-1 recall $annRecall%.3f < 0.8")
  }

  test("dedup_embedding_incremental: the admission gate's match recall " +
      "vs brute force over arriving x standing") {
    // Deterministic: fixed centroids, fixed corpus, hash arrival slice.
    // Ground truth = every (arriving, standing) pair with exact-kernel
    // cosine >= 0.35; the gate catches the pairs whose standing vector
    // sits in one of the arrival's probed cells.
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps.{cosineWithNorms, norm2}
    val d = "/root/testdata/sf0.01"
    val ne = spark.read.parquet(s"$d/embeddings.parquet")
      .filter(col("embedding").isNotNull)
      .withColumn("n2", norm2(col("embedding")))
    val arr = ne.filter(col("vec_id") % 10 === 3)
      .select(col("vec_id").as("vn"), col("embedding").as("ea"),
        col("n2").as("na"))
    val sta = ne.filter(col("vec_id") % 10 =!= 3)
      .select(col("vec_id").as("vo"), col("embedding").as("eb"),
        col("n2").as("nb"))
    val gt = arr.crossJoin(sta)
      .filter(cosineWithNorms(col("ea"), col("eb"),
        col("na"), col("nb")) >= 0.35)
      .select("vn", "vo").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = SparkEntry.queries("dedup_embedding_incremental")(spark, d)
    // per-arrival verdict comparison: brute-force dup verdict vs the
    // declared gate's verdict (pair-level recall is bounded below by
    // this, and the verdict is what the admission gate acts on)
    val bruteDup = gt.map(_._1)
    val gateDup = got.collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(gt.nonEmpty, "no brute-force matches at 0.35 — corpus changed?")
    assert(gateDup.subsetOf(bruteDup),
      "gate flagged an arrival brute force does not support (false positive)")
    val recall = gateDup.size.toDouble / bruteDup.size
    info(f"arrival-verdict recall: $recall%.3f " +
      f"(${gateDup.size}/${bruteDup.size} dup-flagged arrivals)")
    assert(recall >= 0.7, f"gate verdict recall $recall%.3f < 0.7")
  }

  test("sim_ivf_fit feeds the index: iterated fitted cells beat the " +
      "seeds on a corpus whose clusters the seeds don't match") {
    import org.apache.spark.sql.functions._
    import graft.queries.Similarity
    // Synthetic clustered corpus around 8 DIFFERENT centers than the
    // seeded ivfCentroids (fresh deterministic seed): the regime where
    // a k-means fit has something to learn. Same scale discipline as
    // the residual-IVFADC clustered witness.
    val base = "/root/testdata/sf0.1"
    val synth = Catalog.scratch(base, "clustered_emb_fit")
    Catalog.once(spark, base, "clustered_emb_fit") {
      val rnd = new scala.util.Random(99L)
      val centers = Seq.fill(8)(Seq.fill(64)(
        (rnd.nextGaussian() * 0.15).toFloat))
      val rows = (0 until 2000).map { id =>
        val c = centers(id % 8)
        (id.toLong, c.map(v => (v + rnd.nextGaussian() * 0.06).toFloat),
          s"l${id % 4}")
      }
      import spark.implicits._
      rows.toDF("vec_id", "embedding", "label").coalesce(1)
        .write.mode("overwrite").parquet(s"$synth/embeddings.parquet")
    }
    // iterate the DECLARED fit (sim_ivf_fit's frame) three rounds,
    // feeding each round's means back in as the next centroids; a cell
    // that captured nothing keeps its previous centroid
    def fitRound(cents: Seq[Seq[Float]]): Seq[Seq[Float]] = {
      val means = Similarity.ivfFitFrame(spark, synth, cents).collect()
        .groupBy(_.getInt(0))
        .map { case (cell, rs) =>
          cell -> rs.sortBy(_.getInt(1)).map(_.getDouble(3).toFloat).toSeq
        }
      cents.indices.map(i => means.getOrElse(i, cents(i)))
    }
    val fitted = (1 to 3).foldLeft(Similarity.ivfCentroids)(
      (c, _) => fitRound(c))
    def recallOf(cents: Seq[Seq[Float]]): Double = {
      val per = (0L until 20L).map { qid =>
        val exact = Similarity.bruteTopK(spark, synth, qid, 10).collect()
          .map(_.getLong(0)).toSet
        val got = Similarity.annIvfTopK(spark, synth, qid, 10, cents,
            nProbe = 1)
          .collect().map(_.getLong(0)).toSet
        (exact intersect got).size / 10.0
      }
      per.sum / per.size
    }
    val seeded = recallOf(Similarity.ivfCentroids)
    val fit = recallOf(fitted)
    // nProbe=1 (pure nearest-cell retrieval): multi-probe would paper
    // over bad cell placement at 8 cells — probe-1 recall IS the
    // measure of cell quality the fit is supposed to improve
    info(f"clustered-corpus recall@10: fitted cells $fit%.3f vs " +
      f"seeded $seeded%.3f (nProbe=1)")
    assert(fit > seeded,
      f"fitted cells $fit%.3f did not beat the seeds $seeded%.3f — " +
        "the fit query's output fails to improve its own index")
  }
}
