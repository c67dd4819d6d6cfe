package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** ScalaCheck-generator-driven properties (SURVEY.md §5.2 item 3) —
  * algebraic laws the operators must satisfy for arbitrary inputs, not
  * just the fixtures. (The scalatest-scalacheck bridge artifact isn't in
  * the offline cache, so generators are sampled with fixed seeds —
  * deterministic and replayable.) */
class PropertySpec extends AnyFunSuite with SparkSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xC0FFEE + i.toLong)))

  test("topk(k) == sort.limit(k) for arbitrary k") {
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_totalprice").cache()
    val sortedAll = orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .collect().map(_.toSeq).toSeq
    samples(Gen.choose(1, 300), 12).foreach { k =>
      val topk = orders
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(k).collect().map(_.toSeq).toSeq
      assert(topk == sortedAll.take(k), s"k=$k")
    }
    orders.unpersist()
  }

  test("TopK aggregate == window row_number formulation, any partitioning") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val orders = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    samples(Gen.choose(1, 7), 4).foreach { k =>
      val viaWindow = orders
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
        .select("o_custkey", "rn", "o_orderkey")
        .collect().map(_.toSeq).toSet
      Seq(1, 13).foreach { np =>
        val tk = udaf(new queries.Udx.TopK(k),
          org.apache.spark.sql.Encoders.product[queries.Udx.Scored])
        val viaAgg = orders.repartition(np)
          .groupBy("o_custkey")
          .agg(tk(col("o_totalprice"), col("o_orderkey")).as("top"))
          .select(col("o_custkey"), posexplode(col("top")).as(Seq("pos", "t")))
          .select(col("o_custkey"), (col("pos") + 1).as("rn"),
            col("t.key").as("o_orderkey"))
          .collect().map(_.toSeq).toSet
        assert(viaAgg == viaWindow, s"k=$k np=$np")
      }
    }
  }

  test("KmvAgg laws: any split-and-merge equals the whole-stream sketch, " +
    "which is the k smallest distinct values (arbitrary inputs)") {
    val k = 8
    val agg = new queries.Sketches.KmvAgg(k)
    def sk(xs: Seq[Long]): Array[Long] = xs.foldLeft(agg.zero)(agg.reduce)
    val gens = Seq(
      Gen.listOf(Gen.choose(0L, 40L)), // dense: many duplicates
      Gen.listOf(Gen.choose(Long.MinValue, Long.MaxValue))) // sparse
    for (g <- gens; xs <- samples(g, 20)) {
      val whole = sk(xs)
      // the sketch IS the k smallest distinct values, in order
      assert(whole.toSeq == xs.distinct.sorted.take(k))
      // partition the stream anywhere: merged partials == whole
      samples(Gen.choose(0, xs.length), 5).foreach { cut =>
        val (a, b) = xs.splitAt(cut)
        assert(agg.merge(sk(a), sk(b)).toSeq == whole.toSeq,
          s"cut=$cut xs=$xs")
      }
      // merge is idempotent (re-delivered partials are harmless)
      assert(agg.merge(whole, whole).toSeq == whole.toSeq)
    }
  }

  test("dedup is idempotent and bounded for arbitrary column subsets") {
    val cols = Seq("l_returnflag", "l_linestatus", "l_suppkey")
    val li = Tables.lineitem(spark, sf).select(cols.map(col): _*).cache()
    val total = li.count()
    val subsets = samples(Gen.someOf(cols).suchThat(_.nonEmpty), 6)
      .map(_.toSeq).distinct
    subsets.foreach { subset =>
      val once = li.dropDuplicates(subset)
      val n1 = once.count()
      assert(once.dropDuplicates(subset).count() == n1, s"subset=$subset")
      assert(n1 <= total)
    }
    li.unpersist()
  }

  test("minhash signature similarity tracks true jaccard (±0.25 at 64 hashes)") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa", "lam", "mu")
    val docGen = for {
      n <- Gen.choose(8, 20)
      ws <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield ws.mkString(" ")
    val pairs = samples(Gen.zip(docGen, docGen), 8)
    pairs.foreach { case (t1, t2) =>
      val df = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
      val sh = Dedup.withShingles(df).select("doc_id", "sh")
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val uni = sh(1L).union(sh(2L))
      val trueJ =
        if (uni.isEmpty) 1.0
        else sh(1L).intersect(sh(2L)).size.toDouble / uni.size
      val sigs = Dedup.signatures(df).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val est = sigs(1L).zip(sigs(2L)).count { case (a, b) => a == b } / 64.0
      assert(math.abs(est - trueJ) <= 0.25,
        s"est=$est true=$trueJ t1='$t1' t2='$t2'")
    }
  }

  test("decimal sum is invariant under union order (associativity)") {
    val li = Tables.lineitem(spark, sf).select("l_extendedprice")
    val a = li.limit(1000).cache()
    val b = li.limit(3000).exceptAll(a).cache()
    def s(df: org.apache.spark.sql.DataFrame) =
      df.agg(Det.dsum(col("l_extendedprice"))).collect()(0).getDouble(0)
    assert(s(a.union(b)) == s(b.union(a)))
  }

  test("minhash estimate is exactly 1.0 for identical docs (any doc)") {
    import spark.implicits._
    val docGen = Gen.listOfN(10,
      Gen.oneOf("spark", "scan", "merge", "sort", "hash")).map(_.mkString(" "))
    samples(docGen, 5).foreach { t =>
      val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
      val sigs = Dedup.signatures(df).collect()
        .map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(sigs(1L) == sigs(2L), s"t='$t'")
    }
  }

  test("morton code is a bijection on the 8-bit × 8-bit domain") {
    // decode by de-interleaving must invert the query's interleave for
    // arbitrary (x, y) — the property that makes a z-ordered range scan
    // recover BOTH dimension ranges
    val pairGen = for {
      x <- Gen.choose(0L, 255L); y <- Gen.choose(0L, 255L)
    } yield (x, y)
    def interleave(x: Long, y: Long): Long =
      (0 until 8).map { k =>
        (((x >> k) & 1L) << (2 * k)) | (((y >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    def deinterleave(z: Long): (Long, Long) = {
      var x = 0L; var y = 0L
      (0 until 8).foreach { k =>
        x |= ((z >> (2 * k)) & 1L) << k
        y |= ((z >> (2 * k + 1)) & 1L) << k
      }
      (x, y)
    }
    samples(pairGen, 64).foreach { case (x, y) =>
      assert(deinterleave(interleave(x, y)) == ((x, y)), s"($x,$y)")
    }
  }

  test("int8 quantization bounds the reconstruction error (any vector)") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0f))
      .suchThat(v => v.exists(_ != 0.0f))
    samples(vecGen, 8).foreach { v =>
      val df = Seq((1L, v)).toDF("vec_id", "embedding")
      import org.apache.spark.sql.types.{DoubleType, LongType}
      val mx = array_max(transform(col("embedding"),
        y => abs(y.cast(DoubleType))))
      val q = df.select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast(DoubleType) * (lit(127.0) / mx) + 0.5)
            .cast(LongType)).as("qv"), mx.as("m")).head
      val scale = 127.0 / q.getDouble(2)
      val qs = q.getSeq[Long](1)
      v.zip(qs).foreach { case (orig, quant) =>
        val recon = quant / scale
        assert(math.abs(orig - recon) <= 0.5 / scale + 1e-12,
          s"$orig -> $quant -> $recon")
        assert(quant >= -127 && quant <= 127)
      }
    }
  }

  test("reservoir-style hash sample: k smallest is stable under union order") {
    // the sample is a pure function of the key set: permuting/partition-
    // shuffling the input must not change the selected keys
    val base = Tables.orders(spark, sf).select("o_orderkey")
    val h = graft.functions.XHash.sha60(
      concat(lit("smp1:"), col("o_orderkey").cast("string")))
    def pick(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), h.as("h"))
        .orderBy("h", "o_orderkey").limit(100)
        .collect().map(_.getLong(0)).toSeq
    val a = pick(base)
    Seq(3, 17).foreach { np =>
      assert(pick(base.repartition(np)) == a, s"np=$np")
    }
  }

  test("priority sample prefers heavy rows: sampled mean weight beats " +
    "the population mean (Duffield–Lund–Thorup inclusion ∝ weight)") {
    val pop = Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val sampled = SparkEntry.queries("sample_weighted")(spark, sf)
      .agg(avg(col("w"))).collect()(0).getDouble(0) / 100.0 // cents
    assert(sampled > pop * 1.1,
      f"sampled mean $sampled%.0f should exceed population mean $pop%.0f " +
        "by a clear margin — weighting is the whole point")
  }

  test("dedup_url: canonical groups partition the corpus exactly") {
    val r = SparkEntry.queries("dedup_url")(spark, sf)
    val total = r.agg(sum(col("n_dups"))).head.getLong(0)
    val docs = Tables.documents(spark, sf).count()
    assert(total == docs, "every document lands in exactly one group")
    // keep_id must be a member of its own group: doc_id%7 and %23
    // derive host/path, so keep_id%7 / %23 must reproduce them
    val bad = r.filter(
      !col("host").contains(concat(lit("example"),
        (col("keep_id") % 7).cast("string"))) ||
        !col("path").endsWith(concat(lit("/"),
          (col("keep_id") % 23).cast("string")))).count()
    assert(bad == 0, "keep_id outside its canonical group")
  }

  test("quality_classify: threshold splits the corpus (both classes " +
    "non-empty) and the score is the declared linear form") {
    val r = SparkEntry.queries("quality_classify")(spark, sf).cache()
    assert(r.filter(col("keep") === 1).count() > 0)
    assert(r.filter(col("keep") === 0).count() > 0)
    val bad = r.filter(col("score") =!=
      lit(3) * col("uniq_pct") + lit(2) * least(col("n_tok"), lit(150))
        + lit(5) * col("stop_pct")).count()
    assert(bad == 0)
    r.unpersist()
  }

  test("feature_lags: lag1 of row n is the value of row n-1 within " +
    "each user series") {
    val rows = SparkEntry.queries("feature_lags")(spark, sf)
      .filter(col("user_id") < 5)
      .select("user_id", "rn", "value", "lag1", "roll3_sum")
      .collect().groupBy(_.getLong(0))
    assert(rows.nonEmpty)
    rows.foreach { case (_, rs) =>
      val seq = rs.sortBy(_.getInt(1))
      seq.sliding(2).foreach {
        case Array(prev, cur) =>
          assert(!cur.isNullAt(3) &&
            cur.getDouble(3) == prev.getDouble(2), "lag1 != prev value")
        case _ =>
      }
      // frame shorter than 3 → roll3 is NULL (trainer mask rows)
      assert(seq.take(2).forall(_.isNullAt(4)))
    }
  }

  test("text_unigram_nll: per-token surprisal is positive and a doc " +
    "cannot beat the corpus-best token's surprisal") {
    val r = SparkEntry.queries("text_unigram_nll")(spark, sf).cache()
    assert(r.filter(col("nll_sum") <= 0).count() === 0)
    // avg nll is bounded below by -ln(p_max) over the corpus
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("t"))
    val total = toks.count().toDouble
    val maxC = toks.groupBy("t").count().agg(max("count"))
      .head.getLong(0).toDouble
    val floor = -math.log(maxC / total)
    assert(r.filter(col("avg_nll") < floor - 1e-9).count() === 0)
    r.unpersist()
  }

  test("interval_merge: spans are disjoint (gap > 0 between " +
    "consecutive spans) and cover every event") {
    val r = SparkEntry.queries("interval_merge")(spark, sf).cache()
    val nEvents = r.agg(sum("n_events")).head.getLong(0)
    assert(nEvents == Tables.events(spark, sf).count())
    // every span is at least one interval long and starts are ordered
    assert(r.filter(col("span_us") < 600000000L).count() === 0)
    val byUser = r.select("user_id", "span_start", "span_end")
      .collect().groupBy(_.getLong(0))
    byUser.foreach { case (_, rs) =>
      val spans = rs.map(x => (x.getLong(1), x.getLong(2))).sortBy(_._1)
      spans.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._1 > a._2, s"overlapping merged spans $a $b")
        case _ =>
      }
    }
    r.unpersist()
  }

  test("sketch_cms: one-sided guarantee holds (est >= true for every " +
    "probe) and the heavy hitter estimate is collision-tight") {
    val r = SparkEntry.queries("sketch_cms")(spark, sf).cache()
    assert(r.count() == 20)
    assert(r.filter(col("ok") =!= 1).count() === 0, "CMS underestimated")
    assert(r.filter(col("est") < col("true_n")).count() === 0)
    // the most frequent token dominates its buckets: collisions can at
    // most double it (loose; expected collision mass is N/1024 per row)
    val top = r.orderBy(col("true_n").desc).head
    assert(top.getLong(2) < 2 * top.getLong(1),
      s"top-token estimate ${top.getLong(2)} vs true ${top.getLong(1)}")
    r.unpersist()
  }

  test("label encoding is a dense 0..k-1 bijection with the label set") {
    val out = SparkEntry.queries("feature_label_encode")(spark, sf)
    val pairs = out.select("source", "code").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val k = Tables.documents(spark, sf)
      .select("source").distinct().count()
    assert(pairs.size.toLong == k, "one code per label")
    assert(pairs.map(_._2).sorted == (0L until k).toSeq, "dense 0..k-1")
    // lexicographic order of labels == numeric order of codes
    assert(pairs.sortBy(_._1).map(_._2) == (0L until k).toSeq)
  }
}
