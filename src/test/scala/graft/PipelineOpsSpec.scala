package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level semantics of the round-5 additions — invariants the
  * DuckDB hash gate can't express (equivalence to a brute-force
  * formulation, conservation laws, flag consistency). */
class PipelineOpsSpec extends AnyFunSuite with SparkSuite {

  test("mix_rebalance: kept ≤ docs, full-rate sources keep everything, " +
      "rates cap at the uniform target") {
    val rows = SparkEntry.queries("mix_rebalance")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    val target = total / rows.length
    rows.foreach { r =>
      val (nDocs, ratePpm, nKept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nKept <= nDocs)
      if (ratePpm == 1000000L) assert(nKept == nDocs,
        s"${r.getString(0)}: full rate must keep all docs")
      // a source at/below the uniform target is never downsampled
      if (nDocs <= target) assert(ratePpm == 1000000L)
      else assert(ratePpm == math.min(1000000L, target * 1000000L / nDocs))
    }
  }

  test("mix_temperature: shares normalize, upsampling inverts the " +
      "resource ordering, and the multiplier flips around the mean share") {
    val rows = SparkEntry.queries("mix_temperature")(spark, sf).collect()
    assert(rows.nonEmpty)
    val raw = rows.map(_.getDouble(2)); val temp = rows.map(_.getDouble(3))
    assert(math.abs(raw.sum - 1.0) < 1e-9 && math.abs(temp.sum - 1.0) < 1e-9)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(3) / r.getDouble(2))
        < 1e-12)
      // sqrt flattens: temperature share sits between uniform and raw
      val uni = 1.0 / rows.length
      val (rs, ts) = (r.getDouble(2), r.getDouble(3))
      assert((ts - rs) * (ts - uni) <= 1e-12,
        s"${r.getString(0)}: temp share $ts not between raw $rs and $uni")
    }
    // the ordering of multipliers is the REVERSE of the share ordering —
    // that inversion is the whole point of temperature sampling
    val byShare = rows.sortBy(_.getDouble(2)).map(_.getDouble(4)).toSeq
    assert(byShare == byShare.sorted.reverse,
      s"multipliers not antitone in share: $byShare")
    // low-resource langs upsample, the dominant one downsamples
    assert(byShare.head > 1.0 && byShare.last < 1.0)
  }

  test("mix_epochs: the budget is conserved up to the repetition cap, " +
      "epochs invert the resource ordering, and served never exceeds " +
      "either desired or cap x available") {
    val rows = SparkEntry.queries("mix_epochs")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val totalAvail = rows.map(_._2).sum
    // desired tokens partition ~2x the unique corpus (floor rounding
    // loses at most one token per language)
    val totalDesired = rows.map(_._3).sum
    assert(totalDesired <= 2 * totalAvail &&
      totalDesired >= 2 * totalAvail - rows.length,
      s"desired $totalDesired vs budget ${2 * totalAvail}")
    rows.foreach { case (lang, avail, desired, epochs, served) =>
      assert(epochs >= 1 && epochs <= 4, s"$lang: epochs $epochs")
      assert(served <= desired && served <= epochs * avail,
        s"$lang: served $served over desired/cap")
      // the cap binds exactly when 4 passes cannot cover the desire
      if (desired > 4 * avail) assert(epochs == 4 && served == 4 * avail,
        s"$lang: deficit language must serve the full 4-epoch cap")
      else assert(served == desired,
        s"$lang: un-capped language must serve its full allocation")
    }
    // temperature upsampling: epochs are antitone in availability
    val byAvail = rows.sortBy(_._2).map(_._4).toSeq
    assert(byAvail == byAvail.sorted.reverse,
      s"epochs not antitone in availability: $byAvail")
  }

  test("mix_importance_weights: weights match a brute-force DSIR " +
      "recompute, the target domain scores higher on average, and the " +
      "emitted top-50 is the true Gumbel-score ranking") {
    val d = "/root/testdata/sf0.01"
    val rows = SparkEntry.queries("mix_importance_weights")(spark, d)
      .collect()
    assert(rows.length == 50)
    // brute-force DSIR from the raw fixture (plain doubles — agreement
    // within tolerance; the engines' own bit-exactness is the oracle's
    // job, this test pins the SEMANTICS against an independent impl)
    val docs = Tables.documents(spark, d)
      .filter(col("text").isNotNull)
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getString(2)))
    val B = 1024
    def bucket(tok: String): Int =
      (graft.functions.Sha60.hashBytes(
        tok.getBytes("UTF-8")) % B).toInt
    val cr = new Array[Long](B); val ct = new Array[Long](B)
    docs.foreach { case (_, lang, text) =>
      text.split(" ", -1).foreach { t =>
        val b = bucket(t); cr(b) += 1
        if (lang.contains("en")) ct(b) += 1
      }
    }
    val (nr, nt) = (cr.sum, ct.sum)
    val lam = (0 until B).map(b =>
      math.log((ct(b) + 1.0) / (nt + B)) -
        math.log((cr(b) + 1.0) / (nr + B)))
    val logw = docs.map { case (id, lang, text) =>
      id -> (lang, text.split(" ", -1).map(t => lam(bucket(t))).sum)
    }.toMap
    // (a) per-doc weights agree with the brute recompute
    rows.foreach { r =>
      val id = r.getLong(r.fieldIndex("doc_id"))
      val got = r.getDouble(r.fieldIndex("logw9"))
      assert(math.abs(got - logw(id)._2) < 1e-6,
        s"doc $id: logw $got vs brute ${logw(id)._2}")
      assert(r.getDouble(r.fieldIndex("score9")) ==
        got + r.getDouble(r.fieldIndex("gumbel9")))
    }
    // (b) the importance signal exists: target-domain docs weigh more
    val en = logw.values.collect { case (Some("en"), w) => w }
    val rest = logw.values.collect {
      case (l, w) if !l.contains("en") => w }
    val sep = en.sum / en.size - rest.sum / rest.size
    info(f"mean logw: en=${en.sum / en.size}%.4f " +
      f"rest=${rest.sum / rest.size}%.4f separation=$sep%.4f")
    assert(sep > 0.1,
      f"DSIR separation $sep%.4f — target model indistinguishable from raw")
    // (c) selection ∝ exp(logw): the pure-logw top-50 is en-enriched
    // over the corpus base rate (the Gumbel draw is noisy by design,
    // so the enrichment pin is on the deterministic weight ranking)
    val top50 = logw.toSeq.sortBy { case (id, (_, w)) => (-w, id) }.take(50)
    val enTop = top50.count(_._2._1.contains("en")) / 50.0
    val base = en.size.toDouble / logw.size
    info(f"en share: top-50 by logw $enTop%.3f vs corpus $base%.3f")
    assert(enTop > base, "importance ranking does not enrich the target")
  }

  test("window_rolling_median matches a brute-force sliding median") {
    val got = SparkEntry.queries("window_rolling_median")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3))
      .toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val expected = events.groupBy(_._1).flatMap { case (uid, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2))
      ordered.indices.map { i =>
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_._3).sorted
        val n = frame.length
        val med = if (n % 2 == 1) frame(n / 2)
          else (frame(n / 2 - 1) + frame(n / 2)) / 2.0
        (uid, ordered(i)._2) -> med
      }
    }
    assert(got.size == expected.size)
    expected.foreach { case (k, m) =>
      assert(got(k) == m, s"key $k: got ${got(k)} expected $m")
    }
  }

  test("time_twap: bounded by min/max value; held_us spans first→last") {
    val twap = SparkEntry.queries("time_twap")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val byUser = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(min("value").as("lo"), max("value").as("hi"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("span"), count(lit(1)).as("n"))
      .collect()
    byUser.foreach { r =>
      val uid = r.getLong(0)
      if (r.getLong(4) > 1) { // users with ≥2 events have spans
        val (heldUs, tw) = twap(uid)
        assert(heldUs == r.getLong(3),
          s"user $uid: held $heldUs vs ts span ${r.getLong(3)}")
        assert(tw >= r.getDouble(1) - 1e-9 && tw <= r.getDouble(2) + 1e-9,
          s"user $uid: twap $tw outside [${r.getDouble(1)}, ${r.getDouble(2)}]")
      } else assert(!twap.contains(uid))
    }
  }

  test("tpch_q12: mode counts conserve the late-line total") {
    val rows = SparkEntry.queries("tpch_q12")(spark, sf).collect()
    val fromQuery = rows.map(r => r.getLong(1) + r.getLong(2)).sum
    val direct = Tables.lineitem(spark, sf)
      .filter(col("l_returnflag").isin("A", "R")
        && col("l_shipdate") >= lit("1996-01-01").cast("timestamp")
        && col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .count()
    assert(fromQuery == direct && fromQuery > 0)
  }

  test("text_gopher_rules: keep is exactly the conjunction of its flags") {
    SparkEntry.queries("text_gopher_rules")(spark, sf).collect().foreach { r =>
      val flags = Seq(5, 6, 7, 8).map(r.getBoolean)
      assert(r.getBoolean(9) == flags.forall(identity),
        s"doc ${r.getLong(0)}: keep != AND(flags)")
    }
  }

  test("text_bpe_pairs: 2-char pairs, non-increasing counts, " +
      "top pair count matches a direct recount") {
    val rows = SparkEntry.queries("text_bpe_pairs")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getString(0).length == 2))
    val counts = rows.map(_.getLong(1))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    val (topPair, topN) = (rows.head.getString(0), rows.head.getLong(1))
    val direct = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 2)
      .select(col("w"), explode(sequence(lit(1), length(col("w")) - 1))
        .as("i"))
      .filter(col("w").substr(col("i"), lit(2)) === topPair)
      .count()
    assert(direct == topN)
  }

  test("window_ewma matches a brute-force dyadic-weight recompute") {
    val got = SparkEntry.queries("window_ewma")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val events = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("tus"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    events.groupBy(_._1).foreach { case (uid, rs) =>
      val ordered = rs.sortBy(r => (r._4, r._2))
      ordered.indices.foreach { i =>
        val frame = ordered.slice(math.max(0, i - 7), i + 1).map(_._3)
        // weights 2^(7-j): value·2^k is EXACT in Double (power-of-two
        // scaling), and the two-decimal values sum exactly in BigDecimal
        val num = frame.reverse.zipWithIndex
          .map { case (v, j) => BigDecimal(v) * BigDecimal(1L << (7 - j)) }
          .sum
        val den = frame.reverse.zipWithIndex
          .map { case (_, j) => 1L << (7 - j) }.sum
        val expect = num.toDouble / den
        val k = (uid, ordered(i)._2)
        assert(got(k) == expect, s"$k: ${got(k)} vs $expect")
      }
    }
  }

  test("time_anomaly rows really deviate > 3σ from their type's hourly mean") {
    val anomalies = SparkEntry.queries("time_anomaly")(spark, sf).collect()
    assert(anomalies.nonEmpty)
    val hourly = Tables.events(spark, sf)
      .groupBy(col("event_type"),
        (unix_micros(col("ts")) / 3600000000L).cast("long").as("hb"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    val byType = hourly.groupBy(_._1._1).map { case (t, m) =>
      val cs = m.values.map(_.toDouble).toSeq
      val mean = cs.sum / cs.size
      val sd = math.sqrt(cs.map(c => (c - mean) * (c - mean)).sum /
        (cs.size - 1))
      t -> (mean, sd)
    }
    anomalies.foreach { r =>
      val (mean, sd) = byType(r.getString(0))
      assert(math.abs(r.getLong(2) - mean) > 3 * sd,
        s"${r.getString(0)}@${r.getLong(1)} not anomalous")
    }
  }

  test("sink_partitioned round-trip equals the direct aggregate") {
    val viaSink = SparkEntry.queries("sink_partitioned")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val direct = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("s"))
      .orderBy("o_orderpriority")
      .collect().map(_.toSeq).toSeq
    assert(viaSink == direct && viaSink.nonEmpty)
  }

  test("subquery_exists == explicit leftsemi ∘ leftanti joins") {
    val viaSql = SparkEntry.queries("subquery_exists")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val orders = Tables.orders(spark, sf)
    val viaJoins = Tables.customer(spark, sf)
      .join(orders.filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "leftsemi")
      .join(orders.filter(col("o_orderstatus") === "F"
          && col("o_totalprice") > 300000),
        col("c_custkey") === col("o_custkey"), "leftanti")
      .select("c_custkey").orderBy("c_custkey")
      .collect().map(_.getLong(0)).toSeq
    assert(viaSql == viaJoins && viaSql.nonEmpty)
  }

  test("multimodal_decode_png: payload is a genuine PNG container and " +
    "the imageio round-trip decodes it exactly") {
    import graft.multimodal.Multimodal
    import org.apache.spark.sql.Encoders
    val ids = spark.range(0, 50).select(col("id").as("doc_id"))
      .as(Encoders.LONG)
    val rows = Multimodal.pngOf(ids).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      // PNG magic: 89 50 4E 47 0D 0A 1A 0A — the payload is a real
      // container, not pseudo-bytes
      val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
        .map(_.toByte)
      assert(r.payload.take(8).sameElements(magic),
        s"doc ${r.doc_id}: not a PNG header")
      val f = Multimodal.decodePng(r)
      assert(f.width == (r.doc_id % 13 + 1).toInt)
      assert(f.height == (r.doc_id % 7 + 1).toInt)
      val expected = (for {
        y <- 0 until f.height; x <- 0 until f.width
      } yield 3L * Multimodal.pngGray(r.doc_id, x, y)).sum
      assert(f.pixel_sum == expected,
        s"doc ${r.doc_id}: decoded pixel sum ${f.pixel_sum} != $expected")
      assert(f.n_bytes == r.payload.length)
    }
  }

  test("multimodal_phash: planted duplicate images land in one cluster " +
    "and the clustering partitions the corpus") {
    val sf01 = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("multimodal_phash")(spark, sf01).cache()
    val nDocs = Tables.documents(spark, sf01).count()
    // every document lands in exactly one hash cluster
    assert(r.agg(sum("n_images")).head.getLong(0) === nDocs)
    // 40 content seeds -> at most 40 clusters; planted replication
    // (500/40 = 12.5 docs per seed) means every cluster has >= 12 docs
    assert(r.count() <= 40)
    assert(r.filter(col("n_images") < 12).count() === 0,
      "a planted duplicate group fell below its replication count")
    // representative is a real member: rep ids are distinct
    assert(r.select("rep_doc_id").distinct().count() === r.count())
    r.unpersist()
  }

  test("multimodal_phash_near: banded Hamming candidates are sound — " +
    "every pair within threshold, ordered, and nontrivial") {
    val sf01 = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("multimodal_phash_near")(spark, sf01).cache()
    assert(r.count() > 0, "expected near-dup image cluster pairs")
    // verify bound holds and pairs are canonically ordered
    assert(r.filter(col("hamming") > 6).count() === 0)
    assert(r.filter(col("hamming") <= 0).count() === 0,
      "identical hashes must have collapsed in the exact phash step")
    assert(r.filter(struct(col("h1_hi"), col("h1_lo")) >=
      struct(col("h2_hi"), col("h2_lo"))).count() === 0)
    // cluster sizes are real image counts
    assert(r.filter(col("n1") < 1 || col("n2") < 1).count() === 0)
    r.unpersist()
  }

  test("profile_columns: null accounting and distinct counts are exact " +
    "on the events fixture") {
    val sf01 = "/root/testdata/sf0.01"
    val r = SparkEntry.queries("profile_columns")(spark, sf01).cache()
    val n = Tables.events(spark, sf01).count()
    assert(r.count() === 7)
    assert(r.filter(col("n_rows") =!= n).count() === 0)
    val byCol = r.collect().map(row =>
      row.getString(0) -> row).toMap
    // key column: no nulls, all-distinct
    assert(byCol("event_id").getLong(2) === 0L)
    assert(byCol("event_id").getLong(3) === n)
    // derived v_big column: genuine nulls, consistent accounting
    val vbigNull = byCol("v_big").getLong(2)
    assert(vbigNull > 0 && vbigNull < n,
      s"v_big should be partially null, got $vbigNull of $n")
    // string column min/max are real values
    assert(byCol("event_type").getString(4) <= byCol("event_type").getString(5))
    r.unpersist()
  }
}
