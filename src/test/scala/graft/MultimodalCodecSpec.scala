package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.{Encoders, functions => F}
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the JDK-native still-image codec paths.
  *
  * PNG is lossless, so its decode is pinned by the DuckDB oracle
  * (multimodal_decode_png / multimodal_resize). JPEG is lossy — the
  * oracle pins only the frame-header dimensions — so the reconstruction
  * fidelity needs its own bound here: across the full generator seed
  * space (image content is a function of doc_id through small moduli,
  * so 13·7·256-ish distinct images exist; 1000 ids cover every
  * (w, h, gray-pattern) class many times over), every decoded pixel
  * must sit within ±1 gray level of the generator value, and the mean
  * absolute error stays under 0.1 — measured 1 / 0.019 when the codec
  * path was built, so a codec or colorspace regression (e.g. an
  * accidental 4:2:0 subsampling) trips this immediately. */
class MultimodalCodecSpec extends AnyFunSuite with SparkSuite {

  test("JPEG round-trip: dims exact, pixels within ±1 level, " +
      "mean abs error < 0.1") {
    val ids = spark.range(1000).select(F.col("id")).as(Encoders.LONG)
    val stats = Multimodal.jpegOf(ids).mapPartitions { it =>
      it.map { m =>
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(m.payload))
        val w = (m.doc_id % 13 + 1).toInt
        val h = (m.doc_id % 7 + 1).toInt
        assert(img.getWidth == w && img.getHeight == h,
          s"id=${m.doc_id}: dims ${img.getWidth}x${img.getHeight} != ${w}x$h")
        var maxErr = 0L
        var sumErr = 0L
        var n = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val want = Multimodal.pngGray(m.doc_id, x, y)
            val got = (img.getRGB(x, y) >> 16) & 255
            val e = math.abs(got - want).toLong
            maxErr = math.max(maxErr, e)
            sumErr += e
            n += 1
            x += 1
          }
          y += 1
        }
        (maxErr, sumErr, n)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong)).collect()
    val maxErr = stats.map(_._1).max
    val meanAbs = stats.map(_._2).sum.toDouble / stats.map(_._3).sum
    assert(maxErr <= 1, s"max abs pixel error $maxErr > 1")
    assert(meanAbs < 0.1, s"mean abs pixel error $meanAbs >= 0.1")
  }

  test("quarantine decode: truncated, substituted AND bit-flipped " +
      "payloads each cost one routed row; intact payloads decode " +
      "exactly; the strict decoder would have thrown where the " +
      "tolerant one routed") {
    import graft.multimodal.Multimodal.{PngRow, SafeDecode}
    val ids = spark.range(200).select(F.col("id")).as(Encoders.LONG)
    val pngEnc = Encoders.product[PngRow]
    // three damage modes beyond the declared query's two: % 11 = 5
    // flips a byte in the middle of the compressed stream (CRC/inflate
    // damage — the bit-rot case), on top of truncation (% 7 = 0) and
    // substitution (% 7 = 3)
    val damaged = Multimodal.pngOf(ids).map { m =>
      if (m.doc_id % 7 == 0) PngRow(m.doc_id, m.payload.take(10))
      else if (m.doc_id % 7 == 3)
        PngRow(m.doc_id, s"not an image ${m.doc_id}".getBytes("UTF-8"))
      else if (m.doc_id % 11 == 5) {
        val p = m.payload.clone()
        p(p.length / 2) = (p(p.length / 2) ^ 0xFF).toByte
        PngRow(m.doc_id, p)
      } else m
    }(pngEnc)
    val rows = damaged
      .mapPartitions(_.map(Multimodal.decodePngSafe))(
        Encoders.product[SafeDecode])
      .collect()
    assert(rows.length == 200, "tolerant decode must keep row cardinality")
    def damagedId(id: Long) = id % 7 == 0 || id % 7 == 3
    rows.foreach { r =>
      if (damagedId(r.doc_id)) {
        assert(r.status == "quarantine" && r.error.nonEmpty &&
          r.pixel_sum.isEmpty,
          s"id=${r.doc_id}: damaged payload not quarantined: $r")
      } else if (r.doc_id % 11 == 5) {
        // a mid-stream bit flip may inflate to garbage pixels or fail
        // outright depending on where it lands — the contract is only
        // that it never kills the task; both outcomes are rows
        assert(r.status == "ok" || r.error.nonEmpty)
      } else {
        assert(r.status == "ok" && r.error.isEmpty,
          s"id=${r.doc_id}: intact payload quarantined: ${r.error}")
        assert(r.width.contains((r.doc_id % 13 + 1).toInt) &&
          r.height.contains((r.doc_id % 7 + 1).toInt),
          s"id=${r.doc_id}: decoded dims drifted: $r")
      }
    }
    // the strict path throws on the same damage the tolerant path routes
    val bad = PngRow(3L, "not an image 3".getBytes("UTF-8"))
    intercept[Exception] { Multimodal.pixelEmbed(bad) }
    assert(Multimodal.decodePngSafe(bad).status == "quarantine")
  }

  test("multimodal_pca_fit: the power iterate is a genuine eigenvector " +
      "of the pixel-feature covariance (residual small vs lambda)") {
    val rows = SparkEntry.queries("multimodal_pca_fit")(spark, sf).collect()
    assert(rows.length == 10)
    val v = rows.sortBy(_.getInt(0)).map(_.getDouble(1))
    val lambda = rows.head.getDouble(2)
    assert(lambda > 0.0)
    // independent covariance from generator arithmetic (no engine, no
    // decimal quantization — agreement within tolerance shows the
    // quantized dataflow converged to the true component)
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0))
    val feats = ids.map { id =>
      val w = (id % 13 + 1).toInt
      val h = (id % 7 + 1).toInt
      val hist = new Array[Double](10)
      for (y <- 0 until h; x <- 0 until w) {
        val g = Multimodal.pngGray(id, x, y)
        hist(g >> 5) += 1
        if (x > 0) {
          val p = Multimodal.pngGray(id, x - 1, y)
          if (g >= p) hist(9) += 1 else hist(8) += 1
        }
      }
      hist
    }
    val n = feats.length.toDouble
    val mu = (0 until 10).map(i => feats.map(_(i)).sum / n)
    def cov(i: Int, j: Int): Double =
      feats.map(f => f(i) * f(j)).sum / n - mu(i) * mu(j)
    val cv = (0 until 10).map(i =>
      (0 until 10).map(j => cov(i, j) * v(j)).sum)
    val resid = math.sqrt((0 until 10)
      .map(i => { val r = cv(i) - lambda * v(i); r * r }).sum)
    info(f"lambda=$lambda%.3f residual ||Cv - lv|| = $resid%.4f " +
      f"(${resid / lambda}%.5f relative)")
    assert(resid / lambda < 0.05,
      f"power iterate not converged: relative residual ${resid / lambda}%.4f")
    // and the loadings are a unit vector
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"loadings norm $norm != 1")
  }

  test("multimodal_pca_project: scores are centered and their variance " +
      "recovers the eigenvalue (Var(X v) = v'Cv = lambda)") {
    // The eigen-identity ties the two queries together end-to-end: if
    // the projection used the wrong means, the wrong loadings, or a
    // drifted feature pipeline, the score variance would NOT land on
    // the fit's lambda. Tolerance covers the iterate's convergence
    // residual (<5% pinned above) plus the scale-9 score quantization.
    val fit = SparkEntry.queries("multimodal_pca_fit")(spark, sf).collect()
    val lambda = fit.head.getDouble(2)
    val scores = SparkEntry.queries("multimodal_pca_project")(spark, sf)
      .collect().map(_.getDouble(1))
    val n = scores.length.toDouble
    assert(n > 0)
    val mean = scores.sum / n
    val varS = scores.map(x => (x - mean) * (x - mean)).sum / n
    info(f"n=${scores.length} mean=$mean%.6f var=$varS%.3f lambda=$lambda%.3f")
    // centered projection: mean score must be ~0 relative to the spread
    assert(math.abs(mean) < 1e-6 * math.sqrt(varS) + 1e-9,
      f"projected scores not centered: mean=$mean%.9f")
    assert(math.abs(varS - lambda) / lambda < 0.06,
      f"score variance $varS%.4f != lambda $lambda%.4f — projection " +
        "disagrees with the fit it claims to apply")
  }

  test("multimodal_pca_project2: pc1 agrees with the one-component " +
      "projection, both axes centered, and the scores are uncorrelated") {
    // Hotelling deflation guarantees the second iterate converges to an
    // eigenvector of c − λ₁·v₁v₁ᵀ; if it did, (a) pc1 is unchanged by
    // adding a component, (b) both score columns are centered, and
    // (c) Cov(pc1, pc2) = v₁ᵀCv₂ = λ₂·(v₁·v₂) ≈ 0 — correlated scores
    // would mean the deflation failed and the 'second' axis is still
    // chasing the first.
    val one = SparkEntry.queries("multimodal_pca_project")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val two = SparkEntry.queries("multimodal_pca_project2")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(two.nonEmpty)
    two.foreach { case (id, pc1, _) =>
      assert(one(id) == pc1, s"doc $id: pc1 drifted adding a component")
    }
    val n = two.length.toDouble
    val (m1, m2) = (two.map(_._2).sum / n, two.map(_._3).sum / n)
    val v1 = two.map(t => (t._2 - m1) * (t._2 - m1)).sum / n
    val v2 = two.map(t => (t._3 - m2) * (t._3 - m2)).sum / n
    val cv = two.map(t => (t._2 - m1) * (t._3 - m2)).sum / n
    val corr = cv / math.sqrt(v1 * v2)
    info(f"var(pc1)=$v1%.3f var(pc2)=$v2%.3f corr=$corr%.5f")
    assert(math.abs(m2) < 1e-6 * math.sqrt(v2) + 1e-9,
      f"pc2 not centered: mean=$m2%.9f")
    assert(v2 > 0 && v2 <= v1 * 1.001,
      f"second component variance $v2%.3f exceeds the first ($v1%.3f)")
    assert(math.abs(corr) < 0.05,
      f"pc1/pc2 correlation $corr%.4f — deflation did not orthogonalize")
  }

  test("WAV round-trip: decoded PCM features equal the closed-form " +
      "waveform across 1000 seeds, and the container is the declared " +
      "PCM16LE mono format") {
    // PCM is lossless — the bound is EXACTNESS, the GIF discipline:
    // every feature of every asset must match the generator recompute
    // bit-for-bit. 1000 ids cover all (n, period, amplitude) classes.
    val ids = spark.range(1000).select(F.col("id")).as(Encoders.LONG)
    val bad = Multimodal.wavOf(ids).mapPartitions { it =>
      it.flatMap { m =>
        val f = Multimodal.decodeWavFeatures(m)
        val g = Multimodal.decodeWavSegments(m)
        val n = Multimodal.wavLen(m.doc_id)
        var sum = 0L; var peak = 0L; var energy = 0L; var zc = 0L
        var runs = 0L; var active = 0L; var longest = 0L; var cur = 0L
        var prev = 0; var i = 0
        while (i < n) {
          val s = Multimodal.wavSample(m.doc_id, i)
          sum += s; val a = math.abs(s); if (a > peak) peak = a
          energy += s.toLong * s
          if (i > 0 && ((prev > 0 && s < 0) || (prev < 0 && s > 0))) zc += 1
          if (s != 0) {
            if (cur == 0) runs += 1
            cur += 1; active += 1; if (cur > longest) longest = cur
          } else cur = 0
          prev = s; i += 1
        }
        val ok = f.n_samples == n && f.sum_v == sum && f.peak == peak &&
          f.energy == energy && f.zero_crossings == zc &&
          g.n_runs == runs && g.active_samples == active &&
          g.longest_run == longest
        if (ok) Iterator.empty else Iterator.single(m.doc_id)
      }
    }(Encoders.scalaLong).collect()
    assert(bad.isEmpty, s"codec round-trip drifted for ids ${bad.take(5)}")
    // container sanity on one asset: the JDK parser must see the
    // declared format, not a transcoded one
    val one = Multimodal.wavOf(
      spark.range(1).select(F.col("id")).as(Encoders.LONG)).head()
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(one.payload))
    try {
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16 && !fmt.isBigEndian)
      assert(ais.getFrameLength == Multimodal.wavLen(0L).toLong)
    } finally ais.close()
    // a malformed payload fails loudly on the strict path and ROUTES on
    // the tolerant one (multimodal_audio_quarantine's contract) —
    // including header bit-flip damage the declared query's two modes
    // don't cover
    val garbage = Multimodal.WavRow(7L,
      "not a riff container".getBytes("UTF-8"))
    intercept[Exception] { Multimodal.decodeWavFeatures(garbage) }
    assert(Multimodal.decodeWavSafe(garbage).status == "quarantine")
    val flipped = {
      val p = one.payload.clone()
      p(1) = (p(1) ^ 0xff).toByte // break the RIFF magic
      Multimodal.WavRow(0L, p)
    }
    assert(Multimodal.decodeWavSafe(flipped).status == "quarantine",
      "bit-flipped RIFF magic must route, not decode")
    assert(Multimodal.decodeWavSafe(one).status == "ok")
  }

  test("GIF multi-frame round-trip: frame count, dims and every pixel " +
      "exact across the generator seed space") {
    // GIF is palette-lossless, so unlike JPEG the bound is EXACTNESS:
    // every frame of every asset must decode to the generator values
    // bit-for-bit. 1000 ids cover every (w, h, nf, gray-pattern) class
    // many times over — including the h ≤ 4 images that exposed the
    // JDK reader's interlace bug (see gifFrameMeta) and would regress
    // silently if the non-interlace metadata were ever dropped.
    val ids = spark.range(1000).select(F.col("id")).as(Encoders.LONG)
    val bad = Multimodal.gifOf(ids).mapPartitions { it =>
      it.map { m =>
        val frames = Multimodal.decodeGifFrames(m)
        val nf = (m.doc_id % 4 + 2).toInt
        val w = (m.doc_id % 11 + 1).toInt
        val h = (m.doc_id % 6 + 1).toInt
        var errs = 0L
        if (frames.size != nf) errs += 1
        frames.foreach { fr =>
          if (fr.width != w || fr.height != h) errs += 1
          val want = (0 until h).flatMap(y => (0 until w).map(x =>
            Multimodal.gifGray(m.doc_id, fr.frame_idx.toInt, x, y))).sum
          if (fr.pixel_sum != want) errs += 1
        }
        errs
      }
    }(Encoders.scalaLong).collect().sum
    assert(bad == 0L, s"$bad GIF frame mismatches across 1000 assets")
  }

  test("area-average resize matches an independent reference " +
      "resampler on decoded rasters") {
    // Re-derive every output from the generator arithmetic directly
    // (no image round-trip) — the same contract the DuckDB oracle
    // replays, validated here against the REAL decode+resample path.
    val ids = spark.range(500).select(F.col("id")).as(Encoders.LONG)
    val got = Multimodal.pngOf(ids)
      .mapPartitions(_.map(Multimodal.resizeAvg))(
        Encoders.product[Multimodal.ResizedFeatures])
      .collect().map(r => r.doc_id -> r).toMap
    (0L until 500L).foreach { id =>
      val w = (id % 13 + 1).toInt
      val h = (id % 7 + 1).toInt
      val (ow, oh) = Multimodal.fitBox(w, h, Multimodal.ResizeEdge)
      val sums = Array.fill(ow * oh)(0L)
      val cnts = Array.fill(ow * oh)(0L)
      for (y <- 0 until h; x <- 0 until w) {
        val k = (y * oh / h) * ow + (x * ow / w)
        sums(k) += Multimodal.pngGray(id, x, y)
        cnts(k) += 1
      }
      val want = sums.indices.map(k => sums(k) / cnts(k)).sum
      val r = got(id)
      assert(r.width == w && r.height == h && r.out_w == ow &&
        r.out_h == oh && r.out_pixel_sum == want,
        s"id=$id: got $r want sum=$want dims=${w}x$h→${ow}x$oh")
    }
  }
}
