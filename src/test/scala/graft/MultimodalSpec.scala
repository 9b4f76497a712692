package graft

import graft.mm.Multimodal
import graft.mm.Multimodal._
import org.apache.spark.sql.functions._

/** Multimodal plumbing tests: binary columns, batched partition-local
  * decode, feature shape, resize, frame sampling, byte-budget
  * partitioning. The codec is the documented deterministic stub; the
  * plumbing around it is what's under test.
  */
class MultimodalSpec extends SparkFunSuite {

  lazy val media = Multimodal.synthesizeMedia(spark, sf0001).cache()

  test("synthesized media: binary column with parseable header, 500 rows") {
    assert(media.count() == 500)
    val first = media.filter(col("media_id") === 0).head()
    val (w, h, fr) = StubCodec.decodeHeader(first.content)
    assert(w == 64 && h == 64 && fr == 1)
    assert(media.select("mime").distinct().count() == 3)
  }

  test("decodeMeta extracts typed metadata for every record") {
    val meta = decodeMeta(media, batchSize = 7).cache()
    assert(meta.count() == 500)
    val m = meta.filter(col("media_id") === 5).head()
    assert(m.width == 64 + 5 % 192 && m.n_frames == 6)
    assert(meta.filter(col("content_len") <= 16).count() == 0)
    // schema contract: no binary column survives into the metadata table
    assert(!meta.schema.fields.exists(_.dataType ==
      org.apache.spark.sql.types.BinaryType))
  }

  test("extractFeatures yields fixed-width float vectors, deterministic") {
    val f1 = extractFeatures(media).filter(col("media_id") === 3).head()
    val f2 = extractFeatures(media).filter(col("media_id") === 3).head()
    assert(f1.feature.length == 16)
    assert(f1.feature.toSeq == f2.feature.toSeq)
    assert(math.abs(f1.feature.sum - 1.0f) < 1e-3)
  }

  test("resize rewrites header dims and shrinks payload") {
    val resized = resizeAll(media, 32, 32)
    val r = resized.filter(col("media_id") === 10).head()
    val (w, h, _) = StubCodec.decodeHeader(r.content)
    assert(w == 32 && h == 32)
    val orig = media.filter(col("media_id") === 10).head()
    assert(r.content.length <= orig.content.length)
  }

  test("frame sampling explodes videos into per-frame records") {
    val frames = sampleFrames(media, everyNth = 5).cache()
    assert(frames.count() > 0)
    assert(frames.select("mime").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("image/png"))
    // every source video contributes ceil(frames/5) samples
    val vids = media.filter(col("mime") === "video/mp4")
    val expected = vids.collect().map { r =>
      val (_, _, fr) = StubCodec.decodeHeader(r.content)
      (fr + 4) / 5
    }.sum
    assert(frames.count() == expected)
  }

  test("repartitionByBytes produces byte-budgeted partitions") {
    val rp = repartitionByBytes(media, targetBytesPerPartition = 16L << 10)
    assert(rp.rdd.getNumPartitions >= 2)
    assert(rp.count() == 500)
  }

  test("BmpCodec: encode/decode round-trips every pixel exactly, " +
      "including padded odd widths and channel order") {
    // widths 7/9 force nonzero row padding (stride 24 for w=7, 28 for
    // w=9); pixel values hit the byte edges (0, 127, 255)
    for ((w, h) <- Seq((7, 3), (9, 5), (8, 8), (1, 1))) {
      val expect = Array.tabulate(w * h) { idx =>
        val r = (idx * 37) % 256; val g = (255 - idx * 11 % 256) % 256
        val b = Seq(0, 127, 255)(idx % 3)
        (r << 16) | (g << 8) | b
      }
      val bytes = BmpCodec.encode(w, h, { idx =>
        val p = expect(idx); ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      })
      val (gw, gh, px) = BmpCodec.decode(bytes)
      assert(gw == w && gh == h)
      assert(px.toSeq == expect.toSeq, s"pixel mismatch at ${w}x$h")
    }
  }

  test("imageSobel: flat image has zero gradient; vertical step edge " +
      "responds with the analytic Sobel magnitude") {
    import spark.implicits._
    // flat gray 10x10: every 3x3 neighborhood is constant -> all zero
    val flat = BmpCodec.encode(10, 10, _ => (100, 100, 100))
    // vertical step at x=5: left half black, right half white
    val step = BmpCodec.encode(10, 10, { idx =>
      if (idx % 10 < 5) (0, 0, 0) else (255, 255, 255)
    })
    val ds = Seq(
      Multimodal.MediaRecord(0L, "t://flat", "image/bmp", flat),
      Multimodal.MediaRecord(1L, "t://step", "image/bmp", step)).toDS()
    val out = Multimodal.imageSobel(ds, t2 = 1L).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(0L).n_interior == 64 && out(0L).n_edge == 0 &&
      out(0L).sum_mag2 == 0L)
    // step columns x=4 and x=5 see |gx| = 4*lum(white), lum = 255000;
    // 8 interior rows x 2 columns = 16 edge pixels, each mag2 = gx^2
    val gx = 4L * 255000L
    assert(out(1L).n_edge == 16, s"step n_edge = ${out(1L).n_edge}")
    assert(out(1L).sum_mag2 == 16L * gx * gx,
      s"step sum_mag2 = ${out(1L).sum_mag2}")
  }

  test("imageOtsu: perfectly bimodal image thresholds at the lower mode " +
      "with the analytic separation") {
    import spark.implicits._
    // left half gray 50, right half gray 200 on an 8x8 image:
    // candidates collapse to t = 50 (t = 200 is the degenerate W0 = N);
    // W0 = 32, S0 = 1600, S = 8000, a = 1600*32 - 6400*32 = -153600
    val bimodal = BmpCodec.encode(8, 8, { idx =>
      if (idx % 8 < 4) (50, 50, 50) else (200, 200, 200)
    })
    val ds = Seq(
      Multimodal.MediaRecord(0L, "t://bimodal", "image/bmp", bimodal)).toDS()
    val r = Multimodal.imageOtsu(ds).collect().head
    assert(r.otsu_t == 50L, s"otsu_t = ${r.otsu_t}")
    assert(r.n_bg == 32L && r.n_fg == 32L)
    assert(r.mu_bg == 50L && r.mu_fg == 200L)
    assert(r.sep_num == 153600L * 153600L && r.sep_den == 32L * 32L)
  }

  test("imageEuler: solid block has chi = 1, a ring around a hole " +
      "has chi = 0 (components minus holes)") {
    import spark.implicits._
    // 8x8 bimodal planes: Otsu lands at t = 50, fg = the 200-gray cells
    def img(fgCell: Int => Boolean) = BmpCodec.encode(8, 8, { idx =>
      if (fgCell(idx)) (200, 200, 200) else (50, 50, 50)
    })
    // solid 2x2 block at (1,1): V=4 E=4 F=1 -> chi = 1
    val solid = img(idx => {
      val (x, y) = (idx % 8, idx / 8)
      x >= 1 && x <= 2 && y >= 1 && y <= 2
    })
    // 3x3 ring (center empty): V=8 E=8 F=0 -> chi = 0 (1 comp - 1 hole)
    val ring = img(idx => {
      val (x, y) = (idx % 8, idx / 8)
      x >= 1 && x <= 3 && y >= 1 && y <= 3 && !(x == 2 && y == 2)
    })
    val ds = Seq(
      Multimodal.MediaRecord(0L, "t://solid", "image/bmp", solid),
      Multimodal.MediaRecord(1L, "t://ring", "image/bmp", ring)).toDS()
    val out = Multimodal.imageEuler(ds).collect()
      .map(r => r.media_id -> r).toMap
    assert(out(0L).otsu_t == 50L && out(1L).otsu_t == 50L)
    assert(out(0L).n_fg == 4L && out(0L).n_edges == 4L &&
      out(0L).n_quads == 1L && out(0L).euler == 1L,
      s"solid: ${out(0L)}")
    assert(out(1L).n_fg == 8L && out(1L).n_edges == 8L &&
      out(1L).n_quads == 0L && out(1L).euler == 0L,
      s"ring: ${out(1L)}")
  }

  test("imageMoments: a centered square has its centroid at the " +
      "center, zero xy-covariance, and equal axis spreads") {
    import spark.implicits._
    // 8x8, fg = the 4x4 block at (2,2)..(5,5): centroid (3.5, 3.5)
    val img = BmpCodec.encode(8, 8, { idx =>
      val (x, y) = (idx % 8, idx / 8)
      if (x >= 2 && x <= 5 && y >= 2 && y <= 5) (200, 200, 200)
      else (50, 50, 50)
    })
    val ds = Seq(
      Multimodal.MediaRecord(0L, "t://sq", "image/bmp", img)).toDS()
    val r = Multimodal.imageMoments(ds).collect().head
    assert(r.otsu_t == 50L && r.m00 == 16L)
    assert(r.cx_milli == 3500L && r.cy_milli == 3500L,
      s"centroid ${r.cx_milli}, ${r.cy_milli}")
    assert(r.cov_xy == 0L, s"cov_xy ${r.cov_xy}")
    assert(r.cov_xx == r.cov_yy && r.cov_xx > 0L)
  }

  test("degenerate uniform image: Otsu has no valid split and ALL " +
      "three consumers agree on the empty-foreground sentinel") {
    import spark.implicits._
    // single gray level -> no t with 0 < W0 < N -> otsuArgmax = -1;
    // imageEuler/imageMoments must NOT fall into fg = gray > -1
    // (all-foreground), they must match imageOtsu's n_fg = 0
    val flat = BmpCodec.encode(8, 8, _ => (100, 100, 100))
    val ds = Seq(
      Multimodal.MediaRecord(0L, "t://flat", "image/bmp", flat)).toDS()
    val o = Multimodal.imageOtsu(ds).collect().head
    assert(o.otsu_t == -1L && o.n_fg == 0L, s"otsu: $o")
    val e = Multimodal.imageEuler(ds).collect().head
    assert(e.otsu_t == -1L && e.n_fg == 0L && e.n_edges == 0L &&
      e.n_quads == 0L && e.euler == 0L, s"euler: $e")
    val m = Multimodal.imageMoments(ds).collect().head
    assert(m.otsu_t == -1L && m.m00 == 0L && m.m10 == 0L &&
      m.cx_milli == -1L && m.cy_milli == -1L && m.cov_xx == 0L &&
      m.cov_yy == 0L && m.cov_xy == 0L, s"moments: $m")
  }

  test("WavCodec: encode/decode round-trips samples exactly; decoder " +
      "walks past unknown chunks with odd-length padding") {
    for ((ch, frames) <- Seq((1, 7), (2, 5), (2, 1))) {
      val samples = Array.tabulate[Short](frames * ch)(i =>
        (i * 12345 - 32768 + (i % 3) * 31111).toShort)
      val bytes = WavCodec.encode(22050, ch, samples)
      val (sr, gch, got) = WavCodec.decode(bytes)
      assert(sr == 22050 && gch == ch)
      assert(got.toSeq == samples.toSeq, s"sample mismatch ch=$ch")
    }
    // splice an odd-length LIST chunk between fmt and data: a decoder
    // that assumes the canonical 44-byte layout (or forgets the RIFF
    // pad byte) misparses this
    val base = WavCodec.encode(8000, 1, Array[Short](100, -200, 32767))
    val junk = Array[Byte]('L', 'I', 'S', 'T', 5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(36) ++ junk ++ base.drop(36)
    val (sr2, ch2, got2) = WavCodec.decode(spliced)
    assert(sr2 == 8000 && ch2 == 1)
    assert(got2.toSeq == Seq[Short](100, -200, 32767))
    // 16-bit edge values survive the signed/unsigned round trip
    val edge = Array[Short](Short.MinValue, Short.MaxValue, 0, -1)
    assert(WavCodec.decode(WavCodec.encode(8000, 2, edge))._3.toSeq ==
      edge.toSeq)
  }

  test("mm04 path: decimated WAVs decode to the analytic sample stats") {
    val stats = Multimodal.audioStats(
      Multimodal.decimateWavHalf(Multimodal.synthesizeWav(spark, sf0001)))
      .collect().map(s => s.media_id -> s).toMap
    assert(stats.size == 500)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute-force the synthesis formula at the decimated indices for a
    // handful of docs spanning mono/stereo and all sample rates
    for (id <- Seq(0L, 1L, 2L, 3L, 7L, 42L)) {
      val text = docs(id); val n = text.length
      val ch = (1 + id % 2).toInt
      val frames = (32 + id % 96).toInt
      val fo = (frames + 1) / 2
      val vs = (0 until fo * ch).map { j =>
        val i = 2 * (j / ch) * ch + j % ch
        val cp = if (n == 0) 0L else (text.charAt(i % n).toInt % 256).toLong
        (cp * 131L + i * 7L + id) % 65536L - 32768L
      }
      val st = stats(id)
      assert(st.sample_rate == 8000 + (id % 4) * 4000, s"sr for $id")
      assert(st.channels == ch && st.n_frames == fo, s"dims for $id")
      assert(st.sum_samples == vs.sum, s"sum for $id")
      assert(st.sum_squares == vs.map(v => v * v).sum, s"sumsq for $id")
    }
  }

  test("mm02 path: synthesized BMPs decode to the analytic pixel sums") {
    val stats = Multimodal.pixelStats(Multimodal.synthesizeBmp(spark, sf0001))
      .collect().map(s => s.media_id -> s).toMap
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(stats.size == docs.size)
    docs.foreach { case (id, text) =>
      val n = text.length
      val w = (8 + id % 24).toInt; val h = (8 + (id * 7) % 24).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      (0 until w * h).foreach { idx =>
        val ch = if (n == 0) 0 else text.charAt(idx % n).toInt
        sr += ch % 256
        sg += (idx.toLong * 31 + id) % 256
        sb += (idx + ch % 256) % 256
      }
      val s = stats(id)
      assert(s.width == w && s.height == h)
      assert(s.sum_r == sr && s.sum_g == sg && s.sum_b == sb,
        s"channel sums mismatch for media $id")
    }
  }

  test("VideoContainer: mux/demux walks variable-length packets exactly") {
    // frames of different dims would break a fixed-stride walker; here
    // all frames share dims (the container contract) but lengths still
    // come from each BMP's own file-size field — corrupt it and the
    // demux must fail loudly rather than resynchronize by accident
    val frames = (0 until 4).map(f =>
      BmpCodec.encode(5, 3, idx => ((idx + f) % 256, f, idx % 256)))
    val muxed = VideoContainer.mux(5, 3, frames)
    val (w, h, got) = VideoContainer.demux(muxed)
    assert(w == 5 && h == 3 && got.length == 4)
    got.zip(frames).foreach { case (g, e) => assert(g.toSeq == e.toSeq) }
    val corrupt = muxed.clone()
    corrupt(16 + 2) = (corrupt(16 + 2) + 1).toByte // first frame's length
    intercept[IllegalArgumentException](VideoContainer.demux(corrupt))
  }

  test("mm05 path: frame-sampled video stats match the analytic formula") {
    val stats = Multimodal.sampleFrameStats(
      Multimodal.synthesizeVideo(spark, sf0001))
      .collect().map(s => s.media_id -> s).toMap
    assert(stats.size == 500)
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // brute-force the per-frame pixel formula at the sampled frame
    // indices for docs spanning frame counts 2..11
    for (id <- Seq(0L, 1L, 5L, 9L, 13L, 42L, 101L)) {
      val text = docs(id); val n = text.length
      val w = (4 + id % 8).toInt; val h = (4 + (id * 3) % 8).toInt
      val nf = (2 + id % 10).toInt
      val sampled = 0 until nf by 3
      var sr = 0L; var sg = 0L; var sb = 0L
      for (f <- sampled; idx <- 0 until w * h) {
        val cp = if (n == 0) 0 else text.charAt((f + idx) % n).toInt
        val r = cp % 256
        sr += r
        sg += (idx.toLong * 31 + f * 7 + id) % 256
        sb += (idx + f + r) % 256
      }
      val s = stats(id)
      assert(s.width == w && s.height == h && s.n_frames == nf,
        s"dims for $id")
      assert(s.n_sampled == sampled.size, s"sample count for $id")
      assert(s.sum_r == sr && s.sum_g == sg && s.sum_b == sb,
        s"channel sums mismatch for video $id")
    }
  }

  test("aHash64: brightness-shift invariant, structure-sensitive") {
    import spark.implicits._
    def mk(id: Long, f: Int => (Int, Int, Int)) =
      MediaRecord(id, s"synth://t/$id", "image/bmp",
        BmpCodec.encode(16, 16, f))
    // +40 on every channel shifts each integer gray by exactly 40
    // ((r+g+b+120) div 3 = gray+40), and the mean shifts with it, so
    // the thresholded bits — hence the hash — are identical
    val base = mk(0, idx => (idx % 200, (idx * 3) % 200, (idx * 7) % 200))
    val bright = mk(1, idx =>
      (idx % 200 + 40, (idx * 3) % 200 + 40, (idx * 7) % 200 + 40))
    val reversed = mk(2, idx => ((255 - idx) % 200,
      ((255 - idx) * 3) % 200, ((255 - idx) * 7) % 200))
    val hashes = Multimodal.aHash64(
        spark.createDataset(Seq(base, bright, reversed)))
      .collect().map(h => h.media_id -> h.ahash).toMap
    assert(hashes(0) == hashes(1),
      "brightness shift must not change the hash")
    assert(java.lang.Long.bitCount(hashes(0) ^ hashes(2)) > 10,
      "structurally different image must be far in hamming space")
  }

  test("BmpCodec half-resize: picks exactly the even-indexed pixels, " +
    "odd dims round up") {
    // 5×3 image with idx-identifying channels: out should be 3×2 of
    // source pixels (0,0),(2,0),(4,0),(0,2),(2,2),(4,2) = idx 0,2,4,10,12,14
    val bytes = Multimodal.BmpCodec.encode(5, 3,
      idx => (idx, (idx * 2) % 256, (idx * 3) % 256))
    val (w2, h2, px) = Multimodal.BmpCodec.decode(
      Multimodal.BmpCodec.encode(3, 2, { i =>
        val (w, _, src) = Multimodal.BmpCodec.decode(bytes)
        val p = src((2 * (i / 3)) * w + 2 * (i % 3))
        ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      }))
    assert((w2, h2) == (3, 2))
    assert(px.map(p => (p >> 16) & 0xFF).toSeq == Seq(0, 2, 4, 10, 12, 14))
    // and the Dataset-level operator agrees end-to-end
    import spark.implicits._
    val rec = Multimodal.MediaRecord(7L, "synth://t", "image/bmp", bytes)
    val out = Multimodal.resizeBmpHalf(Seq(rec).toDS()).collect().head
    val (wo, ho, opx) = Multimodal.BmpCodec.decode(out.content)
    assert((wo, ho) == (3, 2))
    assert(opx.map(p => (p >> 16) & 0xFF).toSeq == Seq(0, 2, 4, 10, 12, 14))
  }

  test("audioSegmentGoertzel: integer band powers equal the direct DFT " +
      "|X(w)|^2 of the segment's analysis window, end-to-end through " +
      "the codec + VAD") {
    import spark.implicits._
    // one real WAV through the whole operator
    val rec = Multimodal.synthesizeWav(spark, sf0001)
      .filter(col("media_id") === 3L).as[Multimodal.MediaRecord]
      .collect().head
    val rows = Multimodal.audioSegmentGoertzel(Seq(rec).toDS())
      .collect().groupBy(r => (r.seg_start, r.seg_end))
    assert(rows.nonEmpty, "no VAD segments for clip 3")
    // reference: direct complex DFT over the same window / channel
    val (_, ch, samples) = Multimodal.WavCodec.decode(rec.content)
    val frames = samples.length / ch
    val omega = Map("dc" -> 0.0, "fs6" -> math.Pi / 3,
      "fs4" -> math.Pi / 2, "fs3" -> 2 * math.Pi / 3, "nyq" -> math.Pi)
    for (((s0, e0), bandRows) <- rows) {
      val fStart = s0 * 8
      val fEnd = math.min(fStart + 32, math.min((e0 + 1) * 8, frames))
      val xs = (fStart until fEnd).map(f => samples(f * ch).toDouble)
      for (r <- bandRows) {
        val w = omega(r.band)
        val re = xs.zipWithIndex.map { case (x, n) => x * math.cos(w * n) }.sum
        val im = xs.zipWithIndex.map { case (x, n) => -x * math.sin(w * n) }.sum
        val dft = re * re + im * im
        assert(math.abs(dft - r.power.toDouble) <=
          1e-6 * math.max(1.0, dft),
          s"band ${r.band} seg ($s0,$e0): goertzel ${r.power} vs dft $dft")
      }
    }
  }
}
