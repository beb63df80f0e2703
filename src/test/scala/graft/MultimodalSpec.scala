package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("decode pipeline is deterministic and schema-complete") {
    val a = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF))
      .collect().sortBy(_.doc_id)
    val b = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF))
      .collect().sortBy(_.doc_id)
    assert(a.length == 500)
    assert(a.map(_.doc_id).sameElements(b.map(_.doc_id)))
    a.zip(b).foreach { case (x, y) =>
      assert(x.feature.sameElements(y.feature), s"doc ${x.doc_id} nondeterministic")
    }
  }

  test("features carry real metadata: sizes, frames, byte stats") {
    val rows = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, SF)).collect()
    rows.foreach { m =>
      assert(m.n_frames == m.n_bytes / 256 + 1)
      assert(m.mean_byte > 0 && m.mean_byte < 256)
      assert(m.feature.length == 8)
      assert(Set("png", "jpeg", "wav").contains(m.fmt))
    }
  }

  test("resize emits fixed-geometry payloads, deterministic, metadata consistent") {
    val a = Multimodal.resize(Multimodal.mediaTable(spark, SF), side = 8)
      .collect().sortBy(_.doc_id)
    val b = Multimodal.resize(Multimodal.mediaTable(spark, SF), side = 8)
      .collect().sortBy(_.doc_id)
    assert(a.length == 500)
    a.foreach { m =>
      assert(m.payload.length == 64 && m.n_bytes == 64)
    }
    a.zip(b).foreach { case (x, y) =>
      assert(x.payload.sameElements(y.payload), s"doc ${x.doc_id}")
    }
  }

  test("payload column prunes away for metadata-only projections") {
    val scan = Multimodal.mediaTable(spark, SF)
      .select("doc_id", "fmt")
      .queryExecution.executedPlan.toString
    assert(!scan.contains("payload"), s"payload not pruned:\n$scan")
  }

  // ── real codecs (round 11 — the decode stub retired) ─────────────

  test("real PNG decode: JDK codec round-trips the crafted sample grid; corrupt payload quarantined") {
    import graft.operators.{MediaRow, MultimodalCodec => C}
    // crafted valid/corrupt pair, decoded OUTSIDE Spark first: the
    // codec itself must round-trip the closed-form pixel function
    val id = 12345L
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(C.encodePng(id)))
    assert(img.getWidth == C.pngWidth(id) && img.getHeight == C.pngHeight(id))
    assert(img.getRaster.getNumBands == 1)
    var exp = 0L
    for (y <- 0 until C.pngHeight(id); x <- 0 until C.pngWidth(id))
      exp += C.pngPixel(id, x, y)
    var got = 0L
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
      got += img.getRaster.getSample(x, y, 0)
    assert(got == exp, s"codec distorted samples: $got != $exp")
    // the same pair through the batched Spark decode path
    import spark.implicits._
    val media = Seq(
      MediaRow(1L, "png", C.encodePng(1L), 0L),
      MediaRow(2L, "png", C.encodePng(1L).take(16), 16L), // corrupt
      MediaRow(3L, "png", Array.empty[Byte], 0L))         // empty
    val out = C.decodeImages(
        spark.createDataset(media)(implicitly))
      .collect().map(d => d.doc_id -> d).toMap
    assert(out(1L).ok && out(1L).width.contains(C.pngWidth(1L).toLong))
    assert(!out(2L).ok && out(2L).px_sum.isEmpty, "truncated PNG must quarantine")
    assert(!out(3L).ok, "empty payload must quarantine")
    // corpus gate: quarantine lane is exactly the % 97 population
    val gate = C.imageDecode(spark, SF).collect()
    assert(gate.forall(r => r.getBoolean(1) == (r.getLong(0) % 97 != 0)))
    assert(gate.exists(!_.getBoolean(1)), "corpus must exercise quarantine")
  }

  test("real WAV decode: JDK codec round-trips rate/frames/samples; truncated payload quarantined") {
    import graft.operators.{MediaRow, MultimodalCodec => C}
    import spark.implicits._
    val id = 777L
    val media = Seq(
      MediaRow(id, "wav", C.encodeWav(id), 0L),
      MediaRow(id + 1, "wav", C.encodeWav(id).take(8), 8L))
    val out = C.decodeAudio(spark.createDataset(media)(implicitly))
      .collect().map(d => d.doc_id -> d).toMap
    val expSum = (0 until C.wavFrames(id)).map(i =>
      math.abs(C.wavSample(id, i).toLong)).sum
    assert(out(id).ok &&
      out(id).sample_rate.contains(C.wavRate(id).toLong) &&
      out(id).n_frames.contains(C.wavFrames(id).toLong) &&
      out(id).sum_abs.contains(expSum), s"got ${out(id)}")
    assert(!out(id + 1).ok && out(id + 1).sum_abs.isEmpty,
      "truncated RIFF header must quarantine")
    val gate = C.audioDecode(spark, SF).collect()
    assert(gate.forall(r => r.getBoolean(1) == (r.getLong(0) % 101 != 0)))
    assert(gate.exists(!_.getBoolean(1)), "corpus must exercise quarantine")
  }

  test("audio fingerprint: gain-invariant, locally sensitive, quarantined; ≡ closed-form bits") {
    import graft.operators.{MediaRow, MultimodalCodec => C}
    import spark.implicits._
    // crafted 64-sample signal: a deterministic wobble
    val base = Array.tabulate(64)(i => (i * 997 % 2000) - 1000)
    val gained = base.map(s => s * 16)         // uniform gain
    val flipped = base.clone(); flipped(40) = 30000 // one-sample spike
    val media = Seq(
      MediaRow(1L, "wav", C.encodeWavSamples(base, 8000), 0L),
      MediaRow(2L, "wav", C.encodeWavSamples(gained, 8000), 0L),
      MediaRow(3L, "wav", C.encodeWavSamples(flipped, 8000), 0L),
      MediaRow(4L, "wav", C.encodeWavSamples(base, 8000).take(8), 8L))
    val out = C.audioFingerprint(spark.createDataset(media)(implicitly))
      .collect().map(d => d.doc_id -> d).toMap
    // closed-form replay of the bits for the base signal
    val e = Array.tabulate(4)(f =>
      (16 * f until 16 * f + 16).map(i => base(i).toLong * base(i)).sum)
    var want = 0L
    (1 until 4).foreach(f => if (e(f) > e(f - 1)) want |= 1L << (f - 1))
    assert(out(1L).ok && out(1L).n_frames.contains(4L) &&
      out(1L).fp_bits.contains(want), s"${out(1L)}")
    // uniform gain scales every energy by the same factor — the
    // rise/fall ORDER and hence the fingerprint are unchanged
    assert(out(2L).fp_bits == out(1L).fp_bits, "gain must not move bits")
    // a single-sample spike perturbs only the transitions touching
    // its frame (frame 2: bits 1 and 2 of the 3) — other bits hold
    val diff = out(3L).fp_bits.get ^ out(1L).fp_bits.get
    assert((diff & ~6L) == 0L, s"spike leaked outside its frame: $diff")
    assert(!out(4L).ok && out(4L).fp_bits.isEmpty)
  }

  test("perceptual hash: identical pixels → identical hash regardless of id; corrupt quarantined; 64 bits") {
    import graft.operators.{MediaRow, MultimodalCodec => C}
    import spark.implicits._
    // two rows with the SAME payload under different ids must collide
    // (the content-addressing property image dedup rests on); a third
    // with different pixels must not; corrupt → null
    val png = C.encodePng(42L)
    val media = Seq(
      MediaRow(1L, "png", png, 0L),
      MediaRow(2L, "png", png, 0L),
      MediaRow(3L, "png", C.encodePng(43L), 0L),
      MediaRow(4L, "png", png.take(16), 16L))
    val out = C.imagePHash(spark.createDataset(media)(implicitly))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(1), Option(r.getString(2)))).toMap
    assert(out(1L)._2 == out(2L)._2, "same pixels must hash identically")
    assert(out(1L)._2 != out(3L)._2, "different pixels must not collide here")
    assert(out(1L)._2.get.length == 64 &&
      out(1L)._2.get.forall(c => c == '0' || c == '1'))
    assert(!out(4L)._1 && out(4L)._2.isEmpty)
  }

  test("phash near-pairs: chunk blocking returns exactly the brute-force hamming ≤ 3 set") {
    import graft.operators.{MultimodalCodec => C}
    import spark.implicits._
    val hashes = C.imagePHash(C.imageTableNoisy(spark, SF))
      .filter($"ok").collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    def ham(a: String, b: String) = a.zip(b).count(p => p._1 != p._2)
    val brute = (for {
      a <- hashes.keys; b <- hashes.keys if a < b
      h = ham(hashes(a), hashes(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(brute.nonEmpty, "noisy corpus must contain near-dup hash pairs")
    assert(brute.exists(_._3 > 0), "perturbation should produce nonzero hammings")
    val got = C.phashNearPairs(spark, SF)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      s"blocked-only=${(got -- brute).take(3)} brute-only=${(brute -- got).take(3)}")
  }
}
