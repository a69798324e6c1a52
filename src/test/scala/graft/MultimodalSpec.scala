package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{MediaMeta, MediaRecord}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("binary media table round-trips payload and typed metadata") {
    val rows = Multimodal.mediaTable(spark, sf).collect()
    assert(rows.length == 500)
    assert(rows.forall(r => r.content.nonEmpty && r.meta.mediaType == "image"))
    assert(rows.forall(r => r.meta.width >= 1 && r.meta.width <= 64))
  }

  test("feature extraction: deterministic stub decode over partitions") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.doc_id -> f).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    docs.take(5).foreach { case (id, text) =>
      val f = feats(id)
      assert(f.n_bytes == text.getBytes("UTF-8").length)
      assert(f.histogram.sum == f.width.toLong * f.height) // padded grid
      // mean pixel of ASCII text bytes sits in the printable range
      assert(f.mean_px > 0 && f.mean_px < 255)
    }
  }

  private def resourceBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  test("decode reads a real checked-in PNG through javax.imageio") {
    // gradient8x8.png: 8-bit grayscale, pixel(x,y) = y*32 + x*4. Rec.601
    // integer luma of a gray pixel is the gray value itself (weights sum
    // to 1000), so the decoded matrix must equal the generator formula.
    val bytes = resourceBytes("/gradient8x8.png")
    val img = Multimodal.decode(bytes,
      MediaMeta("image", "png", 8, 8, 0L, "res://gradient8x8.png"))
    assert(img.length == 8 && img.forall(_.length == 8))
    for (y <- 0 until 8; x <- 0 until 8)
      assert(img(y)(x) == y * 32 + x * 4, s"pixel ($x,$y)")
  }

  test("decode round-trips a JVM-encoded BMP and GIF") {
    // 6 gray levels; the GIF side encodes from an explicitly indexed
    // image (our own palette) because the writer's automatic quantizer is
    // lossy — with the palette given, GIF encoding is index-exact.
    // 8x8, not smaller: the JDK GIF READER garbles degenerate tiny images
    // (a 5x3 comes back with a shifted/zeroed row).
    val (w, h) = (8, 8)
    def gray(x: Int, y: Int): Int = ((x + y) % 6) * 51
    val palette = Array.tabulate(6)(i => (i * 51).toByte)
    val icm = new java.awt.image.IndexColorModel(8, 6, palette, palette, palette)
    for (fmt <- Seq("bmp", "gif")) {
      val bi =
        if (fmt == "gif") new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        else new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val g = gray(x, y)
        bi.setRGB(x, y, (g << 16) | (g << 8) | g) // gray → luma is exact
      }
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, fmt, out))
      val img = Multimodal.decode(out.toByteArray,
        MediaMeta("image", fmt, w, h, 0L, s"mem://rt.$fmt"))
      assert(img.length == h && img.forall(_.length == w))
      for (y <- 0 until h; x <- 0 until w)
        assert(img(y)(x) == gray(x, y), s"$fmt pixel ($x,$y)")
    }
  }

  test("16-bit grayscale PNGs decode onto the 8-bit luma scale") {
    val bi = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    for (y <- 0 until 2; x <- 0 until 4)
      bi.getRaster.setSample(x, y, 0, (x + y * 4) * 8192) // 0..57344 of 65535
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", out))
    val img = Multimodal.decode(out.toByteArray,
      MediaMeta("image", "png", 4, 2, 0L, "mem://16bit"))
    assert(img.length == 2 && img.forall(_.length == 4))
    for (y <- 0 until 2; x <- 0 until 4) {
      assert(img(y)(x) == (x + y * 4) * 32, s"pixel ($x,$y)") // >> 8
      assert(img(y)(x) <= 255)
    }
  }

  test("decode falls back to the stub on unparseable or codec-less payloads") {
    val garbage = Array.tabulate(20)(i => (i * 7).toByte)
    // claims to be a PNG but isn't → imageio rejects → stub
    val claimed = MediaMeta("image", "png", 4, 0, 0L, "mem://bad")
    assert(Multimodal.decode(garbage, claimed).toSeq.map(_.toSeq) ==
      Multimodal.decodeStub(garbage, claimed).toSeq.map(_.toSeq))
    // format with no JDK codec → stub without attempting imageio
    val fake = MediaMeta("image", "fake", 4, 0, 0L, "mem://fake")
    assert(Multimodal.decode(garbage, fake).toSeq.map(_.toSeq) ==
      Multimodal.decodeStub(garbage, fake).toSeq.map(_.toSeq))
  }

  test("extractFeatures reports real decoded dimensions for real images") {
    import spark.implicits._
    val png = resourceBytes("/gradient8x8.png")
    val media = Seq(
      MediaRecord(1L, png, MediaMeta("image", "png", 8, 8, 0L, "res://g")),
      MediaRecord(2L, "hello world bytes".getBytes("UTF-8"),
        MediaMeta("image", "fake", 4, 0, 0L, "mem://f"))).toDS()
    val f = Multimodal.extractFeatures(media).collect().map(x => x.doc_id -> x).toMap
    assert(f(1L).width == 8 && f(1L).height == 8)
    assert(f(1L).n_bytes == png.length)
    // mean of the gradient: mean over y of 32y (=112) + mean over x of 4x (=14)
    assert(math.abs(f(1L).mean_px - 126.0) < 1e-9)
    assert(f(1L).histogram.sum == 64L)
    assert(f(2L).width == 4) // stub path pads to meta.width
  }

  test("extractFeatures: empty payload falls back to metadata width, zero height") {
    import spark.implicits._
    // empty matrix must not collapse width to 0 — the relational
    // derivation (width = n_chars%64+1, height = ceil(n_bytes/width))
    // gives (meta.width, 0) for a zero-byte payload
    val media = Seq(MediaRecord(9L, Array.empty[Byte],
      MediaMeta("image", "fake", 7, 0, 0L, "mem://empty"))).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width == 7 && f.height == 0)
    assert(f.n_bytes == 0L && f.mean_px == 0.0 && f.histogram.sum == 0L)
  }

  test("resize stub produces requested dimensions") {
    val img = Array.tabulate(10, 8)((y, x) => y * 8 + x)
    val out = Multimodal.resizeStub(img, 4, 5)
    assert(out.length == 5 && out.forall(_.length == 4))
    assert(out(0)(0) == img(0)(0)) // nearest-neighbor keeps origin
  }

  test("frame sampling emits every Nth frame deterministically") {
    import spark.implicits._
    val media = Seq(MediaRecord(1L, Array.range(0, 40).map(_.toByte),
      MediaMeta("video", "fake", 10, 0, 1000L, "mem://v/1"))).toDS()
    val frames = Multimodal.sampleFrames(media, everyN = 2)
      .as[(Long, Int, Array[Byte])].collect().sortBy(_._2)
    // 40 bytes / 10-byte frames = 4 frames; every 2nd → idx 0, 2
    assert(frames.map(_._2).toSeq == Seq(0, 2))
    assert(frames.head._3.toSeq == (0 until 10).map(_.toByte))
  }

  test("frameSampleManifest: sampled bytes bound by the every-Nth budget") {
    import spark.implicits._
    val got = Multimodal.frameSampleManifest(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nBytes, width, nFrames, nSampled, sBytes) =>
      assert(nFrames == (nBytes + width - 1) / width, s"doc $id frames")
      assert(nSampled == (nFrames + 3) / 4, s"doc $id sampled")
      assert(sBytes <= nBytes && sBytes <= nSampled * width, s"doc $id bytes")
    }
    // sampling keeps roughly 1/4 of the frame mass, never more than all
    assert(got.map(_._6).sum * 3 <= got.map(_._2).sum * 2,
      "sampled mass well under the full corpus")
  }

  test("decodeAudit mean equals the padded-matrix byte mean") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text").as[(Long, String)].collect().toMap
    val got = Multimodal.decodeAudit(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, nBytes, width, height, mean) =>
      val bytes = docs(id).getBytes("UTF-8")
      assert(nBytes == bytes.length.toLong)
      assert(height == (nBytes + width - 1) / width)
      val expected =
        if (height == 0) 0.0
        else bytes.map(b => (b & 0xff).toLong).sum.toDouble / (height * width)
      assert(mean == expected, s"doc $id mean")
    }
  }

  test("phash fingerprints match the closed-form byte replay") {
    import spark.implicits._
    val fps = Multimodal.phashFingerprints(spark, sf)
      .as[(Long, Long)].collect().toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)].collect()
    assert(fps.size == docs.length)
    docs.foreach { case (id, text, nChars) =>
      val bytes = text.getBytes("UTF-8").map(_ & 0xff)
      val w = (nChars % 64).toInt + 1
      val h = (bytes.length + w - 1) / w
      val area = h.toLong * w
      val sum = bytes.map(_.toLong).sum
      var fp = 0L
      for (b <- 0 until 64) {
        val idx = ((b / 8) * h / 8) * w + (b % 8) * w / 8
        val px = if (idx < bytes.length) bytes(idx).toLong else 0L
        if (px * area > sum) fp |= (1L << b)
      }
      assert(fps(id) == fp, s"doc $id fingerprint")
    }
  }

  test("phashPairs: banded join reproduces the full quadratic Hamming<=3 pair set") {
    import spark.implicits._
    val fps = Multimodal.phashFingerprints(spark, sf).as[(Long, Long)].collect()
    val brute = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 3
    } yield (a, b, d.toLong)).toSet
    val got = Multimodal.phashPairs(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute, "pigeonhole banding must be lossless at Hamming <= 3")
    assert(got.nonEmpty, "fixture contains near-dup assets")
  }

  test("aspectBatching: conservation, batch arithmetic, and an exact bucket replay") {
    import spark.implicits._
    val rows = Multimodal.aspectBatching(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"n_chars").as[(Long, String, Long)].collect()
      .map { case (id, text, nc) =>
        val w = nc % 64 + 1
        val nb = text.getBytes("UTF-8").length.toLong
        val h = math.max((nb + w - 1) / w, 1L)
        val bucket = 63 - java.lang.Long.numberOfLeadingZeros(math.max(w * 16 / h, 1L))
        (id, w, h, bucket.toLong)
      }
    assert(rows.map(_._2).sum == docs.length, "every asset in one bucket")
    rows.foreach { case (b, n, nb, pad, q6) =>
      assert(nb == (n + 31) / 32, s"bucket $b batch count")
      assert(pad >= 0 && q6 >= 0 && q6 < 1000000L, s"bucket $b pad bounds")
    }
    // exact replay of the fullest bucket's padding
    val hot = docs.groupBy(_._4).maxBy(_._2.length)
    val sorted = hot._2.sortBy(_._1)
    val (batchPx, assetPx) = sorted.grouped(32).map { g =>
      (g.map(_._2).max * g.map(_._3).max * g.length, g.map(x => x._2 * x._3).sum)
    }.toSeq.unzip
    val got = rows.find(_._1 == hot._1).get
    assert(got._4 == batchPx.sum - assetPx.sum, s"bucket ${hot._1} pad replay")
  }

  test("batchSizeSweep: B=32 row equals the q207 totals; conservation per B") {
    import spark.implicits._
    val sweep = Multimodal.batchSizeSweep(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(sweep.keySet == Set(8L, 16L, 32L, 64L))
    val q207 = Multimodal.aspectBatching(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val r32 = sweep(32L)
    assert(r32._2 == q207.map(_._2).sum, "B=32 assets == q207 total")
    assert(r32._3 == q207.map(_._3).sum, "B=32 batches == q207 total")
    assert(r32._4 == q207.map(_._4).sum, "B=32 pad == q207 total")
    sweep.values.foreach { case (b, n, nb, pad, q6) =>
      assert(n == r32._2, s"B=$b conservation")
      assert(pad >= 0 && q6 >= 0 && q6 < 1000000L, s"B=$b bounds")
    }
    // smaller batches can only have >= as many batches
    assert(sweep(8L)._3 >= sweep(16L)._3 && sweep(16L)._3 >= sweep(32L)._3
      && sweep(32L)._3 >= sweep(64L)._3, "batch count monotone in B")
  }
}
