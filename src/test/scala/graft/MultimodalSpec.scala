package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{DecodeStub, MediaRecord}

/** Plumbing tests for the multimodal surface: binary schema, batch
  * shape, stub determinism, and metadata pruning semantics. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("decode stub computes byte-exact features") {
    val r = MediaRecord(7L, "image/png", "abc".getBytes("UTF-8"), 1, 1)
    val f = DecodeStub.features(r)
    assert(f.n_bytes == 3L)
    assert(f.byte_sum == ('a' + 'b' + 'c').toLong)
    assert(f.checksum == ((('a' * 31L + 'b') % 1000000007L) * 31 + 'c') % 1000000007L)
    assert(f.n_frames == 1L)
  }

  test("empty payload decodes to zero features") {
    val f = DecodeStub.features(MediaRecord(0L, "audio/wav", Array.emptyByteArray, 0, 0))
    assert(f.n_bytes == 0L && f.byte_sum == 0L && f.checksum == 0L && f.n_frames == 0L)
  }

  test("media table schema is (binary payload + typed metadata)") {
    val df = Multimodal.mediaTable(spark, sf).toDF()
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("media") == "binary")
    assert(types("media_type") == "string")
    assert(types("width") == "integer" && types("height") == "integer")
    assert(df.select("media_type").distinct().count() == 3)
  }

  test("decodeFeatures is partition-local and preserves row count") {
    val media = Multimodal.mediaTable(spark, sf)
    val n = media.count()
    val decoded = Multimodal.decodeFeatures(media.repartition(3))
    assert(decoded.count() == n)
    // deterministic across partition layouts
    val a = Multimodal.decodeFeatures(media.repartition(1))
      .collect().map(f => f.doc_id -> f.checksum).toMap
    val b = Multimodal.decodeFeatures(media.repartition(5))
      .collect().map(f => f.doc_id -> f.checksum).toMap
    assert(a == b)
  }

  test("videoFrames decodes only the video modality") {
    val rows = Multimodal.videoFrames(spark, sf).select("doc_id").as[Long].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_ % 3 == 2))
  }

  test("PpmCodec parses a handcrafted P6 file to exact channel stats") {
    val header = "P6\n2 1\n255\n".getBytes("US-ASCII")
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60)
    val st = Multimodal.PpmCodec.decode(7L, header ++ pixels)
    assert(st == Multimodal.PpmStats(7L, 2, 1, 2L,
      r_sum = 50L, g_sum = 70L, b_sum = 90L,
      luma_q = 2126L * 50 + 7152L * 70 + 722L * 90))
  }

  test("dhash is brightness-shift invariant and flips on pixel edits") {
    def ppm(pixels: Array[Byte]) = "P6\n3 1\n255\n".getBytes("US-ASCII") ++ pixels
    // gray row: 60, 150, 90 → bits (150>60)=1, (90>150)=0 → 0b10
    val base = Array[Byte](10, 20, 30, 40, 50, 60, 20, 30, 40)
    assert(Multimodal.PpmCodec.dhash(ppm(base)) == 2L)
    // uniform +10 on every channel preserves all comparisons
    val brighter = base.map(b => (b + 10).toByte)
    assert(Multimodal.PpmCodec.dhash(ppm(brighter)) == 2L)
    // darkening the middle pixel below both neighbors flips both bits
    val edited = base.clone(); edited(3) = 0; edited(4) = 0; edited(5) = 0
    assert(Multimodal.PpmCodec.dhash(ppm(edited)) == 1L)
  }

  test("codegen'd ppm_dhash matches the codec on every synthesized raster") {
    val viaExpr = Multimodal.ppmTable(spark, sf)
      .select($"doc_id", graft.plans.MediaHashes.ppmDhash($"media").as("dhash"))
      .as[(Long, Long)].collect().toMap
    val viaCodec = Multimodal.ppmTable(spark, sf).as[(Long, Array[Byte])]
      .collect().map { case (id, m) => id -> Multimodal.PpmCodec.dhash(m) }.toMap
    assert(viaExpr == viaCodec)
    assert(viaExpr.valuesIterator.exists(_ != 0L)) // non-degenerate rasters
    // SQL-callable by name through the extension registration
    Multimodal.ppmTable(spark, sf).createOrReplaceTempView("mm_ppm")
    val one = spark.sql("SELECT ppm_dhash(media) AS h FROM mm_ppm WHERE doc_id = 0")
      .as[Long].head()
    assert(one == viaCodec(0L))
  }

  test("PpmCodec rejects malformed files loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.PpmCodec.decode(0L, "JFIF....".getBytes("US-ASCII"))
    }
    intercept[IllegalArgumentException] { // truncated payload
      Multimodal.PpmCodec.decode(0L, "P6\n2 2\n255\n abc".getBytes("US-ASCII"))
    }
  }

  test("wav codec: sign extension, peak, and crossings on hand-built PCM") {
    // independently constructed RIFF container (not WavCodec.header),
    // with a LIST chunk BEFORE data to force a real chunk walk, at a
    // different rate/geometry than the fixture
    val samples = Array[Short](1000, -2000, 0, 3000, -1, -5, 4, 32767, -32768)
    val dataLen = samples.length * 2
    // LIST chunk with ODD payload length 3: RIFF pads odd chunks to
    // even, so the walker must skip 3 + 1 bytes to stay aligned
    val bb = java.nio.ByteBuffer.allocate(44 + 12 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 12 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200).putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(3).put("INF\u0000".getBytes("US-ASCII"))
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(bb.putShort)
    val st = Multimodal.WavCodec.decode(7L, bb.array())
    assert(st.sample_rate == 44100L && st.n_samples == 9L)
    assert(st.abs_sum == 71545L)        // incl. |−32768| sign-extended
    assert(st.sq_sum == 2161418155L)
    assert(st.peak == 32768L)
    // nonzero sign sequence +,-,+,-,-,+,+,- → 5 crossings (zeros skipped)
    assert(st.zero_crossings == 5L)
    // malformed containers fail loudly, never silently zero
    intercept[IllegalArgumentException] {
      Multimodal.WavCodec.decode(0L, "RIFxWAVE".getBytes("US-ASCII"))
    }
  }

  test("every synthesized WAV round-trips through the real decoder") {
    val decoded = Multimodal.wavDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    val row = decoded.filter($"doc_id" === 0).collect().head
    assert(row.getAs[Long]("sample_rate") == 8000L)
    assert(row.getAs[Long]("n_samples") == 64L)
    // ASCII corpus ⇒ high bytes < 0x80 ⇒ strictly positive samples
    assert(row.getAs[Long]("zero_crossings") == 0L)
    assert(row.getAs[Long]("peak") < 32768L)
  }

  test("every synthesized PPM round-trips through the real decoder") {
    val decoded = Multimodal.ppmDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    val row = decoded.filter($"doc_id" === 0).collect().head
    assert(row.getAs[Int]("width") == 8 && row.getAs[Int]("height") == 6)
    assert(row.getAs[Long]("n_pixels") == 48L)
  }

  test("bmp codec: bottom-up rows, BGR order, and row padding on a hand-built file") {
    // independently constructed 2x2 24bpp BMP (not BmpCodec.header):
    // row size 2*3=6 → padded to 8, pad bytes POISONED with 0xEE so a
    // decoder that reads them corrupts the sums. Stored bottom-up:
    // stored row 0 = logical BOTTOM = pixels (B,G,R) (1,2,3),(4,5,6);
    // stored row 1 = logical TOP    = (7,8,9),(10,11,12)
    val bb = java.nio.ByteBuffer.allocate(54 + 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte)
      .putInt(54 + 16).putInt(0).putInt(54)
      .putInt(40).putInt(2).putInt(2).putShort(1).putShort(24)
      .putInt(0).putInt(16).putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(Array[Byte](1, 2, 3, 4, 5, 6, 0xEE.toByte, 0xEE.toByte))
    bb.put(Array[Byte](7, 8, 9, 10, 11, 12, 0xEE.toByte, 0xEE.toByte))
    val st = Multimodal.BmpCodec.decode(9L, bb.array())
    assert(st.width == 2L && st.height == 2L)
    assert(st.b_sum == (1 + 4 + 7 + 10).toLong)  // BGR: channel 0 is BLUE
    assert(st.g_sum == (2 + 5 + 8 + 11).toLong)  // pads excluded
    assert(st.r_sum == (3 + 6 + 9 + 12).toLong)
    // logical top row is the LAST stored row (7..12), not the first
    assert(st.top_row_sum == (7 + 8 + 9 + 10 + 11 + 12).toLong)
    // malformed containers fail loudly, never silently zero
    intercept[IllegalArgumentException] {
      Multimodal.BmpCodec.decode(0L, "XXnot-a-bmp".getBytes("US-ASCII"))
    }
  }

  test("every synthesized BMP round-trips through the real decoder") {
    val decoded = Multimodal.bmpDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    val row = decoded.filter($"doc_id" === 0).collect().head
    assert(row.getAs[Long]("width") == 5L && row.getAs[Long]("height") == 4L)
    // ASCII corpus: every channel byte < 0x80 → sums bounded by 20*127
    assert(row.getAs[Long]("b_sum") <= 20L * 127)
  }

  test("PNG codec decodes a REAL ImageIO-compressed PNG pixel-exactly") {
    // the JDK's own PNG encoder: genuine dynamic-huffman deflate and
    // encoder-chosen per-row filters — nothing like the fixture's
    // stored blocks, so this pins Inflater + unfilter on real input
    val (w, h) = (13, 7)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 101) % 256 << 16) |
        ((x * 7 + y * 13) % 256 << 8) | ((x * 193 + y * 29) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val (dw, dh, pix) = Multimodal.PngCodec.pixels(7L, bos.toByteArray)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(pix(base) == ((rgb >> 16) & 0xff), s"r at ($x,$y)")
      assert(pix(base + 1) == ((rgb >> 8) & 0xff), s"g at ($x,$y)")
      assert(pix(base + 2) == (rgb & 0xff), s"b at ($x,$y)")
    }
  }

  test("PNG codec unfilters ALL FIVE filter types under real deflate") {
    // hand-build a 4-wide, 5-tall RGB image, one row per filter type
    // (0..4), filter each row per the spec, compress with a real
    // Deflater, and require the decoder to reproduce every pixel
    val (w, h) = (4, 5)
    val stride = w * 3
    val px = Array.tabulate(h * stride)(i => (i * 89 + 23) % 256)
    def paeth(a: Int, b: Int, c: Int): Int = {
      val p = a + b - c
      val (pa, pb, pc) = (math.abs(p - a), math.abs(p - b), math.abs(p - c))
      if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
    }
    val scan = new java.io.ByteArrayOutputStream()
    for (y <- 0 until h) {
      val ft = y % 5
      scan.write(ft)
      for (i <- 0 until stride) {
        val x = px(y * stride + i)
        val a = if (i >= 3) px(y * stride + i - 3) else 0
        val b = if (y > 0) px((y - 1) * stride + i) else 0
        val c = if (i >= 3 && y > 0) px((y - 1) * stride + i - 3) else 0
        val enc = ft match {
          case 0 => x
          case 1 => (x - a) & 0xff
          case 2 => (x - b) & 0xff
          case 3 => (x - ((a + b) >> 1)) & 0xff
          case 4 => (x - paeth(a, b, c)) & 0xff
        }
        scan.write(enc)
      }
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(scan.toByteArray); deflater.finish()
    val comp = new Array[Byte](4096)
    val clen = deflater.deflate(comp)
    deflater.end()
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + data.length + 4)
      bb.putInt(data.length).put(typ.getBytes("US-ASCII")).put(data).putInt(0)
      bb.array()
    }
    val ihdr = java.nio.ByteBuffer.allocate(13).putInt(w).putInt(h)
      .put(8.toByte).put(2.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
      .array()
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", comp.take(clen)) ++
      chunk("IEND", Array.emptyByteArray)
    val (dw, dh, pix) = Multimodal.PngCodec.pixels(9L, png)
    assert(dw == w && dh == h)
    assert(pix.toSeq == px.toSeq)
  }

  test("every synthesized PNG round-trips through the real decoder") {
    val decoded = Multimodal.pngDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    val row = decoded.filter($"doc_id" === 0).collect().head
    assert(row.getAs[Long]("width") == 8L && row.getAs[Long]("height") == 8L)
    // ASCII corpus: channel sums bounded by 64 * 127
    assert(row.getAs[Long]("r_sum") <= 64L * 127)
  }

  test("general PNG encoder round-trips random rasters under every filter type") {
    // deterministic pseudo-random rasters (LCG — no Math.random in
    // tests either) across sizes, one lap per filter type; pixels
    // must survive encode → decode bit-exactly, and the wire bytes
    // must be REAL zlib (an independent Inflater accepts them)
    var seed = 0x2545F4914F6CDD1DL
    def nxt(): Int = { seed = seed * 6364136223846793005L + 1442695040888963407L; ((seed >>> 33) % 256).toInt }
    for (filter <- 0 to 4; (w, h) <- Seq((1, 1), (5, 3), (16, 16))) {
      val pix = Array.fill(w * h * 3)(nxt())
      val png = Multimodal.PngCodec.encode(w, h, pix, filter)
      val (dw, dh, out) = Multimodal.PngCodec.pixels(1L, png)
      assert(dw == w && dh == h, s"filter $filter ${w}x$h")
      assert(out.sameElements(pix), s"filter $filter ${w}x$h")
    }
  }

  test("general PNG encoder splits stored blocks at the 64 KiB DEFLATE cap") {
    // 150x150 RGB: scanline stream = 150*(451) = 67 650 bytes > 65535,
    // so the zlib body MUST carry two stored blocks (BFINAL only on
    // the last) — the single-block fixture never exercises this path
    val (w, h) = (150, 150)
    val pix = Array.tabulate(w * h * 3)(i => (i * 31 + 7) % 256)
    val png = Multimodal.PngCodec.encode(w, h, pix, 4)
    val (dw, dh, out) = Multimodal.PngCodec.pixels(2L, png)
    assert(dw == w && dh == h)
    assert(out.sameElements(pix))
    // count stored-block headers in the zlib body independently:
    // walk the stream like an inflater would
    val idatAt = png.indexOfSlice("IDAT".getBytes("US-ASCII"))
    val len = java.nio.ByteBuffer.wrap(png, idatAt - 4, 4).getInt
    val body = png.slice(idatAt + 4, idatAt + 4 + len)
    var p = 2 // skip zlib header
    var blocks = 0
    var fin = false
    while (!fin) {
      fin = (body(p) & 1) == 1
      val blen = (body(p + 1) & 0xff) | ((body(p + 2) & 0xff) << 8)
      val nlen = (body(p + 3) & 0xff) | ((body(p + 4) & 0xff) << 8)
      assert((blen ^ nlen) == 0xffff, "NLEN must be ones-complement of LEN")
      p += 5 + blen
      blocks += 1
    }
    assert(blocks == 2, s"expected 2 stored blocks, saw $blocks")
  }

  test("PNG round-trip query re-encodes with all five filters and matches the decode") {
    val a = Multimodal.pngDecode(spark, sf).collect().map(_.toString).sorted
    val b = Multimodal.pngRoundtrip(spark, sf).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }

  test("GIF LZW round-trips index streams across width growth, resets, and KwKwK") {
    var seed = 0x9E3779B97F4A7C15L
    def nxt(mod: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % mod).toInt
    }
    // KwKwK trigger: a run of one symbol makes the decoder meet the
    // code it is defining right now
    val kwkwk = Array.fill(64)(5)
    // width growth to 12 bits + a CLEAR reset: enough random symbols
    // that the dictionary passes 4096 entries
    val big = Array.fill(30000)(nxt(256))
    // low-entropy long input: dictionary grows by long chains
    val runs = Array.tabulate(8000)(i => (i / 97) % 7)
    for (ix <- Seq(kwkwk, big, runs, Array(0), Array.fill(3)(255))) {
      val dec = Multimodal.GifCodec.lzwDecode(9L,
        Multimodal.GifCodec.lzwEncode(ix), ix.length)
      assert(dec.sameElements(ix), s"n=${ix.length}")
    }
  }

  test("GIF encoder output decodes pixel-exactly through the JDK's own ImageIO") {
    // third-party cross-validation, direction 1: our LZW/framing must
    // be real GIF, not a private mirror dialect
    val (w, h) = (16, 12)
    var seed = 42L
    val ix = Array.fill(w * h) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 256).toInt
    }
    val gif = Multimodal.GifCodec.encode(w, h, ix, Multimodal.GifCodec.palette)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val c = ix(y * w + x)
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == c, s"r at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (255 - c), s"g at ($x,$y)")
      assert((rgb & 0xff) == (7 * c) % 256, s"b at ($x,$y)")
    }
  }

  test("GIF decoder reads a REAL ImageIO-written GIF pixel-exactly") {
    // direction 2: the JDK encoder chooses its own LZW emission
    // schedule, sub-block sizes, and extension blocks — nothing this
    // file wrote
    val (w, h) = (23, 9)
    val cm = {
      val r = new Array[Byte](256); val g = new Array[Byte](256)
      val b = new Array[Byte](256)
      for (i <- 0 until 256) {
        r(i) = i.toByte; g(i) = ((i * 3) % 256).toByte
        b(i) = ((i * 11) % 256).toByte
      }
      new java.awt.image.IndexColorModel(8, 256, r, g, b)
    }
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 31 + y * 57) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val (dw, dh, pix) = Multimodal.GifCodec.pixels(11L, bos.toByteArray)
    assert(dw == w && dh == h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val base = (y * w + x) * 3
      assert(pix(base) == ((rgb >> 16) & 0xff), s"r at ($x,$y)")
      assert(pix(base + 1) == ((rgb >> 8) & 0xff), s"g at ($x,$y)")
      assert(pix(base + 2) == (rgb & 0xff), s"b at ($x,$y)")
    }
  }

  test("GIF codec rejects malformed files loudly") {
    val ok = Multimodal.GifCodec.encodeFixture(1L, "hello world data")
    intercept[IllegalArgumentException] {
      Multimodal.GifCodec.pixels(1L, "NOTGIF".getBytes ++ ok.drop(6))
    }
    // truncated LZW payload: drop the tail (trailer + final blocks)
    intercept[IllegalArgumentException] {
      Multimodal.GifCodec.decode(1L, ok.dropRight(12) ++ Array[Byte](0, 0x3b))
    }
  }

  test("every synthesized GIF round-trips through the real decoder") {
    val decoded = Multimodal.gifDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    val row = decoded.filter($"doc_id" === 0).collect().head
    assert(row.getAs[Long]("width") == 16L && row.getAs[Long]("height") == 12L)
    // ASCII corpus: r channel = index < 128, so g = 255−ix > 127·192
    assert(row.getAs[Long]("g_sum") >= 192L * 128)
  }

  test("QOI codec round-trips a raster exercising ALL FIVE op kinds") {
    // 16x16 RGB raster scripted so every op family fires: a 69-pixel
    // run of one color (62 + 7 — forces the 62-cap run split), a DIFF step,
    // a LUMA step, an RGB literal jump, and a revisit of the first
    // color through the 64-slot INDEX.
    val w = 16; val h = 16
    val px = new Array[Int](w * h * 3)
    def set(i: Int, r: Int, g: Int, b: Int): Unit = {
      px(3 * i) = r; px(3 * i + 1) = g; px(3 * i + 2) = b
    }
    var i = 0
    while (i < 70) { set(i, 10, 20, 30); i += 1 } // RUN x2 (62 + 8)
    set(70, 11, 21, 31) // DIFF (+1,+1,+1)
    set(71, 21, 31, 38) // LUMA (dg=+10, dr-dg=0, db-dg=-3)
    set(72, 200, 5, 90) // RGB literal
    set(73, 10, 20, 30) // INDEX hit (seen at the run head)
    i = 74
    while (i < w * h) { set(i, 10, 20, 30); i += 1 } // trailing run
    val enc = Multimodal.QoiCodec.encode(w, h, px)
    assert(enc.length < px.length, "op compression actually happened")
    val ops = new Array[Long](5)
    val (dw, dh, out) = Multimodal.QoiCodec.pixels(1L, enc, ops)
    assert(dw == w && dh == h)
    assert(out.toSeq == px.toSeq)
    val Seq(rgb, index, diff, luma, run) = ops.toSeq
    assert(rgb >= 1 && index >= 1 && diff >= 1 && luma >= 1 && run >= 3,
      s"op mix not exercised: ${ops.toSeq}")
  }

  test("QOI codec round-trips random rasters across the op-mix spectrum") {
    // seeded PRNG sweeps the encoder's decision space: near-flat
    // rasters (runs + diffs), small-palette rasters (index hits),
    // and full-noise rasters (rgb/luma literals)
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 30) {
      val w = 1 + rnd.nextInt(24); val h = 1 + rnd.nextInt(24)
      val palette = trial % 3 match {
        case 0 => 2 + rnd.nextInt(3) // tiny palette: runs + index
        case 1 => 16 // small palette: index + diff/luma
        case _ => 0 // full noise: literals
      }
      val px = Array.fill(w * h * 3)(0)
      val colors = Array.fill(math.max(palette, 1) * 3)(rnd.nextInt(256))
      for (i <- 0 until w * h) {
        if (palette > 0) {
          val c = rnd.nextInt(palette)
          px(3 * i) = colors(3 * c); px(3 * i + 1) = colors(3 * c + 1)
          px(3 * i + 2) = colors(3 * c + 2)
        } else {
          px(3 * i) = rnd.nextInt(256); px(3 * i + 1) = rnd.nextInt(256)
          px(3 * i + 2) = rnd.nextInt(256)
        }
      }
      val enc = Multimodal.QoiCodec.encode(w, h, px)
      val (dw, dh, out) = Multimodal.QoiCodec.pixels(trial.toLong, enc)
      assert(dw == w && dh == h, s"trial $trial dims")
      assert(out.toSeq == px.toSeq, s"trial $trial ($w x $h, palette $palette)")
    }
  }

  test("QOI codec wraps deltas like qoi.c: 255->0 is a 1-byte DIFF, not a literal") {
    // seed (0,0,0) -> (255,255,255) wraps to (-1,-1,-1) and
    // (255,255,255) -> (0,0,0) wraps to (+1,+1,+1): a spec-correct
    // encoder emits two 1-byte DIFFs; an unwrapped one falls back to
    // 4-byte RGB literals
    val px = Array(255, 255, 255, 0, 0, 0)
    val enc = Multimodal.QoiCodec.encode(2, 1, px)
    val ops = new Array[Long](5)
    val (_, _, out) = Multimodal.QoiCodec.pixels(0L, enc, ops)
    assert(out.toSeq == px.toSeq)
    assert(ops(2) == 2 && ops(0) == 0,
      s"expected two DIFF ops and no literals, got mix ${ops.toSeq}")
  }

  test("QOI codec rejects malformed streams loudly") {
    val good = Multimodal.QoiCodec.encodeFixture(0L, "hello world")
    // bad magic
    val m = good.clone(); m(0) = 'x'.toByte
    intercept[IllegalArgumentException](Multimodal.QoiCodec.pixels(0L, m))
    // truncated stream
    intercept[IllegalArgumentException](
      Multimodal.QoiCodec.pixels(0L, good.take(good.length - 12)))
    // corrupt end marker
    val e = good.clone(); e(e.length - 1) = 0
    intercept[IllegalArgumentException](Multimodal.QoiCodec.pixels(0L, e))
  }

  test("JPEG entropy layer is lossless: decoded coefficients equal the fixture's") {
    // the lossy step in JPEG is quantization, which the fixture
    // bakes in — so Huffman encode → decode must return EXACTLY the
    // quantized zigzag values times the Annex-K table
    for (text <- Seq("hello world", "a", "The quick brown fox! 0123456789",
        new String(Array.tabulate(200)(i => (32 + (i * 31) % 95).toChar)))) {
      val v = Multimodal.JpegCodec.coefficients(text)
      val jpeg = Multimodal.JpegCodec.encodeFixture(1L, text)
      val (w, h, d, _) = Multimodal.JpegCodec.pixels(1L, jpeg)
      assert(w == 8 && h == 8)
      for (k <- 0 until 64) {
        val nat = Multimodal.JpegCodec.ZZ(k)
        assert(d(nat) == v(k).toLong * Multimodal.JpegCodec.QNat(nat),
          s"coef $k of '$text'")
      }
    }
  }

  test("JPEG encoder output decodes through the JDK's own ImageIO within IDCT tolerance") {
    // ImageIO's JPEG reader is an independent conforming decoder with
    // its own IDCT; the standard bounds IDCT error, not bit patterns,
    // so two conforming decoders may differ by ±1 gray level each —
    // tolerance 2. A Huffman/zigzag/dequantize bug would diverge by
    // tens of levels, so this pins the BITSTREAM against a foreign
    // implementation while the DuckDB oracle pins our IDCT exactly.
    for (text <- Seq("hello world", "zebra 42!", "\u007f" * 47,
        new String(Array.tabulate(577)(i => (32 + (i * 17) % 95).toChar)))) {
      val jpeg = Multimodal.JpegCodec.encodeFixture(2L, text)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(jpeg))
      assert(img != null, s"ImageIO rejected our JPEG for '$text'")
      assert(img.getWidth == 8 && img.getHeight == 8)
      val (_, _, _, pix) = Multimodal.JpegCodec.pixels(2L, jpeg)
      val raster = img.getRaster
      for (y <- 0 until 8; x <- 0 until 8) {
        val ours = pix(y * 8 + x)
        val theirs = raster.getSample(x, y, 0)
        assert(math.abs(ours - theirs) <= 2,
          s"pixel ($x,$y): ours=$ours imageio=$theirs for '$text'")
      }
    }
  }

  test("JPEG decoder rejects progressive and truncated streams loudly") {
    val good = Multimodal.JpegCodec.encodeFixture(3L, "hello world")
    // flip SOF0 (FFC0) to SOF2 (FFC2): progressive must be refused
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sof + 1) = 0xc2.toByte
    val e1 = intercept[IllegalArgumentException](
      Multimodal.JpegCodec.pixels(3L, prog))
    assert(e1.getMessage.contains("progressive"))
    // truncation inside the entropy segment
    intercept[IllegalArgumentException](
      Multimodal.JpegCodec.pixels(3L, good.take(good.length - 3)))
    // no SOI
    intercept[IllegalArgumentException](
      Multimodal.JpegCodec.pixels(3L, good.drop(2)))
  }

  test("every synthesized JPEG decodes under the driver-shaped run") {
    val decoded = Multimodal.jpegDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    // every block has 8x8 pixels in [0,255] and a plausible spread
    decoded.collect().foreach { r =>
      assert(r.getAs[Long]("width") == 8 && r.getAs[Long]("height") == 8)
      val (mn, mx) = (r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))
      assert(mn >= 0 && mx <= 255 && mn <= mx)
      assert(r.getAs[Long]("px_sum") >= mn * 64 && r.getAs[Long]("px_sum") <= mx * 64)
    }
  }

  test("Goertzel bin energies localize a pure tone to its own bin") {
    // a 16-sample tone at bin k must put essentially all its energy
    // in bin k's Goertzel output — the SPECTRAL property, beyond the
    // fixed-point parity the oracle pins
    for (k <- 1 to 3) {
      val fr = Array.tabulate[Short](16)(n =>
        math.round(20000.0 * math.cos(2 * math.Pi * k * n / 16)).toShort)
      val e = Multimodal.GoertzelC.map(c => Multimodal.goertzel(fr, c))
      for (j <- 0 until 3 if j != k - 1)
        assert(e(k - 1) > 100L * e(j),
          s"tone at bin $k leaked: energies ${e.toSeq}")
    }
    // silence has zero energy everywhere
    val zero = new Array[Short](16)
    assert(Multimodal.GoertzelC.forall(c => Multimodal.goertzel(zero, c) == 0L))
  }

  test("MJPEG clip stats are exactly the frame-by-frame fold of the JPEG codec") {
    // decode the container, then recompute every stat from the THREE
    // per-frame JPEGs directly — the container walk must add nothing
    // and lose nothing
    for (text <- Seq("hello world", "a", "The quick brown fox! 0123456789")) {
      val avi = Multimodal.AviCodec.encodeFixture(11L, text)
      val st = Multimodal.AviCodec.decode(11L, avi)
      assert(st.n_frames == 3 && st.width == 8 && st.height == 8)
      val frames = (0 until 3).map { f =>
        Multimodal.JpegCodec.pixels(11L, Multimodal.JpegCodec.encode(
          Multimodal.JpegCodec.frameCoefficients(text, f)))
      }
      assert(st.dc0_dequant == frames(0)._3(0))
      val pix = frames.map(_._4)
      assert(st.px_sum == pix.map(_.map(_.toLong).sum).sum)
      assert(st.px_min == pix.map(_.min).min.toLong)
      assert(st.px_max == pix.map(_.max).max.toLong)
      val motion = (1 until 3).map { f =>
        (0 until 64).map(i => math.abs(pix(f)(i) - pix(f - 1)(i)).toLong).sum
      }.sum
      assert(st.motion_abs == motion, s"motion for '$text'")
      // consecutive frames differ by construction (the rule shifts) —
      // except a length-1 text, where every shift reads the same byte
      if (text.length > 1) assert(motion > 0, s"frames identical for '$text'")
    }
  }

  private def fccIndex(a: Array[Byte], fcc: String, from: Int = 0): Int = {
    val p = fcc.getBytes("US-ASCII")
    (from to a.length - 4).find(i =>
      a(i) == p(0) && a(i + 1) == p(1) && a(i + 2) == p(2) && a(i + 3) == p(3)).get
  }

  test("MJPEG container frames decode through the JDK's own ImageIO") {
    // walk the '00dc' chunks with an independent in-test scan and
    // hand each payload to ImageIO — a foreign conforming decoder
    // must accept every frame the container carries
    val avi = Multimodal.AviCodec.encodeFixture(12L, "zebra 42!")
    def le32(p: Int): Int =
      (avi(p) & 0xff) | ((avi(p + 1) & 0xff) << 8) |
        ((avi(p + 2) & 0xff) << 16) | ((avi(p + 3) & 0xff) << 24)
    var p = fccIndex(avi, "movi") + 4
    var n = 0
    while (n < 3) {
      assert(new String(avi, p, 4, "US-ASCII") == "00dc")
      val len = le32(p + 4)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(avi, p + 8, len))
      assert(img != null && img.getWidth == 8 && img.getHeight == 8,
        s"ImageIO rejected frame $n")
      p += 8 + len + (len % 2)
      n += 1
    }
  }

  test("AVI container round-trips arbitrary frame counts, including odd-length frames") {
    // the fixture always writes 3 frames; the container itself must
    // hold for any count, and odd-length JPEG payloads must exercise
    // the RIFF even-padding path in both the writer and the walker
    val rnd = new scala.util.Random(17)
    var sawOdd = false
    for (_ <- 0 until 10) {
      val n = 1 + rnd.nextInt(4)
      val frames = (0 until n).map { _ =>
        val zz = Array.tabulate(64)(k =>
          if (k == 0) rnd.nextInt(120) - 60 else rnd.nextInt(7) - 3)
        Multimodal.JpegCodec.encode(zz)
      }
      sawOdd ||= frames.exists(_.length % 2 == 1)
      val st = Multimodal.AviCodec.decode(99L, Multimodal.AviCodec.encode(frames))
      assert(st.n_frames == n && st.width == 8 && st.height == 8)
      val pix = frames.map(fb => Multimodal.JpegCodec.pixels(99L, fb)._4)
      assert(st.px_sum == pix.map(_.map(_.toLong).sum).sum)
      val motion = (1 until n).map { f =>
        (0 until 64).map(i => math.abs(pix(f)(i) - pix(f - 1)(i)).toLong).sum
      }.sum
      assert(st.motion_abs == motion)
    }
    assert(sawOdd, "no trial produced an odd-length frame; pad path untested")
  }

  test("MJPEG decoder rejects structural inconsistencies loudly") {
    val good = Multimodal.AviCodec.encodeFixture(13L, "hello world")
    // stale idx1 offset: entry 0's dwChunkOffset at idx1+8 (header) +8
    val idx = good.clone()
    val e0 = fccIndex(idx, "idx1") + 8 + 8
    idx(e0) = (idx(e0) + 2).toByte
    val ex1 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decode(13L, idx))
    assert(ex1.getMessage.contains("idx1 entry 0 offset/size stale"))
    // avih frame count lies: dwTotalFrames at avih+8 (header) +16
    val cnt = good.clone()
    val t0 = fccIndex(cnt, "avih") + 8 + 16
    cnt(t0) = 2
    val ex2 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decode(13L, cnt))
    assert(ex2.getMessage.contains("frame count disagreement"))
    // a non-MJPG stream handler must be refused, not misdecoded
    val xvid = good.clone()
    val h0 = fccIndex(xvid, "strh") + 8 + 4
    "XVID".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => xvid(h0 + i) = b }
    val ex3 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decode(13L, xvid))
    assert(ex3.getMessage.contains("not vids/MJPG"))
  }

  test("A/V demux agrees with the video-only container and the direct PCM fold") {
    for (text <- Seq("hello world", "The quick brown fox! 0123456789")) {
      val av = Multimodal.AviCodec.decodeAv(21L,
        Multimodal.AviCodec.encodeAvFixture(21L, text))
      // video half: the SAME frames ride both containers, so the
      // two-stream demux must reproduce the single-stream stats
      val mj = Multimodal.AviCodec.decode(21L,
        Multimodal.AviCodec.encodeFixture(21L, text))
      assert(av.n_video_frames == 3 && av.n_audio_chunks == 3)
      assert(av.px_sum == mj.px_sum && av.motion_abs == mj.motion_abs)
      // audio half: recompute from the cycled text bytes directly
      val bytes = text.getBytes("US-ASCII")
      val pcm = Array.tabulate(3 * 16 * 2)(i => bytes(i % bytes.length))
      val smp = Array.tabulate(3 * 16)(i =>
        ((pcm(2 * i) & 0xff) | (pcm(2 * i + 1) << 8)).toShort)
      assert(av.pcm_abs_sum == smp.map(v => math.abs(v.toLong)).sum)
      val e2 = smp.grouped(16)
        .map(fr => Multimodal.goertzel(fr, Multimodal.GoertzelC(1))).sum
      assert(av.e2_total == e2)
    }
  }

  test("A/V demux rejects stream-declaration lies loudly") {
    val good = Multimodal.AviCodec.encodeAvFixture(22L, "hello world")
    // audio strf claims non-PCM: wFormatTag at strf payload offset 0.
    // the audio strf is the SECOND strf fourcc in the file
    val fmt = good.clone()
    val f2 = fccIndex(fmt, "strf", fccIndex(fmt, "strf") + 4) + 8
    fmt(f2) = 2
    val ex1 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decodeAv(22L, fmt))
    assert(ex1.getMessage.contains("not 16-bit mono PCM"))
    // avih lies about the stream count
    val sc = good.clone()
    val s0 = fccIndex(sc, "avih") + 8 + 24
    sc(s0) = 1
    val ex2 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decodeAv(22L, sc))
    assert(ex2.getMessage.contains("expected 2 streams"))
    // idx1 entry for an audio chunk claims the wrong ckid: entry 1
    // (the first '01wb') at idx1 payload offset 16
    val ck = good.clone()
    val e1 = fccIndex(ck, "idx1") + 8 + 16
    "00dc".getBytes("US-ASCII").zipWithIndex.foreach { case (b, i) => ck(e1 + i) = b }
    val ex3 = intercept[IllegalArgumentException](
      Multimodal.AviCodec.decodeAv(22L, ck))
    assert(ex3.getMessage.contains("ckid/flags wrong"))
  }

  test("every synthesized AVI decodes under the driver-shaped run") {
    val decoded = Multimodal.mjpegDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    decoded.collect().foreach { r =>
      assert(r.getAs[Long]("n_frames") == 3)
      val (mn, mx) = (r.getAs[Long]("px_min"), r.getAs[Long]("px_max"))
      assert(mn >= 0 && mx <= 255 && mn <= mx)
      assert(r.getAs[Long]("motion_abs") >= 0)
    }
  }

  test("FFT bins 0 and 8 are EXACT; every bin tracks the exact DFT; bins 1-3 cross-validate Goertzel") {
    val rnd = new scala.util.Random(7)
    val frames =
      // pure tones at every bin (three amplitudes) + pseudo-random
      (for (k <- 1 to 8; a <- Seq(300, 5000, 20000)) yield
        Array.tabulate[Short](16)(n =>
          math.round(a * math.cos(2 * math.Pi * k * n / 16)).toShort)) ++
        (0 until 50).map(_ => Array.fill[Short](16)(
          (rnd.nextInt(65536) - 32768).toShort))
    var maxRelDft = 0.0; var maxRelGz = 0.0
    for (fr <- frames) {
      val (re, im) = Multimodal.fft16(fr)
      // bins 0 and 8: the twiddles on their paths are exactly ±1/±i
      // (Q12 products shift out losslessly), so NO rounding happens
      assert(re(0) == fr.map(_.toLong).sum && im(0) == 0L)
      assert(re(8) == fr.zipWithIndex.map { case (v, n) =>
        if (n % 2 == 0) v.toLong else -v.toLong }.sum && im(8) == 0L)
      for (k <- 0 to 8) {
        val eFft = re(k) * re(k) + im(k) * im(k)
        // exact (double) DFT reference
        val xr = (0 until 16).map(n =>
          fr(n) * math.cos(2 * math.Pi * k * n / 16)).sum
        val xi = (0 until 16).map(n =>
          -fr(n) * math.sin(2 * math.Pi * k * n / 16)).sum
        val eTrue = xr * xr + xi * xi
        // error model: a ≤1-ulp floor error per twiddle shift walks
        // the STATE by O(stages), so the energy deviates by
        // O(err·|X|) = O(err·√e) — a √-scaled band, not a relative
        // one (weak bins carry the same absolute state error)
        val dev = math.abs(eFft - eTrue)
        assert(dev <= 128.0 * math.sqrt(eTrue) + 2e5,
          s"bin $k: fft=$eFft true=$eTrue frame=${fr.toSeq}")
        if (eTrue > 1e9) maxRelDft = math.max(maxRelDft, dev / eTrue)
        if (k >= 1 && k <= 3) {
          // the Goertzel twin: an INDEPENDENT fixed-point recursion
          // approximating the same |X_k|² — agreement within the two
          // kernels' combined rounding bound is the cross-validation
          // (bit-equality is impossible: different rounding paths)
          val eGz = Multimodal.goertzel(fr, Multimodal.GoertzelC(k - 1))
          val d2 = math.abs(eFft - eGz).toDouble
          // the resonator amplifies its per-step error by
          // ~1/sin(πk/8), so its band is wider than the FFT's
          assert(d2 <= 256.0 * math.sqrt(math.max(eFft, eGz).toDouble) + 2e5,
            s"bin $k: fft=$eFft goertzel=$eGz frame=${fr.toSeq}")
          if (eGz > 1e9) maxRelGz = math.max(maxRelGz, d2 / eGz)
        }
      }
    }
    // measured ceilings (documented so a kernel regression is loud):
    // the FFT stays within 0.1% of truth on live bins; the two
    // fixed-point paths agree within 0.5% (the resonator's wider
    // error band — measured max 0.30% on this fixture set)
    assert(maxRelDft < 1e-3, s"fft-vs-exact drifted: $maxRelDft")
    assert(maxRelGz < 5e-3, s"fft-vs-goertzel drifted: $maxRelGz")
  }

  test("FFT spectrum localizes a pure tone to its own bin, silence to zero") {
    for (k <- 1 to 8) {
      val fr = Array.tabulate[Short](16)(n =>
        math.round(20000.0 * math.cos(2 * math.Pi * k * n / 16)).toShort)
      val (re, im) = Multimodal.fft16(fr)
      val e = Array.tabulate(9)(j => re(j) * re(j) + im(j) * im(j))
      for (j <- 1 to 8 if j != k)
        assert(e(k) > 100L * e(j), s"tone at bin $k leaked: ${e.toSeq}")
    }
    val (zr, zi) = Multimodal.fft16(new Array[Short](16))
    assert(zr.forall(_ == 0L) && zi.forall(_ == 0L))
  }

  test("driver-shaped FFT run: dominant bins match Goertzel's verdict where comparable") {
    val rows = Multimodal.audioFft(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == n * 4)
    rows.foreach { r =>
      val es = (0 to 8).map(k => r.getAs[Long](s"e$k"))
      val dom = r.getAs[Long]("dom_bin"); val pm = r.getAs[Long]("peak_pm")
      assert(dom >= 1 && dom <= 8 && es(dom.toInt) == es.tail.max)
      val tot = es.tail.sum
      assert(pm == (if (tot == 0) 0L else es(dom.toInt) * 1000L / tot))
    }
  }

  test("motion search finds a planted shift exactly, with the scan-order tie-break") {
    // prev with distinct interior values; cur = prev displaced by
    // (dy, dx) under the SAME clamp rule → candidate (dy, dx) has
    // SAD 0 and must win
    val prev = Array.tabulate(64)(i => (i * 3 + 7) % 256)
    for (dy <- -2 to 2; dx <- -2 to 2) {
      val cur = Array.tabulate(64) { i =>
        val y = i / 8; val x = i % 8
        prev(math.max(0, math.min(7, y + dy)) * 8 +
          math.max(0, math.min(7, x + dx)))
      }
      assert(Multimodal.blockSad(cur, prev, dy, dx) == 0L)
      // recount the full candidate grid the query's loop scans: the
      // winner must carry SAD 0 (clamped borders can hand a zero to
      // more than one displacement; the scan then takes the first)
      val all = for (a <- -2 to 2; b <- -2 to 2)
        yield (Multimodal.blockSad(cur, prev, a, b), a, b)
      val win = all.minBy(t => (t._1, t._2, t._3))
      assert(win._1 == 0L)
      if (dy == 0 && dx == 0) {
        // no clamp ambiguity: the zero displacement is the UNIQUE zero
        assert(all.count(_._1 == 0L) == 1 && win == ((0L, 0, 0)))
      }
    }
    // constant frames: EVERY candidate ties at 0 — the deterministic
    // winner is the first in (dy, dx)-ascending scan order
    val flat = Array.fill(64)(128)
    val all = for (a <- -2 to 2; b <- -2 to 2)
      yield (Multimodal.blockSad(flat, flat, a, b), a, b)
    assert(all.forall(_._1 == 0L) && all.head == ((0L, -2, -2)))
  }

  test("driver-shaped motion-vector run: argmin beats zero baseline, recount agrees") {
    val rows = Multimodal.motionVectors(spark, sf).collect()
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == n * 2) // 2 consecutive pairs per 3-frame clip
    rows.foreach { r =>
      assert(r.getAs[Long]("sad_best") <= r.getAs[Long]("sad_zero"))
      val (dy, dx) = (r.getAs[Long]("best_dy"), r.getAs[Long]("best_dx"))
      assert(dy >= -2 && dy <= 2 && dx >= -2 && dx <= 2)
    }
    // independent recount for a handful of fixture clips
    for (text <- Seq("hello world", "The quick brown fox! 0123456789")) {
      val avi = Multimodal.AviCodec.encodeFixture(31L, text)
      val pix = Multimodal.AviCodec.videoFramePayloads(31L, avi)
        .map(fb => Multimodal.JpegCodec.pixels(31L, fb)._4)
      for (f <- 1 until pix.length) {
        val cands = for (a <- -2 to 2; b <- -2 to 2)
          yield (Multimodal.blockSad(pix(f), pix(f - 1), a, b), a, b)
        val best = cands.minBy(t => (t._1, t._2, t._3))
        // the lexicographic (sad, dy, dx) min IS the scan's
        // first-strict-win — the property the oracle's ORDER BY pins
        assert(best._1 <= cands.find(t => t._2 == 0 && t._3 == 0).get._1)
      }
    }
  }

  test("every synthesized QOI round-trips through the real decoder") {
    val decoded = Multimodal.qoiDecode(spark, sf)
    val n = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(decoded.count() == n)
    // channel sums must agree with the PNG fixture, which cycles the
    // SAME text into the SAME 8x8 raster through a different codec
    val png = Multimodal.pngDecode(spark, sf)
      .select("doc_id", "r_sum", "g_sum", "b_sum").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    decoded.select("doc_id", "r_sum", "g_sum", "b_sum").collect().foreach { r =>
      assert(png(r.getLong(0)) == ((r.getLong(1), r.getLong(2), r.getLong(3))))
    }
  }
}
