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
    val bb = java.nio.ByteBuffer.allocate(44 + 12 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + 12 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(44100).putInt(88200).putShort(2).putShort(16)
      .put("LIST".getBytes("US-ASCII")).putInt(4).put("INFO".getBytes("US-ASCII"))
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
}
