package graft

import graft.functions.Vectors
import graft.operators.TextAnalysis
import graft.plans.TextHashes
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity proofs for the native codegen'd signature expressions: each
  * must be observationally identical to the interpreted higher-order
  * spelling it replaced, on the real test corpus AND on adversarial
  * literals (empty / short / non-ASCII / null) — otherwise wiring
  * them into the dedup/ANN operators would silently change results
  * the DuckDB oracles pin down. */
class TextHashesSpec extends SparkSpec {

  private def docs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet")

  private def embs: DataFrame =
    spark.read.parquet(s"$sf/embeddings.parquet")

  /** Interpreted reference spelling of char-5-gram hashes (the exact
    * pipeline CharGramHashes replaced in Dedup.charShingled). */
  private def interpretedGrams(ctext: org.apache.spark.sql.Column) = {
    val codes = transform(split(ctext, ""), ch => ascii(ch).cast("long"))
    array_distinct(
      transform(sequence(lit(1), length(ctext) - 4), i =>
        element_at(codes, i) * lit(923521L) +
          element_at(codes, i + 1) * lit(29791L) +
          element_at(codes, i + 2) * lit(961L) +
          element_at(codes, i + 3) * lit(31L) +
          element_at(codes, i + 4)))
  }

  test("char_gram_hashes equals the interpreted spelling on the corpus") {
    val base = docs
      .withColumn("ctext", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .filter(length(col("ctext")) >= 5)
    val diff = base
      .withColumn("native", TextHashes.charGramHashes(col("ctext")))
      .withColumn("interp", interpretedGrams(col("ctext")))
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("char_gram_hashes edge cases: short input and empty set") {
    val rows = spark.sql(
      """SELECT char_gram_hashes('') AS a, char_gram_hashes('abcd') AS b,
        |  char_gram_hashes('abcde') AS c, char_gram_hashes('aaaaaa') AS d,
        |  char_gram_hashes(CAST(NULL AS STRING)) AS n""".stripMargin).head()
    assert(rows.getSeq[Long](0).isEmpty)  // len < 5 → no grams
    assert(rows.getSeq[Long](1).isEmpty)
    assert(rows.getSeq[Long](2).length === 1)
    // 'aaaaaa' has two positions but ONE distinct gram
    assert(rows.getSeq[Long](3).length === 1)
    assert(rows.isNullAt(4)) // null-safe eval
  }

  /** Interpreted reference spelling of the FastSS deletion
    * neighborhood (self hash ∪ hash of every one-char deletion, the
    * exact pipeline DeletionHashes replaced in Dedup.fuzzyNames). */
  private def interpretedDeletions(c: org.apache.spark.sql.Column) =
    array_union(
      array(graft.Core.polyHashFold(c)),
      transform(sequence(lit(1), length(c)), i =>
        graft.Core.polyHashFold(concat(
          c.substr(lit(1), i - 1), c.substr(i + 1, length(c))))))

  test("deletion_hashes equals the interpreted substr+fold spelling") {
    val diff = spark.read.parquet(s"$sf/customer.parquet")
      .withColumn("native", TextHashes.deletionHashes(col("c_name")))
      .withColumn("interp", interpretedDeletions(col("c_name")))
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  /** Interpreted D≤2 spelling: D≤1 ∪ every (i < j) double deletion
    * via substr splicing. Valid for length ≥ 2 (sequence() would
    * descend for shorter inputs). */
  private def interpretedDeletions2(c: org.apache.spark.sql.Column) =
    array_union(
      interpretedDeletions(c),
      array_distinct(flatten(transform(sequence(lit(1), length(c) - 1), i =>
        transform(sequence(i + 1, length(c)), j =>
          graft.Core.polyHashFold(concat(
            c.substr(lit(1), i - 1),
            c.substr(i + 1, j - i - 1),
            c.substr(j + 1, length(c)))))))))

  test("deletion_hashes2 equals the interpreted double-deletion spelling") {
    val diff = spark.read.parquet(s"$sf/customer.parquet")
      .filter(length(col("c_name")) >= 2)
      .withColumn("native", TextHashes.deletionHashes2(col("c_name")))
      .withColumn("interp", interpretedDeletions2(col("c_name")))
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("deletion_hashes2 edge cases: sizes and containment of D<=1") {
    val rows = spark.sql(
      """SELECT deletion_hashes2('') AS a, deletion_hashes2('x') AS b,
        |  deletion_hashes2('abc') AS c, deletion_hashes('abc') AS c1,
        |  deletion_hashes2(CAST(NULL AS STRING)) AS n""".stripMargin).head()
    assert(rows.getSeq[Long](0) == Seq(0L))
    assert(rows.getSeq[Long](1).length === 2) // self + empty
    // 'abc': 1 self + 3 singles + 3 doubles, all distinct hashes
    assert(rows.getSeq[Long](2).length === 7)
    // D<=1 is a prefix of D<=2 (same first-occurrence order)
    assert(rows.getSeq[Long](2).take(4) == rows.getSeq[Long](3))
    assert(rows.isNullAt(4))
  }

  test("deletion_hashes edge cases: empty, single char, repeats, null") {
    val rows = spark.sql(
      """SELECT deletion_hashes('') AS a, deletion_hashes('x') AS b,
        |  deletion_hashes('aa') AS c, deletion_hashes('café') AS d,
        |  deletion_hashes(CAST(NULL AS STRING)) AS n""".stripMargin).head()
    assert(rows.getSeq[Long](0) == Seq(0L)) // only the self hash
    // 'x': self plus the one deletion (the empty string, hash 0)
    assert(rows.getSeq[Long](1).length === 2 && rows.getSeq[Long](1)(1) === 0L)
    // 'aa': both deletions give 'a' — deduped to [hash(aa), hash(a)]
    assert(rows.getSeq[Long](2).length === 2)
    assert(rows.getSeq[Long](3).length === 5) // non-ASCII: 4 code points
    assert(rows.isNullAt(4))
  }

  /** Interpreted 48-bit SimHash twin built from the same primitives
    * the 30-bit operator fold used, widened with the Knuth mix —
    * independent spelling of SimHash48Util's arithmetic. Bit
    * extraction uses `shiftright` (exact integer ops): a double
    * `floor(hv / 2^b)` would lose low bits for hv ≥ 2^53. */
  private def interpretedSimhash(toks: org.apache.spark.sql.Column) = {
    val bits = graft.plans.SimHash48Util.Bits
    val mix = (h: org.apache.spark.sql.Column) =>
      h + ((h * lit(2654435761L)) % lit(Core.HashMod)) * lit(1L << 30)
    val votesOf = (hv: org.apache.spark.sql.Column) =>
      array((0 until bits).map(b =>
        pmod(shiftright(hv, b), lit(2L)) * 2 - 1): _*)
    val sums = aggregate(
      transform(toks, tk => mix(Core.polyHash(tk))),
      array_repeat(lit(0L), bits),
      (acc, hv) => zip_with(acc, votesOf(hv), (a, x) => a + x))
    (0 until bits).map { b =>
      when(element_at(sums, b + 1) > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  test("simhash48 equals an independent interpreted spelling on the corpus") {
    val diff = docs
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .withColumn("native", TextHashes.simhash48(col("t")))
      .withColumn("interp", interpretedSimhash(col("t")))
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("simhash48 edge cases: empty token array is fingerprint 0; 48-bit range") {
    val r = spark.sql(
      """SELECT simhash48(CAST(array() AS ARRAY<STRING>)) AS z,
        |  simhash48(array('the','quick','brown','fox')) AS f""".stripMargin).head()
    assert(r.getLong(0) === 0L)
    val fp = r.getLong(1)
    assert(fp >= 0L && fp < (1L << graft.plans.SimHash48Util.Bits))
  }

  test("hyperplane_buckets equals the interpreted per-table fold on the corpus") {
    val e = embs.withColumn("embd", Vectors.toD(col("embedding")))
    val interp = array((0 until Vectors.Tables).map(t =>
      Vectors.bucket(col("embd"), t)): _*)
    val diff = e
      .withColumn("native", Vectors.lshBuckets(col("embd")))
      .withColumn("interp", interp)
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("minhash_sigs equals the interpreted per-seed array_min fold") {
    val seeds = Seq(43L, 47L, 53L, 59L, 61L, 67L, 71L, 73L)
    val P = Core.HashMod
    val sets = docs
      .withColumn("ctext", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .filter(length(col("ctext")) >= 5)
      .withColumn("sh", TextHashes.charGramHashes(col("ctext")))
    val interp = array(seeds.indices.map { i =>
      array_min(transform(col("sh"), h => (lit(seeds(i)) * h + lit(i + 1)) % lit(P)))
    }: _*)
    val diff = sets
      .withColumn("native", TextHashes.minhashSigs(col("sh"), typedlit(seeds)))
      .withColumn("interp", interp)
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("poly_hash equals the interpreted split+ascii fold (incl. non-ASCII)") {
    import spark.implicits._
    val edge = Seq("", "a", "007", "it’s café — naïve", "héllo € 😀 wörld")
      .toDF("text")
    val corpus = docs.select(col("text")).union(edge)
    val diff = corpus
      .withColumn("native", TextHashes.polyHash(col("text")))
      .withColumn("interp", Core.polyHashFold(col("text")))
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("jaccard_long equals the interpreted array_intersect spelling") {
    val sets = docs
      .withColumn("ctext", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
      .filter(length(col("ctext")) >= 5)
      .withColumn("sh", TextHashes.charGramHashes(col("ctext")))
      .select("doc_id", "sh")
      .limit(60)
    val a = sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val diff = a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("native", TextHashes.jaccardLong(col("sh_a"), col("sh_b")))
      .withColumn("interp",
        inter.cast("double") / (size(col("sh_a")) + size(col("sh_b")) - inter))
      // bit-exact: same intersection count, same double division
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("dot_double is bit-identical to the interpreted sequential fold") {
    val e = embs.withColumn("embd", Vectors.toD(col("embedding")))
    val q = e.select(col("embd").as("qv")).limit(1)
    val diff = e.crossJoin(broadcast(q))
      .withColumn("native", TextHashes.dotDouble(col("embd"), col("qv")))
      .withColumn("interp", Vectors.dotdFold(col("embd"), col("qv")))
      // exact equality — same IEEE op sequence, not approximate
      .filter(col("native") =!= col("interp"))
    assert(diff.count() === 0)
  }

  test("hyperplane bucket ids stay within 2^BitsPerTable") {
    val e = embs.withColumn("embd", Vectors.toD(col("embedding")))
    val bad = e
      .select(explode(Vectors.lshBuckets(col("embd"))).as("b"))
      .filter(col("b") < 0 || col("b") >= (1L << Vectors.BitsPerTable))
    assert(bad.count() === 0)
  }

  test("nfc_normalize composes decomposed sequences and fast-paths NFC text") {
    // the decomposed sequence rides a Scala-level \u escape straight
    // into the SQL text (Spark SQL's chr() is ASCII-modulo, unusable
    // for a combining mark)
    val r = spark.sql(
      "SELECT nfc_normalize('caf' || 'e\u0301') AS composed, " +
        "nfc_normalize('plain ascii') AS ascii, " +
        "nfc_normalize('') AS empty, " +
        "nfc_normalize(CAST(NULL AS STRING)) AS n").head()
    assert(r.getString(0) === "caf\u00e9") // e + U+0301 -> U+00E9
    assert(r.getString(0).length === 4)          // genuinely composed
    assert(r.getString(1) === "plain ascii")     // identity on NFC input
    assert(r.getString(2) === "")
    assert(r.isNullAt(3))                        // null propagates
    // idempotence: already-composed input is untouched
    val again = spark.sql("SELECT nfc_normalize(nfc_normalize('e\u0301'))").head()
    assert(again.getString(0) === "\u00e9")
  }
}
