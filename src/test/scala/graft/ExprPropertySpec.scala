package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based parity pins for the native codegen'd expressions:
  * each runs against GENERATED adversarial input (combining marks,
  * astral code points, empty/degenerate strings) rather than the
  * ASCII corpus the example-based suites use. Sampling is
  * deterministically seeded — a failure reproduces, never flakes.
  *
  * Each property materializes ONE DataFrame of samples and evaluates
  * the native expression through Spark (codegen path), comparing
  * against an independent driver-side reference — so what's pinned
  * is the full engine pipeline (UTF8String round-trip included), not
  * the worker object in isolation.
  */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample stream: walk the seed chain so every run
    * sees the same inputs. */
  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Iterator.iterate(org.scalacheck.rng.Seed(seed))(_.next)
      .map(s => g.apply(Gen.Parameters.default, s))
      .collect { case Some(a) => a }
      .take(n).toSeq

  /** Code points weighted toward normalization-active material:
    * ASCII, combining marks (0300–036F), precomposed Latin-1
    * letters, kana, and astral emoji (surrogate-pair handling). */
  private val codePoint: Gen[Int] = Gen.frequency(
    5 -> Gen.choose(0x20, 0x7e),
    3 -> Gen.choose(0x300, 0x36f),
    2 -> Gen.choose(0xc0, 0xff),
    1 -> Gen.choose(0x3040, 0x30ff),
    1 -> Gen.choose(0x1f600, 0x1f64f))

  private val uniString: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, codePoint)).map { cps =>
      val sb = new java.lang.StringBuilder
      cps.foreach(sb.appendCodePoint)
      sb.toString
    }

  test("nfc_normalize equals JDK NFC on generated unicode (incl. astral + combining)") {
    val in = samples(uniString, 400, seed = 0xA11CE)
    val got = in.toDF("s")
      .select(col("s"), graft.plans.TextHashes.nfcNormalize(col("s")).as("n"))
      .as[(String, String)].collect()
    assert(got.length === in.length)
    got.foreach { case (s, n) =>
      val ref = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(n === ref, s"nfc mismatch for ${s.map(_.toInt)}")
      // idempotence — NFC output is itself normalized
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
    }
  }

  test("clean_word equals the regexp_replace(lower) spelling on generated unicode") {
    val in = samples(uniString, 400, seed = 0xC1EA4)
    val diff = in.toDF("s")
      .select(
        expr("clean_word(s)").as("native"),
        regexp_replace(lower(col("s")), "[^a-z0-9]", "").as("declared"))
      .filter(col("native") =!= col("declared"))
    assert(diff.count() === 0)
  }

  test("jaccard_long equals driver-side set Jaccard on generated hash sets") {
    val setGen: Gen[Seq[Long]] =
      Gen.chooseNum(0, 30).flatMap(n =>
        Gen.listOfN(n, Gen.chooseNum(0L, 50L))).map(_.distinct)
    val pairs = samples(Gen.zip(setGen, setGen), 300, seed = 0x7ACCA)
    val got = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        graft.plans.TextHashes.jaccardLong(col("a"), col("b")).as("j"))
      .as[(Seq[Long], Seq[Long], Double)].collect()
    got.foreach { case (a, b, j) =>
      val (sa, sb) = (a.toSet, b.toSet)
      val u = (sa union sb).size
      if (u == 0)
        // two empty sets: 0/0 — the expression yields NaN, exactly
        // like the oracle's i/(la+lb-i) spelling, and every >=t
        // threshold filter drops it; pinned so a "helpful" 0.0 or
        // 1.0 special case can't silently diverge from the oracle
        assert(j.isNaN, s"expected NaN for empty/empty, got $j")
      else
        assert(j === (sa intersect sb).size.toDouble / u,
          s"jaccard mismatch for $a / $b")
    }
  }

  test("jaro_winkler matches textbook values and holds range/symmetry/identity") {
    // the canonical literature examples, exact to the last ulp (the
    // same doubles DuckDB's built-in returns)
    val r = spark.sql(
      """SELECT jaro_winkler_similarity('martha', 'marhta') AS a,
        |  jaro_winkler_similarity('DWAYNE', 'DUANE') AS b,
        |  jaro_winkler_similarity('abc', 'abc') AS c,
        |  jaro_winkler_similarity('', 'abc') AS d,
        |  jaro_winkler_similarity('', '') AS e,
        |  jaro_winkler_similarity('xy', 'ab') AS f""".stripMargin).head()
    assert(r.getDouble(0) === 0.9611111111111111)
    assert(r.getDouble(1) === 0.8400000000000001)
    assert(r.getDouble(2) === 1.0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0) // DuckDB: empty/empty is 0, not 1
    assert(r.getDouble(5) === 0.0)
    // properties over generated pairs: range, symmetry, identity
    val strGen = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))).map(_.mkString)
    val pairs = samples(Gen.zip(strGen, strGen), 300, seed = 0x3A40)
    val got = pairs.toDF("a", "b")
      .select(
        graft.plans.TextHashes.jaroWinkler(col("a"), col("b")).as("ab"),
        graft.plans.TextHashes.jaroWinkler(col("b"), col("a")).as("ba"),
        graft.plans.TextHashes.jaroWinkler(col("a"), col("a")).as("aa"),
        length(col("a")).as("la"))
      .as[(Double, Double, Double, Int)].collect()
    got.foreach { case (ab, ba, aa, la) =>
      assert(ab >= 0.0 && ab <= 1.0)
      assert(ab === ba, "jaro_winkler must be symmetric")
      assert(aa === (if (la == 0) 0.0 else 1.0))
    }
  }

  test("poly_hash stays in [0, HashMod) and collides only on equal strings (sampled)") {
    val in = samples(uniString, 400, seed = 0x90175).distinct
    val got = in.toDF("s")
      .select(col("s"), Core.polyHash(col("s")).as("h"))
      .as[(String, Long)].collect()
    got.foreach { case (s, h) =>
      assert(h >= 0L && h < Core.HashMod, s"poly_hash out of range for $s")
    }
    // distinct inputs should (overwhelmingly) hash apart; a single
    // collision among 400 short strings under a 2^44-sized modulus
    // would be evidence of brokenness, not bad luck
    val distinctHashes = got.map(_._2).distinct.length
    assert(distinctHashes === got.length,
      "poly_hash collision among distinct sampled strings")
  }
}
