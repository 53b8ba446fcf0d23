package graft

import graft.operators.TrainingFilters

/** Semantics tests for the corpus-hygiene filters against a tiny
  * controlled corpus (written as `<dir>/documents.parquet`, like the
  * driver tables).
  */
class TrainingFiltersSpec extends SparkSpec {
  import spark.implicits._

  /** doc 0 (id % 97 == 0 → benchmark) is an 8-token eval question;
    * doc 1 quotes it verbatim inside extra context; doc 2 is clean;
    * doc 3 is a degenerate one-word loop; doc 4 is all-distinct. */
  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-tf").toString
    val bench = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (0L, bench, "en", "src0", bench.length.toLong),
      (1L, s"prefix $bench suffix words here", "en", "src1", 60L),
      (2L, "one two three four five six seven eight nine ten", "en", "src1", 50L),
      (3L, "spam spam spam spam spam spam spam spam", "en", "src2", 39L),
      (4L, "the quick brown fox jumps over a lazy dog today", "en", "src2", 47L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition profiles the degenerate loop and the distinct doc") {
    val rows = TrainingFilters.repetition(spark, dir)
      .select("doc_id", "n_tokens", "dup_tok_frac", "top_bigram_n", "top_bigram_frac")
      .as[(Long, Int, Double, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 3: 8 copies of one token → 7/8 repeated, "spam spam" × 7
    assert(rows(3L) == ((8, 0.875, 7L, 1.75)))
    // doc 4: 10 distinct tokens → nothing repeats, every bigram unique
    assert(rows(4L) == ((10, 0.0, 1L, 0.2)))
  }

  test("decontamination flags the verbatim quote and clears the clean doc") {
    val rows = TrainingFilters.decontaminate(spark, dir)
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toMap
    assert(rows(1L) >= 1L, "doc 1 embeds the benchmark 8-gram")
    assert(rows(2L) == 0L, "doc 2 shares no 8-gram with the benchmark")
    assert(!rows.contains(0L), "benchmark docs are not reported")
  }

  test("cross-doc shingle coverage flags only the quoted 8-gram") {
    val rows = TrainingFilters.crossdocNgrams(spark, dir)
      .select("doc_id", "n_shingles", "n_shared", "shared_frac")
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 0's single shingle is quoted verbatim inside doc 1
    assert(rows(0L) == ((1L, 1L, 1.0)))
    // doc 1: 12 tokens → 5 shingles, exactly one shared (the quote)
    assert(rows(1L) == ((5L, 1L, 0.2)))
    // intra-doc repetition (doc 3) is NOT cross-doc sharing
    assert(rows(2L)._2 == 0L && rows(3L)._2 == 0L && rows(4L)._2 == 0L)
  }

  test("winnowing guarantee: an 8-token shared run forces a shared fingerprint") {
    val rows = TrainingFilters.winnowing(spark, dir)
      .select("doc_id", "n_grams", "n_fps", "n_shared")
      .as[(Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 0 (8 tokens) appears verbatim inside doc 1; 8 tokens is
    // exactly WinK+WinW-1 — the winnowing guarantee threshold — so a
    // full selection window lies inside the shared run in BOTH docs
    // and its minimum is content-determined: they MUST share it
    assert(rows(0L)._3 >= 1L, s"doc 0 shares no fingerprint: $rows")
    assert(rows(1L)._3 >= 1L, s"doc 1 shares no fingerprint: $rows")
    // doc 2's vocabulary is disjoint from every other doc
    assert(rows(2L)._3 === 0L)
    // selection actually thins: the long doc keeps fewer
    // fingerprints than grams (density ~ 2/(WinW+1), never 1)
    assert(rows(1L)._2 < rows(1L)._1.toLong)
    // the degenerate one-word loop collapses to a single fingerprint
    assert(rows(3L)._2 === 1L)
  }

  test("winnowing pairs rank the long verbatim quote at containment 1.0") {
    // fresh corpus: doc 0 is a 16-token text quoted whole inside
    // doc 1; doc 2 is unrelated. 16 tokens ≥ 2 guarantee windows →
    // the pair clears the n_shared ≥ 2 reporting floor
    val d = java.nio.file.Files.createTempDirectory("graft-winpair").toString
    val quote = "alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu nu xi omicron pi"
    Seq(
      (0L, quote, "en", "s0", quote.length.toLong),
      (1L, s"intro words here $quote closing remarks", "en", "s1", 90L),
      (2L, "one two three four five six seven eight nine ten eleven twelve",
        "en", "s2", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = TrainingFilters.winnowingPairs(spark, d)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length === 1, rows.mkString(";")) // exactly the quote pair
    val (a, b, shared, overlap) = rows.head
    assert((a, b) === ((0L, 1L)))
    assert(shared >= 2L)
    // every fingerprint of the quoted doc reappears in the quoting
    // doc, so containment against the smaller side is exactly 1.0
    assert(overlap === 1.0)
  }

  test("unigram score ranks the common-token loop above the distinct doc") {
    val rows = TrainingFilters.unigramScore(spark, dir)
      .select("doc_id", "mean_freq").as[(Long, Double)].collect().toMap
    // 'spam' occurs 8× in the corpus, doc 4's words ~1–2× each
    assert(rows(3L) > rows(4L))
  }

  test("decontamination plans as equi-joins — no cartesian product") {
    val plan = TrainingFilters.decontaminate(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan.take(600))
    assert(!plan.contains("BroadcastNestedLoop"), plan.take(600))
  }

  test("lite stemming absorbs the planted inflections into one stem") {
    val rows = graft.operators.TextAnalysis.stemTop(spark, sf).collect()
    assert(rows.length == 20)
    // the planted -s/-ing/-ed variants of each doc's first token must
    // fold into the base stem — fan-in 4 (base + three inflections)
    assert(rows.exists(_.getAs[Long]("n_forms") >= 4),
      rows.map(r => (r.getString(0), r.getAs[Long]("n_forms"))).mkString(", "))
    // first-match-wins rule table on hand inputs, evaluated through
    // the public query path: one one-token doc per word, stem read back
    val pairs = Seq("misses" -> "miss", "studies" -> "study",
      "joining" -> "join", "joined" -> "join", "class" -> "class",
      "rows" -> "row", "go" -> "go")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-stem").toString
    pairs.map(_._1).zipWithIndex
      .map { case (w, i) => (i.toLong, w, "en", "s", w.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val stems = graft.operators.TextAnalysis.stemTop(spark, dir)
      .select("stem").as[String].collect().toSet
    pairs.foreach { case (_, expect) =>
      assert(stems.contains(expect), s"missing stem $expect in $stems")
    }
  }

  test("URL canonicalization strips every messiness class and accounts duplicates") {
    val rows = graft.operators.TrainingFilters.urlCanonicalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val u = r.getAs[String]("sample_url")
      // lowercase scheme+host, default port gone, fragment gone,
      // tracking params gone, the real param kept
      assert(u.startsWith("https://www."), u)
      assert(!u.contains(":443") && !u.contains("#"), u)
      assert(!u.contains("utm_") && !u.contains("ref=") && !u.contains("id="), u)
      assert(u.endsWith("?lang=en"), u)
      // scheme+host lowercase; the PATH stays case-preserved ("/Docs/")
      // because URL paths are case-sensitive per RFC 3986 — only the
      // authority is case-insensitive
      val hostEnd = u.indexOf('/', "https://".length)
      val authority = u.substring(0, hostEnd)
      assert(authority == authority.toLowerCase, u)
      assert(u.substring(hostEnd).contains("/Docs/"), u)
      // the plant collapses doc_id to doc_id % 7, so duplicates MUST
      // exist and the accounting must balance
      assert(r.getAs[Long]("n_urls") <= 7L, r.toString)
      assert(r.getAs[Long]("n_dup_docs") ==
        r.getAs[Long]("n_docs") - r.getAs[Long]("n_urls"), r.toString)
      assert(r.getAs[Long]("n_dup_docs") > 0, r.toString)
    }
    Core.releaseCaches()
  }

  test("Q20 integer log2 is exact on powers of two and monotone between them") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // q = 2^(30-b) encodes p = 2^-b: the fold must return EXACTLY
    // b·2^20 — the shift-and-square recurrence emits all-zero
    // fraction bits for a power of two
    val qs = (0 to 20).map(b => (b.toLong, 1L << (30 - b)))
    val rows = qs.toDF("b", "q")
      .select(col("b"), graft.operators.TrainingFilters.nllQ20(col("q")).as("nll"))
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("nll") == r.getAs[Long]("b") * 1048576L, r.toString)
    }
    // strictly between two powers the result is strictly between the
    // endpoints (monotonicity of the fold); q = 3·2^28 → −log2(3/4)
    val mid = Seq(3L << 28).toDF("q")
      .select(graft.operators.TrainingFilters.nllQ20(col("q")).as("nll"))
      .head().getAs[Long]("nll")
    // −log2(3/4) = 0.415037…; Q20 truncation of the 20-bit fold
    assert(mid > 0 && mid < 1048576L, mid.toString)
    assert(math.abs(mid / 1048576.0 - 0.4150375) < 2e-6, mid.toString)
  }

  test("held-out KN perplexity exercises the back-off and stays within the floor bound") {
    val rows = graft.operators.TrainingFilters.knPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    // the 2^-20 probability floor caps any trigram's cost at 20 bits
    rows.foreach { r =>
      val bits = r.getAs[Double]("bits_per_token")
      assert(bits > 0.0 && bits <= 20.0, r.toString)
      assert(r.getAs[Long]("nll_q20_total") <=
        r.getAs[Long]("n_scored") * 20L * 1048576L, r.toString)
      assert(r.getAs[Long]("n_unseen") <= r.getAs[Long]("n_scored"), r.toString)
    }
    // the whole point: unseen trigrams must exist and take the
    // back-off path, not vanish from scoring
    assert(rows.map(_.getAs[Long]("n_unseen")).sum > 0)
    Core.releaseCaches()
  }
}
