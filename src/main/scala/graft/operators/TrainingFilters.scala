package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-hygiene operators a large-scale LLM training-data pipeline
  * runs between raw ingest and tokenization (north star; SURVEY §2b
  * last row) — beyond dedup/similarity, the published filter suites
  * add repetition screens, benchmark decontamination, and
  * frequency-based LM scoring:
  *
  *  - [[repetition]]: per-document repetition metrics in the style of
  *    the Gopher/MassiveText quality rules (fraction of repeated
  *    tokens, coverage of the single most frequent bigram). Docs that
  *    loop the same phrase score high and get filtered before
  *    training.
  *  - [[decontaminate]]: n-gram–overlap decontamination — flag corpus
  *    documents sharing a token shingle with a benchmark/eval set so
  *    test data never leaks into training data. The real-world width
  *    is ~13 tokens; 8 here, matched to the driver's short synthetic
  *    docs. Same hash-set + equi-join shape either way.
  *  - [[unigramScore]]: mean corpus frequency of a document's tokens
  *    under the corpus's own unigram model — the cheap stand-in for
  *    LM perplexity filtering. Rare-gibberish docs score near 0,
  *    boilerplate scores high; both tails are filter candidates.
  *
  * Scale notes (100 TB):
  *  - repetition: fully map-side — `array_sort` of the per-doc bigram
  *    array + an `aggregate` fold over the longest equal-run (≡ the
  *    max per-bigram count), linear in tokens per doc with NO
  *    aggregation exchange; the only shuffle is the ordered output's
  *    range partition.
  *  - decontamination: the benchmark shingle set is tiny next to the
  *    corpus (AQE broadcasts it); the corpus side ships only 8-byte
  *    shingle hashes per (doc, shingle) — document text never crosses
  *    an exchange. With a huge benchmark it degrades gracefully to a
  *    shuffle equi-join on the hash.
  *  - unigram score: token stream collapses to per-doc term counts
  *    FIRST (map-side partial agg), so the vocab aggregation and the
  *    model join both run over doc×distinct-term rows, not raw
  *    tokens; the (term, count) model table is vocab-sized.
  *
  * All scores are exact integer counts plus one final double
  * division, so the DuckDB oracles reproduce them bit-for-bit.
  */
object TrainingFilters {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private val P = HashMod
  private val M = Dedup.ShingleMix

  // -------------------------------------------------------------------
  // Repetition metrics (Gopher-style quality screens)
  // -------------------------------------------------------------------

  /** Per-document repetition profile over docs with ≥ 2 tokens:
    * `dup_tok_frac` = fraction of token occurrences that repeat an
    * earlier token, `top_bigram_n` / `top_bigram_frac` = count of the
    * most frequent word bigram and the fraction of tokens it covers. */
  def repetition(s: SparkSession, d: String): DataFrame = {
    val t = docs(s, d)
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 2)
      .select(col("doc_id"), col("t"), size(col("t")).as("n_tokens"),
        size(array_distinct(col("t"))).as("n_distinct"))
    // top_bigram_n is a PER-DOCUMENT statistic, so it never needs an
    // exchange (r18, guide §2.4): sort the doc's bigram array and take
    // the longest run of equal adjacent elements — exactly
    // max(count per bigram), the same integer the former
    // explode → groupBy(doc_id, bigram) → max(c) rollup shuffled
    // ~|tokens| rows to compute. Tokens are non-empty by construction
    // (TextAnalysis.tokens filters ""), so no bigram can collide with
    // the fold's "" seed. The whole profile is now map-side; the only
    // exchange left is the ordered output's range partition.
    val bigrams = array_sort(
      transform(sequence(lit(1), col("n_tokens") - 1), g =>
        concat_ws(" ", element_at(col("t"), g), element_at(col("t"), g + 1))))
    val topRun = aggregate(
      bigrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (st, x) => {
        val run = when(x === st.getField("prev"), st.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))
    t.withColumn("top_bigram_n", topRun)
      .select(
        col("doc_id"), col("n_tokens"),
        ((col("n_tokens") - col("n_distinct")).cast("double") / col("n_tokens"))
          .as("dup_tok_frac"),
        col("top_bigram_n"),
        ((col("top_bigram_n") * 2).cast("double") / col("n_tokens"))
          .as("top_bigram_frac"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // Benchmark decontamination (token-shingle overlap)
  // -------------------------------------------------------------------

  private val W = 8 // shingle width in tokens

  /** doc_id + distinct W-token shingle hash set (docs with ≥ W
    * tokens). Tokens are polyhashed once; a shingle hash folds the W
    * token hashes (`acc·8191 + h mod P` — every intermediate < 2^44),
    * so shingling is O(tokens·W) integer ops with no string building. */
  private def tokenShingles(docFrame: DataFrame): DataFrame =
    docFrame
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= W)
      .withColumn("th", transform(col("t"), tk => polyHash(tk)))
      .select(col("doc_id"), array_distinct(
        transform(sequence(lit(1), size(col("th")) - (W - 1)), g =>
          aggregate(slice(col("th"), g, lit(W)), lit(0L),
            (acc, x) => (acc * M + x) % P))).as("sh"))

  /** Benchmark contamination report: for every corpus document (the
    * pretend eval set is `doc_id % 97 = 0`), how many of its distinct
    * W-token shingles also occur in the benchmark. `contam_frac` near
    * 1 means the doc IS benchmark material (a leaked copy); any
    * n_hits > 0 is a span-level leak worth excluding. */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    // persisted: the shingle projection feeds the benchmark set, the
    // per-doc totals, and the hit counts
    val sets = cached(tokenShingles(docs(s, d)))
    val bench = sets.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("s")).distinct()
    val corpus = sets.filter(col("doc_id") % 97 =!= 0)
    val hits = corpus
      .select(col("doc_id"), explode(col("sh")).as("s"))
      .join(bench, Seq("s"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    corpus
      .select(col("doc_id"), size(col("sh")).as("n_shingles"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles"))
          .as("contam_frac"))
      .orderBy("doc_id")
  }

  /** Cross-document repeated-shingle coverage — the boilerplate
    * signal: for each document, the fraction of its distinct W-token
    * shingles that occur in at least one OTHER document. Headers,
    * footers, license blocks, and templated text share long token
    * spans across many docs; a high shared_frac flags a doc as mostly
    * boilerplate even when no single pairwise near-dup fires (each
    * sharing partner can contribute a different span). Complements
    * [[repetition]] (intra-doc) and [[decontaminate]] (corpus vs
    * benchmark): this is corpus vs itself.
    *
    * Scale: shingles are distinct per doc, so after the explode the
    * per-hash row count IS the containing-doc count — one
    * partial-aggregated shuffle keyed by shingle hash, one hash-keyed
    * join back (no document text moves), one doc-keyed rollup.
    * Ubiquitous boilerplate shingles fan back out only to their
    * containing docs, never all-pairs. */
  def crossdocNgrams(s: SparkSession, d: String): DataFrame = {
    // persisted: the shingle projection feeds both the doc-count
    // aggregation and the join probe side
    val sets = cached(tokenShingles(docs(s, d)))
    val exploded = sets.select(col("doc_id"), explode(col("sh")).as("h"))
    val ndocs = exploded.groupBy("h").agg(count(lit(1)).as("ndocs"))
    exploded.join(ndocs, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles")).as("shared_frac"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS scheme)
  // -------------------------------------------------------------------

  private val WinK = 4 // winnowing gram width in tokens
  private val WinW = 5 // winnowing window: grams per selection window

  /** Winnowing fingerprint report — the MOSS document-fingerprint
    * scheme: hash every [[WinK]]-token gram, slide a [[WinW]]-gram
    * window, keep each window's MINIMUM gram hash. The selection
    * GUARANTEE (the reason winnowing beats "every j-th gram"
    * sampling): any token run of ≥ WinK+WinW−1 tokens shared by two
    * documents spans a full window in both, and the window's minimum
    * is a property of the shared content alone — so the two documents
    * MUST share that fingerprint. Density is ~2/(WinW+1) of grams
    * instead of all of them; the guarantee is spec-pinned on planted
    * near-dup docs and the report carries the measured density.
    *
    * Per doc: n_grams, selected fingerprints (distinct), and how many
    * of them occur in ≥ 2 documents (the cross-doc overlap signal a
    * plagiarism/boilerplate pass reads). Scale: gram hashing and
    * window minima are map-side array folds (no string building —
    * token hashes fold in integers exactly like [[tokenShingles]]);
    * the only shuffles carry (fingerprint) and (doc_id) keys. Ties in
    * a window pick the same hash VALUE regardless of position, so the
    * distinct fingerprint set is position-independent — no
    * rightmost-tie bookkeeping is needed for set semantics. */
  /** (doc_id, n_grams, fps): each doc's winnowing-selected distinct
    * fingerprint set — shared by the per-doc report, the pair report,
    * and the streaming index maintainer (which computes it per
    * micro-batch; the selection is a pure per-row function, so the
    * per-batch sets equal the batch-computed ones row for row). */
  private[graft] def winnowFpsOf(docFrame: DataFrame): DataFrame =
    docFrame
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= WinK + WinW - 1)
      .withColumn("th", transform(col("t"), tk => polyHash(tk)))
      .withColumn("g",
        transform(sequence(lit(1), size(col("th")) - (WinK - 1)), i =>
          aggregate(slice(col("th"), i, lit(WinK)), lit(0L),
            (acc, x) => (acc * M + x) % P)))
      .select(col("doc_id"), size(col("g")).as("n_grams"),
        array_distinct(
          transform(sequence(lit(1), size(col("g")) - (WinW - 1)), j =>
            array_min(slice(col("g"), j, lit(WinW))))).as("fps"))

  private def winnowFps(s: SparkSession, d: String): DataFrame =
    winnowFpsOf(docs(s, d))

  def winnowing(s: SparkSession, d: String): DataFrame = {
    val f = cached(winnowFps(s, d))
    val e = f.select(col("doc_id"), col("n_grams"), explode(col("fps")).as("h"))
    val nd = e.groupBy("h").agg(count(lit(1)).as("ndocs"))
    e.join(nd, "h")
      .groupBy("doc_id")
      .agg(max("n_grams").as("n_grams"), count(lit(1)).as("n_fps"),
        sum(when(col("ndocs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"), col("n_grams"), col("n_fps"), col("n_shared"),
        (col("n_fps").cast("double") / col("n_grams")).as("fp_density"))
      .orderBy("doc_id")
  }

  /** Fingerprints occurring in more documents than this are
    * boilerplate, not plagiarism signal — they are dropped BEFORE
    * pairing (MOSS's standard guard, and the scale guard: a
    * fingerprint shared by a million documents would otherwise fan
    * out into 10¹² pairs). */
  private val WinMaxDf = 50

  /** The winnowing PAIR report — what a MOSS-style overlap pass
    * actually outputs: document pairs ranked by shared selected
    * fingerprints, with `overlap` = shared / min(|fps_a|, |fps_b|)
    * (the containment-style score that still fires when a small doc
    * is quoted inside a large one). Pairs form ONLY through the
    * fingerprint equi-join on docs sharing a selected hash — never
    * all-pairs — and ultra-common fingerprints are excluded by
    * [[WinMaxDf]] before the join, so per-fingerprint fan-out is
    * bounded. Shuffles carry (fingerprint) then (pair) keys; the
    * score is exact integers + one double division. */
  /** The pair derivation over ANY (doc_id, h) fingerprint index plus
    * a (doc_id, nf) size table — shared by the batch report and the
    * streaming index maintainer, so "pairs from the maintained index"
    * and "pairs from a batch scan" are literally the same plan. The
    * df-cap is applied HERE, at pairing time, because a fingerprint's
    * document frequency is a corpus-level property that an
    * append-only per-doc index cannot finalize early. */
  private[graft] def winnowPairReport(
      index: DataFrame, sizes: DataFrame): DataFrame = {
    val e = cached(index)
    val rare = e.groupBy("h").agg(count(lit(1)).as("ndocs"))
      .filter(col("ndocs") <= WinMaxDf).select("h")
    // select explicitly: the semi join reorders columns key-first
    val ee = e.join(rare, Seq("h"), "left_semi").select("doc_id", "h")
    val pairs = ee.toDF("a", "h").join(ee.toDF("b", "h"), "h")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 2)
    pairs
      .join(sizes.toDF("a", "nfa"), "a")
      .join(sizes.toDF("b", "nfb"), "b")
      .select(col("a").as("doc_a"), col("b").as("doc_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          least(col("nfa"), col("nfb"))).as("overlap"))
      .orderBy("doc_a", "doc_b")
  }

  def winnowingPairs(s: SparkSession, d: String): DataFrame = {
    val f = cached(winnowFps(s, d))
    winnowPairReport(
      f.select(col("doc_id"), explode(col("fps")).as("h")),
      f.select(col("doc_id"), size(col("fps")).as("nf")))
  }

  /** The pair-report oracle — shared verbatim by the batch query and
    * the streaming index maintainer (`stream_winnowing_pairs`): the
    * maintained index is row-for-row the batch-scanned one, so one
    * SQL is the truth for both. */
  private[graft] lazy val oWinnowPairsSql: String =
    s"""WITH t AS (SELECT doc_id, $oTok AS tok FROM documents),
       |th AS (SELECT doc_id, list_transform(tok, s -> ${oPolyHash("s")}) AS th
       |       FROM t WHERE len(tok) >= ${WinK + WinW - 1}),
       |g AS (SELECT doc_id, list_transform(generate_series(1, len(th) - ${WinK - 1}),
       |       i -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+${WinK - 1}]),
       |            (a, b) -> (a * $M + b) % $P)) AS g FROM th),
       |f AS MATERIALIZED (SELECT doc_id,
       |       list_distinct(list_transform(generate_series(1, len(g) - ${WinW - 1}),
       |        j -> list_min(g[j:j+${WinW - 1}]))) AS fps FROM g),
       |e AS (SELECT doc_id, unnest(fps) AS h FROM f),
       |rare AS (SELECT h FROM e GROUP BY h HAVING COUNT(*) <= $WinMaxDf),
       |ee AS MATERIALIZED (SELECT doc_id, h FROM e JOIN rare USING (h)),
       |p AS (SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, COUNT(*) AS n_shared
       |      FROM ee x JOIN ee y ON x.h = y.h AND x.doc_id < y.doc_id
       |      GROUP BY x.doc_id, y.doc_id HAVING COUNT(*) >= 2),
       |sz AS (SELECT doc_id, len(fps) AS nf FROM f)
       |SELECT doc_a, doc_b, n_shared,
       |  CAST(n_shared AS DOUBLE) / LEAST(sa.nf, sb.nf) AS overlap
       |FROM p JOIN sz sa ON sa.doc_id = doc_a JOIN sz sb ON sb.doc_id = doc_b
       |ORDER BY doc_a, doc_b""".stripMargin

  // -------------------------------------------------------------------
  // Unigram-model frequency scoring (perplexity stand-in)
  // -------------------------------------------------------------------

  /** Mean corpus frequency of each document's tokens: with C(w) the
    * corpus count of word w and T the total token count, score(doc) =
    * (Σ_tokens C(w)) / (n_tokens · T) — exact integers until the one
    * final division. Equals the average unigram probability of the
    * doc's tokens under the corpus's own unigram LM. */
  def unigramScore(s: SparkSession, d: String): DataFrame = {
    // collapse to per-doc term counts before anything wide — persisted
    // because the unigram model, the total, and the scoring join all
    // read it
    val tfc = cached(
      docs(s, d)
        .withColumn("t", TextAnalysis.tokens(col("text")))
        .select(col("doc_id"), explode(col("t")).as("word"))
        .groupBy("doc_id", "word").agg(count(lit(1)).as("tf")))
    val wc = tfc.groupBy("word").agg(sum("tf").as("wcount"))
    val total = tfc.agg(sum("tf").as("total"))
    tfc.join(wc, "word")
      .groupBy("doc_id")
      .agg(sum("tf").as("n_tokens"), sum(col("tf") * col("wcount")).as("sum_freq"))
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("n_tokens"), col("sum_freq"),
        (col("sum_freq").cast("double") /
          (col("n_tokens") * col("total")).cast("double")).as("mean_freq"))
      .orderBy("doc_id")
  }

  // -------------------------------------------------------------------
  // Bigram language model (count-based conditional probabilities)
  // -------------------------------------------------------------------

  /** Corpus bigram LM: P(w2 | w1) = c(w1,w2) / c(w1·) for the 20 most
    * frequent bigrams — the count-based model behind next-token
    * statistics and corpus-drift monitoring. The context totals
    * c(w1·) are derived FROM the bigram counts (sum over w2), so the
    * token stream is read once (the cached count table serves both
    * consumers; the w1 side is vocabulary-sized and deliberately not
    * broadcast at scale — AQE decides locally).
    * Exact integer counts; one final division. */
  def bigramLm(s: SparkSession, d: String): DataFrame = {
    val bg = docs(s, d)
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1), g =>
        struct(element_at(col("t"), g).as("w1"),
          element_at(col("t"), g + 1).as("w2")))).as("b"))
      .select(col("b.w1"), col("b.w2"))
    // cached: the bigram-count table feeds both the context rollup
    // and the probability join; plan specialization would otherwise
    // run the bigram explode once per consumer (see
    // [[graft.operators.TextAnalysis.tfidfTop]]). No repartition(w1)
    // inside the cache: the cached root is AdaptiveSparkPlan, whose
    // partitioning consumers cannot see, so it bought nothing and
    // cost a full extra shuffle of the bigram table (the r18 tfidf
    // finding); the c1 rollup's own exchange carries only
    // partially-aggregated per-w1 sketches.
    val c12 = cached(bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy("w1").agg(sum("c12").as("c1"))
    c12.join(c1, "w1")
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        (col("c12").cast("double") / col("c1")).as("p"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Interpolated KNESER–NEY smoothed bigram LM — the smoothing that
    * actually ships in count-based LMs (Chen & Goodman '99): the raw
    * MLE of [[bigramLm]] assigns zero to unseen pairs and over-trusts
    * frequent contexts; KN discounts every seen bigram by D and
    * redistributes the held-out mass through the CONTINUATION
    * probability (how many distinct contexts a word follows — "san
    * francisco" gives high c(francisco) but low continuation):
    *
    *   P(w2|w1) = (c12 − D)/c1 + (D·N₁₊(w1·)/c1) · (N₁₊(·w2)/N₁₊(··))
    *
    * D = 3/4 is exactly representable (the power-of-two-fraction
    * discipline) and every other input is an integer count, so with
    * the identical cast/op sequence on both engines the probability
    * is bit-reproducible; c12 ≥ 1 makes the max(c−D, 0) clamp
    * vacuous. All four statistics derive from the ONE bigram-count
    * table (the stream is read once): c1 and N₁₊(w1·) share the w1
    * exchange, N₁₊(·w2) is a w2-keyed count, N₁₊(··) a 1-row frame. */
  def kneserNey(s: SparkSession, d: String): DataFrame = {
    val bg = docs(s, d)
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1), g =>
        struct(element_at(col("t"), g).as("w1"),
          element_at(col("t"), g + 1).as("w2")))).as("b"))
      .select(col("b.w1"), col("b.w2"))
    // no repartition(w1) inside the cache — see [[bigramLm]]
    val c12 = cached(bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val c1 = c12.groupBy("w1")
      .agg(sum("c12").as("c1"), count(lit(1)).as("n_follow"))
    val c2 = c12.groupBy("w2").agg(count(lit(1)).as("n_precede"))
    val tt = c12.agg(count(lit(1)).as("tt"))
    c12.join(c1, "w1").join(c2, "w2")
      .crossJoin(broadcast(tt))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n_follow"), col("n_precede"),
        (((col("c12").cast("double") - lit(0.75)) / col("c1").cast("double")) +
          (lit(0.75) * col("n_follow").cast("double") / col("c1").cast("double")) *
            (col("n_precede").cast("double") / col("tt").cast("double")))
          .as("p_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Interpolated Kneser–Ney TRIGRAM LM with bigram back-off — the
    * two-level join chain [[kneserNey]]'s flat four-statistic rollup
    * doesn't exercise (Chen & Goodman '99, the full recursion):
    *
    *   P(w3|w1w2) = (c123−D)/c12· + (D·N₁₊(w1w2·)/c12·) · P₂(w3|w2)
    *   P₂(w3|w2)  = (N₁₊(·w2w3)−D)/N₁₊(·w2·)
    *                  + (D·N₁₊(w2·)/N₁₊(·w2·)) · N₁₊(·w3)/N₁₊(··)
    *
    * The lower-order distribution uses CONTINUATION TYPE counts, which
    * Chen–Goodman define FROM the higher-order table — so ALL six
    * statistics derive from the ONE trigram-count table (the token
    * stream is read once): c12·/N₁₊(w1w2·) share the (w1,w2) rollup,
    * the type table N₁₊(·w2w3) is a (w2,w3) rollup of c123, and the
    * three bigram-level statistics are rollups of THAT. D = 3/4 at
    * both levels (exactly representable); every other input is an
    * integer count and the cast/op sequence is mirrored in the
    * oracle, so both probabilities are bit-reproducible.
    *
    * Scale: c123 and the type table are cached (each feeds 2–3
    * consumers); all joins are vocabulary-keyed equi-joins (partial →
    * final aggregates; AQE broadcasts the small rollups at driver SF
    * and shuffles them at corpus scale); only the 1-row type total is
    * an explicit broadcast. The report is a c123-ordered top-20
    * TakeOrdered. */
  /** The six Kneser–Ney trigram statistics of a document frame — ALL
    * rollups of the ONE trigram-count table (token stream read once):
    * (c123, ctx12, mid23, mid2, cont3, tt2). Factored so the full-LM
    * report ([[kneserNeyTrigram]]) and the held-out scorer
    * ([[knPerplexity]], which trains on the 80% split only) build the
    * identical model. */
  /** The raw (w1, w2, w3, c123) trigram-count table of a document
    * frame — the ONE table every KN statistic rolls up from, and the
    * exact state a streaming LM trainer maintains (counts are
    * additive, so per-batch merge is a groupBy-sum fold). */
  private[graft] def trigramCounts(docFrame: DataFrame): DataFrame =
    docFrame
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(explode(transform(sequence(lit(1), size(col("t")) - 2), g =>
        struct(element_at(col("t"), g).as("w1"),
          element_at(col("t"), g + 1).as("w2"),
          element_at(col("t"), g + 2).as("w3")))).as("b"))
      .select(col("b.w1"), col("b.w2"), col("b.w3"))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))

  private def knTrigramTables(docFrame: DataFrame): (DataFrame, DataFrame,
      DataFrame, DataFrame, DataFrame, DataFrame) =
    knStatsFromC123(trigramCounts(docFrame))

  /** The six KN statistics as rollups of an already-built trigram
    * count table — shared by the doc-frame path above and the
    * streaming twin, whose c123 arrives as maintained state. */
  private[graft] def knStatsFromC123(c123raw: DataFrame): (DataFrame,
      DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    val c123 = cached(c123raw)
    val ctx12 = c123.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("n_follow12"))
    val mid23 = cached(c123.groupBy("w2", "w3")
      .agg(count(lit(1)).as("n_mid")))
    val mid2 = mid23.groupBy("w2")
      .agg(sum("n_mid").as("n_mid2"), count(lit(1)).as("n_types2"))
    val cont3 = mid23.groupBy("w3").agg(count(lit(1)).as("n_prec3"))
    val tt2 = mid23.agg(count(lit(1)).as("tt2"))
    (c123, ctx12, mid23, mid2, cont3, tt2)
  }

  def kneserNeyTrigram(s: SparkSession, d: String): DataFrame = {
    val (c123, ctx12, mid23, mid2, cont3, tt2) = knTrigramTables(docs(s, d))
    val D = lit(0.75)
    val pKn2 =
      ((col("n_mid").cast("double") - D) / col("n_mid2").cast("double")) +
        (D * col("n_types2").cast("double") / col("n_mid2").cast("double")) *
          (col("n_prec3").cast("double") / col("tt2").cast("double"))
    c123.join(ctx12, Seq("w1", "w2"))
      .join(mid23, Seq("w2", "w3"))
      .join(mid2, "w2")
      .join(cont3, "w3")
      .crossJoin(broadcast(tt2))
      .withColumn("p_kn2", pKn2)
      .select(col("w1"), col("w2"), col("w3"), col("c123"), col("c12"),
        col("p_kn2"),
        (((col("c123").cast("double") - D) / col("c12").cast("double")) +
          (D * col("n_follow12").cast("double") / col("c12").cast("double")) *
            col("p_kn2")).as("p_kn3"))
      .orderBy(col("c123").desc, col("w1"), col("w2"), col("w3"))
      .limit(20)
  }

  /** Fixed-point −log2: q ∈ [1, 2^30] encodes the probability
    * p = q/2^30; returns ⌊−log2(p)·2^20⌋-style Q20 bits via the
    * classic shift-and-square binary logarithm — integer part from
    * the top set bit, then 20 squaring steps each emitting one
    * fraction bit. NO transcendental anywhere: the cross-engine
    * contract allows only the correctly-rounded IEEE ops (+,−,×,÷,
    * sqrt), and log() carries no bit guarantee between JVM libm and
    * DuckDB's — so the logarithm itself is a FIXED integer op
    * sequence both engines replay (the IDCT-kernel discipline
    * applied to the log). x < 2^31 throughout, so x² < 2^62 never
    * overflows a long on either engine. */
  private[graft] def nllQ20(q: Column): Column = {
    // il = floor(log2 q): the highest k with q >> k > 0
    val il = (size(filter(sequence(lit(0), lit(30)),
      k => call_function("shiftright", q, k) > 0)) - 1).cast("long")
    // normalize into [2^30, 2^31), then 20 square-and-shift rounds
    val x0 = call_function("shiftleft", q, (lit(30L) - il).cast("int"))
    val frac = aggregate(
      sequence(lit(1), lit(20)),
      struct(x0.as("x"), lit(0L).as("f")),
      (st, _) => {
        val xx = call_function("shiftright",
          st.getField("x") * st.getField("x"), lit(30))
        struct(
          when(xx >= lit(2147483648L), call_function("shiftright", xx, lit(1)))
            .otherwise(xx).as("x"),
          when(xx >= lit(2147483648L), st.getField("f") * 2 + 1)
            .otherwise(st.getField("f") * 2).as("f"))
      },
      st => st.getField("f"))
    (lit(30L) - il) * lit(1048576L) - frac
  }

  /** HELD-OUT Kneser–Ney perplexity per source — the quality-gate
    * consumer the LM family exists for (perplexity filtering à la
    * CCNet/Wenzek '20: score every candidate document under an LM
    * trained on trusted text; high-perplexity sources get
    * down-weighted). Train/held-out follow the [[Pipeline.hashSplit]]
    * discipline (content-hash buckets, 80/20), the model is the SAME
    * six-statistic trigram build as [[kneserNeyTrigram]] on the train
    * split only, and scoring LEFT-joins held-out trigrams so unseen
    * events take the Chen–Goodman back-off chain: unseen trigram →
    * λ(w1w2)·P₂, unseen context → P₂, unseen (w2,w3) → λ(w2)·Pcont,
    * unseen w3 → the 2⁻²⁰ floor. The report is log2-domain
    * (bits/token): perplexity = 2^bits needs pow(), which has no
    * cross-engine bit guarantee — bits_per_token is one exact
    * division of two integers, and nll_q20_total pins the fold
    * integer-exactly. n_unseen proves the back-off path runs.
    *
    * Scale: the model tables are vocabulary-keyed rollups of the one
    * train-split trigram table; scoring is five left equi-joins on
    * (word…) keys — AQE broadcasts them at driver SF, shuffles at
    * corpus scale — and the Q20 log fold is 20 integer ops per
    * DISTINCT (source, trigram), never per occurrence. */
  def knPerplexity(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val bucket = polyHash(col("text")) % 100
    knPerplexityScore(
      trigramCounts(all.filter(bucket < 80)), all.filter(bucket >= 80))
  }

  /** The held-out scorer over ANY trigram-count table — factored so
    * the streaming twin ([[graft.streaming.Streams.streamLmPerplexity]],
    * whose counts arrive as maintained state) reports through the
    * IDENTICAL model-build + back-off + Q20 fold and one oracle
    * serves both. */
  private[graft] def knPerplexityScore(
      c123raw: DataFrame, held: DataFrame): DataFrame = {
    val (c123, ctx12, mid23, mid2, cont3, tt2) = knStatsFromC123(c123raw)
    val ht = held
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 3)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("t")) - 2), g =>
          struct(element_at(col("t"), g).as("w1"),
            element_at(col("t"), g + 1).as("w2"),
            element_at(col("t"), g + 2).as("w3")))).as("b"))
      .select(col("source"), col("b.w1"), col("b.w2"), col("b.w3"))
      .groupBy("source", "w1", "w2", "w3").agg(count(lit(1)).as("n"))
    val D = lit(0.75)
    val pcont = coalesce(col("n_prec3"), lit(0L)).cast("double") /
      col("tt2").cast("double")
    val lam2 = D * col("n_types2").cast("double") / col("n_mid2").cast("double")
    val p2 = when(col("n_mid2").isNull, pcont)
      .when(col("n_mid").isNull, lam2 * pcont)
      .otherwise(((col("n_mid").cast("double") - D) /
        col("n_mid2").cast("double")) + lam2 * pcont)
    val lam12 = D * col("n_follow12").cast("double") / col("c12").cast("double")
    val p3g = when(col("c12").isNull, col("p2"))
      .when(col("c123").isNull, lam12 * col("p2"))
      .otherwise(((col("c123").cast("double") - D) /
        col("c12").cast("double")) + lam12 * col("p2"))
    val q = greatest(least(
      floor(greatest(p3g, lit(9.5367431640625e-7)) * lit(1073741824.0)),
      lit(1073741824L)), lit(1L))
    ht.join(c123, Seq("w1", "w2", "w3"), "left")
      .join(ctx12, Seq("w1", "w2"), "left")
      .join(mid23, Seq("w2", "w3"), "left")
      .join(mid2, Seq("w2"), "left")
      .join(cont3, Seq("w3"), "left")
      .crossJoin(broadcast(tt2))
      .withColumn("p2", p2)
      .select(col("source"), col("n"), col("c123"), nllQ20(q).as("nll"))
      .groupBy("source")
      .agg(
        sum("n").as("n_scored"),
        sum(when(col("c123").isNull, col("n")).otherwise(lit(0L))).as("n_unseen"),
        sum(col("nll") * col("n")).as("nll_q20_total"))
      .select(col("source"), col("n_scored"), col("n_unseen"),
        col("nll_q20_total"),
        (col("nll_q20_total").cast("double") /
          (col("n_scored") * lit(1048576L)).cast("double")).as("bits_per_token"))
      .orderBy("source")
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  private val oTok = TextAnalysis.oTokens

  /** PII redaction — the scrub step every training-data pipeline
    * runs before tokenization. The driver corpus is deliberately
    * PII-free, so the fixtures are PLANTED in-query, byte-identically
    * on both engines: each doc gets a synthetic contact line built
    * from its own first token and doc_id (an e-mail and a 555 phone
    * number), then the scrubber replaces e-mails with `<EMAIL>` and
    * phones with `<PHONE>`. Output is per-doc redaction counts plus
    * `md5(clean_text)` — the hash pins every scrubbed BYTE, so a
    * regex-dialect divergence between Spark (java.util.regex) and
    * DuckDB (RE2) cannot hide; the patterns stay in the common
    * dialect subset (character classes, +, {n}).
    *
    * Scale: pure per-row scan work — two codegen'd regex passes and
    * a hash, zero shuffle before the Verify sort. */
  private val PiiEmailRe = "[a-z0-9]+@[a-z0-9]+\\.com"
  private val PiiPhoneRe = "555-[0-9]{4}"
  /** The planted synthetic contact line over a frame carrying
    * (doc_id, text, t) — shared by [[piiScrub]] and the
    * [[scorecard]]'s PII gate. */
  private def piiDirty: Column =
    concat(col("text"), lit(" contact "),
      element_at(col("t"), 1), lit("@example.com or 555-"),
      lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"))

  def piiScrub(s: SparkSession, d: String): DataFrame = {
    Tables(s, d, "documents")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .filter(size(col("t")) >= 1)
      .withColumn("dirty", piiDirty)
      .select(
        col("doc_id"),
        regexp_count(col("dirty"), lit(PiiEmailRe)).cast("long").as("n_emails"),
        regexp_count(col("dirty"), lit(PiiPhoneRe)).cast("long").as("n_phones"),
        md5(regexp_replace(regexp_replace(col("dirty"), PiiEmailRe, "<EMAIL>"),
          PiiPhoneRe, "<PHONE>")).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** URL canonicalization + registered-domain dedup accounting — the
    * web-corpus hygiene step CCNet/RefinedWeb-class pipelines run
    * before ANY content dedup: the same page arrives under dozens of
    * URL spellings (case-shifted scheme/host, explicit default port,
    * tracking parameters, fragments, parameter order), and
    * canonicalizing first turns an expensive content comparison into
    * an exact key match. The corpus has no URL column, so the fixture
    * is PLANTED in-query byte-identically on both engines (the
    * [[piiScrub]] discipline): each doc gets a deliberately messy URL
    * — uppercase scheme/host, explicit :443, utm_-prefixed/ref/id tracking
    * params around a real `lang` param, a fragment — whose canonical
    * form collapses to (source, doc_id % 7), so every domain carries
    * genuine duplicate-URL mass the rollup must find.
    *
    * Canonicalization (identical op sequence both engines): drop the
    * fragment, split authority/path/query, lowercase scheme+host,
    * strip the default port, drop tracking params (utm_*, ref, id)
    * and re-sort the survivors, reassemble. Registered domain = the
    * last two host labels.
    *
    * Scale: pure per-row codegen'd string expressions fused into the
    * scan (zero extra passes) + one domain-keyed rollup with a
    * distinct over canonical URLs — at corpus scale the distinct
    * shuffles canonical-URL HASHES, never page content. */
  /** The canonicalized form of the planted messy URL (the full
    * fragment-cut → authority-split → lowercase → port-strip →
    * tracking-filter → re-sort op sequence) and its registered
    * domain — shared by [[urlCanonicalize]] and the [[scorecard]]'s
    * URL-dup gate. */
  private def urlCanonCols: (Column, Column) = {
    val trackRe = "^(utm_[a-z]+|ref|id)="
    val raw = concat(
      lit("HTTPS://WWW."), col("source"), lit("-Example.COM:443/Docs/"),
      pmod(col("doc_id"), lit(7)).cast("string"),
      lit("?utm_source=feed&lang=en&ref="),
      pmod(col("doc_id"), lit(3)).cast("string"),
      lit("&id="), col("doc_id").cast("string"), lit("#sec"))
    val noFrag = substring_index(raw, "#", 1)
    val base = substring_index(noFrag, "?", 1)
    val query = substring_index(noFrag, "?", -1)
    val proto = lower(substring_index(base, "://", 1))
    val rest = substring_index(base, "://", -1)
    val hostport = substring_index(rest, "/", 1)
    val path = regexp_replace(rest, "^[^/]*", "")
    val host = lower(regexp_replace(hostport, ":443$", ""))
    val kept = array_join(
      array_sort(filter(split(query, "&"), p => !p.rlike(trackRe))), "&")
    val canon = concat(proto, lit("://"), host, path,
      when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit("")))
    val domain = concat(
      element_at(split(host, "\\."), -2), lit("."),
      element_at(split(host, "\\."), -1))
    (canon, domain)
  }

  def urlCanonicalize(s: SparkSession, d: String): DataFrame = {
    val (canon, domain) = urlCanonCols
    Tables(s, d, "documents")
      .select(col("doc_id"), domain.as("domain"), canon.as("canon"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("canon")).as("n_urls"),
        (count(lit(1)) - countDistinct(col("canon"))).as("n_dup_docs"),
        min("canon").as("sample_url"))
      .orderBy("domain")
  }

  /** CORPUS SCORECARD — the one-row-per-source go/no-go dashboard a
    * data team reads before admitting a source into a training mix
    * (r17 verdict item #6), unifying the hygiene gates the catalog
    * already computes individually: token-duplication share (the
    * [[repetition]] family at source grain), benchmark-contamination
    * mass ([[decontaminate]]'s shingle rule), planted-PII counts
    * ([[piiScrub]]'s fixture), the corpus-frequency score
    * ([[unigramScore]] at source grain), canonical-URL duplicate mass
    * ([[urlCanonicalize]]'s rule), and the held-out Kneser–Ney
    * bits/token ([[knPerplexity]]). `passed` applies the documented
    * admission rule: duplication share < 0.5, ≤10% of docs carrying a
    * benchmark shingle, bits/token < 20 (the Q20 probability floor) —
    * sources without held-out trigrams pass the LM gate vacuously.
    *
    * Scale: every input is a source-grain rollup of a scan-level
    * computation — the integration is a 6-way LEFT join of
    * source-cardinality frames (20 rows here; thousands at corpus
    * scale — all broadcast), so the scorecard costs one pass per gate
    * family and nothing at the join. */
  def scorecard(s: SparkSession, d: String): DataFrame = {
    val all = docs(s, d)
    val tok = all.withColumn("t", TextAnalysis.tokens(col("text")))
    val rep = tok
      .select(col("source"), size(col("t")).cast("long").as("nt"),
        size(array_distinct(col("t"))).cast("long").as("nd"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"),
        sum(col("nt") - col("nd")).as("n_dup"))
    // benchmark shingle hits, rolled to source (decontaminate's rule)
    val sets = cached(tokenShingles(all))
    val bench = sets.filter(col("doc_id") % 97 === 0)
      .select(explode(col("sh")).as("sv")).distinct()
    val hits = sets.filter(col("doc_id") % 97 =!= 0)
      .select(col("doc_id"), explode(col("sh")).as("sv"))
      .join(bench, Seq("sv"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    val contam = all.filter(col("doc_id") % 97 =!= 0)
      .select("doc_id", "source")
      .join(hits, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(sum(when(coalesce(col("n_hits"), lit(0L)) > 0, 1L).otherwise(0L))
        .as("contam_docs"),
        sum(coalesce(col("n_hits"), lit(0L))).as("contam_hits"))
    val pii = tok.filter(size(col("t")) >= 1)
      .select(col("source"),
        (regexp_count(piiDirty, lit(PiiEmailRe)) +
          regexp_count(piiDirty, lit(PiiPhoneRe))).cast("long").as("np"))
      .groupBy("source").agg(sum("np").as("pii_count"))
    // source-grain unigram model score (one corpus-level model)
    val tfc = cached(tok.select(col("source"), explode(col("t")).as("word"))
      .groupBy("source", "word").agg(count(lit(1)).as("tf")))
    val wc = tfc.groupBy("word").agg(sum("tf").as("wcount"))
    val total = tfc.agg(sum("tf").as("total"))
    val uni = tfc.join(wc, "word")
      .groupBy("source")
      .agg(sum(col("tf") * col("wcount")).as("sum_freq"),
        sum("tf").as("src_tokens"))
      .crossJoin(broadcast(total))
      .select(col("source"),
        (col("sum_freq").cast("double") /
          (col("src_tokens") * col("total")).cast("double")).as("mean_freq"))
    val url = all.select(col("source"), urlCanonCols._1.as("canon"))
      .groupBy("source")
      .agg((count(lit(1)) - countDistinct(col("canon"))).as("url_dup_docs"))
    val kn = knPerplexity(s, d).select(col("source"), col("bits_per_token"))
    rep
      .join(contam, Seq("source"), "left")
      .join(pii, Seq("source"), "left")
      .join(uni, Seq("source"), "left")
      .join(url, Seq("source"), "left")
      .join(kn, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_tokens"),
        (col("n_dup").cast("double") / col("n_tokens").cast("double"))
          .as("dup_tok_frac"),
        coalesce(col("contam_docs"), lit(0L)).as("contam_docs"),
        coalesce(col("contam_hits"), lit(0L)).as("contam_hits"),
        coalesce(col("pii_count"), lit(0L)).as("pii_count"),
        col("mean_freq"),
        coalesce(col("url_dup_docs"), lit(0L)).as("url_dup_docs"),
        col("bits_per_token"))
      .withColumn("passed", when(
        col("dup_tok_frac") < lit(0.5) &&
          col("contam_docs") * 10 <= col("n_docs") &&
          coalesce(col("bits_per_token") < lit(20.0), lit(true)), 1L)
        .otherwise(0L))
      .orderBy("source")
  }

  /** Oracle for [[knPerplexity]] AND its streaming twin
    * ([[graft.streaming.Streams.streamLmPerplexity]]): trigram
    * counts are additive, so the maintained state equals the batch
    * count table and the shared scoring tail makes ONE oracle
    * serve both. */
  private[graft] val oKnPerplexitySql: String =
    s"""WITH tr AS (
         |  SELECT text FROM documents WHERE ${oPolyHash("text")} % 100 < 80),
         |ho AS (
         |  SELECT source, text FROM documents
         |  WHERE ${oPolyHash("text")} % 100 >= 80),
         |t AS (SELECT $oTok AS t FROM tr),
         |tg AS (SELECT t[g] AS w1, t[g+1] AS w2, t[g+2] AS w3
         |       FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS g
         |             FROM t WHERE len(t) >= 3)),
         |c123 AS MATERIALIZED (
         |  SELECT w1, w2, w3, COUNT(*) AS c123 FROM tg GROUP BY 1, 2, 3),
         |ctx12 AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
         |            COUNT(*) AS n_follow12 FROM c123 GROUP BY 1, 2),
         |mid23 AS MATERIALIZED (
         |  SELECT w2, w3, COUNT(*) AS n_mid FROM c123 GROUP BY 1, 2),
         |mid2 AS (SELECT w2, CAST(SUM(n_mid) AS BIGINT) AS n_mid2,
         |           COUNT(*) AS n_types2 FROM mid23 GROUP BY 1),
         |cont3 AS (SELECT w3, COUNT(*) AS n_prec3 FROM mid23 GROUP BY 1),
         |tt2 AS (SELECT COUNT(*) AS tt2 FROM mid23),
         |hts AS (SELECT source, $oTok AS t FROM ho),
         |ht AS (SELECT source, t[g] AS w1, t[g+1] AS w2, t[g+2] AS w3
         |       FROM (SELECT source, t,
         |               unnest(generate_series(1, len(t) - 2)) AS g
         |             FROM hts WHERE len(t) >= 3)),
         |htc AS (SELECT source, w1, w2, w3, COUNT(*) AS n
         |        FROM ht GROUP BY 1, 2, 3, 4),
         |j AS (
         |  SELECT source, n, c123, c12, n_follow12,
         |    CASE WHEN n_mid2 IS NULL
         |           THEN (CAST(COALESCE(n_prec3, 0) AS DOUBLE) / CAST(tt2 AS DOUBLE))
         |         WHEN n_mid IS NULL
         |           THEN (7.5e-1 * CAST(n_types2 AS DOUBLE) / CAST(n_mid2 AS DOUBLE))
         |             * (CAST(COALESCE(n_prec3, 0) AS DOUBLE) / CAST(tt2 AS DOUBLE))
         |         ELSE ((CAST(n_mid AS DOUBLE) - 7.5e-1) / CAST(n_mid2 AS DOUBLE))
         |           + (7.5e-1 * CAST(n_types2 AS DOUBLE) / CAST(n_mid2 AS DOUBLE))
         |             * (CAST(COALESCE(n_prec3, 0) AS DOUBLE) / CAST(tt2 AS DOUBLE))
         |    END AS p2
         |  FROM htc LEFT JOIN c123 USING (w1, w2, w3)
         |    LEFT JOIN ctx12 USING (w1, w2)
         |    LEFT JOIN mid23 USING (w2, w3)
         |    LEFT JOIN mid2 USING (w2)
         |    LEFT JOIN cont3 USING (w3)
         |    CROSS JOIN tt2),
         |p AS (
         |  SELECT source, n, c123,
         |    CASE WHEN c12 IS NULL THEN p2
         |         WHEN c123 IS NULL
         |           THEN (7.5e-1 * CAST(n_follow12 AS DOUBLE) / CAST(c12 AS DOUBLE)) * p2
         |         ELSE ((CAST(c123 AS DOUBLE) - 7.5e-1) / CAST(c12 AS DOUBLE))
         |           + (7.5e-1 * CAST(n_follow12 AS DOUBLE) / CAST(c12 AS DOUBLE)) * p2
         |    END AS p3
         |  FROM j),
         |qq AS (
         |  SELECT source, n, c123,
         |    GREATEST(LEAST(CAST(FLOOR(
         |      GREATEST(p3, 9.5367431640625e-7) * 1073741824e0) AS BIGINT),
         |      1073741824), 1) AS q
         |  FROM p),
         |lg AS (
         |  SELECT source, n, c123, q,
         |    length(list_filter(range(0, 31), k -> (q >> k) > 0)) - 1 AS il
         |  FROM qq),
         |st AS (
         |  SELECT source, n, c123, il,
         |    list_reduce(
         |      list_prepend([q << (30 - il), CAST(0 AS BIGINT)],
         |        list_transform(range(20),
         |          i -> [CAST(0 AS BIGINT), CAST(0 AS BIGINT)])),
         |      (a, b) -> CASE WHEN ((a[1]*a[1]) >> 30) >= 2147483648
         |                THEN [((a[1]*a[1]) >> 30) >> 1, a[2]*2 + 1]
         |                ELSE [(a[1]*a[1]) >> 30, a[2]*2] END) AS fs
         |  FROM lg),
         |nl AS (SELECT source, n, c123,
         |         (30 - il) * 1048576 - fs[2] AS nll FROM st)
         |SELECT source, CAST(SUM(n) AS BIGINT) AS n_scored,
         |  CAST(SUM(CASE WHEN c123 IS NULL THEN n ELSE 0 END) AS BIGINT)
         |    AS n_unseen,
         |  CAST(SUM(nll * n) AS BIGINT) AS nll_q20_total,
         |  (CAST(SUM(nll * n) AS DOUBLE) / CAST(SUM(n) * 1048576 AS DOUBLE))
         |    AS bits_per_token
         |FROM nl GROUP BY source ORDER BY source""".stripMargin

  def queries: Seq[Q] = Seq(
    // oracle: the identical plant → canonicalize op sequence —
    // fragment cut, authority split, lowercase scheme/host, default
    // port strip, tracking-param filter + re-sort, reassembly — in
    // the shared regex/string dialect (anchored patterns only, so
    // Spark's replace-all and DuckDB's replace-first agree)
    Q("filter_url_canonical", urlCanonicalize, Some {
      val trackRe = "^(utm_[a-z]+|ref|id)="
      s"""WITH raw AS (
         |  SELECT doc_id,
         |    'HTTPS://WWW.' || source || '-Example.COM:443/Docs/' ||
         |      CAST(doc_id % 7 AS VARCHAR) || '?utm_source=feed&lang=en&ref=' ||
         |      CAST(doc_id % 3 AS VARCHAR) || '&id=' || CAST(doc_id AS VARCHAR)
         |      || '#sec' AS u
         |  FROM documents),
         |parts AS (
         |  SELECT doc_id,
         |    lower(split_part(split_part(split_part(u, '#', 1), '?', 1), '://', 1)) AS proto,
         |    split_part(split_part(split_part(u, '#', 1), '?', 1), '://', 2) AS rest,
         |    split_part(split_part(u, '#', 1), '?', 2) AS query
         |  FROM raw),
         |canon AS (
         |  SELECT doc_id,
         |    lower(regexp_replace(split_part(rest, '/', 1), ':443$$', '')) AS host,
         |    proto || '://' ||
         |      lower(regexp_replace(split_part(rest, '/', 1), ':443$$', '')) ||
         |      regexp_replace(rest, '^[^/]*', '') ||
         |      CASE WHEN length(array_to_string(list_sort(list_filter(
         |               string_split(query, '&'),
         |               p -> NOT regexp_matches(p, '$trackRe'))), '&')) > 0
         |           THEN '?' || array_to_string(list_sort(list_filter(
         |               string_split(query, '&'),
         |               p -> NOT regexp_matches(p, '$trackRe'))), '&')
         |           ELSE '' END AS canon
         |  FROM parts)
         |SELECT string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
         |    AS domain,
         |  COUNT(*) AS n_docs,
         |  COUNT(DISTINCT canon) AS n_urls,
         |  COUNT(*) - COUNT(DISTINCT canon) AS n_dup_docs,
         |  MIN(canon) AS sample_url
         |FROM canon GROUP BY 1 ORDER BY domain""".stripMargin
    }),
    Q("filter_pii_scrub", piiScrub, Some {
      val emailRe = "[a-z0-9]+@[a-z0-9]+\\.com"
      val phoneRe = "555-[0-9]{4}"
      s"""WITH t AS (
         |  SELECT doc_id, text, $oTok AS t FROM documents),
         |dirty AS (
         |  SELECT doc_id,
         |    text || ' contact ' || t[1] || '@example.com or 555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
         |  FROM t WHERE len(t) >= 1)
         |SELECT doc_id,
         |  CAST(len(regexp_extract_all(dirty, '$emailRe')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(dirty, '$phoneRe')) AS BIGINT) AS n_phones,
         |  md5(regexp_replace(regexp_replace(dirty, '$emailRe', '<EMAIL>', 'g'),
         |    '$phoneRe', '<PHONE>', 'g')) AS clean_md5
         |FROM dirty ORDER BY doc_id""".stripMargin
    }),
    Q("filter_repetition", repetition, Some(
      s"""WITH t AS (SELECT doc_id, $oTok AS t FROM documents),
         |st AS (SELECT doc_id, len(t) AS n, len(list_distinct(t)) AS nd, t
         |       FROM t WHERE len(t) >= 2),
         |bg AS (SELECT doc_id, n, nd, t[g] || ' ' || t[g+1] AS bigram
         |       FROM (SELECT doc_id, n, nd, t, unnest(generate_series(1, n - 1)) AS g FROM st)),
         |pc AS (SELECT doc_id, n, nd, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, n, nd, bigram),
         |mx AS (SELECT doc_id, n, nd, MAX(c) AS m FROM pc GROUP BY doc_id, n, nd)
         |SELECT doc_id, n AS n_tokens,
         |  CAST(n - nd AS DOUBLE) / n AS dup_tok_frac,
         |  m AS top_bigram_n,
         |  CAST(m * 2 AS DOUBLE) / n AS top_bigram_frac
         |FROM mx ORDER BY doc_id""".stripMargin)),
    Q("filter_decontaminate", decontaminate, Some(
      s"""WITH t AS (SELECT doc_id, $oTok AS tok FROM documents),
         |th AS (SELECT doc_id, list_transform(tok, s -> ${oPolyHash("s")}) AS th
         |       FROM t WHERE len(tok) >= $W),
         |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(th) - ${W - 1}),
         |       g -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[g:g+${W - 1}]),
         |            (a, b) -> (a * $M + b) % $P))) AS sh FROM th),
         |bench AS (SELECT DISTINCT unnest(sh) AS s FROM s WHERE doc_id % 97 = 0),
         |corpus AS (SELECT doc_id, len(sh) AS n_shingles, sh FROM s WHERE doc_id % 97 <> 0),
         |e AS (SELECT doc_id, unnest(sh) AS s FROM corpus),
         |h AS (SELECT doc_id, COUNT(*) AS n_hits FROM e
         |      WHERE s IN (SELECT s FROM bench) GROUP BY doc_id)
         |SELECT c.doc_id, c.n_shingles,
         |  CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / c.n_shingles AS contam_frac
         |FROM corpus c LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin)),
    Q("filter_crossdoc_ngrams", crossdocNgrams, Some(
      s"""WITH t AS (SELECT doc_id, $oTok AS tok FROM documents),
         |th AS (SELECT doc_id, list_transform(tok, s -> ${oPolyHash("s")}) AS th
         |       FROM t WHERE len(tok) >= $W),
         |s AS (SELECT doc_id, list_distinct(list_transform(generate_series(1, len(th) - ${W - 1}),
         |       g -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[g:g+${W - 1}]),
         |            (a, b) -> (a * $M + b) % $P))) AS sh FROM th),
         |e AS (SELECT doc_id, unnest(sh) AS h FROM s),
         |nd AS (SELECT h, COUNT(*) AS ndocs FROM e GROUP BY h)
         |SELECT doc_id, COUNT(*) AS n_shingles,
         |  CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS shared_frac
         |FROM e JOIN nd USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    // oracle: same token-hash fold, gram fold, window list_min and
    // cross-doc join — integer-exact end to end
    Q("filter_winnowing", winnowing, Some(
      s"""WITH t AS (SELECT doc_id, $oTok AS tok FROM documents),
         |th AS (SELECT doc_id, list_transform(tok, s -> ${oPolyHash("s")}) AS th
         |       FROM t WHERE len(tok) >= ${WinK + WinW - 1}),
         |g AS (SELECT doc_id, list_transform(generate_series(1, len(th) - ${WinK - 1}),
         |       i -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[i:i+${WinK - 1}]),
         |            (a, b) -> (a * $M + b) % $P)) AS g FROM th),
         |f AS (SELECT doc_id, len(g) AS n_grams,
         |       list_distinct(list_transform(generate_series(1, len(g) - ${WinW - 1}),
         |        j -> list_min(g[j:j+${WinW - 1}]))) AS fps FROM g),
         |e AS (SELECT doc_id, n_grams, unnest(fps) AS h FROM f),
         |nd AS (SELECT h, COUNT(*) AS ndocs FROM e GROUP BY h)
         |SELECT doc_id, MAX(n_grams) AS n_grams, COUNT(*) AS n_fps,
         |  CAST(SUM(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(COUNT(*) AS DOUBLE) / MAX(n_grams) AS fp_density
         |FROM e JOIN nd USING (h)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),
    // oracle: same selected-fingerprint sets, same df guard, same
    // equi-join pairing and containment-style score
    Q("filter_winnowing_pairs", winnowingPairs, Some(oWinnowPairsSql)),
    Q("filter_unigram_score", unigramScore, Some(
      s"""WITH t AS (SELECT doc_id, unnest($oTok) AS word FROM documents),
         |tfc AS (SELECT doc_id, word, COUNT(*) AS tf FROM t GROUP BY doc_id, word),
         |wc AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS wcount FROM tfc GROUP BY word),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tfc),
         |d AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |        CAST(SUM(tf * wcount) AS BIGINT) AS sum_freq
         |      FROM tfc JOIN wc USING (word) GROUP BY doc_id)
         |SELECT doc_id, n_tokens, sum_freq,
         |  CAST(sum_freq AS DOUBLE) / CAST(n_tokens * total AS DOUBLE) AS mean_freq
         |FROM d CROSS JOIN tot ORDER BY doc_id""".stripMargin)),
    Q("lm_bigram_prob", bigramLm, Some(
      s"""WITH t AS (SELECT $oTok AS t FROM documents),
         |bg AS (SELECT t[g] AS w1, t[g+1] AS w2
         |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS g
         |             FROM t WHERE len(t) >= 2)),
         |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
         |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c12 GROUP BY w1)
         |SELECT w1, w2, c12, c1, CAST(c12 AS DOUBLE) / c1 AS p
         |FROM c12 JOIN c1 USING (w1)
         |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin)),
    // oracle: the same four count statistics off one bigram table and
    // the identical cast/op sequence; the discount is the E-NOTATION
    // double literal 7.5e-1 (a plain 0.75 would be DECIMAL in DuckDB
    // — the benford lesson) and 3/4 is exactly representable
    Q("lm_kneser_ney", kneserNey, Some(
      s"""WITH t AS (SELECT $oTok AS t FROM documents),
         |bg AS (SELECT t[g] AS w1, t[g+1] AS w2
         |       FROM (SELECT t, unnest(generate_series(1, len(t) - 1)) AS g
         |             FROM t WHERE len(t) >= 2)),
         |c12 AS MATERIALIZED (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY w1, w2),
         |c1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
         |         COUNT(*) AS n_follow FROM c12 GROUP BY w1),
         |c2 AS (SELECT w2, COUNT(*) AS n_precede FROM c12 GROUP BY w2),
         |tt AS (SELECT COUNT(*) AS tt FROM c12)
         |SELECT w1, w2, c12, c1, n_follow, n_precede,
         |  ((CAST(c12 AS DOUBLE) - 7.5e-1) / CAST(c1 AS DOUBLE))
         |    + (7.5e-1 * CAST(n_follow AS DOUBLE) / CAST(c1 AS DOUBLE))
         |      * (CAST(n_precede AS DOUBLE) / CAST(tt AS DOUBLE)) AS p_kn
         |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tt
         |ORDER BY c12 DESC, w1, w2 LIMIT 20""".stripMargin)),
    // oracle: the same six statistics off the same single trigram
    // table; p_kn2 is aliased in a subquery so both engines run the
    // identical IEEE sequence for the back-off product
    Q("lm_kn_trigram", kneserNeyTrigram, Some(
      s"""WITH t AS (SELECT $oTok AS t FROM documents),
         |tg AS (SELECT t[g] AS w1, t[g+1] AS w2, t[g+2] AS w3
         |       FROM (SELECT t, unnest(generate_series(1, len(t) - 2)) AS g
         |             FROM t WHERE len(t) >= 3)),
         |c123 AS MATERIALIZED (
         |  SELECT w1, w2, w3, COUNT(*) AS c123 FROM tg GROUP BY 1, 2, 3),
         |ctx12 AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
         |            COUNT(*) AS n_follow12 FROM c123 GROUP BY 1, 2),
         |mid23 AS MATERIALIZED (
         |  SELECT w2, w3, COUNT(*) AS n_mid FROM c123 GROUP BY 1, 2),
         |mid2 AS (SELECT w2, CAST(SUM(n_mid) AS BIGINT) AS n_mid2,
         |           COUNT(*) AS n_types2 FROM mid23 GROUP BY 1),
         |cont3 AS (SELECT w3, COUNT(*) AS n_prec3 FROM mid23 GROUP BY 1),
         |tt2 AS (SELECT COUNT(*) AS tt2 FROM mid23),
         |j AS (
         |  SELECT w1, w2, w3, c123, c12, n_follow12,
         |    ((CAST(n_mid AS DOUBLE) - 7.5e-1) / CAST(n_mid2 AS DOUBLE))
         |      + (7.5e-1 * CAST(n_types2 AS DOUBLE) / CAST(n_mid2 AS DOUBLE))
         |        * (CAST(n_prec3 AS DOUBLE) / CAST(tt2 AS DOUBLE)) AS p_kn2
         |  FROM c123 JOIN ctx12 USING (w1, w2) JOIN mid23 USING (w2, w3)
         |  JOIN mid2 USING (w2) JOIN cont3 USING (w3) CROSS JOIN tt2)
         |SELECT w1, w2, w3, c123, c12, p_kn2,
         |  ((CAST(c123 AS DOUBLE) - 7.5e-1) / CAST(c12 AS DOUBLE))
         |    + (7.5e-1 * CAST(n_follow12 AS DOUBLE) / CAST(c12 AS DOUBLE))
         |      * p_kn2 AS p_kn3
         |FROM j ORDER BY c123 DESC, w1, w2, w3 LIMIT 20""".stripMargin)),
    // oracle: the identical 80/20 content-hash split, the identical
    // six-statistic train-split model, the identical back-off CASE
    // chain (branch order mirrored), and the identical Q20
    // shift-and-square log fold — so n_scored/n_unseen/nll_q20_total
    // are integer-exact and bits_per_token is one shared division
    Q("lm_kn_perplexity", knPerplexity, Some(oKnPerplexitySql)),
    // oracle: each gate's rule replayed at source grain — token/
    // shingle/unigram folds mirrored, the KN sub-oracle embedded
    // VERBATIM as a subquery, and the URL gate derived through the
    // INDEPENDENT model (canon is a bijection of (source, doc_id%7),
    // so dup mass = n_docs − distinct residues — the engine's only
    // route is the real canonicalization op sequence)
    Q("pipeline_scorecard", scorecard, Some {
      s"""WITH t AS (SELECT doc_id, source, text, $oTok AS t FROM documents),
         |rep AS (
         |  SELECT source, COUNT(*) AS n_docs,
         |    CAST(SUM(len(t)) AS BIGINT) AS n_tokens,
         |    CAST(SUM(len(t) - len(list_distinct(t))) AS BIGINT) AS n_dup
         |  FROM t GROUP BY 1),
         |th AS (SELECT doc_id, list_transform(t, s -> ${oPolyHash("s")}) AS th
         |       FROM t WHERE len(t) >= $W),
         |shg AS (SELECT doc_id, list_distinct(list_transform(
         |         generate_series(1, len(th) - ${W - 1}),
         |         g -> list_reduce(list_prepend(CAST(0 AS BIGINT), th[g:g+${W - 1}]),
         |              (a, b) -> (a * $M + b) % $P))) AS sh FROM th),
         |bench AS (SELECT DISTINCT unnest(sh) AS sv FROM shg WHERE doc_id % 97 = 0),
         |e AS (SELECT doc_id, unnest(sh) AS sv FROM shg WHERE doc_id % 97 <> 0),
         |h AS (SELECT doc_id, COUNT(*) AS n_hits FROM e
         |      WHERE sv IN (SELECT sv FROM bench) GROUP BY 1),
         |contam AS (
         |  SELECT d.source,
         |    CAST(SUM(CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END) AS BIGINT)
         |      AS contam_docs,
         |    CAST(SUM(COALESCE(h.n_hits, 0)) AS BIGINT) AS contam_hits
         |  FROM documents d LEFT JOIN h USING (doc_id)
         |  WHERE d.doc_id % 97 <> 0 GROUP BY 1),
         |dirty AS (
         |  SELECT source,
         |    text || ' contact ' || t[1] || '@example.com or 555-' ||
         |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS dirty
         |  FROM t WHERE len(t) >= 1),
         |pii AS (SELECT source,
         |    CAST(SUM(len(regexp_extract_all(dirty, '$PiiEmailRe'))
         |      + len(regexp_extract_all(dirty, '$PiiPhoneRe'))) AS BIGINT) AS pii_count
         |  FROM dirty GROUP BY 1),
         |tw AS (SELECT source, unnest(t) AS word FROM t),
         |tfc AS (SELECT source, word, COUNT(*) AS tf FROM tw GROUP BY 1, 2),
         |wc AS (SELECT word, CAST(SUM(tf) AS BIGINT) AS wcount FROM tfc GROUP BY 1),
         |tot AS (SELECT CAST(SUM(tf) AS BIGINT) AS total FROM tfc),
         |uni0 AS (SELECT source, CAST(SUM(tf * wcount) AS BIGINT) AS sum_freq,
         |           CAST(SUM(tf) AS BIGINT) AS src_tokens
         |         FROM tfc JOIN wc USING (word) GROUP BY 1),
         |uni AS (SELECT source,
         |    CAST(sum_freq AS DOUBLE) / CAST(src_tokens * total AS DOUBLE) AS mean_freq
         |  FROM uni0 CROSS JOIN tot),
         |url AS (SELECT source,
         |    CAST(COUNT(*) - COUNT(DISTINCT doc_id % 7) AS BIGINT) AS url_dup_docs
         |  FROM documents GROUP BY 1),
         |kn AS (SELECT source, bits_per_token FROM ($oKnPerplexitySql))
         |SELECT r.source, r.n_docs, r.n_tokens,
         |  CAST(r.n_dup AS DOUBLE) / CAST(r.n_tokens AS DOUBLE) AS dup_tok_frac,
         |  COALESCE(c.contam_docs, 0) AS contam_docs,
         |  COALESCE(c.contam_hits, 0) AS contam_hits,
         |  COALESCE(p.pii_count, 0) AS pii_count,
         |  u.mean_freq,
         |  COALESCE(l.url_dup_docs, 0) AS url_dup_docs,
         |  k.bits_per_token,
         |  CAST(CASE WHEN CAST(r.n_dup AS DOUBLE) / CAST(r.n_tokens AS DOUBLE) < 5e-1
         |      AND COALESCE(c.contam_docs, 0) * 10 <= r.n_docs
         |      AND COALESCE(k.bits_per_token < 2e1, TRUE)
         |    THEN 1 ELSE 0 END AS BIGINT) AS passed
         |FROM rep r LEFT JOIN contam c USING (source)
         |  LEFT JOIN pii p USING (source)
         |  LEFT JOIN uni u USING (source)
         |  LEFT JOIN url l USING (source)
         |  LEFT JOIN kn k USING (source)
         |ORDER BY r.source""".stripMargin
    }),
  )
}
