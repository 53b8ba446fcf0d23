package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Verbatim repeated-SPAN dedup — the ExactSubstr modality of
  * "Deduplicating Training Data Makes Language Models Better" (Lee
  * et al., 2021): find and remove token spans that occur verbatim
  * more than once in the corpus, even when the surrounding documents
  * are unique. This is the one dedup family the whole-document
  * operators ([[Dedup]]) cannot express: MinHash/SimHash drop whole
  * near-dup documents, while boilerplate license headers, quoted
  * passages and templated paragraphs repeat INSIDE otherwise-unique
  * documents.
  *
  * Spark-first design — no suffix array. The paper builds a corpus
  * suffix array because it targets arbitrary-length matches on one
  * big machine; for a fixed minimum span length K the same answer
  * falls out of a shuffle-by-n-gram: a repeated span of length
  * L ≥ K contains exactly L−K+1 repeated K-grams at CONSECUTIVE
  * start positions, and conversely every maximal run of consecutive
  * repeated-K-gram starts reconstructs a maximal repeated span. So:
  *
  *  1. explode each document into its K-token grams (one narrow
  *     map-side pass, O(tokens) rows total);
  *  2. count occurrences per gram — ONE shuffle, map-side partial
  *     aggregation, key = the gram text (at 100 TB the key becomes a
  *     128-bit content hash; the text key keeps the oracle exact
  *     here);
  *  3. join grams back to the repeated set (AQE picks broadcast when
  *     the repeated vocabulary is small, shuffle join otherwise);
  *  4. per document, collapse the sorted repeated-start positions
  *     into maximal spans with pure array folds — document-local
  *     work, no further shuffle: with sorted starts p₁…pₙ and gaps
  *     dᵢ = pᵢ−pᵢ₋₁, covered tokens = K + Σ min(dᵢ, K) and span
  *     count = 1 + |{i : dᵢ > K}| (a gap > K breaks the run; = K is
  *     adjacency, one contiguous region).
  *
  * Nothing is quadratic and no state exceeds a document's own token
  * array; the only wide exchange carries (gram, count) pairs.
  */
object SpanDedup {

  /** Minimum repeated-span length in tokens (the paper uses 50 BPE
    * tokens at web scale; 8 word tokens puts the synthetic corpus's
    * planted spans in range while random 8-grams stay unique). */
  private val K = 8

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .select(col("doc_id"), col("source"), split(col("text"), " ").as("ts"))

  /** (doc_id, pos, g): every K-gram occurrence, pos 0-based. */
  private def grams(docsDf: DataFrame): DataFrame =
    docsDf.filter(size(col("ts")) >= K)
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(col("ts")) - K),
          i => concat_ws(" ", slice(col("ts"), i + lit(1), lit(K))))))
      .toDF("doc_id", "pos", "g")

  /** Grams occurring ≥ 2 times corpus-wide (across or within docs). */
  private def repeated(gramsDf: DataFrame): DataFrame =
    gramsDf.groupBy("g").agg(count(lit(1)).as("n")).filter(col("n") >= 2)
      .select("g")

  /** Per-doc sorted repeated-gram start positions. */
  private def repStarts(gramsDf: DataFrame): DataFrame =
    gramsDf.join(repeated(gramsDf), "g")
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))

  /** Σ f(gap) over consecutive sorted starts. */
  private def foldGaps(ps: Column, f: (Column, Column) => Column): Column =
    aggregate(
      zip_with(slice(ps, lit(2), size(ps) - 1), slice(ps, lit(1), size(ps) - 1), f),
      lit(0L), (acc, x) => acc + x)

  /** Detector: per document, total tokens, tokens covered by some
    * repeated K-gram, and the number of maximal repeated spans. */
  def repeatedSpans(s: SparkSession, d: String): DataFrame = {
    val ds = docs(s, d)
    // gram SHARD (r19, guide §6): materialize the (doc_id, pos, g)
    // projection once to disk and let both consumers — the
    // corpus-wide repeated-gram rollup and the per-doc join-back —
    // read the shard, instead of re-running the tokenize + gram
    // explode per consumer (2 gram passes → 1). Disk, not memory:
    // the shard is ~K× the corpus text (overlapping grams), which is
    // the ExactSubstr production trade (its suffix-array shard is
    // the same order) and exactly what an in-memory persist was
    // rejected for in r18. The third documents pass below stays: the
    // detector must emit zero-rows for gram-free docs, and that pass
    // prunes to (doc_id, |tokens|).
    val shard = graft.Core.ckptRound(grams(ds), "graft-gram-shard")
    val stats = repStarts(shard)
      .select(col("doc_id"),
        (lit(K.toLong) + foldGaps(col("ps"),
          (a, b) => least(a - b, lit(K)).cast("long"))).as("dup"),
        (lit(1L) + foldGaps(col("ps"),
          (a, b) => (a - b > K).cast("long"))).as("spans"))
    ds.join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"), size(col("ts")).cast("long").as("n_tokens"),
        coalesce(col("dup"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("spans"), lit(0L)).as("n_spans"))
      .orderBy("doc_id")
  }

  /** Covered token positions from the sorted start list: the union of
    * [p, p+K) intervals, as a distinct array. Array-local; bounded by
    * the document's own length. */
  private def coveredPositions(ps: Column): Column =
    array_distinct(flatten(transform(ps,
      p => sequence(p, p + lit(K - 1)))))

  /** Removal, conservative policy: delete EVERY token covered by a
    * repeated K-gram (all copies go — the safe choice for training
    * data where repeated boilerplate carries no signal). Emits the
    * affected documents with their exact cleaned text; the byte-exact
    * string must match the oracle's reconstruction, which pins the
    * span arithmetic end to end. */
  def spanClean(s: SparkSession, d: String): DataFrame = {
    val ds = docs(s, d)
    repStarts(grams(ds))
      .withColumn("cov", coveredPositions(col("ps")))
      .join(ds, "doc_id")
      .select(col("doc_id"),
        concat_ws(" ", filter(col("ts"),
          (_, i) => !array_contains(col("cov"), i))).as("clean_text"),
        size(col("cov")).cast("long").as("n_removed"))
      .orderBy("doc_id")
  }

  /** Removal, keep-first policy (the paper's): every repeated gram
    * keeps its corpus-FIRST occurrence — ordered by (doc_id, pos) —
    * and only later occurrences are removable, so one copy of each
    * repeated passage survives. Per-source accounting of the edit.
    * The min-occurrence per gram rides the same single gram shuffle
    * as the count. */
  def spanKeepFirst(s: SparkSession, d: String): DataFrame = {
    val ds = docs(s, d)
    val g = grams(ds)
    // corpus-first key = min(struct(doc_id, pos)): one mergeable
    // aggregate with NO magnitude assumption (the r12 arithmetic
    // doc_id*1e6+pos encoding silently mis-ordered for ≥1e6-token
    // documents, and the oracle shared the bug so parity couldn't
    // catch it)
    val firsts = g.groupBy("g")
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id").as("d0"), col("pos").as("p0"))).as("k0"))
      .filter(col("n") >= 2)
      .select("g", "k0")
    val removableStarts = g.join(firsts, "g")
      .filter(col("doc_id") =!= col("k0.d0") || col("pos") =!= col("k0.p0"))
      .groupBy("doc_id").agg(sort_array(collect_list(col("pos"))).as("ps"))
    ds.join(removableStarts, Seq("doc_id"), "left")
      .select(col("source"), size(col("ts")).cast("long").as("nt"),
        when(col("ps").isNull, lit(0L))
          .otherwise(size(coveredPositions(col("ps"))).cast("long")).as("nr"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum((col("nr") > 0).cast("long")).as("n_docs_affected"),
        sum(col("nt")).as("n_tokens"),
        sum(col("nr")).as("n_tokens_removed"))
      .orderBy("source")
  }

  /** Maximal-span LENGTH histogram — the report the ExactSubstr paper
    * publishes (how long the verbatim repeats are decides whether
    * they're boilerplate headers or wholesale copied documents).
    * Reuses the same single (gram, count) shuffle as the detector;
    * the repeated starts then explode per doc (O(repeated grams)
    * rows, a strict subset of the corpus token count), runs break on
    * a gap > K exactly as [[repeatedSpans]]'s fold defines them, and
    * each maximal run's length is last − first + K tokens. Per
    * length: span count and distinct affected documents. */
  def spanLengths(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = grams(docs(s, d))
    val starts = g.join(repeated(g), "g").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val runs = starts
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(w) > K, 1L).otherwise(0L))
      .withColumn("run", sum("brk").over(w))
      .groupBy("doc_id", "run")
      .agg((max("pos") - min("pos") + lit(K)).cast("long").as("span_len"))
    runs.groupBy("span_len")
      .agg(count(lit(1)).as("n_spans"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy("span_len")
  }

  /** Gram rows from a raw documents batch — the streaming ingest
    * hook ([[graft.streaming.Streams]]' span-ingest query feeds each
    * micro-batch through the same explode the batch operators use). */
  private[graft] def gramRows(docsRaw: DataFrame): DataFrame =
    grams(docsRaw.select(col("doc_id"), col("source"),
      split(col("text"), " ").as("ts")))

  /** The shared docs/grams oracle CTE (also used by the streaming
    * replay-parity oracle). */
  private[graft] def oracleGrams: String =
    s"""docs AS (
       |  SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
       |grams AS (
       |  SELECT doc_id, i - 1 AS pos, array_to_string(ts[i:i+${K - 1}], ' ') AS g
       |  FROM docs, LATERAL (SELECT unnest(range(1, len(ts) - $K + 2)) AS i) s
       |  WHERE len(ts) >= $K)""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("dedup_repeated_spans", repeatedSpans, Some(
      s"""WITH $oracleGrams,
         |rep AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         |ps AS (SELECT doc_id, list(pos ORDER BY pos) AS ps
         |       FROM grams JOIN rep USING (g) GROUP BY doc_id),
         |stats AS (
         |  SELECT doc_id,
         |    $K + COALESCE(list_sum(list_transform(range(2, len(ps) + 1),
         |      i -> least(ps[i] - ps[i-1], $K))), 0) AS dup,
         |    1 + COALESCE(list_sum(list_transform(range(2, len(ps) + 1),
         |      i -> CASE WHEN ps[i] - ps[i-1] > $K THEN 1 ELSE 0 END)), 0) AS spans
         |  FROM ps)
         |SELECT d.doc_id, CAST(len(d.ts) AS BIGINT) AS n_tokens,
         |  CAST(COALESCE(s.dup, 0) AS BIGINT) AS n_dup_tokens,
         |  CAST(COALESCE(s.spans, 0) AS BIGINT) AS n_spans
         |FROM docs d LEFT JOIN stats s USING (doc_id) ORDER BY doc_id""".stripMargin)),
    Q("dedup_repeated_spans_clean", spanClean, Some(
      s"""WITH $oracleGrams,
         |rep AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         |ps AS (SELECT doc_id, list(pos ORDER BY pos) AS ps
         |       FROM grams JOIN rep USING (g) GROUP BY doc_id),
         |cov AS (SELECT doc_id,
         |          list_distinct(flatten(list_transform(ps,
         |            p -> range(p, p + $K)))) AS cov
         |        FROM ps)
         |SELECT d.doc_id,
         |  -- COALESCE: a fully-covered doc filters to the empty list,
         |  -- where DuckDB's array_to_string yields NULL but Spark's
         |  -- concat_ws yields ''
         |  COALESCE(array_to_string(list_transform(
         |    list_filter(range(1, len(d.ts) + 1),
         |      i -> NOT list_contains(c.cov, i - 1)),
         |    i -> d.ts[i]), ' '), '') AS clean_text,
         |  CAST(len(c.cov) AS BIGINT) AS n_removed
         |FROM cov c JOIN docs d USING (doc_id) ORDER BY doc_id""".stripMargin)),
    Q("dedup_repeated_spans_keepfirst", spanKeepFirst, Some(
      s"""WITH $oracleGrams,
         |ranked AS (SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
         |    COUNT(*) OVER (PARTITION BY g) AS n
         |  FROM grams),
         |removable AS (
         |  SELECT doc_id, list(pos ORDER BY pos) AS ps
         |  FROM ranked WHERE n >= 2 AND rn > 1 GROUP BY doc_id),
         |perdoc AS (
         |  SELECT d.doc_id, d.source, len(d.ts) AS nt,
         |    COALESCE(len(list_distinct(flatten(list_transform(r.ps,
         |      p -> range(p, p + $K))))), 0) AS nr
         |  FROM docs d LEFT JOIN removable r USING (doc_id))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(CASE WHEN nr > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_affected,
         |  CAST(SUM(nt) AS BIGINT) AS n_tokens,
         |  CAST(SUM(nr) AS BIGINT) AS n_tokens_removed
         |FROM perdoc GROUP BY source ORDER BY source""".stripMargin)),
    Q("dedup_span_lengths", spanLengths, Some(
      s"""WITH $oracleGrams,
         |rep AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) >= 2),
         |starts AS (SELECT doc_id, pos FROM grams JOIN rep USING (g)),
         |runs AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) > $K
         |         THEN 1 ELSE 0 END AS brk
         |  FROM starts),
         |r2 AS (SELECT doc_id, pos,
         |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS run
         |  FROM runs),
         |spans AS (
         |  SELECT doc_id, run, MAX(pos) - MIN(pos) + $K AS span_len
         |  FROM r2 GROUP BY doc_id, run)
         |SELECT CAST(span_len AS BIGINT) AS span_len, COUNT(*) AS n_spans,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM spans GROUP BY span_len ORDER BY span_len""".stripMargin)),
  )
}
