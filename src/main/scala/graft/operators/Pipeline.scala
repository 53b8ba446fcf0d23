package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation (north star capstone): the
  * composition a 100 TB corpus pipeline actually runs —
  *
  *   1. quality gate: token count and stopword-density thresholds
  *      (per-row expressions, evaluated at scan time);
  *   2. exact dedup: keep the minimum doc_id per content hash (one
  *      shuffle on a 32-byte key);
  *   3. language gate: keep docs whose stopword profile says 'en';
  *   4. accounting: surviving docs + token totals per source.
  *
  * Everything before the final per-source rollup is row-local or a
  * single hash exchange; the output cardinality is |sources|. The
  * whole pipeline is one declarative plan — Catalyst fuses the three
  * gates into the scan and the dedup exchange is the only wide
  * dependency before the rollup.
  */
object Pipeline {

  def corpusPrep(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in", "is", "it")
    // cached (r18): the gated scan feeds BOTH the exact-dedup rollup
    // and the survivor join — uncached, the regex-tokenizing gate ran
    // twice (two documents.parquet scans in the plan). Same
    // materialized-gated-corpus pin as [[fullPrep]].
    val scored = cached(Tables(s, d, "documents")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("stop_ratio",
        size(filter(col("t"), x => x.isInCollection(stop))).cast("double") /
          col("n_tokens"))
      // 1. quality gate
      .filter(col("n_tokens") >= 50 && col("stop_ratio") >= 0.05)
      // 3. language gate (en stopwords present — cheap lexicon test)
      .filter(size(filter(col("t"), x => x.isInCollection(Seq("the", "a", "and")))) > 0)
      // observability: gate selectivity is accounted IN the same pass
      // (no second scan); metrics surface via
      // queryExecution.observedMetrics / a QueryExecutionListener
      .observe("corpus_prep_gates",
        count(lit(1)).as("docs_after_gates"),
        sum(col("n_tokens").cast("long")).as("tokens_after_gates")))
    // 2. exact dedup: canonical = min doc_id per content hash
    val canonical = scored
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    // 4. accounting per source
    scored.join(canonical, "doc_id")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        davg(col("n_tokens").cast("double")).as("avg_tokens"))
      .orderBy("source")
  }

  /** Deterministic corpus splitting: every document is assigned to
    * train/validation/test by CONTENT HASH (polyHash mod 100 →
    * 80/10/10) — the reproducible-sampling idiom for training
    * pipelines. The split is a pure function of the text, so it is
    * stable across runs, cluster sizes, partitionings, and row order,
    * and upstream reshuffles can never leak validation documents
    * into train. One scan; the split decision is a per-row expression
    * fused into it; output cardinality |splits| × |langs|. */
  def hashSplit(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "documents")
      .withColumn("bucket", polyHash(col("text")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .groupBy("split", "lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
      .orderBy("split", "lang")

  /** Per-source sampling rates for [[sampleMix]] (percent kept).
    * The mix weights a training run would tune: keep all of src0,
    * half of src1, a quarter of src2, a tenth of everything else. */
  private val mixRates: Seq[(String, Int)] =
    Seq("src0" -> 100, "src1" -> 50, "src2" -> 25)
  private val mixDefault = 10

  /** Stratified deterministic sampling (data mixing): each source is
    * down-sampled to its target rate by CONTENT HASH — doc selection
    * is a pure function of the text (like [[hashSplit]]), so the mix
    * is reproducible across runs and partitionings and never biased
    * by row order. The sample decision is one per-row expression
    * fused into the scan (zero extra passes, no `TABLESAMPLE`
    * non-determinism); output is the per-source accounting a mixing
    * job reports. A different hash stream than the 80/10/10 split
    * (offset 7) so mix and split decisions stay independent. */
  def sampleMix(s: SparkSession, d: String): DataFrame = {
    val rate = mixRates.foldLeft(lit(mixDefault)) { case (acc, (src, r)) =>
      when(col("source") === src, lit(r)).otherwise(acc)
    }
    Tables(s, d, "documents")
      .withColumn("keep", (polyHash(concat(col("text"), lit("7"))) % 100) < rate)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("keep"), col("n_chars")).otherwise(0L)).as("sampled_chars"))
      .orderBy("source")
  }

  /** CURRICULUM ordering with source interleave — sort the corpus
    * easy→hard (n_chars as the difficulty proxy) for curriculum
    * training, but ROUND-ROBIN across sources at each difficulty
    * ordinal: a naive global sort-by-difficulty puts whole sources
    * in contiguous runs (web first, code last), which destabilizes
    * training; ordering by (per-source ordinal, source) guarantees
    * any N consecutive positions draw from every source still
    * contributing. Report: per (curriculum decile, source) the doc
    * count and difficulty range — the balance check that the
    * interleave holds in every decile.
    *
    * Scale: the per-source ordinal is a per-source window (source-
    * sized partitions; a single outsized source would swap in the
    * two-phase rank spelling); the global decile IS the two-phase
    * range-partition rank over (ordinal, source) — never a
    * single-partition global window. */
  def curriculum(s: SparkSession, d: String): DataFrame = {
    val bySrc = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    val ranked = Tables(s, d, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("k", row_number().over(bySrc).cast("long"))
    val parts = cached(ranked.repartitionByRange(32, col("k"), col("source"))
      .withColumn("pid", spark_partition_id()))
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"),
        coalesce(sum("cnt").over(prior), lit(0L)).as("off"))
    val local = Window.partitionBy("pid").orderBy("k", "source", "doc_id")
    val tot = parts.agg(count(lit(1)).as("n"))
    parts
      .withColumn("lrk", row_number().over(local).cast("long"))
      .join(broadcast(offs), "pid")
      .crossJoin(broadcast(tot))
      .select(col("source"), col("n_chars"),
        expr("((off + lrk - 1) * 10) div n").as("decile"))
      .groupBy("decile", "source")
      .agg(count(lit(1)).as("n_docs"),
        min("n_chars").as("min_chars"), max("n_chars").as("max_chars"))
      .orderBy("decile", "source")
  }

  /** Epochs reported by [[epochShuffle]]. */
  private val ShuffleEpochs = 3

  /** DETERMINISTIC EPOCH SHUFFLE — the reshuffle-per-epoch a training
    * loader needs, as a pure function of (content, epoch): epoch e
    * orders documents by polyHash('e' ∥ e ∥ text), so the permutation
    * is reproducible across runs/partitionings (the [[hashSplit]]
    * discipline) yet different per epoch, with doc_id breaking hash
    * ties. The salt is PREPENDED: a polynomial hash's last character
    * contributes additively, so an APPENDED epoch digit shifts every
    * document's hash by the same constant and epochs 1..3 come out
    * as the identical permutation (caught by the epochs-differ spec
    * pin; prepending multiplies the salt by 31^len(text), which
    * genuinely reshuffles). Report: per epoch the exact total and
    * mean absolute DISPLACEMENT from the doc_id (ingest) order —
    * the shuffle-quality statistic (≈ n/3 expected for a uniform
    * permutation; an ineffective salt reports identical sums).
    *
    * Scale: per-epoch positions use the TWO-PHASE range-partition
    * rank (the [[curriculum]] spelling, generalized per epoch) — a
    * `Window.partitionBy(epoch)` would put each epoch's ENTIRE corpus
    * in one window partition, i.e. |epochs| single-task global sorts
    * (the r15 advice catch). Here the exploded (epoch, h, doc_id)
    * rows range-partition across 32 tasks; per-(epoch, pid) counts
    * broadcast back as offsets (|epochs|×32 rows) and local
    * row_numbers complete the global rank. The ingest-order base rank
    * is epoch-independent, so it is computed ONCE over doc_id (same
    * two-phase shape) and equi-joined back. Text never shuffles —
    * hashes are computed map-side and only (epoch, doc_id, h) rows
    * move. The displacement report is |epochs| rows. */
  def epochShuffle(s: SparkSession, d: String): DataFrame = {
    val docs = Tables(s, d, "documents").select(col("doc_id"), col("text"))
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // global rank of doc_id (ingest order), two-phase
    val dparts = cached(docs.select(col("doc_id"))
      .repartitionByRange(32, col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    val doffs = dparts.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"), coalesce(sum("cnt").over(prior), lit(0L)).as("off"))
    val based = dparts
      .withColumn("lrk", row_number()
        .over(Window.partitionBy("pid").orderBy("doc_id")).cast("long"))
      .join(broadcast(doffs), "pid")
      .select(col("doc_id"), (col("off") + col("lrk") - 1).as("base"))
    // global rank of (h, doc_id) WITHIN each epoch, two-phase: range
    // partitioning on (epoch, h, doc_id) keeps every pid's rows ≥ all
    // lower pids' rows in that order, so a per-(epoch, pid') count
    // prefix-sum over pid' < pid is each row's epoch-global offset
    val hashed = docs
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), lit(ShuffleEpochs))).as("epoch"))
      .select(col("epoch"), col("doc_id"),
        polyHash(concat(lit("e"), col("epoch").cast("string"), col("text")))
          .as("h"))
    val parts = cached(hashed
      .repartitionByRange(32, col("epoch"), col("h"), col("doc_id"))
      .withColumn("pid", spark_partition_id()))
    val offs = parts.groupBy("epoch", "pid").agg(count(lit(1)).as("cnt"))
      .select(col("epoch"), col("pid"),
        coalesce(sum("cnt").over(Window.partitionBy("epoch").orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)).as("off"))
    parts
      .withColumn("lrk", row_number()
        .over(Window.partitionBy("epoch", "pid").orderBy("h", "doc_id"))
        .cast("long"))
      .join(broadcast(offs), Seq("epoch", "pid"))
      .select(col("epoch"), col("doc_id"), (col("off") + col("lrk") - 1).as("pos"))
      .join(based, "doc_id")
      .groupBy("epoch")
      .agg(count(lit(1)).as("n_docs"),
        sum(abs(col("pos") - col("base"))).as("sum_displacement"))
      .select(col("epoch").cast("long").as("epoch"), col("n_docs"),
        col("sum_displacement"),
        (col("sum_displacement").cast("double") /
          col("n_docs").cast("double")).as("mean_displacement"))
      .orderBy("epoch")
  }

  /** One-pass column profiler (ingest data-quality gate): per column
    * of `documents` — row count, nulls, exact distinct count, min and
    * max (rendered as strings so heterogeneous columns stack into one
    * result shape). A single aggregate over one scan; the multi-column
    * exact `count(DISTINCT …)` plans as one Expand(×|cols|) +
    * partial/final aggregate — the deliberate trade for EXACT counts.
    * A 100 TB profiling pass swaps `count_distinct` for
    * `approx_count_distinct` (mergeable HLL sketches, no Expand) and
    * keeps everything else; exact is kept here because the oracle
    * must hash-match. The 1-row aggregate is then unpivoted to
    * one-row-per-column with `stack` — driver-side trivia at
    * cardinality |columns|. */
  def profileColumns(s: SparkSession, d: String): DataFrame = {
    val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
        count_distinct(col(c)).as(s"dist_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val stacked = cols.map(c =>
      s"'$c', n_rows, null_$c, dist_$c, min_$c, max_$c").mkString(", ")
    Tables(s, d, "documents")
      .agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${cols.size}, $stacked) AS " +
        "(col_name, n_rows, n_nulls, n_distinct, min_value, max_value)")
      .orderBy("col_name")
  }

  /** Fixed token-budget chunking (sequence packing, the simple form):
    * every document is split into ceil(n_tokens / 32)-many 32-token
    * windows — the map-side `explode` a pretraining tokenizer shard
    * step runs. No shuffle until the |sources|-row accounting: chunks
    * per source, how many are full, and the padding the final partial
    * chunks would cost. Chunk boundaries are pure arithmetic on token
    * counts (`sequence` + `least`), so no token array survives past
    * the scan projection. */
  def tokenChunks(s: SparkSession, d: String): DataFrame = {
    val W = 32
    Tables(s, d, "documents")
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .filter(col("n_tokens") > 0)
      // (n-1) div W == ceil(n/W) - 1 for n ≥ 1; `div` keeps the
      // arithmetic integral (Spark's `/` on ints returns double)
      .select(col("source"), col("n_tokens"),
        explode(expr(s"sequence(0, (n_tokens - 1) div $W)")).as("chunk_idx"))
      .withColumn("chunk_tokens",
        least(lit(W), col("n_tokens") - col("chunk_idx") * W))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(when(col("chunk_tokens") === W, 1L).otherwise(0L)).as("n_full"),
        sum(lit(W) - col("chunk_tokens")).as("padding_tokens"))
      .orderBy("source")
  }

  /** Leakage-AWARE train/val/test split: a plain per-document hash
    * split (pipeline_hash_split) puts near-duplicate documents in
    * DIFFERENT splits ~27% of the time per pair — evaluation then
    * scores the model on paraphrases of its training data. Here the
    * split decision hashes the GROUP id — the near-dup cluster id
    * where one exists ([[Dedup.dupClusters]]), else the doc's own id
    * — so whole clusters move together. The output carries the proof:
    * `n_leaky_clusters` (clusters spanning >1 split) is 0 by
    * construction, and the oracle recomputes it from the exact
    * ground-truth closure.
    *
    * Scale shape: the cluster table is the (comparatively tiny)
    * output of the iterative components job; the guarantee then costs
    * ONE left join on doc_id + a map-side hash — the split itself
    * never shuffles the corpus, and the accounting is a |splits|-row
    * aggregate. */
  def clusterSplit(s: SparkSession, d: String): DataFrame = {
    val clusters = Dedup.dupClusters(s, d).select("doc_id", "cluster_id")
    val g = cached(Tables(s, d, "documents")
      .join(clusters, Seq("doc_id"), "left")
      .withColumn("gid", coalesce(col("cluster_id"), col("doc_id")))
      .withColumn("bucket",
        pmod(polyHash(concat(col("gid").cast("string"), lit("split"))), lit(100)))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test")))
    val leaky = g.filter(col("cluster_id").isNotNull)
      .groupBy("cluster_id").agg(count_distinct(col("split")).as("ns"))
      .agg(coalesce(sum(when(col("ns") > 1, 1L).otherwise(0L)), lit(0L))
        .as("n_leaky_clusters"))
    g.groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("gid")).as("n_groups"),
        sum(when(col("cluster_id").isNotNull, 1L).otherwise(0L)).as("n_clustered_docs"))
      .crossJoin(broadcast(leaky))
      .orderBy("split")
  }

  /** The FULL training-data preparation pipeline, end to end in one
    * declarative plan — the capstone composition a 100 TB corpus
    * actually runs before tokenization:
    *
    *   1. quality + language gates (row-local, fused into the scan);
    *   2. exact dedup (min doc_id per md5 — 32-byte shuffle key);
    *   3. NEAR-dup removal over the survivors: MinHash-LSH verified
    *      J ≥ 0.8 pairs, then the one-pass keep policy "drop every
    *      pair's higher doc_id" (each removed doc names a surviving
    *      lower-id near-twin; the transitive-closure variant is
    *      [[graft.operators.Dedup.dupClusters]]);
    *   4. deterministic 80/10/10 content-hash split;
    *   5. per-split accounting (docs + tokens).
    *
    * Wide dependencies: the exact-dedup exchange, the LSH band join,
    * and the split rollup — everything else rides the initial scan.
    * The near-dup drop is a LEFT ANTI join against the (tiny) pair
    * victim set. */
  def fullPrep(s: SparkSession, d: String): DataFrame = {
    val stop = Seq("the", "a", "and", "of", "to", "in", "is", "it")
    // cached: the token-gate scan feeds BOTH the exact-dedup agg and
    // the survivors join — without it the (regex-tokenizing) scan
    // runs twice; at cluster scale this is the materialized
    // gated-corpus stage every later stage reads
    val gated = cached(Tables(s, d, "documents")
      .withColumn("t", TextAnalysis.tokens(col("text")))
      .withColumn("n_tokens", size(col("t")))
      .withColumn("stop_ratio",
        size(filter(col("t"), x => x.isInCollection(stop))).cast("double") /
          col("n_tokens"))
      .filter(col("n_tokens") >= 50 && col("stop_ratio") >= 0.05)
      .filter(size(filter(col("t"), x => x.isInCollection(Seq("the", "a", "and")))) > 0))
    val canonical = gated
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id")).select("doc_id")
    val survivors = cached(gated.join(canonical, "doc_id"))
    val victims = Dedup.verifiedPairsOf(cached(Dedup.wordSetsOf(survivors)))
      .select(col("doc_b").as("doc_id")).distinct()
    survivors.join(victims, Seq("doc_id"), "left_anti")
      .withColumn("bucket", polyHash(col("text")) % 100)
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "validation")
          .otherwise("test"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"))
      .orderBy("split")
  }

  /** Fixed-size deterministic stratified sample: exactly K docs per
    * source, chosen by CONTENT-HASH order (hash stream offset 11,
    * independent of the split/mix streams; ties broken by doc_id) —
    * a reservoir-style "give me exactly 100 eval docs per source"
    * that is reproducible across runs and partitionings, unlike
    * rand()-based reservoirs. Spelled as a per-stratum top-k window.
    * At 100 TB with FEW strata the full window sort would hot-spot
    * its handful of partitions — production first gates by hash rate
    * to ~2K survivors per stratum (the [[sampleMix]] expression) and
    * only then runs this exact top-k on the survivors; the semantics
    * below are that final exact step. */
  def stratifiedK(s: SparkSession, d: String): DataFrame = {
    val K = 100
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    Tables(s, d, "documents")
      .withColumn("h", polyHash(concat(col("text"), lit("11"))))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_sampled"),
        sum("n_chars").as("sampled_chars"),
        max("rn").cast("long").as("k_effective"))
      .orderBy("source")
  }

  /** Data-mixing weight table: the per-source numbers a training run
    * uses to set sampling ratios. `token_share` is the exact
    * proportional share (integer token counts, one exact division);
    * `sqrt_weight_rel` is the alpha=0.5 temperature-scaled weight
    * relative to the largest source — the standard "flatten the
    * source distribution" reweighting (small sources get upsampled
    * relative to proportional). Both are deterministic IEEE doubles:
    * sqrt and division are correctly-rounded single ops over exact
    * integers, so the DuckDB oracle reproduces them bit-for-bit —
    * no sum-of-doubles normalizer anywhere (a Σ√tokens constant
    * would be accumulation-order-dependent). One scan; output
    * cardinality |sources|. */
  def mixWeights(s: SparkSession, d: String): DataFrame = {
    // perSrc feeds both the totals subtree and the crossJoin stream
    // side; cached() so the tokenize scan runs once, not twice
    val perSrc = cached(Tables(s, d, "documents")
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens")))
    val totals = perSrc.agg(
      sum("total_tokens").as("grand_tokens"),
      max(sqrt(col("total_tokens").cast("double"))).as("max_sqrt"))
    perSrc.crossJoin(broadcast(totals))
      .select(col("source"), col("n_docs"), col("total_tokens"),
        (col("total_tokens").cast("double") / col("grand_tokens").cast("double"))
          .as("token_share"),
        (sqrt(col("total_tokens").cast("double")) / col("max_sqrt"))
          .as("sqrt_weight_rel"))
      .orderBy("source")
  }

  /** Concat-and-chunk sequence packing: the exact accounting of the
    * standard pretraining batcher — per hash shard, documents are
    * concatenated in a deterministic content-hash order and the token
    * stream is cut every L=256 tokens; a document whose span crosses
    * a cut boundary is split across multiple training sequences (a
    * doc longer than L spans 3+). Reports per shard: docs, tokens,
    * sequences produced (ceil(total/L)), and how many documents get
    * split at least once (not the number of split points).
    *
    * Scale shape: the shard is the parallel unit — the running token
    * sum is a window cumsum WITHIN each shard, so at 100 TB this is
    * |shards|-way parallel with no global ordering anywhere (a global
    * cumsum would serialize on one range-partition tail). Shard count
    * scales with the cluster; 8 here to keep sf-scale outputs
    * readable. All arithmetic is integer-exact. */
  def packSequences(s: SparkSession, d: String): DataFrame = {
    val L = 256
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
    Tables(s, d, "documents")
      .withColumn("n_tokens", size(TextAnalysis.tokens(col("text"))))
      .filter(col("n_tokens") > 0)
      .withColumn("h", polyHash(concat(col("text"), lit("13"))))
      .withColumn("shard", pmod(col("h"), lit(8)))
      .withColumn("cum", sum("n_tokens").over(w))
      // doc occupies tokens [cum - n_tokens, cum); it crosses a cut
      // iff its first and last token land in different L-windows
      // (integer div keeps everything exact on both engines)
      .withColumn("split_doc",
        expr(s"(cum - n_tokens) div $L") =!= expr(s"(cum - 1) div $L"))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        expr(s"(max(cum) + ${L - 1}) div $L").as("n_sequences"),
        sum(when(col("split_doc"), 1L).otherwise(0L)).as("n_split_docs"))
      .orderBy("shard")
  }

  /** Pairwise source-vocabulary overlap — the mixture-design
    * diagnostic read before setting [[mixWeights]]: two sources whose
    * vocabularies barely overlap contribute diversity; near-identical
    * vocabularies mean the mixture is double-counting one
    * distribution. Exact Jaccard between each source pair's DISTINCT
    * token sets, spelled as the set-similarity equi-join (distinct
    * (source, token) → self-join on token, a < b → shared count;
    * never an all-pairs comparison of vocabularies as arrays). Scale:
    * the distinct projection collapses the corpus to |vocab|·|sources|
    * rows before anything wide; the token join's fan-out per token is
    * ≤ |sources|² with |sources| small by construction — the shuffle
    * carries (token) then (source-pair) keys. Integer counts, one
    * double division. */
  def sourceOverlap(s: SparkSession, d: String): DataFrame = {
    val st = cached(Tables(s, d, "documents")
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .distinct())
    val sizes = st.groupBy("source").agg(count(lit(1)).as("nv"))
    val shared = st.toDF("sa", "tok").join(st.toDF("sb", "tok"), "tok")
      .filter(col("sa") < col("sb"))
      .groupBy("sa", "sb").agg(count(lit(1)).as("n_shared"))
    shared
      .join(sizes.toDF("sa", "nva"), "sa")
      .join(sizes.toDF("sb", "nvb"), "sb")
      .select(col("sa").as("source_a"), col("sb").as("source_b"),
        col("nva").as("vocab_a"), col("nvb").as("vocab_b"), col("n_shared"),
        (col("n_shared").cast("double") /
          (col("nva") + col("nvb") - col("n_shared")).cast("double"))
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  private val BinCap = 64 // whole-doc packing capacity in tokens

  /** Whole-document bin packing (next-fit-decreasing) — the OTHER
    * packing discipline next to [[packSequences]]'s concat-and-chunk:
    * instruction-tuning and boundary-respecting pretraining must NOT
    * split a document across training sequences, so docs pack WHOLE
    * into [[BinCap]]-token bins and the cost metric is bin count +
    * fill fraction, not split count. Exact first-fit-decreasing is
    * inherently sequential (every placement consults every open
    * bin), so the scalable spelling is per-shard NEXT-fit-decreasing:
    * hash-shard the corpus (16 ways here; thousands at 100 TB — the
    * greedy runs independently per shard), sort each shard by
    * (n_tokens DESC, doc_id), and fold left to right, opening a new
    * bin whenever the next doc no longer fits. The fold's running
    * fill RESETS on overflow — a non-associative scan no
    * window/cumsum can express — so this is the one operator class
    * where a sortWithinPartitions + mapPartitions fold IS the right
    * Spark tool (per-partition imperative state, zero extra shuffle
    * beyond the shard exchange). Decreasing order is the classic
    * variance reducer (big items first, small items fill the tails).
    * Docs longer than the capacity cannot pack whole and are counted
    * out per shard instead of silently truncated. The oracle replays
    * the identical fold as a rank-recursive CTE, and
    * `assign_checksum` = Σ doc_id·(bin+1) pins every per-doc bin
    * assignment, not just the aggregate counts. */
  def binPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val L = BinCap
    val base = cached(Tables(s, d, "documents")
      .withColumn("n", size(TextAnalysis.tokens(col("text"))))
      .filter(col("n") > 0)
      .withColumn("shard",
        pmod(polyHash(concat(col("text"), lit("19"))), lit(16)).cast("int")))
    val oversize = base.filter(col("n") > L)
      .groupBy("shard").agg(count(lit(1)).as("n_oversize"))
    val packed = base.filter(col("n") <= L)
      .select(col("shard"), col("doc_id"), col("n"))
      .repartition(16, col("shard"))
      .sortWithinPartitions(col("shard"), col("n").desc, col("doc_id"))
      .as[(Int, Long, Int)]
      .mapPartitions { it =>
        // a partition may hold several whole shards; state resets on
        // the shard boundary (rows arrive shard-grouped by the sort)
        var shard = Int.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (sh, id, n) =>
          if (sh != shard) { shard = sh; bin = 0L; fill = 0L }
          if (fill + n > L) { bin += 1; fill = n.toLong } else fill += n
          (sh, id, n, bin)
        }
      }
      .toDF("shard", "doc_id", "n", "bin")
    packed.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        (max("bin") + 1).as("n_bins"),
        sum("n").as("total_tokens"),
        sum(col("doc_id") * (col("bin") + 1)).as("assign_checksum"))
      .join(oversize, Seq("shard"), "left")
      .select(col("shard"), col("n_docs"),
        coalesce(col("n_oversize"), lit(0L)).as("n_oversize"),
        col("n_bins"), col("total_tokens"), col("assign_checksum"),
        (col("total_tokens").cast("double") /
          (col("n_bins") * L).cast("double")).as("fill_frac"))
      .orderBy("shard")
  }

  /** Systematic (fixed-interval) WEIGHTED sampling — the exact-count
    * complement to [[sampleMix]]'s Bernoulli hash thresholding. Docs
    * are laid on a per-(source, shard) axis of cumulative character
    * mass in content-hash order, and one document is taken wherever
    * the axis crosses a STEP-character boundary: a doc is selected
    * iff its span `[cum − n_chars, cum)` contains a multiple of
    * STEP. Selection probability is proportional to length (docs
    * ≥ STEP chars are always taken) and the per-shard sample size is
    * EXACTLY ⌈mass/STEP⌉-ish (±1) — none of Bernoulli sampling's
    * binomial variance, which matters when the budget is a token
    * count, not a rate. All arithmetic is integer-exact; hash order
    * makes the sample reproducible and unbiased by ingest order.
    *
    * Scale posture: the cumulative sum is a window per
    * (source, shard) — 16 hash shards per source restore full
    * parallelism (a single per-source cumsum would serialize each
    * source through one task at 100 TB); each shard is its own exact
    * systematic sample, so the union keeps the per-source exactness
    * within ±|shards|. */
  def systematicSample(s: SparkSession, d: String): DataFrame = {
    val Step = 4096L
    val w = Window.partitionBy("source", "shard").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(s, d, "documents")
      .withColumn("h", polyHash(concat(col("text"), lit("17"))))
      .withColumn("shard", pmod(col("h"), lit(16)))
      .withColumn("cum", sum(col("n_chars").cast("long")).over(w))
      .withColumn("sel",
        expr(s"cum div $Step") =!= expr(s"(cum - n_chars) div $Step"))
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("sel"), 1L).otherwise(0L)).as("n_sampled"),
        sum(when(col("sel"), col("n_chars").cast("long")).otherwise(0L))
          .as("sampled_chars"),
        sum(when(col("sel"), col("doc_id")).otherwise(0L)).as("id_checksum"))
      .orderBy("source")
  }

  /** Contiguous global row ids (gap-free, ordered by doc_id) WITHOUT
    * the single-partition `row_number() OVER (ORDER BY …)` that
    * serializes the whole corpus through one task at scale: the
    * classic two-phase offset assignment. Phase 1 range-partitions by
    * doc_id and counts rows per partition (a |partitions|-row frame);
    * phase 2 broadcasts the cumulative offsets back and adds each
    * row's in-partition rank. The ranking window partitions by pid —
    * |partitions| uniform groups, so full parallelism is preserved
    * where the naive spelling has exactly one group.
    *
    * The range-partitioned frame is pinned with persist(): range
    * boundaries come from sampling, and an unpinned recompute between
    * the two phases could re-draw them, mismatching offsets against
    * pids. (This is the DataFrame spelling of RDD `zipWithIndex`,
    * which runs the same two jobs internally.) */
  def globalIds(s: SparkSession, d: String): DataFrame = {
    val parts = cached(
      Tables(s, d, "documents").select("doc_id")
        .repartitionByRange(32, col("doc_id"))
        .withColumn("pid", spark_partition_id()))
    val offsets = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum("cnt").over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "off")
    val local = Window.partitionBy("pid").orderBy("doc_id")
    parts
      .withColumn("local", row_number().over(local))
      .join(broadcast(offsets), "pid")
      .select(col("doc_id"), (col("off") + col("local")).as("global_id"))
      .orderBy("doc_id")
  }

  private val CapPerSource = 40

  /** Per-source quota sampling — cap every source at
    * [[CapPerSource]] documents, chosen by a deterministic hash rank
    * (stable across runs/partitionings, unbiased w.r.t. doc order).
    * The production knob that stops one giant crawl domain from
    * dominating a training mix. Output per source: surviving doc
    * count, their character volume, and an id checksum pinning the
    * exact chosen set.
    *
    * Scale: selection runs on the custom bounded-heap
    * [[graft.plans.TopKPerGroup]] operator — one hash exchange on
    * `source`, O(cap) memory per source, NO per-source full sort —
    * where the built-in `row_number` spelling would sort every row
    * of a 100 TB corpus just to keep 40 per source. The oracle
    * replays the row_number spelling; both select the same rows. */
  def sourceCap(s: SparkSession, d: String): DataFrame = {
    val ranked = Tables(s, d, "documents")
      .withColumn("h", pmod(col("doc_id") * lit(2654435761L), lit(HashMod)))
    graft.plans.TopKPerGroup(ranked,
        Seq("source"), Seq("h" -> true, "doc_id" -> true), CapPerSource)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"),
        sum("doc_id").as("id_checksum"))
      .orderBy("source")
  }

  /** Train-vs-holdout unigram drift monitor: split the corpus by the
    * deterministic content hash ([[hashSplit]]'s 80/20), count every
    * token's occurrences in each side, and rank tokens by the
    * absolute difference of their per-billion occurrence rates —
    * integer-quantized, so the statistic is exact and
    * order-independent. The production check that a validation set
    * still looks like the training distribution (and, run between
    * two corpus SNAPSHOTS, the data-drift alarm for an ingest
    * pipeline).
    *
    * Scale: one scan + explode feeding a partially-aggregated
    * per-token conditional count (the shuffle carries vocabulary
    * cardinality, not token instances); the totals frame is a 1-row
    * broadcast; the final cut is TakeOrdered(20). */
  def tokenDrift(s: SparkSession, d: String): DataFrame = {
    val split = when(polyHash(col("text")) % 100 < 80, "train").otherwise("holdout")
    driftRank(Tables(s, d, "documents")
      .select(split.as("split"), explode(TextAnalysis.tokens(col("text"))).as("term"))
      .groupBy("term").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L)).as("c_train"),
        sum(when(col("split") === "holdout", 1L).otherwise(0L)).as("c_hold")))
  }

  /** The drift ranking tail over per-term (c_train, c_hold) counts —
    * ONE spelling shared by the batch monitor and the streaming
    * replay (`stream_token_drift`), so the quantization constant and
    * tie-break can never diverge between the two. The counts frame is
    * cached: it feeds both the totals aggregate and the scored join,
    * and ReuseExchange can't be relied on to dedupe specialized
    * branches (see [[TextAnalysis.bm25]]'s note). */
  private[graft] def driftRank(counts: DataFrame): DataFrame = {
    val c = cached(counts)
    val totals = c.agg(sum("c_train").as("n_train"), sum("c_hold").as("n_hold"))
    c.crossJoin(broadcast(totals))
      .withColumn("drift", abs(
        expr("(c_train * 1000000000) div n_train") -
          expr("(c_hold * 1000000000) div n_hold")))
      .orderBy(col("drift").desc, col("term"))
      .limit(20)
      .select("term", "c_train", "c_hold", "drift")
  }

  private val oTok = TextAnalysis.oTokens

  /** [[tokenDrift]]'s oracle — shared with the streaming replay
    * (`stream_token_drift`), which maintains the same per-term split
    * counters incrementally and must converge to the identical
    * ranking. */
  private[graft] val oTokenDriftSql: String =
    s"""WITH toks AS (
       |  SELECT CASE WHEN ${oPolyHash("text")} % 100 < 80
       |           THEN 'train' ELSE 'holdout' END AS split,
       |         unnest($oTok) AS term
       |  FROM documents),
       |counts AS (SELECT term,
       |    CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS c_train,
       |    CAST(SUM(CASE WHEN split = 'holdout' THEN 1 ELSE 0 END) AS BIGINT) AS c_hold
       |  FROM toks GROUP BY term),
       |tot AS (SELECT CAST(SUM(c_train) AS BIGINT) AS n_train,
       |               CAST(SUM(c_hold) AS BIGINT) AS n_hold FROM counts)
       |SELECT term, c_train, c_hold,
       |  abs((c_train * 1000000000) // n_train
       |      - (c_hold * 1000000000) // n_hold) AS drift
       |FROM counts CROSS JOIN tot
       |ORDER BY drift DESC, term LIMIT 20""".stripMargin

  val queries: Seq[Q] = Seq(
    Q("pipeline_token_drift", tokenDrift, Some(oTokenDriftSql)),
    Q("pipeline_source_cap", sourceCap, Some(
      s"""WITH r AS (
         |  SELECT source, doc_id, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY (doc_id * 2654435761) % $HashMod, doc_id) AS rk
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_kept,
         |  CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
         |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
         |FROM r WHERE rk <= $CapPerSource
         |GROUP BY source ORDER BY source""".stripMargin)),
    Q("pipeline_corpus_prep", corpusPrep, Some(
      s"""WITH scored AS (
         |  SELECT doc_id, source, text, len(t) AS n_tokens,
         |    CAST(len(list_filter(t, x -> x IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
         |      / len(t) AS stop_ratio,
         |    len(list_filter(t, x -> x IN ('the','a','and'))) AS en_hits
         |  FROM (SELECT doc_id, source, text, $oTok AS t FROM documents)),
         |gated AS (
         |  SELECT * FROM scored
         |  WHERE n_tokens >= 50 AND stop_ratio >= 0.05 AND en_hits > 0),
         |canonical AS (
         |  SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text))
         |SELECT source, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  (CAST(SUM(CAST(CAST(n_tokens AS DOUBLE) AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS avg_tokens
         |FROM gated JOIN canonical USING (doc_id)
         |GROUP BY source ORDER BY source""".stripMargin)),
    Q("pipeline_hash_split", hashSplit, Some(
      s"""WITH b AS (
         |  SELECT lang, n_chars, ${oPolyHash("text")} % 100 AS bucket
         |  FROM documents)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'validation'
         |            ELSE 'test' END AS split,
         |  lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
         |FROM b GROUP BY 1, 2 ORDER BY split, lang""".stripMargin)),
    Q("pipeline_cluster_split", clusterSplit, Some(
      s"""WITH RECURSIVE ${Dedup.oClusterChain},
         |g AS (
         |  SELECT d.doc_id, COALESCE(cc.cluster_id, d.doc_id) AS gid, cc.cluster_id AS cluster_id
         |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.doc_id),
         |sp AS (
         |  SELECT doc_id, gid, cluster_id,
         |    CASE WHEN bucket < 80 THEN 'train'
         |         WHEN bucket < 90 THEN 'validation'
         |         ELSE 'test' END AS split
         |  FROM (SELECT *, ${oPolyHash("CAST(gid AS VARCHAR) || 'split'")} % 100 AS bucket FROM g)),
         |leaky AS (
         |  SELECT CAST(COALESCE(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
         |    AS n_leaky_clusters
         |  FROM (SELECT cluster_id, COUNT(DISTINCT split) AS ns
         |        FROM sp WHERE cluster_id IS NOT NULL GROUP BY cluster_id))
         |SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT gid) AS n_groups,
         |  CAST(SUM(CASE WHEN cluster_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_clustered_docs,
         |  n_leaky_clusters
         |FROM sp CROSS JOIN leaky
         |GROUP BY split, n_leaky_clusters ORDER BY split""".stripMargin)),
    Q("pipeline_sample_mix", sampleMix, Some(
      s"""WITH b AS (
         |  SELECT source, n_chars,
         |    (${oPolyHash("text || '7'")} % 100) <
         |      (CASE WHEN source = 'src0' THEN 100
         |            WHEN source = 'src1' THEN 50
         |            WHEN source = 'src2' THEN 25
         |            ELSE 10 END) AS keep
         |  FROM documents)
         |SELECT source, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(SUM(CASE WHEN keep THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars
         |FROM b GROUP BY source ORDER BY source""".stripMargin)),
    Q("pipeline_full", fullPrep, Some {
      val sm = Dedup.ShingleMix
      val p = graft.Core.HashMod
      s"""WITH t AS (
         |  SELECT doc_id, text, $oTok AS tok FROM documents),
         |scored AS (
         |  SELECT doc_id, text, tok, len(tok) AS n_tokens,
         |    CAST(len(list_filter(tok, x -> x IN ('the','a','and','of','to','in','is','it'))) AS DOUBLE)
         |      / len(tok) AS stop_ratio,
         |    len(list_filter(tok, x -> x IN ('the','a','and'))) AS en_hits
         |  FROM t),
         |gated AS (
         |  SELECT * FROM scored
         |  WHERE n_tokens >= 50 AND stop_ratio >= 0.05 AND en_hits > 0),
         |canon AS (SELECT min(doc_id) AS doc_id FROM gated GROUP BY md5(text)),
         |surv AS (SELECT g.* FROM gated g JOIN canon USING (doc_id)),
         |th AS (
         |  SELECT doc_id, list_transform(tok, s -> ${oPolyHash("s")}) AS th
         |  FROM surv WHERE len(tok) >= 3),
         |sets AS (
         |  SELECT doc_id, list_distinct(list_transform(generate_series(1, len(th) - 2),
         |    i -> ((th[i] * $sm + th[i+1]) % $p * $sm + th[i+2]) % $p)) AS sh
         |  FROM th),
         |pr AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    len(list_intersect(a.sh, b.sh)) AS i, len(a.sh) AS la, len(b.sh) AS lb
         |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id),
         |victims AS (
         |  SELECT DISTINCT doc_b FROM pr
         |  WHERE CAST(i AS DOUBLE) / (la + lb - i) >= 0.8),
         |keep AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_b FROM victims)),
         |b AS (SELECT n_tokens, ${oPolyHash("text")} % 100 AS bucket FROM keep)
         |SELECT CASE WHEN bucket < 80 THEN 'train'
         |            WHEN bucket < 90 THEN 'validation'
         |            ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |FROM b GROUP BY 1 ORDER BY split""".stripMargin
    }),
    // oracle: one global ordered row_number over (ordinal, source)
    // (fine at oracle size; the engine's two-phase spelling is the
    // 100 TB case) over the same per-source difficulty ordinal
    Q("pipeline_curriculum", curriculum, Some(
      """WITH s AS (
        |  SELECT source, n_chars,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY n_chars, doc_id) AS k,
        |    doc_id
        |  FROM documents),
        |p AS (SELECT source, n_chars,
        |        row_number() OVER (ORDER BY k, source, doc_id) - 1 AS pos
        |      FROM s),
        |t AS (SELECT COUNT(*) AS n FROM documents)
        |SELECT CAST((pos * 10) // n AS BIGINT) AS decile, source,
        |  COUNT(*) AS n_docs,
        |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
        |  CAST(MAX(n_chars) AS BIGINT) AS max_chars
        |FROM p, t GROUP BY 1, 2 ORDER BY decile, source""".stripMargin)),
    // oracle: the same salted polyHash permutation per epoch and the
    // same exact displacement integers
    Q("pipeline_epoch_shuffle", epochShuffle, Some(
      s"""WITH e AS (
         |  SELECT doc_id, epoch,
         |    ${oPolyHash("'e' || CAST(epoch AS VARCHAR) || text")} AS h
         |  FROM documents, (SELECT unnest(generate_series(1, 3)) AS epoch)),
         |p AS (
         |  SELECT epoch,
         |    row_number() OVER (PARTITION BY epoch ORDER BY h, doc_id) - 1 AS pos,
         |    row_number() OVER (PARTITION BY epoch ORDER BY doc_id) - 1 AS base
         |  FROM e)
         |SELECT CAST(epoch AS BIGINT) AS epoch, COUNT(*) AS n_docs,
         |  CAST(SUM(ABS(pos - base)) AS BIGINT) AS sum_displacement,
         |  CAST(SUM(ABS(pos - base)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
         |    AS mean_displacement
         |FROM p GROUP BY epoch ORDER BY epoch""".stripMargin)),
    Q("pipeline_stratified_k", stratifiedK, Some(
      s"""WITH h AS (
         |  SELECT source, n_chars, doc_id, ${oPolyHash("text || '11'")} AS h
         |  FROM documents),
         |r AS (
         |  SELECT *, row_number() OVER (PARTITION BY source ORDER BY h, doc_id) AS rn
         |  FROM h)
         |SELECT source, COUNT(*) AS n_sampled,
         |  CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
         |  CAST(max(rn) AS BIGINT) AS k_effective
         |FROM r WHERE rn <= 100 GROUP BY source ORDER BY source""".stripMargin)),
    Q("pipeline_systematic_sample", systematicSample, Some(
      s"""WITH hashed AS (
         |  SELECT doc_id, source, n_chars,
         |    ${oPolyHash("text || '17'")} AS h
         |  FROM documents),
         |c AS (
         |  SELECT source, doc_id, n_chars,
         |    SUM(CAST(n_chars AS BIGINT)) OVER (
         |      PARTITION BY source, h % 16 ORDER BY h, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM hashed)
         |SELECT source, COUNT(*) AS n_total,
         |  CAST(SUM(CASE WHEN cum // 4096 <> (cum - n_chars) // 4096
         |       THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
         |  CAST(SUM(CASE WHEN cum // 4096 <> (cum - n_chars) // 4096
         |       THEN n_chars ELSE 0 END) AS BIGINT) AS sampled_chars,
         |  CAST(SUM(CASE WHEN cum // 4096 <> (cum - n_chars) // 4096
         |       THEN doc_id ELSE 0 END) AS BIGINT) AS id_checksum
         |FROM c GROUP BY source ORDER BY source""".stripMargin)),
    Q("pipeline_global_ids", globalIds, Some(
      """SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS global_id
        |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("profile_columns", profileColumns, Some {
      val cols = Seq("doc_id", "lang", "n_chars", "source", "text")
      val a = cols.map(c =>
        s"""CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_$c,
           |    COUNT(DISTINCT $c) AS dist_$c,
           |    CAST(min($c) AS VARCHAR) AS min_$c,
           |    CAST(max($c) AS VARCHAR) AS max_$c""".stripMargin).mkString(",\n    ")
      val rows = cols.map(c =>
        s"SELECT '$c' AS col_name, n_rows, null_$c AS n_nulls, dist_$c AS n_distinct, " +
          s"min_$c AS min_value, max_$c AS max_value FROM a").mkString("\nUNION ALL\n")
      s"WITH a AS (\n  SELECT COUNT(*) AS n_rows,\n    $a\n  FROM documents)\n" +
        s"$rows\nORDER BY col_name"
    }),
    Q("pipeline_mix_weights", mixWeights, Some(
      s"""WITH t AS (SELECT source, len($oTok) AS n_tokens FROM documents),
         |p AS (SELECT source, COUNT(*) AS n_docs,
         |        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
         |      FROM t GROUP BY source),
         |g AS (SELECT CAST(SUM(total_tokens) AS BIGINT) AS grand_tokens,
         |        MAX(sqrt(CAST(total_tokens AS DOUBLE))) AS max_sqrt FROM p)
         |SELECT source, n_docs, total_tokens,
         |  CAST(total_tokens AS DOUBLE) / CAST(grand_tokens AS DOUBLE) AS token_share,
         |  sqrt(CAST(total_tokens AS DOUBLE)) / max_sqrt AS sqrt_weight_rel
         |FROM p CROSS JOIN g ORDER BY source""".stripMargin)),
    Q("pipeline_pack_sequences", packSequences, Some(
      s"""WITH t AS (SELECT doc_id, len($oTok) AS n_tokens,
         |        ${oPolyHash("text || '13'")} AS h FROM documents),
         |f AS (SELECT doc_id, n_tokens, h, h % 8 AS shard FROM t WHERE n_tokens > 0),
         |c AS (SELECT shard, n_tokens,
         |        SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
         |          ROWS UNBOUNDED PRECEDING) AS cum
         |      FROM f)
         |SELECT shard, COUNT(*) AS n_docs,
         |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
         |  CAST((MAX(cum) + 255) // 256 AS BIGINT) AS n_sequences,
         |  CAST(SUM(CASE WHEN (cum - n_tokens) // 256 <> (cum - 1) // 256
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_split_docs
         |FROM c GROUP BY shard ORDER BY shard""".stripMargin)),
    Q("pipeline_source_overlap", sourceOverlap, Some(
      s"""WITH st AS MATERIALIZED (
         |  SELECT DISTINCT source, unnest($oTok) AS tok FROM documents),
         |sz AS (SELECT source, COUNT(*) AS nv FROM st GROUP BY source),
         |sh AS (SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
         |       FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
         |       GROUP BY 1, 2)
         |SELECT source_a, source_b, za.nv AS vocab_a, zb.nv AS vocab_b, n_shared,
         |  CAST(n_shared AS DOUBLE) / (za.nv + zb.nv - n_shared) AS jaccard
         |FROM sh JOIN sz za ON za.source = source_a
         |        JOIN sz zb ON zb.source = source_b
         |ORDER BY source_a, source_b""".stripMargin)),
    // oracle: the identical next-fit-decreasing fold, replayed as a
    // rank-recursive CTE (one rank per shard per step — the
    // non-associative fill reset is exactly what recursion expresses
    // and windows cannot); base/t MATERIALIZED per the round-chain rule
    Q("pipeline_bin_pack", binPack, Some(
      s"""WITH RECURSIVE t AS MATERIALIZED (
         |  SELECT doc_id, len($oTok) AS n,
         |    CAST(${oPolyHash("text || '19'")} % 16 AS INTEGER) AS shard
         |  FROM documents WHERE len($oTok) > 0),
         |base AS MATERIALIZED (
         |  SELECT shard, doc_id, n,
         |    row_number() OVER (PARTITION BY shard ORDER BY n DESC, doc_id) AS rk
         |  FROM t WHERE n <= $BinCap),
         |pack(shard, rk, doc_id, n, bin, fill) AS (
         |  SELECT shard, rk, doc_id, n, CAST(0 AS BIGINT), CAST(n AS BIGINT)
         |  FROM base WHERE rk = 1
         |  UNION ALL
         |  SELECT b.shard, b.rk, b.doc_id, b.n,
         |    CASE WHEN p.fill + b.n > $BinCap THEN p.bin + 1 ELSE p.bin END,
         |    CASE WHEN p.fill + b.n > $BinCap THEN CAST(b.n AS BIGINT)
         |         ELSE p.fill + b.n END
         |  FROM pack p JOIN base b ON b.shard = p.shard AND b.rk = p.rk + 1),
         |agg AS (SELECT shard, COUNT(*) AS n_docs, MAX(bin) + 1 AS n_bins,
         |        CAST(SUM(n) AS BIGINT) AS total_tokens,
         |        CAST(SUM(doc_id * (bin + 1)) AS BIGINT) AS assign_checksum
         |        FROM pack GROUP BY shard),
         |ov AS (SELECT shard, COUNT(*) AS n_oversize FROM t
         |       WHERE n > $BinCap GROUP BY shard)
         |SELECT a.shard, a.n_docs, COALESCE(ov.n_oversize, 0) AS n_oversize,
         |  a.n_bins, a.total_tokens, a.assign_checksum,
         |  CAST(a.total_tokens AS DOUBLE) / CAST(a.n_bins * $BinCap AS DOUBLE) AS fill_frac
         |FROM agg a LEFT JOIN ov ON a.shard = ov.shard
         |ORDER BY a.shard""".stripMargin)),
    Q("pipeline_token_chunks", tokenChunks, Some(
      s"""WITH t AS (
         |  SELECT source, len($oTok) AS n_tokens FROM documents),
         |c AS (
         |  SELECT source, n_tokens, unnest(range((n_tokens - 1) // 32 + 1)) AS chunk_idx
         |  FROM t WHERE n_tokens > 0)
         |SELECT source, COUNT(*) AS n_chunks,
         |  CAST(SUM(CASE WHEN least(32, n_tokens - chunk_idx * 32) = 32
         |            THEN 1 ELSE 0 END) AS BIGINT) AS n_full,
         |  CAST(SUM(32 - least(32, n_tokens - chunk_idx * 32)) AS BIGINT) AS padding_tokens
         |FROM c GROUP BY source ORDER BY source""".stripMargin)),
  )
}
