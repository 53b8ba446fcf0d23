package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's entire program, re-expressed as one declarative
  * Spark plan (reference: /root/reference/1.cpp — scan 248–264, clean
  * 60–68, filter 84, two-phase sum 145–207, final sort 316–320).
  *
  * Pipeline: tokenize on whitespace → byte-level ASCII clean
  * (`lower` + strip `[^a-z0-9]` — pinned semantics: `café`→`caf`,
  * `c++`→`c`, `007` stays) → drop empty tokens → count per word →
  * order by word in binary/ASCII order.
  *
  * Scale notes (100 TB posture):
  *  - `groupBy.agg(count)` compiles to partial HashAggregate →
  *    hash-Exchange → final HashAggregate — the exact structural twin
  *    of the reference's shuffle-combine (1.cpp:145–158) + reducer
  *    merge (1.cpp:183–207), with map-side combine absorbing Zipf
  *    skew before any data moves.
  *  - The whole scan→explode→project→filter→partial-agg prefix runs
  *    inside one WholeStageCodegen loop; nothing materializes between
  *    "phases" (unlike the reference's global arrays, 1.cpp:54–57).
  *  - The final `orderBy` is a range-partitioned sort over the
  *    *aggregated* (small) side only — cardinality is bounded by
  *    vocabulary, not corpus size.
  */
object WordCount {

  /** O2+O3+O4: tokenize a text column, apply the reference's
    * `clean_word` (1.cpp:60–68), drop empties (1.cpp:84). */
  def cleanTokens(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(col(textCol), "\\s+")).as("tok"))
      .select(regexp_replace(lower(col("tok")), "[^a-z0-9]", "").as("word"))
      .filter(length(col("word")) > 0)

  /** O5–O10: count per word, binary-order sort. */
  def wordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    cleanTokens(docs, textCol)
      .groupBy("word")
      .agg(count(lit(1)).as("count"))
      .orderBy("word")

  /** Top-k most frequent words; total order (count desc, word asc) so
    * ties are deterministic for the oracle. */
  def topK(docs: DataFrame, k: Int): DataFrame =
    cleanTokens(docs, "text")
      .groupBy("word")
      .agg(count(lit(1)).as("count"))
      .orderBy(col("count").desc, col("word"))
      .limit(k)

  /** Top-k words via the custom bounded-heap aggregate
    * (graft.plans.TopKCounts, registered by GraftExtensions): O(k)
    * state per partial — the global "top 20" is computed without
    * sorting or shuffling the full vocabulary. */
  def topKAgg(docs: DataFrame, k: Int): DataFrame =
    cleanTokens(docs, "text")
      .groupBy("word")
      .agg(count(lit(1)).as("count"))
      .agg(expr(s"topk_counts(word, count, $k)").as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "e")))
      .select((col("pos") + 1).as("rn"), col("e.word"), col("e.count"))

  /** Salted two-stage aggregation — the explicit skew-mitigation
    * pattern for when partial aggregation alone can't absorb a hot
    * key: rows first aggregate under (word, salt) so a hot word
    * spreads across 16 reducers, then the per-salt partials collapse.
    * Same result as [[wordCount]] (same oracle); the salt is
    * positional, so the plan stays deterministic in OUTPUT while
    * spreading load. */
  def saltedWordCount(docs: DataFrame, textCol: String = "text"): DataFrame =
    cleanTokens(docs, textCol)
      .withColumn("salt", pmod(monotonically_increasing_id(), lit(16)))
      .groupBy("word", "salt")
      .agg(count(lit(1)).as("c"))
      .groupBy("word")
      .agg(sum("c").as("count"))
      .orderBy("word")

  /** O1/O2 literal text-file scan. The reference reads a plain text
    * file (1.cpp:248–264) while every other registered path scans
    * parquet — this query round-trips `documents.text` through a real
    * text file and runs the identical pipeline over `spark.read.text`.
    * The word multiset is invariant under the text writer's line
    * splitting (newline is whitespace to the tokenizer), so the batch
    * wordcount oracle applies unchanged. */
  def wordCountText(s: SparkSession, d: String): DataFrame = {
    val dir = graft.Core.tempDir("graft-wctext")
    Tables(s, d, "documents")
      .select(coalesce(col("text"), lit("")).as("value"))
      .write.mode("overwrite").text(dir)
    wordCount(s.read.text(dir), "value")
  }

  /** Oracle spelling of the cleaned token stream; shared with the
    * streaming word count so the replay-parity guarantee can never
    * drift from the batch oracle. */
  val cleanedSql: String =
    """SELECT regexp_replace(lower(unnest(string_split_regex(text, '\s+'))), '[^a-z0-9]', '', 'g') AS word
      |FROM documents""".stripMargin

  val queries: Seq[Q] = Seq(
    Q(
      "wordcount",
      (s, dir) => wordCount(Tables(s, dir, "documents")),
      Some(
        s"""SELECT word, COUNT(*) AS count FROM ($cleanedSql)
           |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),
    Q(
      "wordcount_salted",
      (s, dir) => saltedWordCount(Tables(s, dir, "documents")),
      Some(
        s"""SELECT word, COUNT(*) AS count FROM ($cleanedSql)
           |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),
    Q(
      "wordcount_topk_agg",
      (s, dir) => topKAgg(Tables(s, dir, "documents"), 20),
      Some(
        s"""SELECT row_number() OVER (ORDER BY count DESC, word) AS rn, word, count
           |FROM (SELECT word, COUNT(*) AS count FROM ($cleanedSql)
           |      WHERE word <> '' GROUP BY word)
           |ORDER BY count DESC, word LIMIT 20""".stripMargin)),
    Q(
      "wordcount_text",
      wordCountText,
      Some(
        s"""SELECT word, COUNT(*) AS count FROM ($cleanedSql)
           |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin)),
    Q(
      "wordcount_topk",
      (s, dir) => topK(Tables(s, dir, "documents"), 20),
      Some(
        s"""SELECT word, COUNT(*) AS count FROM ($cleanedSql)
           |WHERE word <> '' GROUP BY word
           |ORDER BY count DESC, word LIMIT 20""".stripMargin)),
  )
}
