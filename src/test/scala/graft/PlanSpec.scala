package graft

import graft.operators._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan

/** Physical-plan audits: the properties that make these queries
  * scale are asserted, not assumed — pushdown reaching the parquet
  * scan, dimension joins broadcasting, top-k avoiding global sorts,
  * aggregates running partial+final, and no cartesian products in
  * any LSH candidate path. */
class PlanSpec extends SparkSpec {

  private def executed(df: DataFrame): String = {
    df.queryExecution.executedPlan.toString
  }
  private def formatted(df: DataFrame): String = {
    // AQE hides the final plan until execution; format the initial one
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("filter pushdown reaches the parquet scan") {
    val s = formatted(Relational.filterPushdown(spark, sf))
    assert(s.contains("PushedFilters"))
    assert(s.matches("(?s).*PushedFilters: \\[.*GreaterThan\\(l_quantity.*"))
    // projection pruned to the 3 selected + filter columns
    assert(s.contains("ReadSchema"))
    assert(!s.contains("l_shipdate"))
  }

  test("dimension joins broadcast; no shuffle of the fact side") {
    assert(formatted(Relational.joinBroadcast(spark, sf))
      .contains("BroadcastHashJoin"))
    assert(formatted(Relational.joinMktsegment(spark, sf))
      .contains("BroadcastHashJoin"))
  }

  test("top-k plans as TakeOrderedAndProject, not a global sort") {
    val s = formatted(Relational.topkOrders(spark, sf))
    assert(s.contains("TakeOrderedAndProject"))
  }

  test("wordcount aggregates partially before the exchange") {
    val s = formatted(WordCount.wordCount(
      spark.read.parquet(s"$sf/documents.parquet")))
    // two HashAggregates around one Exchange = partial+final
    assert("HashAggregate".r.findAllIn(s).size >= 2)
    assert(s.contains("Exchange"))
  }

  test("LSH candidate paths contain no cartesian product") {
    for (df <- Seq(
        Dedup.minhashLsh(spark, sf),
        Dedup.ngramJaccard(spark, sf),
        Dedup.simhashPairs(spark, sf),
        Dedup.embeddingLsh(spark, sf),
        Similarity.topkLsh(spark, sf))) {
      val s = executed(df)
      assert(!s.contains("CartesianProduct"), s.take(400))
    }
  }

  test("bucketed fact join runs with zero exchanges") {
    Bucketing.bucketedJoin(spark, sf).collect() // creates the tables
    val s = formatted(Bucketing.joinBucketed(spark))
    assert(s.contains("SortMergeJoin") || s.contains("ShuffledHashJoin"))
    assert(!s.contains("Exchange"), s.take(600))
  }

  test("partitioned layout prunes at file listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-prune").toString
    spark.read.parquet(s"$sf/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(s"$dir/events_part")
    val s = formatted(Connectors.partitionedRead(spark, dir))
    assert(s.contains("PartitionFilters"), s.take(600))
    assert(s.matches("(?s).*PartitionFilters: \\[.*event_type.*"))
  }

  test("brute-force ANN broadcasts the query side") {
    val s = executed(Similarity.topkBrute(spark, sf))
    assert(s.contains("BroadcastNestedLoopJoin") || s.contains("BroadcastHashJoin"))
    assert(!s.contains("CartesianProduct"))
  }

  test("native signature expressions are live in the dedup/ANN plans") {
    assert(executed(Dedup.ngramJaccard(spark, sf)).contains("char_gram_hashes"))
    assert(executed(Dedup.simhashPairs(spark, sf)).contains("simhash48"))
    assert(executed(Dedup.embeddingLsh(spark, sf)).contains("hyperplane_buckets"))
    assert(executed(Similarity.topkLsh(spark, sf)).contains("hyperplane_buckets"))
  }

  test("whole-stage codegen covers the wordcount pipeline") {
    // AQE finalizes the plan only at execution; run, then inspect
    val df = WordCount.wordCount(spark.read.parquet(s"$sf/documents.parquet"))
    df.collect()
    // codegen stages print as "*(n) Op" in the executed-plan string
    assert(executed(df).contains("*("), executed(df).take(500))
    // the optimizer rewrite is live in this session's physical plan
    assert(executed(df).contains("clean_word"))
  }
}
