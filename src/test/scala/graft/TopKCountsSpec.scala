package graft

import org.apache.spark.sql.functions._

/** Semantics of the bounded-heap top-k aggregate: ordering,
  * deterministic tie-break, and partition-merge correctness. */
class TopKCountsSpec extends SparkSpec {
  import spark.implicits._

  private def topk(rows: Seq[(String, Long)], k: Int, parts: Int): Seq[(String, Long)] =
    rows.toDF("word", "count").repartition(parts)
      .agg(expr(s"topk_counts(word, count, $k)").as("tk"))
      .select(explode($"tk").as("e"))
      .select($"e.word", $"e.count")
      .as[(String, Long)].collect().toSeq

  test("keeps the k largest, ordered count desc then word asc") {
    val rows = Seq("a" -> 5L, "b" -> 9L, "c" -> 7L, "d" -> 1L, "e" -> 9L)
    assert(topk(rows, 3, 1) == Seq("b" -> 9L, "e" -> 9L, "c" -> 7L))
  }

  test("tie-break prefers the lexicographically smaller word") {
    val rows = Seq("zed" -> 4L, "ant" -> 4L, "mid" -> 4L)
    assert(topk(rows, 2, 1) == Seq("ant" -> 4L, "mid" -> 4L))
  }

  test("merge across many partitions equals single-partition result") {
    val rows = (0 until 500).map(i => (f"w$i%03d", (i % 37).toLong))
    assert(topk(rows, 10, 8) == topk(rows, 10, 1))
  }

  test("fewer rows than k returns all, ranked") {
    assert(topk(Seq("x" -> 2L, "y" -> 3L), 10, 2) == Seq("y" -> 3L, "x" -> 2L))
  }
}
