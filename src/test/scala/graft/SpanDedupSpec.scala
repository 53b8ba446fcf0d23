package graft

import graft.operators.SpanDedup
import org.apache.spark.sql.functions._

/** Semantics of the repeated-span (ExactSubstr) dedup on a planted
  * corpus: one 10-token passage shared by docs 0 and 1, repeated
  * twice inside doc 3; doc 2 is unique filler; doc 4 is shorter than
  * K. K = 8, so each passage occurrence carries exactly 3 repeated
  * 8-gram starts whose union covers the 10 passage tokens.
  */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val span = (1 to 10).map(i => s"s$i").mkString(" ")

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-span").toString
    def filler(p: String, n: Int) = (1 to n).map(i => s"$p$i").mkString(" ")
    Seq(
      // span at token positions 5..14
      (0L, s"${filler("a", 5)} $span ${filler("b", 5)}", "en", "srcA", 0L),
      // same span, different position (3..12) and neighborhood
      (1L, s"${filler("c", 3)} $span ${filler("d", 7)}", "en", "srcA", 0L),
      // unique doc — no repeated 8-grams anywhere
      (2L, filler("e", 20), "en", "srcB", 0L),
      // span twice within one doc: positions 5..14 and 18..27
      (3L, s"${filler("f", 5)} $span ${filler("g", 3)} $span ${filler("h", 2)}", "en", "srcB", 0L),
      // shorter than K: never grams
      (4L, filler("i", 5), "en", "srcB", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("detector: maximal spans and covered-token counts are exact") {
    val rows = SpanDedup.repeatedSpans(spark, dir)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rows == Seq(
      (0L, 20L, 10L, 1L),   // one 10-token span
      (1L, 20L, 10L, 1L),
      (2L, 20L, 0L, 0L),    // untouched
      (3L, 30L, 20L, 2L),   // both in-doc copies, two maximal spans
      (4L, 5L, 0L, 0L)))    // shorter than K
  }

  test("clean removes exactly the covered tokens, preserving order") {
    val rows = SpanDedup.spanClean(spark, dir)
      .as[(Long, String, Long)].collect().toSeq.toMap2
    assert(rows(0L) == ("a1 a2 a3 a4 a5 b1 b2 b3 b4 b5", 10L))
    assert(rows(1L) == ("c1 c2 c3 d1 d2 d3 d4 d5 d6 d7", 10L))
    assert(rows(3L) == ("f1 f2 f3 f4 f5 g1 g2 g3 h1 h2", 20L))
    // only affected docs appear
    assert(rows.keySet == Set(0L, 1L, 3L))
  }

  test("keep-first spares the corpus-earliest copy only") {
    val rows = SpanDedup.spanKeepFirst(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // srcA: doc 0 holds the corpus-first occurrence (doc_id·1e6+pos
    // minimal) and keeps its copy; doc 1's copy is removed.
    // srcB: doc 3's two copies are both later than doc 0's — both
    // removed; docs 2 and 4 untouched.
    assert(rows == Seq(
      ("srcA", 2L, 1L, 40L, 10L),
      ("srcB", 3L, 1L, 55L, 20L)))
  }

  private implicit class Map2[A, B, C](rows: Seq[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> (r._2, r._3)).toMap
  }
}
