package graft

import graft.operators.WordCount
import org.apache.spark.sql.DataFrame

/** Golden-fixture tests ported from the reference's manual test corpus
  * (FIXTURES.md; reference tests via screenshots, README.md:82–84).
  * Pins the byte-level ASCII cleaning semantics of
  * /root/reference/1.cpp:60–68 and the binary-order sort of
  * 1.cpp:316–320.
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def wc(lines: Seq[String]): Seq[(String, Long)] =
    WordCount.wordCount(lines.toDF("text"))
      .as[(String, Long)].collect().toSeq

  test("single word") {
    assert(wc(Seq("hello")) == Seq(("hello", 1L)))
  }

  test("repeats") {
    assert(wc(Seq("apple apple banana apple")) ==
      Seq(("apple", 3L), ("banana", 1L)))
  }

  test("mixed case + punctuation (formats)") {
    assert(wc(Seq("Hello, hello! HELLO world. World?")) ==
      Seq(("hello", 3L), ("world", 2L)))
  }

  test("numeric keys sort in byte order before letters (num)") {
    assert(wc(Seq("42 test 42 hello 007 test 42")) ==
      Seq(("007", 1L), ("42", 3L), ("hello", 1L), ("test", 2L)))
  }

  test("symbols stripped; c++ becomes c (symbol)") {
    assert(wc(Seq("code++ python@ java# c++")) ==
      Seq(("c", 1L), ("code", 1L), ("java", 1L), ("python", 1L)))
  }

  test("sentence with case folding (large)") {
    val rows = wc(Seq(
      "The quick brown fox jumps over the lazy dog.",
      "The dog barks, the fox runs away."))
    assert(rows.toMap == Map(
      "away" -> 1L, "barks" -> 1L, "brown" -> 1L, "dog" -> 2L,
      "fox" -> 2L, "jumps" -> 1L, "lazy" -> 1L, "over" -> 1L,
      "quick" -> 1L, "runs" -> 1L, "the" -> 4L))
    assert(rows.map(_._1) == rows.map(_._1).sorted) // binary order
  }

  test("empty input yields no rows (notext)") {
    assert(wc(Seq.empty[String]) == Seq.empty)
    assert(wc(Seq("")) == Seq.empty)
    assert(wc(Seq("?!- --- ++")) == Seq.empty)
  }

  test("unicode bytes are deleted, not transliterated") {
    // pins 1.cpp:60–68 byte-level ASCII semantics: café→caf, it’s→its
    assert(wc(Seq("café it’s naïve")) ==
      Seq(("caf", 1L), ("its", 1L), ("nave", 1L)))
  }

  test("vlarge golden corpus: 443 groups, Σcount=1090") {
    val p = java.nio.file.Paths.get("/root/reference/vlarge.txt")
    assume(java.nio.file.Files.exists(p), "reference corpus not present")
    val text = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    val rows = wc(text.split("\n").toSeq)
    assert(rows.size == 443)
    assert(rows.map(_._2).sum == 1090L)
    val m = rows.toMap
    assert(m("a") == 37L && m("and") == 23L && m("1st") == 1L && m("2024") == 1L)
    assert(rows.head._1 == "1st") // digit-first binary order
  }

  // -- property-style tests (seeded, deterministic) -------------------

  private val rnd = new scala.util.Random(42)
  private def randTok(): String = {
    val alphabet = "aAbB1!?é+z"
    (0 until (1 + rnd.nextInt(6))).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
  }

  test("property: Σcount == number of non-empty cleaned tokens") {
    val toks = (0 until 500).map(_ => randTok())
    val cleaned = toks.map(_.toLowerCase.filter(c => c.isLetterOrDigit && c < 128))
      .filter(_.nonEmpty)
    val rows = wc(Seq(toks.mkString(" ")))
    assert(rows.map(_._2).sum == cleaned.size.toLong)
    assert(rows.forall { case (w, _) => w.matches("^[a-z0-9]+$") })
  }

  test("property: output invariant under input permutation") {
    val toks = (0 until 300).map(_ => randTok())
    val a = wc(Seq(toks.mkString(" ")))
    val b = wc(Seq(rnd.shuffle(toks).mkString(" ")))
    assert(a == b)
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
