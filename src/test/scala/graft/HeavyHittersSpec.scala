package graft

import org.apache.spark.sql.functions._

/** Semantics of the Misra-Gries frequent-items sketch
  * ([[graft.plans.MisraGries]]): exactness when cap ≥ distinct keys,
  * and the classical guarantees in the lossy regime — estimates never
  * overcount, undercount by at most W/(cap+1), and every key with
  * true weight above W/(cap+1) survives — including across
  * partition merges. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def sketch(rows: Seq[(String, Long)], cap: Int, parts: Int): Map[String, Long] =
    rows.toDF("word", "w").repartition(parts)
      .agg(expr(s"misra_gries(word, w, $cap)").as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.word", $"e.count")
      .as[(String, Long)].collect().toMap

  test("cap >= distinct keys is exact, any partitioning") {
    val rows = Seq("a" -> 5L, "b" -> 3L, "a" -> 2L, "c" -> 1L, "b" -> 4L)
    val exact = Map("a" -> 7L, "b" -> 7L, "c" -> 1L)
    assert(sketch(rows, 8, 1) == exact)
    assert(sketch(rows, 8, 4) == exact)
  }

  test("lossy regime: no overcount, undercount <= W/(cap+1), heavy keys survive") {
    // Zipf-ish stream: one hot key, a warm key, and 40 singletons.
    val rows = Seq.fill(60)("hot" -> 1L) ++ Seq.fill(12)("warm" -> 1L) ++
      (0 until 40).map(i => (f"noise$i%02d", 1L))
    val truth = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val w = rows.map(_._2).sum
    for (parts <- Seq(1, 8)) {
      val cap = 4
      val est = sketch(rows, cap, parts)
      val slack = w / (cap + 1)
      est.foreach { case (k, c) =>
        assert(c <= truth(k), s"overcount for $k")
        assert(truth(k) - c <= slack, s"undercount beyond W/(cap+1) for $k")
      }
      // every key with true weight > W/(cap+1) must be present
      truth.filter(_._2 > slack).keys.foreach(k => assert(est.contains(k), s"lost heavy key $k"))
      assert(est.size <= cap)
    }
  }

  test("weighted updates count by weight, not row count") {
    val rows = Seq("x" -> 10L, "y" -> 1L, "x" -> 5L)
    assert(sketch(rows, 4, 2) == Map("x" -> 15L, "y" -> 1L))
  }

  test("output is ordered count desc then word asc") {
    val out = Seq("b" -> 4L, "a" -> 4L, "c" -> 9L).toDF("word", "w")
      .agg(expr("misra_gries(word, w, 8)").as("hh"))
      .select(posexplode($"hh").as(Seq("pos", "e")))
      .select($"e.word").as[String].collect().toSeq
    assert(out == Seq("c", "a", "b"))
  }
}
