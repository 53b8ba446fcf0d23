package graft

import graft.plans.Sketches
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Semantics of the deterministic mergeable summaries
  * ([[graft.plans.MinKHashes]], [[graft.plans.CountMinSketch]],
  * [[graft.plans.BloomAgg]]): partition-order independence (the
  * property that lets the DuckDB oracles hash-match the sketch
  * VALUES), the KMV exact regime and estimator wiring, Count-Min's
  * deterministic one-sided error, and the Bloom filter's
  * no-false-negative guarantee that the gated dedup path relies on.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hashes(n: Int): Seq[Long] =
    (1 to n).map(i => (Sketches.seedA(40) * i + Sketches.seedB(40)) % Sketches.P)

  test("min_k_hashes: k smallest distinct values, any partitioning, duplicate-insensitive") {
    val hs = hashes(500)
    val dup = hs ++ hs.take(100) // duplicates must not change a set property
    val expected = hs.distinct.sorted.take(64)
    for (parts <- Seq(1, 7)) {
      val got = dup.toDF("h").repartition(parts)
        .agg(expr("min_k_hashes(h, 64)")).as[Seq[Long]].head()
      assert(got == expected, s"parts=$parts")
    }
  }

  test("min_k_hashes: exact regime below k returns the whole distinct set") {
    val hs = hashes(10)
    val got = hs.toDF("h").agg(expr("min_k_hashes(h, 64)")).as[Seq[Long]].head()
    assert(got == hs.distinct.sorted)
    assert(Seq.empty[Long].toDF("h").agg(expr("min_k_hashes(h, 64)"))
      .as[Seq[Long]].head().isEmpty, "empty input -> empty sketch")
  }

  test("kmv estimate: within 25% of truth at k=64 over 5000 keys") {
    val n = 5000
    val est = (1 to n).map(i => (Sketches.seedA(40) * i + Sketches.seedB(40)) % Sketches.P)
      .toDF("h").repartition(5)
      .agg(Sketches.kmvEstimate(expr("min_k_hashes(h, 64)"), 64))
      .as[Double].head()
    assert(math.abs(est - n) / n < 0.25, s"est=$est truth=$n")
  }

  test("count_min: deterministic cells, order/partition independent, est >= truth") {
    val rows = Seq.fill(40)("hot") ++ (0 until 30).map(i => f"w$i%02d")
    val df = rows.toDF("word")
    def cms(parts: Int): Seq[Long] = df.repartition(parts)
      .agg(expr("count_min(poly_hash(word), 1, 3, 16)")).as[Seq[Long]].head()
    val a = cms(1)
    assert(a == cms(6), "cells differ across partitionings")
    assert(a.length == 48 && a.sum == 3 * rows.length, "each row lands once per depth row")
    // point estimate for the hot key: min over rows of its cells
    val est = df.groupBy("word").count().filter($"word" === "hot")
      .crossJoin(df.agg(expr("count_min(poly_hash(word), 1, 3, 16)").as("cms")))
      .select(least((0 until 3).map(r => element_at($"cms",
        lit(r * 16) + Sketches.cell(Core.polyHash($"word"), r, 16).cast("int") + 1)): _*))
      .as[Long].head()
    assert(est >= 40, "count-min must never undercount")
  }

  test("bloom_agg: no false negatives under any partitioning; probe matches buffer bits") {
    val member = hashes(300)
    val other = hashes(900).drop(300)
    for (parts <- Seq(1, 8)) {
      val bf = member.toDF("h").repartition(parts)
        .agg(expr("bloom_agg(h, 1024, 3)").as("bf"))
      val probed = other.toDF("h").crossJoin(broadcast(bf))
        .withColumn("maybe", Sketches.bloomMightContain($"bf", $"h", 1024, 3))
      val missed = probed.filter($"h".isin(member.map(Long.box): _*) && !$"maybe").count()
      assert(missed == 0, s"false negative at parts=$parts")
      // the tiny-table FP rate must be sane (not all-ones saturation)
      val fp = probed.filter(!$"h".isin(member.map(Long.box): _*) && $"maybe").count()
      assert(fp < 300, s"bloom saturated: $fp/600 false positives")
    }
  }

  test("bloom probe column agrees with a JVM-side replay of the bitset") {
    val member = hashes(50)
    val bits = member.toDF("h").agg(expr("bloom_agg(h, 256, 2)")).as[Seq[Long]].head()
    def jvmMaybe(h: Long): Boolean = (0 until 2).forall { i =>
      val pos = ((Sketches.seedA(i) * h + Sketches.seedB(i)) % Sketches.P % 256).toInt
      (bits(pos / 64) >> (pos % 64) & 1L) == 1L
    }
    val probes = hashes(200)
    val sparkSide = probes.toDF("h")
      .crossJoin(broadcast(member.toDF("h2").agg(expr("bloom_agg(h2, 256, 2)").as("bf"))))
      .withColumn("maybe", Sketches.bloomMightContain($"bf", $"h", 256, 2))
      .select($"h", $"maybe").as[(Long, Boolean)].collect().toMap
    probes.foreach(h => assert(sparkSide(h) == jvmMaybe(h), s"probe mismatch for $h"))
  }

  test("AMS F2 estimate lands within the 4-wise variance band on real keys") {
    // variance bound 2F2²/k (k=64) → σ ≈ 0.18·F2; [0.5, 1.5] is > 2.8σ.
    // A LINEAR sign hash measurably fails this on consecutive part
    // keys (ratio 0.0006 observed — see amsSign's scaladoc), so the
    // band also pins that the hash stays degree-3.
    val r = graft.operators.Udaf.amsF2(spark, sf).collect().head
    val ratio = r.getAs[Double]("est_ratio")
    assert(ratio > 0.5 && ratio < 1.5, s"est_ratio $ratio outside band")
    assert(r.getAs[Long]("f2_exact") >= r.getAs[Long]("n_rows"))
  }

  test("bloom FPR curve: fill and false positives fall monotonically with width") {
    val rows = graft.operators.Dedup.bloomFprCurve(spark, sf).collect()
      .sortBy(_.getAs[Int]("m_bits"))
    assert(rows.map(_.getAs[Int]("m_bits")).toSeq == Seq(128, 512, 2048))
    rows.foreach { r =>
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.0 && fill <= 1.0, s"$r")
      assert(r.getAs[Long]("n_bits_set") <= r.getAs[Int]("m_bits"), s"$r")
      assert(r.getAs[Long]("n_fp") <= r.getAs[Long]("n_probes"), s"$r")
      // probes are verified non-members, so every maybe IS a false
      // positive and fpr is exactly n_fp / n_probes
      assert(r.getAs[Double]("fpr") ==
        r.getAs[Long]("n_fp").toDouble / r.getAs[Long]("n_probes"), s"$r")
    }
    val fprs = rows.map(_.getAs[Double]("fpr"))
    assert(fprs(0) >= fprs(1) && fprs(1) >= fprs(2), fprs.toSeq.toString)
    val fills = rows.map(_.getAs[Double]("fill_ratio"))
    assert(fills(0) > fills(2), fills.toSeq.toString)
    Core.releaseCaches()
  }

  test("kmv intersection estimator: exact regime returns exact intersection") {
    // two overlapping sets small enough that every sketch is exact
    val a = (1 to 40).map(_.toLong)
    val b = (21 to 60).map(_.toLong)
    val h = (c: Column) => (lit(Sketches.seedA(40)) * c + lit(Sketches.seedB(40))) % Sketches.P
    val row = (a.map(x => (x, 1, 0)) ++ b.map(x => (x, 0, 1)))
      .toDF("key", "ia", "ib")
      .groupBy("key").agg(max($"ia").as("ia"), max($"ib").as("ib"))
      .agg(
        Sketches.minKHashes(when($"ia" === 1, h($"key")), 64).as("ska"),
        Sketches.minKHashes(when($"ib" === 1, h($"key")), 64).as("skb"))
      .withColumn("u", slice(array_sort(array_union($"ska", $"skb")), 1, 64))
      .select(
        ((size(filter($"u", (x: Column) =>
          array_contains($"ska", x) && array_contains($"skb", x)))
          .cast("double") / size($"u").cast("double")) *
          Sketches.kmvEstimate($"u", 64)).as("est"))
      .as[Double].head()
    assert(row == 20.0, s"exact-regime intersection estimate was $row")
  }
}
