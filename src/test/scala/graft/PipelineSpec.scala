package graft

import graft.operators.Pipeline

/** Corpus-prep pipeline behavior: in-pass observability metrics and
  * the determinism/coverage invariants of the hash split. */
class PipelineSpec extends SparkSpec {

  test("corpus prep surfaces gate-accounting metrics in the same pass") {
    val df = Pipeline.corpusPrep(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val metrics = df.queryExecution.observedMetrics
    assert(metrics.contains("corpus_prep_gates"), metrics.keys.toString)
    val m = metrics("corpus_prep_gates")
    val docsAfter = m.getAs[Long]("docs_after_gates")
    val tokensAfter = m.getAs[Long]("tokens_after_gates")
    // quality gate demands >= 50 tokens per surviving doc
    assert(docsAfter > 0 && tokensAfter >= docsAfter * 50)
    // the final accounting can only shrink further (dedup step)
    assert(rows.map(_.getAs[Long]("n_docs")).sum <= docsAfter)
  }

  test("hash split is exhaustive, disjoint, and stable") {
    val out = Pipeline.hashSplit(spark, sf).collect()
    // every document lands in exactly one split
    val total = out.map(_.getAs[Long]("n_docs")).sum
    assert(total === spark.read.parquet(s"$sf/documents.parquet").count())
    // pure function of content: identical on re-run
    val again = Pipeline.hashSplit(spark, sf).collect()
    assert(out.map(_.toString).toSeq === again.map(_.toString).toSeq)
  }

  test("bin packing replays the brute-force next-fit-decreasing fold per shard") {
    import org.apache.spark.sql.functions._
    val L = 64
    val rows = Pipeline.binPack(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute force: the same shard/order/fold in driver-side Scala
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("n", size(graft.operators.TextAnalysis.tokens(col("text"))))
      .filter(col("n") > 0)
      .withColumn("shard",
        pmod(graft.Core.polyHash(concat(col("text"), lit("19"))), lit(16)).cast("int"))
      .select("shard", "doc_id", "n")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    val byShard = base.filter(_._3 <= L).groupBy(_._1)
    val expect = byShard.map { case (sh, ds) =>
      val sorted = ds.sortBy(t => (-t._3, t._2))
      var bin = 0L; var fill = 0L; var checksum = 0L
      sorted.foreach { case (_, id, n) =>
        if (fill + n > L) { bin += 1; fill = n.toLong } else fill += n
        checksum += id * (bin + 1)
      }
      sh -> (sorted.length.toLong, bin + 1, sorted.map(_._3.toLong).sum, checksum)
    }
    rows.foreach { r =>
      val sh = r.getAs[Int]("shard")
      val (nd, nb, tt, cs) = expect(sh)
      assert(r.getAs[Long]("n_docs") == nd, s"shard $sh n_docs")
      assert(r.getAs[Long]("n_bins") == nb, s"shard $sh n_bins")
      assert(r.getAs[Long]("total_tokens") == tt, s"shard $sh total_tokens")
      assert(r.getAs[Long]("assign_checksum") == cs, s"shard $sh checksum")
      val over = base.count(t => t._1 == sh && t._3 > L).toLong
      assert(r.getAs[Long]("n_oversize") == over, s"shard $sh n_oversize")
      // every bin holds ≤ L tokens by construction, so fill ≤ 1
      assert(r.getAs[Double]("fill_frac") <= 1.0 + 1e-12)
    }
    assert(rows.map(_.getAs[Int]("shard")).toSet == expect.keySet)
  }
}
