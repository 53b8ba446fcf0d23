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
}
