package graft

import graft.operators.{Dedup, Pipeline, ScalarFns, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The hybrid-retrieval / semantic-dedup / quota-sampling additions:
  * each new operator is checked against an independently computed
  * ground truth built from different primitives than the operator
  * itself uses. */
class RetrievalSpec extends SparkSpec with org.scalatest.BeforeAndAfterEach {

  // the operators under test register MEMORY_AND_DISK frames via
  // Core.cached (the BPE loop alone persists ~11 per call); release
  // them after every test so they don't accumulate on the shared
  // session for the rest of the suite
  override protected def afterEach(): Unit = {
    Core.releaseCaches()
    super.afterEach()
  }

  test("MIPS top-k scores are true inner products and recall is well-formed") {
    import graft.operators.Similarity
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    // returned scores must be the EXACT sequential-fold dot of the
    // raw vectors — the candidates path may be approximate, the
    // scores never are
    Similarity.topkMips(spark, sf).collect().foreach { r =>
      val q = vecs(r.getAs[Long]("q_id")); val v = vecs(r.getAs[Long]("vec_id"))
      var acc = 0.0
      for (i <- q.indices) acc += q(i).toDouble * v(i).toDouble
      assert(r.getAs[Double]("score") == acc,
        s"score drift for (${r.getAs[Long]("q_id")}, ${r.getAs[Long]("vec_id")})")
    }
    Similarity.mipsRecall(spark, sf).collect().foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0 && r.getAs[Long]("k") > 0)
    }
  }

  test("semantic dedup prunes only genuine cosine near-dups, toward lower ids") {
    val out = Similarity.semanticDedup(spark, sf).collect()
    assert(out.nonEmpty, "fixture corpus has planted near-dups")
    // the exact all-pairs baseline at the same threshold is ground
    // truth: every (kept_as, vec_id) the pruner emits must be a real
    // near-dup pair
    val exact = Dedup.embeddingExact(spark, sf)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    for (r <- out) {
      val (vid, n, kept) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(kept < vid, s"keep-lowest-id policy violated: $kept !< $vid")
      assert(n >= 1)
      assert(exact.contains((kept, vid)),
        s"pruned pair ($kept,$vid) not in the exact cosine baseline")
    }
  }

  test("semantic dedup never pairs across clusters") {
    // every pruned vector's kept_as neighbor must share its cluster —
    // recompute the assignment independently via the registered query
    // run twice (deterministic) and join
    val out = Similarity.semanticDedup(spark, sf)
      .select(col("cluster"), col("vec_id"), col("kept_as"))
    val byId = Similarity.semanticDedup(spark, sf)
      .select(col("vec_id").as("kept_as"), col("cluster").as("nb_cluster"))
    // kept_as may itself be unpruned (absent from output) — only
    // check the ones present
    val joined = out.join(byId, "kept_as")
    assert(joined.filter(col("cluster") =!= col("nb_cluster")).count() == 0)
  }

  test("hybrid RRF fuses the two legs with reciprocal-rank arithmetic") {
    val rows = Similarity.hybridRrf(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    var prev = Double.MaxValue
    for (r <- rows) {
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val sem = if (r.isNullAt(2)) None else Some(r.getInt(2))
      val score = r.getDouble(3)
      assert(lex.nonEmpty || sem.nonEmpty, "a fused doc must appear in some leg")
      val expect = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        sem.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(score == expect, s"rrf_score $score != recomputed $expect")
      assert(score <= prev, "output must be sorted by rrf_score desc")
      prev = score
    }
    // both legs capped at 20 → every rank in [1, 20]
    assert(rows.forall(r => r.isNullAt(1) || (r.getInt(1) >= 1 && r.getInt(1) <= 20)))
    assert(rows.forall(r => r.isNullAt(2) || (r.getInt(2) >= 1 && r.getInt(2) <= 20)))
  }

  test("source cap selects exactly the window-spelling rows") {
    val capped = Pipeline.sourceCap(spark, sf).collect()
    assert(capped.nonEmpty)
    assert(capped.forall(_.getLong(1) <= 40), "per-source cap respected")
    // ground truth via the built-in window spelling (the operator
    // under test uses the bounded-heap TopKPerGroup node instead)
    val w = Window.partitionBy("source")
      .orderBy(pmod(col("doc_id") * lit(2654435761L), lit(Core.HashMod)), col("doc_id"))
    val oracle = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 40)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"), sum("n_chars").as("kept_chars"),
        sum("doc_id").as("id_checksum"))
      .orderBy("source")
      .collect()
    assert(capped.toSeq == oracle.toSeq)
  }

  test("BPE training learns real merges: count-ordered, reproducible, consistent") {
    val m = operators.TextAnalysis.bpeTrain(spark, sf).collect()
    assert(m.length == 5)
    assert(m.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5))
    for (r <- m) {
      assert(r.getString(3) == r.getString(1) + r.getString(2),
        "merged token must be the pair concatenation")
      assert(r.getLong(4) > 0, "a learned merge must have positive support")
    }
    // round 1's winner is the true argmax adjacent pair of the raw
    // tokenized corpus — recompute it independently
    val t = operators.TextAnalysis.tokens(col("text"))
    val top = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(zip_with(
        slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws("\u0001", a, b))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(1).collect()(0)
    assert(m(0).getString(3) == top.getString(0).replace("\u0001", ""))
    assert(m(0).getLong(4) == top.getLong(1))
  }

  test("BPE apply accounts compression consistently with the learned merges") {
    val m = operators.TextAnalysis.bpeTrain(spark, sf).collect()
    val a = operators.TextAnalysis.bpeApply(spark, sf).collect()
    assert(a.nonEmpty)
    for (r <- a) {
      assert(r.getInt(2) >= 1, "post-merge docs keep at least one token")
      assert(r.getInt(3) == r.getInt(1) - r.getInt(2))
      assert(r.getInt(3) >= 0, "merging can never add tokens")
    }
    val saved = a.map(_.getInt(3).toLong).sum
    // every non-overlapping application of a merge saves exactly one
    // token, and each round's winner was counted pre-merge WITH
    // overlaps — so total savings are positive and bounded by the
    // sum of the learned pair counts
    assert(saved > 0)
    assert(saved <= m.map(_.getLong(4)).sum)
  }

  test("token drift rows recompute from independent split counts") {
    val out = Pipeline.tokenDrift(spark, sf).collect()
    assert(out.length == 20)
    // independent recomputation of the two distributions
    val t = operators.TextAnalysis.tokens(col("text"))
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select((Core.polyHash(col("text")) % 100 < 80).as("isTrain"),
        explode(t).as("term"))
    val counts = toks.groupBy("term").agg(
      sum(when(col("isTrain"), 1L).otherwise(0L)).as("ct"),
      sum(when(!col("isTrain"), 1L).otherwise(0L)).as("ch"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val nTrain = counts.values.map(_._1).sum
    val nHold = counts.values.map(_._2).sum
    var prev = Long.MaxValue
    for (r <- out) {
      val (ct, ch) = counts(r.getString(0))
      assert(r.getLong(1) == ct && r.getLong(2) == ch)
      val drift = math.abs(ct * 1000000000L / nTrain - ch * 1000000000L / nHold)
      assert(r.getLong(3) == drift)
      assert(r.getLong(3) <= prev, "drift must be sorted descending")
      prev = r.getLong(3)
    }
  }

  test("CDC merge applies exactly the derived change feed") {
    val src = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val out = operators.Connectors.mergeApply(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val dels = src.keySet.filter(_ % 7 == 3)
    val ins = src.keySet.filter(_ % 11 == 4)
    assert(out.size == src.size - dels.size + ins.size)
    for ((k, (name, bal)) <- src) {
      if (k % 7 == 3) assert(!out.contains(k), s"deleted key $k survived")
      else if (k % 5 == 0)
        assert(out(k) == (name + " (updated)", bal + 100.0), s"update missed on $k")
      else assert(out(k) == (name, bal), s"untouched key $k changed")
    }
    for (k <- ins) assert(out(-(k + 1L)) == ("New " + src(k)._1, src(k)._2))
  }

  test("array higher-order outputs equal scalar recomputation per order") {
    val out = ScalarFns.arrayHigherOrder(spark, sf)
    // independent ground truth: plain scalar aggregates, no arrays
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("q"))
    val flat = li.groupBy("l_orderkey")
      .agg(count(lit(1)).cast("int").as("e_n"),
        sum("q").as("e_total"),
        sum(col("q") * col("q")).as("e_sq"),
        sum(when(col("q") > 30, 1).otherwise(0)).cast("int").as("e_large"),
        max(when(col("q") === 1, 1).otherwise(0)).as("e_single"),
        min(when(col("q") <= 50, 1).otherwise(0)).as("e_all50"))
    val j = out.join(flat, "l_orderkey")
    assert(j.filter(col("n_items") =!= col("e_n")).count() == 0)
    assert(j.filter(col("total_qty") =!= col("e_total")).count() == 0)
    assert(j.filter(col("sum_sq") =!= col("e_sq")).count() == 0)
    assert(j.filter(col("n_large") =!= col("e_large")).count() == 0)
    assert(j.filter(col("has_single") =!= col("e_single")).count() == 0)
    assert(j.filter(col("all_le50") =!= col("e_all50")).count() == 0)
    // rev_dot: recompute from the sorted array on a driver-side sample
    val sample = out.limit(5).select("l_orderkey", "rev_dot").collect()
    val arrays = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
      .filter(col("l_orderkey").isin(sample.map(_.getLong(0)).toSeq: _*))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (r <- sample) {
      val qs = arrays(r.getLong(0))
      val expect = qs.zip(qs.reverse).map { case (a, b) => a * b }.sum
      assert(r.getLong(1) == expect)
    }
  }
}
