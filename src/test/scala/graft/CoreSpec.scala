package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Pins for [[Core.CkptEvery]]/[[Core.ckptRound]]: iterative loops
  * must keep a BOUNDED logical plan as rounds grow — caching
  * truncates recompute, not lineage, so without the parquet-leaf cut
  * an N-round loop re-analyzes an O(N)-deep tree every round (O(N²)
  * planning; see the connected-components scaladoc for the measured
  * exponential variant). The pin: a loop run 20 rounds (crossing the
  * every-8 threshold twice, 3–4 live rounds after the last cut) has
  * EXACTLY the depth of a 12-round run (one cut, same live tail),
  * and strictly less than an uncut 7-round run. */
class CoreSpec extends SparkSpec {

  private def depth(p: LogicalPlan): Int =
    1 + (if (p.children.isEmpty) 0 else p.children.map(depth).max)
  private def depth(df: DataFrame): Int = depth(df.queryExecution.analyzed)

  test("20-round k-means keeps a bounded plan via parquet-leaf checkpoints") {
    val d20 = graft.operators.Similarity.kmeansRounds(spark, sf, 20)
    val d12 = graft.operators.Similarity.kmeansRounds(spark, sf, 12)
    val d7 = graft.operators.Similarity.kmeansRounds(spark, sf, 7)
    assert(depth(d20) == depth(d12),
      s"post-checkpoint tail should be identical: ${depth(d20)} vs ${depth(d12)}")
    assert(depth(d20) < depth(d7),
      s"two cuts must beat an uncut 7-round chain: ${depth(d20)} vs ${depth(d7)}")
    // the checkpointed plan still executes end to end
    assert(d20.count() > 0)
    Core.releaseCaches()
  }

  test("20-round BPE train keeps a bounded plan and a complete merge table") {
    val (c20, m20) = graft.operators.TextAnalysis.bpeLoopN(spark, sf, 20)
    val (c12, _) = graft.operators.TextAnalysis.bpeLoopN(spark, sf, 12)
    val (c7, _) = graft.operators.TextAnalysis.bpeLoopN(spark, sf, 7)
    assert(depth(c20) == depth(c12),
      s"post-checkpoint tail should be identical: ${depth(c20)} vs ${depth(c12)}")
    assert(depth(c20) < depth(c7),
      s"two cuts must beat an uncut 7-round chain: ${depth(c20)} vs ${depth(c7)}")
    // merge table survives the leaf cuts intact: one winner per round
    assert(m20.count() == 20)
    Core.releaseCaches()
  }

  test("the registered 12-round BPE train executes through a checkpoint leaf") {
    // text_bpe_train12 runs DeepBpeRounds = 12 > CkptEvery = 8, so the
    // production deep-loop path (checkpoint-then-continue) is exercised
    // by a CORRECTNESS-gated query, not only by this suite's structural
    // pins: rounds 9–12 must scan the round-8 parquet leaf, which
    // makes the leaf the state's ONLY input
    val (c12, m12) = graft.operators.TextAnalysis.bpeLoopN(spark, sf, 12)
    assert(m12.count() == 12)
    // the loop caches every round's rewrite, and inputFiles reads the
    // OPTIMIZED plan — with the caches live, withCachedData swaps an
    // InMemoryRelation in for the whole chain and no file leaf shows.
    // Release them first so the plan's real leaves are visible.
    Core.releaseCaches()
    assert(c12.inputFiles.nonEmpty &&
      c12.inputFiles.forall(_.contains("graft-bpe-ckpt")),
      s"state should read ONLY the checkpoint leaf, got: ${c12.inputFiles.take(3).mkString(", ")}")
  }

  test("every .collect() in src/main is a 1-row limit(1) loop-control read") {
    // The SCALE.md invariant, pinned grep-ably: no DATA-bearing
    // collect may land in the engine. The three legal sites today are
    // iterative loop-control reads (MMR round winner ×2, BPE argmax)
    // — each collects a TakeOrdered/limit(1) single row to inline as
    // a literal in the next round's plan. Any new `.collect()` must
    // either sit within 2 lines of its `limit(1)` or be consciously
    // admitted here by raising the pinned count WITH a justification.
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala/graft")
    val files = java.nio.file.Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".scala")).toSeq
    assert(files.nonEmpty, s"no sources under $root — cwd moved?")
    val sites = files.flatMap { p =>
      val lines = java.nio.file.Files.readAllLines(p).asScala.toVector
      lines.zipWithIndex.collect {
        case (l, i)
            if l.contains(".collect()") &&
              !l.trim.startsWith("//") && !l.trim.startsWith("*") =>
          val window = lines.slice(math.max(0, i - 2), i + 1)
          (s"$p:${i + 1}", window.exists(_.contains("limit(1)")))
      }
    }
    val illegal = sites.filterNot(_._2).map(_._1)
    assert(illegal.isEmpty,
      s"data-bearing .collect() without a limit(1) within 2 lines: ${illegal.mkString(", ")}")
    assert(sites.size == 3,
      s"loop-control collect census changed (expected 3): ${sites.map(_._1).mkString(", ")}")
  }
}
