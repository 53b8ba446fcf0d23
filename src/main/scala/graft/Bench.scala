package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE coalescing targets shuffle BYTES and serializes the
      // compute-heavy small-data stages (LSH candidate verification
      // folds run per-row; a 10 MB pair list coalesced to 1 partition
      // pins one core for minutes). Keep AQE for skew/plan adaptation
      // but hold every shuffle at full parallelism.
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Clear the previous run's summary artifact up front: a crashed
    // or killed run must leave NO file (read as "run failed"), never
    // a stale summary that parses as this run's numbers.
    val summaryPath = java.nio.file.Paths.get("target", "bench_summary.json")
    val detailPath = java.nio.file.Paths.get("target", "bench_detail.json")
    java.nio.file.Files.deleteIfExists(summaryPath)
    java.nio.file.Files.deleteIfExists(detailPath)
    // Optional comma-separated name filter for profiling a subset
    // (e.g. SPARK_GRAFT_BENCH_ONLY=scalar_dates,pipeline_corpus_prep).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // Fail fast on misspelled names (same hazard as Verify): an empty
    // selection would print a vacuous ~0 s "total" that reads as a
    // speedup. The filter runs over the FULL catalog so profiling a
    // non-headline query by name still works.
    only.foreach { names =>
      val known = SparkEntry.all.map(_.name).toSet
      val unknown = names.filterNot(known)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_BENCH_ONLY names unknown queries: ${unknown.mkString(", ")}")
    }
    val picked = only.fold(SparkEntry.benchQueries)(names =>
      SparkEntry.all.filter(q => names(q.name)))
    // A failing query must surface in the output, never read as a ~0 s
    // "speedup": names land in the "errors" array and get no timing.
    val errors = scala.collection.mutable.LinkedHashSet[String]()
    def runOne(q: Q, dir: String, tag: String): Option[Double] = {
      val t0 = System.nanoTime()
      // noop write materializes every row/column (count() would let
      // Spark prune the plan down to row counting).
      try {
        q.spark(spark, dir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // per-query progress to stderr: if the driver kills a run
        // mid-pass, the log still carries partial per-query evidence
        System.err.println(f"[bench] $tag ${q.name} ${sec}%.3f s")
        Some(sec)
      } catch {
        case e: Throwable =>
          errors += q.name
          System.err.println(s"[bench] $tag ${q.name} failed: ${e.getMessage}")
          None
      }
    }
    // Untimed warmup at the smallest SF for EVERY benched query (an
    // r12 allowlist of name prefixes silently missed new families —
    // er_/graph_/maint_ paid their JIT inside timed pass 1). Sole
    // exclusion, chosen so new families warm BY DEFAULT: streaming,
    // where fixed micro-batch overhead dwarfs JIT and a warm lap
    // would cost real wall-clock (r7's bench timed out before
    // output); its pass 1 is its own warmup and min-of-passes
    // absorbs the difference.
    val warmDir = {
      val sibling = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sibling.isDirectory && sibling.toString != sfDir) sibling.toString else sfDir
    }
    picked.filterNot(_.name.startsWith("stream_")).foreach { q =>
      Core.releaseCaches()
      runOne(q, warmDir, "warm")
    }
    errors.clear() // warmup failures don't count; timed passes re-report
    def onePass(tag: String, qs: Seq[Q]): Map[String, Double] = qs.flatMap { q =>
      // release the previous query's internal persists before timing
      Core.releaseCaches()
      runOne(q, sfDir, tag).map(q.name -> _)
    }.toMap
    // Two full passes, per-query MIN: the host shows ~1-minute
    // interference waves (10–20× slowdowns at low loadavg); whole-suite
    // passes are minutes apart, so a wave poisons at most one sample
    // of any query. The min is the plan's cost, not the host's.
    // Pass 2 runs ROTATED BY HALF, not reversed: interference waves
    // are position-correlated (r10: text_stats/text_bpe_tokens
    // inflated 3–4× in BOTH passes while isolated runs matched r9),
    // so identical ordering can park the same query in the same wave
    // twice. Reversal (r11) had its own failure mode: pass 1's TAIL
    // and pass 2's HEAD become wall-clock-ADJACENT, so one wave
    // spanning the pass boundary poisons BOTH samples of exactly the
    // last-scheduled family (r11: every streaming query "regressed"
    // 3–7× in-suite while isolated re-runs matched r10). A half
    // rotation keeps every query's two samples maximally separated
    // in time AND in neighborhood.
    val p1 = onePass("p1", picked)
    val half = picked.size / 2
    val p2 = onePass("p2", picked.drop(half) ++ picked.take(half))
    // Adaptive third sample: two samples of the same constant-cost
    // plan disagreeing >3× PROVES at least one met an interference
    // wave — and during a long wave the "better" sample may itself be
    // poisoned (observed: a pass-total-424 s lap left min-of-2 values
    // 3–5× above quiet-window anchors). Re-time the worst such
    // queries once, minutes after both passes, and take the overall
    // min. Bounded at 10 queries so the extra lap can't blow the
    // wall-clock budget; sub-second disagreements are scheduling
    // jitter, not waves, and are skipped.
    val suspects = picked.filter { q =>
      (p1.get(q.name), p2.get(q.name)) match {
        case (Some(a), Some(b)) =>
          math.max(a, b) / math.min(a, b) > 3.0 && math.min(a, b) > 1.0
        case _ => false
      }
    }.sortBy(q => -math.min(p1(q.name), p2(q.name))).take(10)
    val p3 = onePass("p3", suspects)
    val results = picked.flatMap { q =>
      val samples = Seq(p1.get(q.name), p2.get(q.name), p3.get(q.name)).flatten
      if (samples.isEmpty) None else Some(q.name -> samples.min)
    }.toMap
    def f(v: Double) = math.round(v * 1000) / 1000.0
    def qjson(m: Map[String, Double]) =
      m.map { case (k, v) => s"\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val errJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) f(results.values.sum) else 0.0
    // "total" is the sum of per-query minima — a methodology marker plus
    // both raw per-pass totals keep cross-round comparisons honest (no
    // single pass achieved `value`; pass1/pass2 did happen end-to-end).
    // Both raw per-pass maps ship too, so the artifact itself separates
    // host interference waves (one wild sample) from real regressions
    // (both samples slow).
    val passTotals = s"[${f(p1.values.sum)},${f(p2.values.sum)}]"
    // The driver keeps only a ~2 KB TAIL of stdout, so the LAST line
    // must be a short self-contained summary it can parse whole. The
    // full per-query maps (145+ entries, ~10 KB) go on an earlier line
    // for humans and logs; the summary's "queries" carries just the 10
    // slowest by min-of-passes — the entries a regression hunt reads
    // first — and stays well under the tail window.
    val detail = s"""{"metric":"total_detail","value":$total,"unit":"sec","queries":${qjson(results)},"queries_p1":${qjson(p1)},"queries_p2":${qjson(p2)},"queries_p3":${qjson(p3)},"errors":$errJson,"sf":"$sfDir"}"""
    println(detail)
    // The stdout copy of the detail line routinely falls off the
    // driver's ~2 KB stdout tail (r13 kept ~62 of ~75 entries);
    // cross-round per-query comparison needs the WHOLE map durably,
    // so the detail ships as its own artifact file alongside the
    // summary.
    java.nio.file.Files.createDirectories(detailPath.getParent)
    java.nio.file.Files.write(detailPath,
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    // The r15 verdict's per-query r14/r15 comparison had to be
    // reconstructed from truncated 2 KB stdout tails — so the detail
    // also lands as a COMMITTED round artifact next to the driver's
    // BENCH_r{N}.json. The round number is inferred from the committed
    // artifacts themselves: this run belongs to round max+1 (the
    // driver writes BENCH_r{N} AFTER the round's bench). Written only
    // when run from the repo root on the full bench set, so a
    // SPARK_GRAFT_BENCH_ONLY profiling subset can't masquerade as the
    // round's numbers.
    // Guarded to the driver's scale point AND core count: an sf0.001
    // profiling lap once clobbered the round's committed sf0.1
    // per-query baseline (r18 inherited state), and the driver's own
    // reduced-core scaling lap once landed as the NEXT round's
    // "32-core" baseline (r18 verdict: an 8-core 73.9 s run written
    // as BENCH_DETAIL_r19.json). The committed detail is only
    // meaningful at the driver's bench configuration; both knobs stay
    // env-overridable so a differently named data dir doesn't
    // silently disable the write forever (the opposite failure mode).
    val driverSf = sys.env.getOrElse("SPARK_GRAFT_DRIVER_SF", "sf0.1")
    val driverCpus = sys.env.getOrElse("SPARK_GRAFT_DRIVER_CPUS", "32")
    val isDriverShape =
      new java.io.File(sfDir).getName == driverSf && cpus == driverCpus
    if (only.isEmpty && !isDriverShape)
      System.err.println(s"[bench] committed-detail write skipped: " +
        s"sf=${new java.io.File(sfDir).getName} cpus=$cpus is not the " +
        s"driver shape ($driverSf @ $driverCpus cpus)")
    if (only.isEmpty && isDriverShape) {
      // Round inference hazard: a manual rerun AFTER the driver has
      // already committed this round's BENCH_r{N}.json would label
      // its detail as round N+1. SPARK_GRAFT_ROUND pins the number
      // explicitly for such reruns; the max+1 inference remains the
      // default because the driver's own bench always runs BEFORE
      // its BENCH_r{N}.json exists.
      val rPat = "BENCH_r(\\d+)\\.json".r
      // Defensive parse: a malformed SPARK_GRAFT_ROUND must not crash
      // the bench after all timing work is done — fall through to the
      // max+1 inference instead.
      val round = sys.env.get("SPARK_GRAFT_ROUND")
        .flatMap(s => scala.util.Try(s.trim.toInt).toOption)
        .orElse(Option(new java.io.File(".").listFiles).toSeq.flatten
          .flatMap(f => f.getName match {
            case rPat(n) => Some(n.toInt)
            case _ => None
          }).reduceOption(_ max _).map(_ + 1))
      round.foreach { r =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(f"BENCH_DETAIL_r$r%02d.json"),
          (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    }
    val slowest = results.toSeq.sortBy(-_._2).take(10).toMap
    val summary = s"""{"metric":"total","value":$total,"unit":"sec","method":"min-of-2+adaptive-3rd-warmed","pass_totals":$passTotals,"errors":$errJson,"queries":${qjson(slowest)},"sf":"$sfDir"}"""
    println(summary)
    // The stdout copy rides inside sbt's log framing, whose
    // `[success] Total time` epilogue has defeated the driver's
    // last-line parse for ten rounds. A fixed artifact file carries
    // the same JSON with no framing at all; written before
    // spark.stop() so a slow shutdown can't truncate it.
    val out = summaryPath
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      (summary + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
