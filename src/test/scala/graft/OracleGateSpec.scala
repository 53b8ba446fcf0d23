package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle tractability gate (the round-13 post-mortem regression).
  *
  * Every registered oracle is executed in embedded DuckDB (via the
  * driver-side python, the only place DuckDB exists in this sandbox)
  * against the sf0.001 tables under a strict per-query wall-clock
  * budget. The failure class this pins: an oracle that is CORRECT but
  * UNPLANNABLE — round 13's `text_bpe_train12` unrolled 12 merge
  * rounds into CTEs each referencing the previous round twice, DuckDB
  * default-INLINED the chain as a 2^12 tree, the compare hung at plan
  * time, and the driver's whole 225-query correctness artifact came
  * back `{}`. No Spark-side test can see that bug: tests never run
  * the oracles. This spec does, so `sbt test` fails first.
  *
  * Budget: 30 s per oracle at sf0.001 — the full catalog's slowest
  * honest oracle is ~1 s here; plan-explosion failures don't finish
  * in minutes. Each oracle runs in its own OS process (a hung DuckDB
  * *planner* cannot be interrupted in-thread; a process can always be
  * killed).
  */
class OracleGateSpec extends AnyFunSuite {

  private def haveDuckdb: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb").start.waitFor == 0
    } catch { case _: Exception => false }

  test("every registered oracle plans and runs within budget at sf0.001") {
    assume(haveDuckdb, "python3+duckdb not on this host; gate runs driver-side")
    val dir = Files.createTempDirectory("graft-oracle-gate")
    val jsonPath = dir.resolve("oracles.json")
    // same escaping contract as Verify's oracle_sql.json dump
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(jsonPath, json)
    val gate = Paths.get("scripts/oracle_gate.py").toAbsolutePath
    assert(Files.exists(gate), s"missing $gate")
    val pb = new ProcessBuilder(
      "python3", gate.toString, jsonPath.toString,
      "/root/testdata/sf0.001", "30", "8")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes)
    val rc = proc.waitFor()
    // Always surface the slowest-first runtime table — it's the
    // per-round headroom log the punch list asks for.
    info(out.linesIterator.take(15).mkString("\n"))
    out.linesIterator.filter(_.startsWith("FAIL")).foreach(l => info(l))
    assert(rc == 0, s"oracle gate failed:\n$out")
    val total = SparkEntry.oracleSql.size
    assert(out.contains(s"$total/$total oracles ok"),
      s"gate did not cover the full catalog:\n${out.linesIterator.toSeq.takeRight(3).mkString("\n")}")
  }
}
