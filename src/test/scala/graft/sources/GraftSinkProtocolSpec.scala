package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}

/** Commit-protocol semantics of the DSv2 sink, driven directly
  * through the SPI (the failure scenarios Spark's happy path never
  * exercises locally): zombie attempts, aborts, and manifest-gated
  * visibility across overwrites. */
class GraftSinkProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, text: String) =
    InternalRow(id, UTF8String.fromString(text))

  private def writeRows(root: String, partitionId: Int, taskId: Long,
      rows: Seq[(Long, String)]): WriterCommitMessage = {
    val w = new GraftSinkWriterFactory(root).createWriter(partitionId, taskId)
    rows.foreach { case (i, t) => w.write(row(i, t)) }
    w.commit()
  }

  private def readBack(root: String): Set[(Long, String)] =
    spark.read.format("graft.sources.GraftDocsSink").option("path", root)
      .load().as[(Long, String)].collect().toSet

  test("commit publishes exactly the surviving attempts; zombies are invisible") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val m0 = writeRows(root, 0, 100L, Seq((1L, "alpha"), (2L, "tab\there")))
    val m1 = writeRows(root, 1, 101L, Seq((3L, "line\nbreak"), (4L, "cr\rhere")))
    // zombie: a second attempt of partition 1 stages its own file but
    // its message never reaches the driver (Spark picked attempt 101)
    writeRows(root, 1, 999L, Seq((99L, "zombie")))
    new GraftSinkBatchWrite(root).commit(Array(m0, m1))
    // escapes round-trip (incl. \r, which the line-based reader would
    // otherwise treat as a record break); the zombie row is not
    // published
    assert(readBack(root) ==
      Set((1L, "alpha"), (2L, "tab\there"), (3L, "line\nbreak"), (4L, "cr\rhere")))
    // staging fully swept — no orphan files accumulate
    assert(!Files.exists(Paths.get(root, "staging")))
  }

  test("abort leaves no table; a prior committed version stays visible") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    // aborted FIRST write: reader sees nothing at all
    val bw = new GraftSinkBatchWrite(root)
    val m = writeRows(root, 0, 1L, Seq((7L, "doomed")))
    bw.abort(Array(m))
    assert(readBack(root).isEmpty)
    // committed v1, then aborted v2: v1 stays visible untouched
    val v1 = writeRows(root, 0, 2L, Seq((1L, "keep")))
    new GraftSinkBatchWrite(root).commit(Array(v1))
    val v2 = writeRows(root, 0, 3L, Seq((2L, "discard")))
    new GraftSinkBatchWrite(root).abort(Array(v2))
    assert(readBack(root) == Set((1L, "keep")))
  }

  test("overwrite through the public API flips visibility atomically") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    def writeDf(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write
        .format("graft.sources.GraftDocsSink")
        .option("path", root).mode("overwrite").save()
    writeDf(Seq((1L, "one"), (2L, "two"), (3L, "three")))
    assert(readBack(root) == Set((1L, "one"), (2L, "two"), (3L, "three")))
    writeDf(Seq((9L, "nine")))
    // the manifest gates: only the new version's files are visible
    assert(readBack(root) == Set((9L, "nine")))
    // the stranded v1 files are exactly what vacuum collects — and
    // collecting them cannot change the reader's view
    val dataDir = new java.io.File(root, "data")
    val before = dataDir.listFiles.length
    val (live, removed) = GraftDocsSink.vacuum(root)
    assert(live >= 1 && removed == before - live && removed >= 1)
    assert(dataDir.listFiles.length == live)
    assert(readBack(root) == Set((9L, "nine")))
    // idempotent: a second vacuum finds nothing
    assert(GraftDocsSink.vacuum(root) == (live, 0))
  }
}
