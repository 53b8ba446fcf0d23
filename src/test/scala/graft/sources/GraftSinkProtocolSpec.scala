package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.WriterCommitMessage
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Paths}

/** Commit-protocol semantics of the DSv2 sink, driven directly
  * through the SPI (the failure scenarios Spark's happy path never
  * exercises locally): zombie attempts, aborts, manifest-gated
  * visibility across overwrites, CONCURRENT writers racing the
  * version allocation, and snapshot time travel + expiry. */
class GraftSinkProtocolSpec extends SparkSpec {
  import spark.implicits._

  private def row(id: Long, text: String) =
    InternalRow(id, UTF8String.fromString(text))

  private def writeRows(root: String, jobId: String, partitionId: Int,
      taskId: Long, rows: Seq[(Long, String)]): WriterCommitMessage = {
    val w = new GraftSinkWriterFactory(root, jobId)
      .createWriter(partitionId, taskId)
    rows.foreach { case (i, t) => w.write(row(i, t)) }
    w.commit()
  }

  private def readBack(root: String, versionAsOf: Option[Int] = None): Set[(Long, String)] = {
    val r = spark.read.format("graft.sources.GraftDocsSink").option("path", root)
    versionAsOf.foreach(v => r.option("versionAsOf", v.toString))
    r.load().as[(Long, String)].collect().toSet
  }

  test("commit publishes exactly the surviving attempts; zombies are invisible") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val m0 = writeRows(root, "jobA", 0, 100L, Seq((1L, "alpha"), (2L, "tab\there")))
    val m1 = writeRows(root, "jobA", 1, 101L, Seq((3L, "line\nbreak"), (4L, "cr\rhere")))
    // zombie: a second attempt of partition 1 stages its own file but
    // its message never reaches the driver (Spark picked attempt 101)
    writeRows(root, "jobA", 1, 999L, Seq((99L, "zombie")))
    new GraftSinkBatchWrite(root, "jobA").commit(Array(m0, m1))
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
    val bw = new GraftSinkBatchWrite(root, "j1")
    val m = writeRows(root, "j1", 0, 1L, Seq((7L, "doomed")))
    bw.abort(Array(m))
    assert(readBack(root).isEmpty)
    // committed v1, then aborted v2: v1 stays visible untouched
    val v1 = writeRows(root, "j2", 0, 2L, Seq((1L, "keep")))
    new GraftSinkBatchWrite(root, "j2").commit(Array(v1))
    val v2 = writeRows(root, "j3", 0, 3L, Seq((2L, "discard")))
    new GraftSinkBatchWrite(root, "j3").abort(Array(v2))
    assert(readBack(root) == Set((1L, "keep")))
  }

  test("concurrent writers: namespaced staging, serialized version allocation") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    // both jobs stage FULLY before either commits — the interleaving
    // the r12 shared-staging sweep corrupted (commit A deleted B's
    // staged file; B's commit then crashed at Files.move)
    val ma = writeRows(root, "jobA", 0, 1L, Seq((1L, "from-A")))
    val mb = writeRows(root, "jobB", 0, 1L, Seq((2L, "from-B")))
    new GraftSinkBatchWrite(root, "jobA").commit(Array(ma))
    new GraftSinkBatchWrite(root, "jobB").commit(Array(mb))
    // both snapshots retained as distinct versions; the later commit
    // is current (last-committer-wins, like two blind INSERT
    // OVERWRITEs through a table catalog)
    assert(GraftDocsSink.versions(root) == Seq(1, 2))
    assert(readBack(root) == Set((2L, "from-B")))
    assert(readBack(root, Some(1)) == Set((1L, "from-A")))
    assert(!Files.exists(Paths.get(root, "staging")))
  }

  test("version numbers past the 5-digit pad stay visible") {
    // %05d is a MINIMUM width: version 100000 writes 6 digits, and an
    // exactly-5-digit listing pattern would silently shadow it (commit
    // "succeeds", snapshot invisible, reads pin a stale table)
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    Files.write(GraftDocsSink.manifestPath(root, 99999), Array.empty[Byte])
    Files.write(GraftDocsSink.manifestPath(root, 100000), Array.empty[Byte])
    assert(GraftDocsSink.versions(root) == Seq(99999, 100000))
  }

  test("time travel: versionAsOf reads an old snapshot while newer commits exist") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    def writeDf(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write
        .format("graft.sources.GraftDocsSink")
        .option("path", root).mode("overwrite").save()
    writeDf(Seq((1L, "one"), (2L, "two")))
    writeDf(Seq((9L, "nine")))
    assert(readBack(root) == Set((9L, "nine")))
    assert(readBack(root, Some(1)) == Set((1L, "one"), (2L, "two")))
    assert(readBack(root, Some(2)) == Set((9L, "nine")))
    // a version that was never committed is an error, not an empty table
    val e = intercept[Exception](readBack(root, Some(7)))
    assert(e.getMessage.contains("versionAsOf 7"))
  }

  // --------------------------------------------------- streaming epochs

  private def stageEpoch(root: String, writeId: String, epochId: Long,
      rows: Seq[(Long, String)]): WriterCommitMessage = {
    val w = new GraftSinkStreamingWriterFactory(root, writeId)
      .createWriter(0, System.nanoTime(), epochId)
    rows.foreach { case (i, t) => w.write(row(i, t)) }
    w.commit()
  }

  test("streaming epochs append: one snapshot per epoch, markers carried forward") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sw = new GraftSinkStreamingWrite(root, "q1")
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "e0")))))
    sw.commit(1L, Array(stageEpoch(root, "q1", 1L, Seq((2L, "e1")))))
    sw.commit(2L, Array(stageEpoch(root, "q1", 2L, Seq((3L, "e2")))))
    assert(GraftDocsSink.versions(root) == Seq(1, 2, 3), "one snapshot per epoch")
    assert(readBack(root) == Set((1L, "e0"), (2L, "e1"), (3L, "e2")), "appends accrete")
    assert(readBack(root, Some(2)) == Set((1L, "e0"), (2L, "e1")),
      "epoch history is time-travelable")
    assert(!Files.exists(Paths.get(root, "staging")))
  }

  test("streaming epoch re-commit is idempotent (crash between commit and checkpoint)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sw = new GraftSinkStreamingWrite(root, "q1")
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "once")))))
    // Spark re-runs the micro-batch after recovery: fresh staged files
    // (new taskId), SAME epoch — the marker in the current manifest
    // must make this publish nothing
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "once")))))
    assert(GraftDocsSink.versions(root) == Seq(1), "re-delivered epoch adds no snapshot")
    assert(readBack(root) == Set((1L, "once")), "no duplicate rows")
    assert(!Files.exists(Paths.get(root, "staging")), "re-staged files swept")
    // a LATER epoch still commits normally after the replayed one
    sw.commit(1L, Array(stageEpoch(root, "q1", 1L, Seq((2L, "next")))))
    assert(readBack(root) == Set((1L, "once"), (2L, "next")))
    // ...and markers survive the append chain: replaying epoch 0 AFTER
    // epoch 1 committed is still a no-op (carried-forward ledger)
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "once")))))
    assert(GraftDocsSink.versions(root) == Seq(1, 2) &&
      readBack(root) == Set((1L, "once"), (2L, "next")))
  }

  test("streaming epoch abort sweeps only its own staging; committed state intact") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sw = new GraftSinkStreamingWrite(root, "q1")
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "keep")))))
    val doomed = stageEpoch(root, "q1", 1L, Seq((2L, "discard")))
    sw.abort(1L, Array(doomed))
    assert(GraftDocsSink.versions(root) == Seq(1))
    assert(readBack(root) == Set((1L, "keep")))
    assert(!Files.exists(Paths.get(root, "staging")))
  }

  test("streaming append interleaved with a batch overwrite rebuilds on the new base") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sw = new GraftSinkStreamingWrite(root, "q1")
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "stream0")))))
    // a batch job overwrites the table between two epochs
    val mb = writeRows(root, "jobB", 0, 1L, Seq((9L, "batch")))
    new GraftSinkBatchWrite(root, "jobB").commit(Array(mb))
    // the next epoch appends to the OVERWRITTEN snapshot, not the
    // stale pre-overwrite one
    sw.commit(1L, Array(stageEpoch(root, "q1", 1L, Seq((2L, "stream1")))))
    assert(readBack(root) == Set((9L, "batch"), (2L, "stream1")))
  }

  test("epoch re-delivery after a batch overwrite publishes nothing (_txn ledger)") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sw = new GraftSinkStreamingWrite(root, "q1")
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "stream0")))))
    // crash between the commit and the checkpoint advance... then a
    // batch overwrite lands: its fresh manifest carries NO #epoch
    // markers, so the in-snapshot ledger alone would forget epoch 0
    val mb = writeRows(root, "jobB", 0, 1L, Seq((9L, "batch")))
    new GraftSinkBatchWrite(root, "jobB").commit(Array(mb))
    // stream restarts and re-delivers epoch 0: the _txn file is the
    // overwrite-proof record — nothing republishes
    sw.commit(0L, Array(stageEpoch(root, "q1", 0L, Seq((1L, "stream0")))))
    assert(readBack(root) == Set((9L, "batch")),
      "re-delivered epoch republished into the overwritten snapshot")
    assert(GraftDocsSink.versions(root).size == 2,
      "re-delivery must not add a snapshot")
    assert(!Files.exists(Paths.get(root, "staging")), "re-staged files swept")
  }

  test("overwrite flips atomically; vacuum honors retained snapshots; expire reclaims") {
    val root = java.nio.file.Files.createTempDirectory("graft-sink").toString
    def writeDf(rows: Seq[(Long, String)]): Unit =
      rows.toDF("doc_id", "text").write
        .format("graft.sources.GraftDocsSink")
        .option("path", root).mode("overwrite").save()
    writeDf(Seq((1L, "one"), (2L, "two"), (3L, "three")))
    assert(readBack(root) == Set((1L, "one"), (2L, "two"), (3L, "three")))
    writeDf(Seq((9L, "nine")))
    // the manifest gates: only the new version's files are visible...
    assert(readBack(root) == Set((9L, "nine")))
    // ...but v1's files are NOT garbage while its snapshot is
    // retained — vacuum must keep every file any version references
    val dataDir = new java.io.File(root, "data")
    val before = dataDir.listFiles.length
    val (liveAll, removed0) = GraftDocsSink.vacuum(root)
    assert(liveAll == before && removed0 == 0)
    assert(readBack(root, Some(1)) == Set((1L, "one"), (2L, "two"), (3L, "three")))
    // expiring down to the current snapshot strands v1's files;
    // vacuum then reclaims exactly those, and the reader's view of
    // the current version is unchanged
    assert(GraftDocsSink.expireVersions(root, 1) == Seq(1))
    val (live, removed) = GraftDocsSink.vacuum(root)
    assert(live >= 1 && removed == before - live && removed >= 1)
    assert(dataDir.listFiles.length == live)
    assert(readBack(root) == Set((9L, "nine")))
    // idempotent: a second vacuum finds nothing
    assert(GraftDocsSink.vacuum(root) == (live, 0))
    // the expired snapshot is gone for good
    intercept[Exception](readBack(root, Some(1)))
  }
}
