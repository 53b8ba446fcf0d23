package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 WRITE path (`spark.read/write.format("graft-docs-sink")`)
  * — the sink half of the connector SPI, complementing
  * [[SyntheticDocsSource]]'s read half: a file sink with the real
  * STAGING + ATOMIC-COMMIT protocol every production connector needs
  * for exactly-once batch output.
  *
  * Protocol (the part worth building):
  *  - each write JOB stages under its own `staging/<jobId>/`
  *    directory (jobId = Spark's queryId for the write), so two
  *    concurrent jobs against the same table can never sweep each
  *    other's staged files; within a job, each task's [[DataWriter]]
  *    writes a file named by (partitionId, taskId) — task RETRIES and
  *    speculative attempts each stage their own file and never
  *    clobber one another;
  *  - `commit()` on a writer returns its staging path as the
  *    [[WriterCommitMessage]]; only messages from the ONE attempt
  *    Spark picks per partition reach the driver;
  *  - driver-side [[BatchWrite.commit]] atomically publishes exactly
  *    the staged files named in the messages (rename into `data/`,
  *    then ONE atomic manifest-version CREATE marks the snapshot
  *    live) — zombie attempts' orphan staging files are ignored and
  *    swept;
  *  - [[BatchWrite.abort]] deletes the job's staging so a failed job
  *    leaves no partial table (readers see the previous manifest or
  *    nothing).
  *
  * Snapshots and time travel: every commit lands as a NEW manifest
  * file `MANIFEST-v<n>` and the current table state is the
  * highest-numbered manifest. The version file is created with an
  * atomic hard-link (create-if-absent; on a cluster the same
  * primitive is HDFS `create(overwrite=false)` or an object store's
  * conditional put / If-None-Match — exactly how Delta's log store
  * serializes commits) — two concurrent committers
  * can never overwrite one another's manifest; the committer that
  * loses the version number simply allocates the next one, so
  * concurrent blind overwrites SERIALIZE (both snapshots are
  * retained, the later allocation is "current" — the same
  * last-committer-wins semantics two uncoordinated INSERT OVERWRITE
  * jobs get from a real table format's catalog). Readers pin a
  * snapshot with `option("versionAsOf", n)`; [[GraftDocsSink.vacuum]]
  * keeps every file any RETAINED manifest references, and
  * [[GraftDocsSink.expireVersions]] drops old snapshots to let vacuum
  * reclaim them.
  *
  * Readers scan ONLY files listed in the resolved manifest, so a
  * concurrent reader never observes a half-written table — the same
  * manifest-gated visibility a table format (Iceberg/Delta) provides,
  * demonstrated at connector scale. Rows are TSV-encoded (doc_id,
  * text with tab/newline escapes); one reader partition per data
  * file, so read parallelism tracks write parallelism.
  *
  * GraftSinkProtocolSpec drives commit, abort, zombie-orphan,
  * overwrite, concurrent-writer, time-travel and expire scenarios
  * directly through this SPI.
  */
class GraftDocsSink extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftDocsSink.schema
  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new GraftDocsSinkTable(properties.asScala.toMap)
}

object GraftDocsSink {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false)))

  // \r must be escaped too: the reader splits on LINES, and a bare
  // carriage return in a payload would terminate a record early
  // (readAllLines treats \r as a line break) — corrupting or
  // crashing the round-trip of rows the writer accepted.
  def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\t", "\\t")
      .replace("\n", "\\n").replace("\r", "\\r")
  def unesc(s: String): String = {
    val b = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 't'  => b.append('\t'); i += 2
          case 'n'  => b.append('\n'); i += 2
          case 'r'  => b.append('\r'); i += 2
          case '\\' => b.append('\\'); i += 2
          case _    => b.append(c); i += 1
        }
      } else { b.append(c); i += 1 }
    }
    b.toString
  }

  // \d{5,}: the %05d pad is a MINIMUM width, so version 100,000
  // writes 6 digits — an exactly-5 pattern would leave it invisible
  // to versions() and silently shadow every later snapshot
  private val ManifestRe = "MANIFEST-v(\\d{5,})".r

  def manifestPath(root: String, version: Int): java.nio.file.Path =
    Paths.get(root, f"MANIFEST-v$version%05d")

  /** Retained snapshot versions, ascending (empty if never committed). */
  def versions(root: String): Seq[Int] =
    Option(new File(root).list()).getOrElse(Array.empty[String])
      .toSeq.collect { case ManifestRe(n) => n.toInt }.sorted

  /** Raw manifest lines of a snapshot: data-file names plus `#`-prefixed
    * metadata (the streaming path records `#epoch=<writeId>/<epochId>`
    * markers there — see [[GraftSinkStreamingWrite]]). */
  private[sources] def manifestLines(root: String, version: Int): Seq[String] =
    new String(Files.readAllBytes(manifestPath(root, version)), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq

  /** Data files of a committed snapshot — the given version, or the
    * CURRENT (highest) one. Empty if the table was never committed;
    * an explicitly requested version that is not retained is an
    * error, not an empty table. */
  def committedFiles(root: String, version: Option[Int] = None): Seq[String] = {
    val have = versions(root)
    version.foreach(v => require(have.contains(v),
      s"graft-docs-sink: versionAsOf $v not retained at $root " +
        s"(have: ${if (have.isEmpty) "none" else have.mkString(", ")})"))
    version.orElse(have.lastOption).fold(Seq.empty[String])(
      manifestLines(root, _).filterNot(_.startsWith("#")))
  }

  /** Allocate-and-create the next manifest version atomically (the
    * hard-link create-if-absent commit point). `lines` is recomputed
    * on every attempt, so an APPENDING committer that loses the race
    * rebuilds its manifest on the new current snapshot instead of
    * resurrecting a stale base (the lost-update hazard two appenders
    * otherwise have); a blind-overwrite committer just passes a
    * constant. Returns the version that stuck. */
  private[sources] def publishManifest(root: String, tmpTag: String)(
      lines: () => Seq[String]): Int = {
    var committed = -1
    while (committed < 0) {
      val tmp = Paths.get(root, s"MANIFEST.tmp-$tmpTag")
      Files.write(tmp, lines().mkString("\n").getBytes(StandardCharsets.UTF_8))
      val v = versions(root).lastOption.getOrElse(0) + 1
      try {
        Files.createLink(manifestPath(root, v), tmp)
        committed = v
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => ()
      }
      Files.delete(tmp)
    }
    committed
  }

  /** Table maintenance: delete data files NOT referenced by ANY
    * retained manifest version (each overwrite publishes a fresh file
    * list; superseded versions stay readable via `versionAsOf` until
    * [[expireVersions]] drops them, so vacuum only reclaims files no
    * retained snapshot can reach).
    *
    * Concurrency contract — same as a real table format's VACUUM:
    * run in a maintenance window with NO concurrent writer (a commit
    * between the manifest read and the deletes could otherwise lose
    * just-moved files). The staging/ directory only exists between
    * writer start and commit/abort, so its presence detects an
    * in-flight (or crashed) write and the call refuses rather than
    * race it. Returns (live, removed) counts. */
  def vacuum(root: String): (Int, Int) = {
    require(!new File(root, "staging").exists(),
      s"vacuum($root): write in flight (staging/ present) — " +
        "run vacuum only in a maintenance window")
    val live = versions(root)
      .flatMap(v => committedFiles(root, Some(v))).toSet
    val dataDir = new File(root, "data")
    val all = Option(dataDir.listFiles).getOrElse(Array.empty)
    val orphans = all.filterNot(f => live(f.getName))
    orphans.foreach(_.delete())
    (live.size, orphans.length)
  }

  /** Drop all but the newest `keepLast` snapshot manifests (their
    * data files become vacuum-collectable unless a retained snapshot
    * still references them). Returns the expired version numbers. */
  def expireVersions(root: String, keepLast: Int): Seq[Int] = {
    require(keepLast >= 1, "expireVersions: must retain at least the current version")
    val expired = versions(root).dropRight(keepLast)
    expired.foreach(v => Files.deleteIfExists(manifestPath(root, v)))
    expired
  }
}

private[sources] class GraftDocsSinkTable(options: Map[String, String])
    extends Table with SupportsWrite with SupportsRead {
  private def root: String = options.getOrElse("path",
    sys.error("graft-docs-sink requires option 'path'"))

  override def name(): String = s"graft_docs_sink($root)"
  override def schema(): StructType = GraftDocsSink.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.BATCH_READ, TableCapability.STREAMING_WRITE)

  // ---------------------------------------------------------------- write
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite == truncate-then-write for an unpartitioned table;
      // visibility still flips atomically at the manifest create
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        // queryId is Spark's unique id for THIS write job — the
        // staging namespace that isolates concurrent writers
        override def toBatch: BatchWrite =
          new GraftSinkBatchWrite(root, info.queryId())
        override def toStreaming: StreamingWrite =
          new GraftSinkStreamingWrite(root, info.queryId())
      }
    }

  // ----------------------------------------------------------------- read
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    // time travel: pin the scan to a retained snapshot; default is
    // the current (highest) version
    val versionAsOf =
      Option(o.get("versionAsOf")).orElse(options.get("versionasof"))
        .map(_.trim.toInt)
    () => new Scan with Batch {
      override def readSchema(): StructType = GraftDocsSink.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        // manifest-gated: uncommitted/orphan staging files are invisible
        GraftDocsSink.committedFiles(root, versionAsOf)
          .map(f => GraftSinkFilePartition(s"$root/data/$f"): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftSinkReaderFactory
    }
  }
}

private[sources] case class GraftSinkFilePartition(path: String)
    extends InputPartition

private[sources] class GraftSinkReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val lines = Files.readAllLines(
      Paths.get(p.asInstanceOf[GraftSinkFilePartition].path),
      StandardCharsets.UTF_8).asScala.iterator
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (!lines.hasNext) false
        else {
          val l = lines.next()
          val tab = l.indexOf('\t')
          cur = InternalRow(l.substring(0, tab).toLong,
            UTF8String.fromString(GraftDocsSink.unesc(l.substring(tab + 1))))
          true
        }
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

private[sources] case class GraftSinkCommitMessage(stagedFile: String)
    extends WriterCommitMessage

private[sources] class GraftSinkBatchWrite(root: String, jobId: String)
    extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(root, jobId)

  /** Atomic publish: move exactly the staged files the surviving
    * attempts reported, then CREATE the next manifest version. The
    * version create (an atomic hard-link — fails if the name exists)
    * is the commit point AND the concurrent-writer arbiter: a
    * committer that loses the race for version n retries at n+1, so
    * racing jobs serialize into distinct retained snapshots and the
    * last allocation is "current". Readers either see a complete old
    * snapshot or the complete new one. Orphan staging files (zombie
    * attempts of THIS job) are swept, not published. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val published = GraftSinkWriters.publishStaged(root, messages)
    GraftDocsSink.publishManifest(root, jobId)(() => published)
    GraftSinkWriters.sweep(root, jobId)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    GraftSinkWriters.sweep(root, jobId) // failed job leaves no partial table
}

private[sources] object GraftSinkWriters {
  /** One staged TSV writer. `ns` is the staging namespace (jobId for
    * batch, `<writeId>-e<epochId>` for a streaming epoch) — it
    * isolates concurrent jobs AND prefixes the file name so published
    * names stay collision-free in the shared data/ dir; the
    * (partitionId, taskId)-unique suffix isolates concurrent attempts
    * within one job (taskIds restart per job, and retries of a
    * streaming epoch get fresh taskIds). */
  def staged(root: String, ns: String, partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    val dir = Paths.get(root, "staging", ns)
    Files.createDirectories(dir)
    val path = dir.resolve(f"$ns%s-part-$partitionId%05d-$taskId.tsv")
    val out = Files.newBufferedWriter(path, StandardCharsets.UTF_8)
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit = {
        out.write(s"${r.getLong(0)}\t${GraftDocsSink.esc(r.getUTF8String(1).toString)}")
        out.newLine()
      }
      override def commit(): WriterCommitMessage = {
        out.close()
        GraftSinkCommitMessage(path.toString)
      }
      override def abort(): Unit = { out.close(); Files.deleteIfExists(path): Unit }
      override def close(): Unit = ()
    }
  }

  /** Move the surviving attempts' staged files into data/ and return
    * their published names. */
  def publishStaged(root: String, messages: Array[WriterCommitMessage]): Seq[String] = {
    val dataDir = Paths.get(root, "data")
    Files.createDirectories(dataDir)
    messages.map { m =>
      val staged = Paths.get(m.asInstanceOf[GraftSinkCommitMessage].stagedFile)
      Files.move(staged, dataDir.resolve(staged.getFileName),
        StandardCopyOption.REPLACE_EXISTING)
      staged.getFileName.toString
    }.toSeq
  }

  /** Sweep ONE staging namespace (a job, or a streaming epoch) — a
    * concurrent writer's namespace is its own to commit or abort. The
    * shared parent dir is removed when this was the last namespace in
    * flight (delete on a non-empty dir is a no-op failure). */
  def sweep(root: String, ns: String): Unit = {
    val nsDir = new File(new File(root, "staging"), ns)
    val fs = nsDir.listFiles
    if (fs != null) fs.foreach(_.delete())
    nsDir.delete()
    new File(root, "staging").delete(): Unit
  }
}

private[sources] class GraftSinkWriterFactory(root: String, jobId: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    GraftSinkWriters.staged(root, jobId, partitionId, taskId)
}

/** Structured Streaming write path: one epoch = one micro-batch = one
  * APPENDED manifest version, with exactly-once semantics across
  * failure replays.
  *
  * The idempotence protocol (the part a real streaming sink must get
  * right): after a crash BETWEEN a successful epoch commit and the
  * checkpoint advance, Spark re-runs the micro-batch and re-delivers
  * `commit(epochId)`. Each committed manifest therefore carries an
  * `#epoch=<writeId>/<epochId>` marker line, and every append CARRIES
  * FORWARD the current manifest's markers (the same mechanism as
  * Delta's SetTransaction appId/version ledger) — a re-delivered
  * commit finds its marker in the current snapshot, publishes
  * NOTHING, and just sweeps its re-staged files. Partially-published
  * files of a commit that crashed before its manifest create are
  * invisible (manifest-gated readers) and reclaimed by vacuum.
  *
  * Appends rebuild on the CURRENT snapshot inside the allocation
  * retry loop ([[GraftDocsSink.publishManifest]] recomputes lines per
  * attempt), so a concurrent appender — another query, or a batch
  * overwrite — can never be lost-updated away. */
private[sources] class GraftSinkStreamingWrite(root: String, writeId: String)
    extends StreamingWrite {
  private def ns(epochId: Long) = s"$writeId-e$epochId"

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    // a dedicated Serializable factory: a SAM lambda here would close
    // over this (non-serializable) driver-side StreamingWrite
    new GraftSinkStreamingWriterFactory(root, writeId)

  private def currentLines(): Seq[String] =
    GraftDocsSink.versions(root).lastOption
      .fold(Seq.empty[String])(GraftDocsSink.manifestLines(root, _))

  /** Durable epoch ledger entry OUTSIDE the snapshot line list: the
    * in-manifest `#epoch=` markers are carried forward by appends but
    * ERASED by a batch overwrite's fresh manifest, so a commit
    * re-delivered after an interleaved overwrite (crash between
    * commit and checkpoint advance, then a batch overwrite) would no
    * longer find its marker and republish the epoch's rows into the
    * post-overwrite snapshot. A `_txn/<writeId>-e<epochId>` file is
    * the overwrite-proof record (Delta's SetTransaction idea, as a
    * file). Written AFTER the manifest publish — a crash in between
    * is healed because the replay that finds the marker backfills the
    * ledger below; only a crash in that window followed by an
    * overwrite BEFORE the stream restarts can still double-publish,
    * and that requires a second writer inside the recovery window. */
  private def txnPath(epochId: Long) =
    Paths.get(root, "_txn", ns(epochId))

  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
    val marker = s"#epoch=${ns(epochId)}"
    val committed = Files.exists(txnPath(epochId)) ||
      currentLines().contains(marker)
    if (!committed) {
      val published = GraftSinkWriters.publishStaged(root, messages)
      GraftDocsSink.publishManifest(root, ns(epochId)) { () =>
        val base = currentLines()
        if (base.contains(marker)) base // raced our own crash-replay twin
        else base ++ published :+ marker
      }
    }
    // ledger backfill is idempotent and also covers the replay that
    // found a marker published by a pre-crash twin
    Files.createDirectories(txnPath(epochId).getParent)
    try Files.createFile(txnPath(epochId))
    catch { case _: java.nio.file.FileAlreadyExistsException => () }
    GraftSinkWriters.sweep(root, ns(epochId))
  }

  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
    GraftSinkWriters.sweep(root, ns(epochId))
}

private[sources] class GraftSinkStreamingWriterFactory(root: String, writeId: String)
    extends StreamingDataWriterFactory {
  override def createWriter(
      partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    GraftSinkWriters.staged(root, s"$writeId-e$epochId", partitionId, taskId)
}
