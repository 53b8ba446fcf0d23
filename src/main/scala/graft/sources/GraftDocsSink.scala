package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
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
  *  - each task's [[DataWriter]] writes to a staging file named by
  *    (partitionId, taskId) — task RETRIES and speculative attempts
  *    each stage their own file and never clobber one another;
  *  - `commit()` on a writer returns its staging path as the
  *    [[WriterCommitMessage]]; only messages from the ONE attempt
  *    Spark picks per partition reach the driver;
  *  - driver-side [[BatchWrite.commit]] atomically publishes exactly
  *    the staged files named in the messages (rename into `data/`,
  *    then one manifest write marks the table live) — zombie
  *    attempts' orphan staging files are ignored and swept;
  *  - [[BatchWrite.abort]] deletes staging so a failed job leaves no
  *    partial table (readers see the previous manifest or nothing).
  *
  * Readers scan ONLY files listed in the committed manifest, so a
  * concurrent reader never observes a half-written table — the same
  * manifest-gated visibility a table format (Iceberg/Delta) provides,
  * demonstrated at connector scale. Rows are TSV-encoded (doc_id,
  * text with tab/newline escapes); one reader partition per data
  * file, so read parallelism tracks write parallelism.
  *
  * SourceSpec drives commit, abort, zombie-orphan, and overwrite
  * scenarios directly through this SPI.
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

  def manifestPath(root: String): java.nio.file.Path =
    Paths.get(root, "MANIFEST")

  /** Table maintenance: delete data files NOT referenced by the
    * current manifest (each overwrite publishes a fresh file list and
    * strands the previous version's files — the same garbage a table
    * format's VACUUM collects).
    *
    * Concurrency contract — same as a real table format's VACUUM
    * with retention 0: run in a maintenance window with NO concurrent
    * writer (a commit between the manifest read and the deletes could
    * otherwise lose just-moved files) and no reader still scanning a
    * SUPERSEDED manifest. The staging/ directory only exists between
    * writer start and commit/abort, so its presence detects an
    * in-flight write and the call refuses rather than race it.
    * Returns (live, removed) counts. */
  def vacuum(root: String): (Int, Int) = {
    require(!new File(root, "staging").exists(),
      s"vacuum($root): write in flight (staging/ present) — " +
        "run vacuum only in a maintenance window")
    val live = committedFiles(root).toSet
    val dataDir = new File(root, "data")
    val all = Option(dataDir.listFiles).getOrElse(Array.empty)
    val orphans = all.filterNot(f => live(f.getName))
    orphans.foreach(_.delete())
    (live.size, orphans.length)
  }
  /** Data files of the CURRENTLY COMMITTED version (empty if never
    * committed). */
  def committedFiles(root: String): Seq[String] = {
    val m = manifestPath(root)
    if (!Files.exists(m)) Seq.empty
    else new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      .split("\n").filter(_.nonEmpty).toSeq
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
      TableCapability.BATCH_READ)

  // ---------------------------------------------------------------- write
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      // overwrite == truncate-then-write for an unpartitioned table;
      // visibility still flips atomically at the manifest write
      override def truncate(): WriteBuilder = this
      override def build(): Write = new Write {
        override def toBatch: BatchWrite = new GraftSinkBatchWrite(root)
      }
    }

  // ----------------------------------------------------------------- read
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan with Batch {
      override def readSchema(): StructType = GraftDocsSink.schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        // manifest-gated: uncommitted/orphan staging files are invisible
        GraftDocsSink.committedFiles(root)
          .map(f => GraftSinkFilePartition(s"$root/data/$f"): InputPartition)
          .toArray
      override def createReaderFactory(): PartitionReaderFactory =
        new GraftSinkReaderFactory
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

private[sources] class GraftSinkBatchWrite(root: String) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new GraftSinkWriterFactory(root)

  /** Atomic publish: move exactly the staged files the surviving
    * attempts reported, then flip the manifest. The manifest write is
    * the commit point — readers either see the old file list or the
    * complete new one. Orphan staging files (zombie attempts) are
    * swept, not published. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dataDir = Paths.get(root, "data")
    Files.createDirectories(dataDir)
    val published = messages.map { m =>
      val staged = Paths.get(m.asInstanceOf[GraftSinkCommitMessage].stagedFile)
      val target = dataDir.resolve(staged.getFileName)
      Files.move(staged, target, StandardCopyOption.REPLACE_EXISTING)
      staged.getFileName.toString
    }
    // commit point: one atomic manifest replace
    val tmp = Paths.get(root, "MANIFEST.tmp")
    Files.write(tmp, published.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, GraftDocsSink.manifestPath(root),
      StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    sweepStaging()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    sweepStaging() // failed job leaves no partial table

  private def sweepStaging(): Unit = {
    val staging = new File(root, "staging")
    val fs = staging.listFiles
    if (fs != null) fs.foreach(_.delete())
    staging.delete(): Unit
  }
}

private[sources] class GraftSinkWriterFactory(root: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] = {
    // (partitionId, taskId)-unique staging file: concurrent attempts
    // of the same partition never collide
    val dir = Paths.get(root, "staging")
    Files.createDirectories(dir)
    val path = dir.resolve(f"part-$partitionId%05d-$taskId.tsv")
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
}
