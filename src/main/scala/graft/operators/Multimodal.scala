package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star): media as opaque `binary`
  * columns with typed metadata, and a decode / feature-extract stage
  * run through `Dataset.mapPartitions` — the Scala analogue of a
  * Pandas-UDF `mapInPandas` decode: per-partition batches of rows in,
  * typed feature rows out, no shuffle.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * environment — see [[DecodeStub]]): the stub is a deterministic
  * byte-level "decode" so the Spark-side plumbing — binary schema,
  * partition-local batch iteration, typed output encoders, metadata
  * pushdown — is real and oracle-checkable end to end.
  *
  * The media table is synthesized deterministically from `documents`
  * (`media` = UTF-8 bytes of `text`; modality round-robins on
  * `doc_id`) so the DuckDB oracle can recompute every feature from
  * the same source column.
  *
  * Scale posture:
  *  - Binary payloads stay opaque through the scan; metadata
  *    predicates (modality, size) prune BEFORE decode, so a
  *    "decode only images wider than X" pipeline never touches
  *    non-matching bytes (columnar parquet reads skip the `media`
  *    column entirely for metadata-only queries).
  *  - Decode is partition-local `mapPartitions` over fixed-size
  *    batches (shape chosen for a real vectorized decoder); decode
  *    parallelism is partition count, controlled upstream with
  *    `repartition` — never a shuffle of decoded output.
  */
object Multimodal {

  /** Input row: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long,
      media_type: String,
      media: Array[Byte],
      width: Int,
      height: Int)

  /** Typed decode output. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      byte_sum: Long,
      checksum: Long,
      n_frames: Long)

  /** ====== STUB ======
    * Stand-in for a real codec (libjpeg / ffmpeg / soundfile would
    * slot in here). Deterministic byte-level features so the
    * surrounding plumbing is testable: a real implementation would
    * return pixel tensors / PCM frames instead.
    */
  object DecodeStub {
    /** Bytes per fake "frame" when treating the payload as video. */
    val FrameBytes = 256

    def features(r: MediaRecord): MediaFeatures = {
      val bytes = r.media
      var sum = 0L
      var hash = 0L
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        sum += b
        hash = (hash * 31 + b) % HashMod
        i += 1
      }
      MediaFeatures(
        r.doc_id, r.media_type, bytes.length.toLong, sum, hash,
        (bytes.length.toLong + FrameBytes - 1) / FrameBytes)
    }
  }

  /** Deterministic media table synthesized from `documents`:
    * modality by doc_id mod 3, fake dimensions from metadata. */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables(s, d, "documents")
      .select(
        col("doc_id"),
        element_at(
          array(lit("image/png"), lit("audio/wav"), lit("video/mp4")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        col("text").cast("binary").as("media"),
        (pmod(col("doc_id"), lit(640)) + 1).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 1).cast("int").as("height"))
      .as[MediaRecord]
  }

  /** The decode stage: partition-local, batched (the batch shape a
    * vectorized decoder needs), typed in/out, zero shuffle. */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // Real decoders amortize setup per batch; the stub keeps the
      // same iteration shape (grouped batches, flat output).
      rows.grouped(64).flatMap(batch => batch.map(DecodeStub.features))
    }
  }

  /** Registered query: full decode pass → per-document features. */
  def features(s: SparkSession, d: String): DataFrame =
    decodeFeatures(mediaTable(s, d)).toDF().orderBy("doc_id")

  /** Metadata-only aggregation: never reads the `media` column (the
    * parquet scan prunes it), groups tiny cardinality (3 rows). */
  def metaAgg(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d).toDF()
      .groupBy("media_type")
      .agg(
        count(lit(1)).as("n_media"),
        sum(length(col("media")).cast("long")).as("total_bytes"),
        max("width").as("max_width"))
      .orderBy("media_type")

  /** Predicate-pushdown decode: only the "video" modality is decoded;
    * the filter prunes before mapPartitions ever runs. */
  def videoFrames(s: SparkSession, d: String): DataFrame = {
    val media = mediaTable(s, d)
    import media.sparkSession.implicits._
    decodeFeatures(media.filter(col("media_type") === "video/mp4").as[MediaRecord])
      .toDF()
      .select("doc_id", "n_bytes", "n_frames")
      .orderBy("doc_id")
  }

  /** Oracle spelling of the modality round-robin. */
  private val oType =
    "(['image/png', 'audio/wav', 'video/mp4'])[CAST(doc_id % 3 AS INTEGER) + 1]"
  /** The payload's actual UTF-8 byte values as a DuckDB list. The stub
    * folds BYTES (what a codec sees), not codepoints, so the oracle
    * must too or any non-ASCII document silently breaks parity; DuckDB
    * has no blob→byte-array accessor, so decode hex pairs. */
  private val oBytes =
    "list_transform(range(1, octet_length(encode(text)) + 1), i -> " +
      "CAST(16*(strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i-1, 1)) - 1) " +
      "+ (strpos('0123456789ABCDEF', substr(hex(encode(text)), 2*i, 1)) - 1) AS BIGINT))"
  private val oByteSum =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $oBytes), (a, b) -> a + b)"
  private val oByteHash =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), $oBytes), (a, b) -> (a * 31 + b) % $HashMod)"

  val queries: Seq[Q] = Seq(
    Q("multimodal_features", features, Some(
      s"""SELECT doc_id, $oType AS media_type,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  $oByteSum AS byte_sum,
         |  $oByteHash AS checksum,
         |  (CAST(octet_length(encode(text)) AS BIGINT) + 255) // 256 AS n_frames
         |FROM documents ORDER BY doc_id""".stripMargin)),
    Q("multimodal_meta_agg", metaAgg, Some(
      s"""SELECT $oType AS media_type, COUNT(*) AS n_media,
         |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
         |  max(CAST(doc_id % 640 AS INTEGER) + 1) AS max_width
         |FROM documents GROUP BY 1 ORDER BY media_type""".stripMargin)),
    Q("multimodal_video_frames", videoFrames, Some(
      s"""SELECT doc_id,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  (CAST(octet_length(encode(text)) AS BIGINT) + 255) // 256 AS n_frames
         |FROM documents WHERE doc_id % 3 = 2 ORDER BY doc_id""".stripMargin)),
  )
}
