package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One registered engine query: the Spark plan plus (optionally) the
  * equivalent DuckDB SQL the driver uses as a correctness oracle.
  *
  * Column names MUST match between `spark` and `oracle` — the driver
  * sorts columns by name before hashing values.
  */
final case class Q(
    name: String,
    spark: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** benchmarked at sf0.1 by [[Bench]]; keep false for quadratic
      * correctness-only demos that exist for oracle parity. */
    headline: Boolean = true)

object Tables {
  /** All driver tables are parquet: `<sfDir>/<name>.parquet`. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}

/** Helpers shared by operator modules. */
object Core {
  /** Temp directory removed recursively at JVM exit — used by the
    * connector round-trips, bucketed tables, and stream-replay
    * symlink dirs so repeated runs don't accumulate table copies. */
  def tempDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles
        if (cs != null) cs.foreach(rm)
        f.delete(): Unit
      }
      rm(dir.toFile)
    }))
    dir.toString
  }

  /** Exact-decimal sum rendered as double.
    *
    * Doubles summed in different orders differ in the last ulps, so a
    * straight `sum(double)` can never hash-match a DuckDB oracle. Both
    * engines instead cast the (2-decimal) inputs to exact DECIMAL,
    * sum exactly, and cast the single exact result to double — a
    * deterministic, order-independent value identical on both sides.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 2))
  def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
  /** Oracle-side spelling of [[dsum]]. */
  def oDsum(x: String): String = s"CAST(SUM(CAST($x AS DECIMAL(12,2))) AS DOUBLE)"
  /** avg as exact-sum / count — deterministic double on both sides. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))
  def oDavg(x: String): String = s"(${oDsum(x)} / COUNT(*))"

  /** Deterministic 31-base polynomial rolling hash of a string, mod
    * 1e9+7. Expressible identically in Spark and DuckDB SQL (integer
    * arithmetic stays < 2^63 on both sides: acc < 1e9+7, so
    * acc*31+255 < 3.3e10). Used as the shared hash primitive for
    * fingerprinting / MinHash / SimHash so the DuckDB oracle can
    * recompute the exact same signatures.
    */
  /** Cache registry. Operators persist small intermediate tables
    * (MinHash signatures, embedding norms) that are consumed more
    * than once within one query plan; [[cached]] persists AND tracks
    * them so [[releaseCaches]] can unpersist exactly those frames
    * later. A library user embedding graft queries in a long-lived
    * session calls `releaseCaches()` after consuming each result —
    * unlike the blunt session-wide `spark.catalog.clearCache()`, it
    * cannot evict the application's own cached data. */
  private val liveCaches = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]

  /** `df.persist()` tracked for later [[releaseCaches]]. */
  def cached(df: DataFrame): DataFrame = {
    df.persist()
    liveCaches.add(df)
    df
  }

  /** Unpersist every frame handed to [[cached]] since the last call. */
  def releaseCaches(): Unit = {
    var df = liveCaches.poll()
    while (df != null) { df.unpersist(blocking = false); df = liveCaches.poll() }
  }

  /** Run `body` with AQE partition coalescing enabled, restoring the
    * session's setting after. The session default is OFF because
    * byte-targeted coalescing serializes compute-heavy small-byte
    * stages (per-row LSH verification folds); loops and micro-batch
    * bodies whose stages are all uniform narrow-row joins/aggregates
    * (connected components, label maintenance) opt back in here —
    * their kilobyte shuffles collapse to few tasks locally while the
    * identical plan keeps full width at scale (the coalescing target
    * is BYTES, not a tuned partition count). */
  def withPartitionCoalescing[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** Iterative loops (k-means, BPE, connected components) checkpoint
    * their state to a parquet LEAF every this-many rounds: caching
    * truncates per-round recompute but NOT the logical plan, so an
    * N-round loop otherwise re-analyzes an N-round-deep tree every
    * round — O(N²) planning overall. Production round counts (2–5)
    * sit below the threshold, so headline queries never pay a write;
    * long-running loops stay flat (CoreSpec pins a 20-round loop's
    * plan depth). Connected components checkpoints EVERY round
    * instead — its convergence probe needs the materialization
    * anyway. */
  val CkptEvery = 8

  /** Materialize `df` to a temp parquet dir and return the read-back
    * LEAF — the lineage cut [[CkptEvery]] describes. (RDD
    * `localCheckpoint` pins executor blocks until RDD GC; a parquet
    * round-trip is released by the tempDir shutdown hook and, unlike
    * `checkpoint()`, needs no cluster-wide checkpoint dir.) */
  def ckptRound(df: DataFrame, prefix: String): DataFrame = {
    val dir = tempDir(prefix)
    df.write.mode("overwrite").parquet(dir)
    df.sparkSession.read.parquet(dir)
  }

  /** Epoch MICROSECONDS of the events `ts` column. The driver stores
    * `ts` as a naive (no-timezone) microsecond parquet timestamp;
    * every session pins `spark.sql.session.timeZone=UTC`, so the
    * NTZ→timestamp cast reads the stored value as the same UTC
    * instant DuckDB's `epoch_us(ts)` reports — the two engines agree
    * on the integer bit-for-bit. */
  def epochUs(c: Column): Column =
    unix_micros(c.cast(TimestampType))

  /** Epoch NANOSECONDS (µs-precision data ⇒ exact ×1000) — the
    * integer time unit the temporal operators compute in. */
  def epochNs(c: Column): Column = epochUs(c) * 1000

  val HashMod = 1000000007L
  def polyHash(c: Column): Column = graft.plans.TextHashes.polyHash(c)
  /** The INTERPRETED spelling of [[polyHash]] (per-code-point
    * `split`+`aggregate` fold) — kept as the parity baseline the
    * native expression is tested against ([[graft.TextHashesSpec]]). */
  def polyHashFold(c: Column): Column =
    aggregate(
      split(c, ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % HashMod)
  /** Oracle-side spelling of [[polyHash]] (DuckDB `list_reduce`). */
  def oPolyHash(x: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($x, ''), c -> CAST(ascii(c) AS BIGINT))), " +
      s"(a, b) -> (a * 31 + b) % ${HashMod})"
}
