package graft

import org.apache.spark.sql.types._

/** Output-schema hygiene: every registered query must emit only types
  * the driver's hash compare renders identically from Spark parquet
  * and DuckDB results.
  *
  * The failure class this pins (round 14's single red row): a
  * DECIMAL output column. `quality_ks_drift` emitted `max_gap` as
  * decimal(38,0); rows and schema matched and the values were
  * bit-identical on both engines, but the driver's hasher reads
  * Spark's decimal128 and DuckDB's DECIMAL through different
  * renderings and can never hash-match on that type. No Spark-side
  * correctness test can see this — the values ARE equal — so the
  * gate has to be on the output TYPE itself.
  *
  * Stable types: integral (byte/short/int/long), double/float,
  * string, boolean, date, timestamp. Banned at the top level:
  * decimal (engine-rendering asymmetry), binary (bytes-vs-blob
  * rendering), array/map/struct (nested ordering and rendering are
  * engine-specific). A query that deliberately needs a banned type
  * must both register in `allowed` here AND carry a comment at its
  * definition site explaining why the driver compare is safe for it.
  *
  * Cost: building a DataFrame is analysis-only for declarative
  * queries; only the iterative/streaming entries do eager work, so
  * this pass is far cheaper than DeterminismSpec's two collect laps.
  */
class SchemaHygieneSpec extends SparkSpec {

  /** "query.column" pairs deliberately exempted. Currently empty —
    * keep it that way unless a future query truly needs one. */
  private val allowed: Set[String] = Set.empty

  private def stable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case FloatType | DoubleType                        => true
    case StringType | BooleanType                      => true
    case DateType | TimestampType | TimestampNTZType   => true
    case _                                             => false
  }

  test("every registered query emits only driver-hash-stable output types") {
    val bad = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val fields =
        try fn(spark, sf).schema.fields.toSeq
        finally Core.releaseCaches()
      fields.collect {
        case f if !stable(f.dataType) && !allowed(s"$name.${f.name}") =>
          s"$name.${f.name}: ${f.dataType.simpleString}"
      }
    }
    assert(bad.isEmpty,
      s"hash-unstable output columns (cast to string/long/double before output, " +
        s"or register a justified exemption): ${bad.mkString(", ")}")
  }
}
