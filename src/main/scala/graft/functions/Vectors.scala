package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic vector arithmetic over `array<float>` embedding
  * columns, built purely from Spark's higher-order array functions —
  * no UDFs, so everything stays inside Catalyst and is evaluated
  * per-row at scan time (map-side; zero shuffle).
  *
  * Determinism contract: every fold is a LEFT fold in array order
  * with a double accumulator, and the DuckDB oracle spells the same
  * fold (`list_reduce(list_prepend(0.0, products), +)`), so results
  * are bit-identical across engines regardless of parallelism —
  * floating-point addition is not associative, but both sides add in
  * the same sequence.
  */
object Vectors {

  /** `array<float>` → `array<double>` (exact widening). */
  def toD(a: Column): Column = transform(a, _.cast("double"))

  /** Sequential-fold dot product of two double arrays via the native
    * codegen'd [[graft.plans.DotDouble]] — one JVM loop per row. The
    * accumulation order acc + a[i]·b[i] is the same arithmetic
    * sequence the oracle (and [[dotdFold]]) folds, so values stay
    * bit-identical. */
  def dotd(a: Column, b: Column): Column =
    graft.plans.TextHashes.dotDouble(a, b)

  /** The INTERPRETED spelling of [[dotd]] (per-element `aggregate`
    * fold) — kept as the parity baseline the native expression is
    * tested against ([[graft.TextHashesSpec]]). */
  def dotdFold(a: Column, b: Column): Column =
    aggregate(sequence(lit(1), size(a)), lit(0.0),
      (acc, i) => acc + element_at(a, i) * element_at(b, i))

  def norm(a: Column): Column = sqrt(dotd(a, a))

  /** Cosine similarity; both operands must already be double arrays. */
  def cosine(a: Column, b: Column): Column =
    dotd(a, b) / (norm(a) * norm(b))

  /** Oracle (DuckDB) spelling of [[dotd]] over float-array columns
    * `a`,`b` of length `dim` — identical fold order and double ops. */
  def oDot(a: String, b: String, dim: Int): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, $dim), " +
      s"k -> CAST($a[k] AS DOUBLE) * CAST($b[k] AS DOUBLE))), (x, y) -> x + y)"

  def oCos(a: String, b: String, dim: Int): String =
    s"(${oDot(a, b, dim)} / (sqrt(${oDot(a, a, dim)}) * sqrt(${oDot(b, b, dim)})))"

  // ---------------------------------------------------------------------
  // Random-hyperplane LSH (sign-random-projection), shared by the
  // near-dup and ANN operators.
  //
  // Planes are pseudo-random but fully deterministic, generated from
  // integer arithmetic both in Scala (plan-build time, embedded as
  // literals) and in the DuckDB oracle (inline formula) — the same
  // weights bit-for-bit. Weights are INTEGER-valued doubles in
  // [-1000, 1000]: the scale of the plane doesn't affect the sign of
  // the dot product, and integer-valued doubles avoid any
  // representation drift between the two engines.
  // ---------------------------------------------------------------------

  /** Number of hash tables / bits per table for the 64-d embeddings.
    * 12 bits = 4096 buckets per table: the log-rule width (bits ≈
    * log2(N / occupancy)) for corpora well past the test SF — bucket
    * occupancy, and with it the quadratic intra-bucket candidate
    * count, stays bounded 64× longer than the earlier 6-bit tables.
    * The oracle formulas below are generated from these constants, so
    * DuckDB follows any width change automatically. */
  val Tables = 8
  val BitsPerTable = 12
  val Dim = 64

  /** Weight of hyperplane `p` (global bit index) at dimension `d`. */
  def planeWeight(p: Int, d: Int): Double =
    (((p.toLong * 73 + d) * 2654435761L) % 1000003 % 2001 - 1000).toDouble

  private def plane(p: Int): Column =
    typedlit((0 until Dim).map(planeWeight(p, _)))

  /** `t`-th table's bucket id for a double-array vector — the
    * INTERPRETED reference spelling (per-plane `aggregate` folds),
    * kept as the parity baseline the native expression is tested
    * against ([[graft.TextHashesSpec]]). */
  def bucket(embd: Column, t: Int): Column =
    (0 until BitsPerTable).map { b =>
      when(dotdFold(embd, plane(t * BitsPerTable + b)) > 0, lit(1L << b))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** All `Tables` bucket ids of a vector (element `t` = table `t`)
    * via the native codegen'd [[graft.plans.HyperplaneBuckets]] — one
    * JVM loop per row instead of Tables × BitsPerTable interpreted
    * `aggregate` folds. `posexplode` at the call sites turns it into
    * (tbl, bucket) entries. */
  def lshBuckets(embd: Column): Column =
    graft.plans.TextHashes.hyperplaneBuckets(embd)

  /** Bucket id of table `t` for the MIPS-AUGMENTED vector
    * [v, xe] (Bachrach et al., RecSys'14: xe = √(M²−‖v‖²) makes every
    * corpus vector the same length M, so cosine order over the
    * augmented space IS inner-product order over the original).
    * Queries carry 0 in the extra coordinate, so their buckets are
    * the plain [[lshBuckets]]; only corpus vectors need this
    * (Dim+1)-weight spelling — the extra plane weight is
    * `planeWeight(p, Dim)`, the next value of the SAME integer
    * formula, added AFTER the 64-dim fold (one extra IEEE add, same
    * shape in the oracle). Interpreted, not native: the codegen'd
    * expression is pinned at Dim and this runs once per corpus
    * vector, not in any hot loop. */
  def mipsBucket(embd: Column, xe: Column, t: Int): Column =
    (0 until BitsPerTable).map { b =>
      val p = t * BitsPerTable + b
      when(dotdFold(embd, plane(p)) + xe * lit(planeWeight(p, Dim)) > 0,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Oracle spelling of [[mipsBucket]] (`t` is a SQL expression). */
  def oMipsBucket(v: String, xe: String, t: String): String = {
    val p = s"(($t) * $BitsPerTable + b)"
    val wExtra =
      s"CAST((($p * 73 + $Dim) * 2654435761) % 1000003 % 2001 - 1000 AS DOUBLE)"
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(0, ${BitsPerTable - 1}), " +
      s"b -> CASE WHEN ${oPlaneDot(v, p)} + ($xe) * $wExtra > 0 " +
      s"THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)), (x, y) -> x + y)"
  }

  /** Oracle spelling of the dot-with-plane fold for global bit `p`
    * over float-array column `v` (1-based DuckDB index `k`, so the
    * 0-based dim is `k-1`). */
  private def oPlaneDot(v: String, p: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, $Dim), " +
      s"k -> CAST($v[k] AS DOUBLE) * " +
      s"CAST((((($p) * 73 + (k - 1)) * 2654435761) % 1000003 % 2001 - 1000) AS DOUBLE))), " +
      "(x, y) -> x + y)"

  /** Oracle: bucket id of table `t` (SQL expression over column `v`). */
  def oBucket(v: String, t: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(generate_series(0, ${BitsPerTable - 1}), " +
      s"b -> CASE WHEN ${oPlaneDot(v, s"($t) * $BitsPerTable + b")} > 0 " +
      s"THEN CAST(power(2, b) AS BIGINT) ELSE 0 END)), (x, y) -> x + y)"

  /** Oracle CTE producing `(vec_id, label?, tbl, bucket)` rows —
    * one per table per vector of `embeddings`. */
  def oBucketCte(extraCols: String = ""): String =
    s"""SELECT vec_id$extraCols, t AS tbl, ${oBucket("embedding", "t")} AS bucket
       |FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, ${Tables - 1})) AS t)""".stripMargin
}
