package graft.operators

import graft.{Core, Q, Tables}
import graft.plans.Sketches
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import java.math.{BigDecimal => JBigDecimal, RoundingMode}

/** User-defined aggregation surface (SURVEY §2b "UDF/UDAF/UDTF"):
  * a typed `Aggregator[IN, BUF, OUT]` registered through
  * `functions.udaf`, plus the scalar-UDF registration path.
  *
  * The aggregator computes the revenue-weighted average discount with
  * an EXACT decimal buffer (sum of 2-dec × 2-dec products and sum of
  * 2-dec prices), converting to double only once at finish — so the
  * result is order-independent and bit-equal to the DuckDB oracle's
  * decimal formulation, exactly like [[graft.Core.dsum]].
  *
  * Scale posture: an Aggregator is a real partial+final aggregate —
  * `reduce` runs map-side per partition, `merge` combines partial
  * buffers after the exchange; shuffle traffic is one (num, den)
  * pair per group, not rows.
  */
object Udaf {

  /** (price, discount) → revenue-weighted average discount. */
  object WeightedDiscount
      extends Aggregator[(Double, Double), (JBigDecimal, JBigDecimal), Double] {
    private def dec2(d: Double): JBigDecimal =
      JBigDecimal.valueOf(d).setScale(2, RoundingMode.HALF_UP)

    override def zero: (JBigDecimal, JBigDecimal) =
      (JBigDecimal.ZERO, JBigDecimal.ZERO)
    override def reduce(
        b: (JBigDecimal, JBigDecimal), in: (Double, Double)): (JBigDecimal, JBigDecimal) = {
      val p = dec2(in._1)
      (b._1.add(p.multiply(dec2(in._2))), b._2.add(p))
    }
    override def merge(
        a: (JBigDecimal, JBigDecimal), b: (JBigDecimal, JBigDecimal)): (JBigDecimal, JBigDecimal) =
      (a._1.add(b._1), a._2.add(b._2))
    override def finish(b: (JBigDecimal, JBigDecimal)): Double =
      if (b._2.signum() == 0) Double.NaN
      else b._1.doubleValue() / b._2.doubleValue()

    override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.DECIMAL, org.apache.spark.sql.Encoders.DECIMAL)
    override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
  }

  /** Weighted average discount per return flag via the registered
    * UDAF. */
  def weightedDiscByFlag(s: SparkSession, d: String): DataFrame = {
    s.udf.register("wavg_disc", udaf(WeightedDiscount))
    Tables(s, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("wavg_disc(l_extendedprice, l_discount)").as("wavg_disc"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")
  }

  /** Distinct-count surface: exact vs HyperLogLog++ approximation.
    * The HLL sketch value itself can't hash-match a different engine's
    * sketch, so the query emits a hashable CONTRACT instead: the exact
    * count plus a bool asserting the approximation landed within a
    * relative-error bound. The oracle emits the same exact count and
    * literal TRUE — a real correctness gate for an approximate
    * operator. The bound is 4x the requested rsd (0.02 → 0.08): HLL++
    * error is probabilistic, and a 2.5-sigma gate would eventually
    * trip on a dataset the driver runs that we didn't calibrate on;
    * 4 sigma keeps the gate meaningful (a broken sketch still fails)
    * without betting green rows on tail luck. The raw sketch twin
    * stays available via `distinct_parts` (exact, oracled). */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .agg(
        countDistinct(col("o_custkey")).as("exact_custkeys"),
        approx_count_distinct(col("o_custkey"), 0.02).as("approx"))
      .select(
        col("exact_custkeys"),
        (abs(col("approx") - col("exact_custkeys")) /
          col("exact_custkeys") <= 0.08).as("within_bound"))

  /** Mergeable-sketch rollup — the two-level distinct-count pattern a
    * 100 TB deployment actually runs: build a DataSketches HLL sketch
    * of customer keys PER NATION (`hll_sketch_agg`), then merge the
    * 25 nation sketches up to regions (`hll_union_agg`) without
    * touching the base table again. Re-aggregatability is the point:
    * exact distinct counts cannot roll up (distinct-per-nation does
    * not sum to distinct-per-region), sketches can — one base scan
    * serves every level of a rollup hierarchy, and partial sketches
    * merge associatively across executors/days/partitions.
    *
    * Hashability contract (same as [[approxDistinct]]): the sketch
    * estimate itself is engine-specific, so the emitted row is the
    * exact count plus a bool that the merged estimate landed within
    * 8% relative error (default lgK=12 HLL is exact-in-sparse-mode at
    * these cardinalities and ~1.6% rsd far beyond them; 8% gives the
    * same 4-sigma-style headroom). Oracle emits the exact count and
    * literal TRUE. */
  def hllUnionRollup(s: SparkSession, d: String): DataFrame = {
    val perNation = Tables(s, d, "customer")
      .groupBy("c_nationkey")
      .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
    val nation = Tables(s, d, "nation").select("n_nationkey", "n_regionkey")
    val region = Tables(s, d, "region").select("r_regionkey", "r_name")
    val merged = perNation
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = Tables(s, d, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_regionkey")
      .agg(countDistinct(col("c_custkey")).as("exact_custkeys"))
    merged.join(exact, "n_regionkey")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("exact_custkeys"),
        (abs(col("est") - col("exact_custkeys")).cast("double") /
          col("exact_custkeys") <= 0.08).as("within_bound"))
      .orderBy("r_name")
  }

  /** Quantile sketch with a rank-band contract: `approx_percentile`
    * (Greenwald-Khanna, accuracy 100 → rank error ≤ 1%) next to the
    * exact interpolated percentiles. Like [[approxDistinct]], the
    * sketch value itself is engine-specific, so the hashable row is
    * the exact quantiles plus bools asserting the sketch landed
    * inside a wide exact-rank band (p50 within [p25, p75], p95
    * within [p90, p99]) — loose enough never to bet a green row on
    * tail luck, tight enough that a broken sketch fails. At 100 TB
    * the sketch is the only option: GK summaries merge across
    * partitions in O(1/accuracy) space; exact percentiles need a
    * full sort. */
  def approxQuantiles(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "events")
      .groupBy("event_type")
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.25)").as("p25"),
        expr("percentile(value, 0.75)").as("p75"),
        expr("percentile(value, 0.90)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"),
        expr("approx_percentile(value, 0.5, 100)").as("a50"),
        expr("approx_percentile(value, 0.95, 100)").as("a95"),
        count(lit(1)).as("n"))
      .select(col("event_type"), col("p50"), col("p95"), col("n"),
        (col("a50") >= col("p25") && col("a50") <= col("p75")).as("p50_in_band"),
        (col("a95") >= col("p90") && col("a95") <= col("p99")).as("p95_in_band"))
      .orderBy("event_type")

  /** Frequent tokens via the Misra-Gries sketch
    * ([[graft.plans.MisraGries]], `misra_gries(key, w, cap)`): the raw
    * cleaned-token stream folds into ≤ 64 counters per partition and
    * the partials merge — NO groupBy shuffle of the token stream at
    * all, unlike every other top-k spelling in the engine. At 100 TB
    * the exact spelling must first shuffle one row per distinct key;
    * this moves O(cap × partitions) bytes total. cap = 64 exceeds the
    * corpus vocabulary (~31), so the sketch runs in its exact regime
    * and the output hashes against the exact top-10 oracle; the
    * approximate regime's undercount/recall bounds are pinned by
    * HeavyHittersSpec. */
  def heavyHitters(s: SparkSession, d: String): DataFrame =
    WordCount.cleanTokens(Tables(s, d, "documents"), "text")
      .agg(expr("misra_gries(word, 1, 64)").as("hh"))
      .select(posexplode(col("hh")).as(Seq("pos", "e")))
      .filter(col("pos") < 10)
      .select((col("pos") + 1).as("rn"), col("e.word"), col("e.count"))

  /** KMV (k-minimum-values) distinct sketches with set INTERSECTION —
    * the operation HLL sketches cannot do (HLL unions only; see
    * [[hllUnionRollup]]). Question: how many customers ordered in
    * BOTH 1995 and 1996? Each year's sketch is the k = 64 smallest
    * values of `(a·custkey + b) mod P` ([[graft.plans.MinKHashes]]);
    * merging keeps the k minima of the union, and the fraction of
    * those minima present in both input sketches is an unbiased
    * Jaccard estimate, so `est∩ = ρ̂ · est∪`.
    *
    * Unlike the HLL/GK rows, the oracle here does NOT need an
    * error-band contract: the k minima are a deterministic set
    * property and every estimate is a fixed integer/IEEE expression,
    * so DuckDB replays the SKETCH VALUES and the row hash-matches
    * bit-for-bit — exact counts and approximate estimates side by
    * side in one row.
    *
    * Scale: both sketches ride ONE aggregation over the per-customer
    * year flags — partial state is 2×64 longs per partition; the
    * exact columns are the expensive part (a distinct shuffle the
    * sketch columns would not need). At 100 TB you'd keep only the
    * sketch columns and drop the exact twins. */
  def kmvIntersect(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val perCust = Tables(s, d, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .filter(col("y").isin(1995, 1996))
      .groupBy("o_custkey")
      .agg(
        max(when(col("y") === 1995, lit(1)).otherwise(lit(0))).as("in95"),
        max(when(col("y") === 1996, lit(1)).otherwise(lit(0))).as("in96"))
    val hc = (lit(Sketches.seedA(40)) * col("o_custkey") + lit(Sketches.seedB(40))) % Sketches.P
    perCust
      .agg(
        sum("in95").as("exact_1995"),
        sum("in96").as("exact_1996"),
        sum(col("in95") * col("in96")).as("exact_both"),
        Sketches.minKHashes(when(col("in95") === 1, hc), k).as("ska"),
        Sketches.minKHashes(when(col("in96") === 1, hc), k).as("skb"))
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .select(
        col("exact_1995"), col("exact_1996"), col("exact_both"),
        Sketches.kmvEstimate(col("ska"), k).as("est_1995"),
        Sketches.kmvEstimate(col("skb"), k).as("est_1996"),
        ((size(filter(col("u"), (x: Column) =>
          array_contains(col("ska"), x) && array_contains(col("skb"), x)))
          .cast("double") / size(col("u")).cast("double")) *
          Sketches.kmvEstimate(col("u"), k)).as("est_both"))
  }

  /** KMV set ALGEBRA — [[kmvIntersect]] completed into the full
    * union/difference toolkit a sketch-backed audience system needs:
    * from the same two year sketches, est∪ = the merged sketch's own
    * estimate and the one-sided differences by inclusion–exclusion
    * (|A∖B| = |A∪B| − |B|), next to their exact twins. Same
    * determinism contract as the intersect row: the k minima are a
    * SET property, every estimate a fixed integer/IEEE expression,
    * so DuckDB replays the sketch values and the row hash-matches —
    * no error-band oracle needed. Scale: one aggregation pass,
    * 2×64-long partial state; the exact twins are the expensive
    * columns a 100 TB run would drop. */
  def kmvSetAlgebra(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val perCust = Tables(s, d, "orders")
      .select(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .filter(col("y").isin(1995, 1996))
      .groupBy("o_custkey")
      .agg(
        max(when(col("y") === 1995, lit(1)).otherwise(lit(0))).as("in95"),
        max(when(col("y") === 1996, lit(1)).otherwise(lit(0))).as("in96"))
    val hc = (lit(Sketches.seedA(40)) * col("o_custkey") + lit(Sketches.seedB(40))) % Sketches.P
    perCust
      .agg(
        sum(when(col("in95") === 1 && col("in96") === 0, 1L).otherwise(0L))
          .as("exact_only_1995"),
        sum(when(col("in96") === 1 && col("in95") === 0, 1L).otherwise(0L))
          .as("exact_only_1996"),
        count(lit(1)).as("exact_union"),
        Sketches.minKHashes(when(col("in95") === 1, hc), k).as("ska"),
        Sketches.minKHashes(when(col("in96") === 1, hc), k).as("skb"))
      .withColumn("u", slice(array_sort(array_union(col("ska"), col("skb"))), 1, k))
      .select(
        col("exact_only_1995"), col("exact_only_1996"), col("exact_union"),
        Sketches.kmvEstimate(col("u"), k).as("est_union"),
        (Sketches.kmvEstimate(col("u"), k) -
          Sketches.kmvEstimate(col("skb"), k)).as("est_only_1995"),
        (Sketches.kmvEstimate(col("u"), k) -
          Sketches.kmvEstimate(col("ska"), k)).as("est_only_1996"))
  }

  /** Count-Min frequency sketch over the raw token stream
    * ([[graft.plans.CountMinSketch]], depth 3 × width 16): estimated
    * counts for the exact top-10 words next to their true counts.
    * Width 16 is deliberately far below the ~31-word vocabulary so
    * the sketch runs in its genuinely APPROXIMATE regime — and
    * because cells are sums under fixed seeds, the overcounts are
    * DETERMINISTIC: the oracle replays every cell and the estimates
    * hash-match exactly, `overcount ≥ 0` by construction. (Production
    * sizing is width = e/ε; the point here is the collision path.)
    * Complements [[heavyHitters]]: Misra-Gries answers "which keys
    * are frequent", Count-Min answers "how frequent is THIS key" for
    * any key, and both shuffle O(state × partitions), never the
    * token stream. */
  def countMinWords(s: SparkSession, d: String): DataFrame = {
    val (depth, width) = (3, 16)
    val toks = WordCount.cleanTokens(Tables(s, d, "documents"), "text")
    val h = Core.polyHash(col("word"))
    val cms = toks.agg(Sketches.countMin(h, lit(1L), depth, width).as("cms"))
    toks.groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("word")).limit(10)
      .crossJoin(broadcast(cms))
      .select(col("word"), col("n"),
        least((0 until depth).map(r =>
          element_at(col("cms"),
            lit(r * width) + Sketches.cell(h, r, width).cast("int") + 1)): _*).as("est"))
      .withColumn("overcount", col("est") - col("n"))
      .orderBy(desc("n"), col("word"))
  }

  /** Join-size estimation by Count-Min COMPOSITION — the planner-side
    * application: |A ⋈ B| = Σ_k fA(k)·fB(k), and with both sides
    * sketched under the SAME seeds, min over rows r of
    * Σ_cells cmsA[r][c]·cmsB[r][c] upper-bounds it (collisions only
    * ADD mass, so est ≥ exact deterministically — the AGMS/CM
    * estimate a cost model uses to pick broadcast-vs-shuffle or flag
    * a fan-out join BEFORE running it). Each side is one O(depth·
    * width)-state scan, no shuffle of the join keys; the exact column
    * is the expensive twin the sketch replaces at 100 TB. Keys feed
    * the seed arithmetic directly (exact while key < P ≈ 1e9;
    * larger key domains pre-hash mod P). The oracle replays both
    * sketches and the cell products bit-for-bit.
    *
    * Sizing: the additive error is ≈ N_A·N_B/width, so width must
    * track the key-domain size for a near-uniform FK join (the
    * hardest case — no heavy keys to dominate the product; measured:
    * width 64 inflated this estimate 234×). 3×32768 cells = 768
    * KB/side: at sf0.01 (15k distinct keys) the min-over-rows is
    * collision-free and the estimate is EXACT (overcount 0); at
    * larger domains the deterministic overcount reappears, still
    * bounded by N_A·N_B/width per row. The state stays trivia next
    * to shuffling either join side. */
  def joinSizeSketch(s: SparkSession, d: String): DataFrame = {
    val (depth, width) = (3, 32768)
    val ca = Tables(s, d, "orders")
      .agg(Sketches.countMin(col("o_orderkey"), lit(1L), depth, width).as("ca"))
    val cb = Tables(s, d, "lineitem")
      .agg(Sketches.countMin(col("l_orderkey"), lit(1L), depth, width).as("cb"))
    val exact = Tables(s, d, "orders").select("o_orderkey")
      .join(Tables(s, d, "lineitem").select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"))
      .agg(count(lit(1)).as("exact_join_rows"))
    def rowDot(r: Int): Column = aggregate(
      zip_with(
        slice(col("ca"), r * width + 1, width),
        slice(col("cb"), r * width + 1, width),
        (x: Column, y: Column) => x * y),
      lit(0L), (acc: Column, x: Column) => acc + x)
    exact.crossJoin(broadcast(ca)).crossJoin(broadcast(cb))
      .select(col("exact_join_rows"),
        least((0 until depth).map(rowDot): _*).as("est_join_rows"))
      .withColumn("overcount", col("est_join_rows") - col("exact_join_rows"))
  }

  /** Counter count for the AMS F₂ sketch — shared by engine and
    * oracle so the estimator replays exactly. */
  private val AmsK = 64

  /** ±1 FOUR-wise-independent sign hash for counter `i` — a cubic
    * polynomial mod the shared prime (Horner, mod after every step so
    * products stay < P·key ≤ 9.2e18 for keys < 9e9), parity bit as
    * the sign. Degree 3 is load-bearing, not hygiene: AMS's variance
    * bound needs 4-wise independence, and a LINEAR hash measurably
    * fails on this data — parts keys are consecutive integers, a
    * linear map's parity alternates with k (sign ≈ (−1)^k up to slow
    * wrap flips), consecutive signs cancel, and the measured estimate
    * came out 1700× LOW (est_ratio 0.0006) before the cubic fix.
    * The oracle recomputes the identical signs. */
  private def amsSign(key: Column, i: Int): Column = {
    val P = graft.Core.HashMod
    val c3 = (1779033703L + 265443L * i) % P
    val c2 = (998244353L + 69621L * i) % P
    val c1 = (2654435761L + 40503L * i) % P
    val h = pmod(
      (pmod((pmod(lit(c3) * key, lit(P)) + lit(c2)) * key, lit(P)) + lit(c1))
        * key, lit(P))
    lit(1L) - lit(2L) * (h % 2)
  }

  /** Oracle spelling of [[amsSign]] for counter `i`. */
  private def oAmsSign(i: Int): String = {
    val P = graft.Core.HashMod
    val c3 = (1779033703L + 265443L * i) % P
    val c2 = (998244353L + 69621L * i) % P
    val c1 = (2654435761L + 40503L * i) % P
    s"(1 - 2*(((((($c3*k) % $P + $c2)*k) % $P + $c1)*k % $P) % 2))"
  }

  /** AMS "tug-of-war" second-moment (F₂) sketch (Alon–Matias–Szegedy
    * 1996) over the lineitem part-key frequency vector — F₂ = Σₖ fₖ²
    * IS the key's self-join size, the quantity a join planner reads
    * to price a skewed self-join (the cross-stream companion to
    * `sketch_join_size`'s Count-Min inner-product). Each of the
    * [[AmsK]] counters is Sᵢ = Σ_rows signᵢ(key) — so the sketch is
    * ONE aggregate row of 64 ±1-sums (the `corrMatrix` wide-agg
    * idiom: no fan-out, no explode), mergeable by addition across
    * partitions/streams, constant size regardless of data volume —
    * the defining 100 TB sketch property. Estimate = mean of Sᵢ²
    * (E[Sᵢ²] = F₂ exactly; variance bounded by 2F₂²/k). Everything is
    * exact integers until ONE double division, and the exact F₂ rides
    * alongside so the estimator's health is a REGISTERED number. */
  def amsF2(s: SparkSession, d: String): DataFrame = {
    val li = Tables(s, d, "lineitem").select(col("l_partkey").as("k"))
    val sums = (0 until AmsK).map(i => sum(amsSign(col("k"), i)).as(s"s$i"))
    val sk = li.agg(sums.head, sums.tail: _*)
    val exact = li.groupBy("k").agg(count(lit(1)).as("f"))
      .agg(
        sum(col("f") * col("f")).as("f2_exact"),
        count(lit(1)).as("n_keys"),
        sum(col("f")).as("n_rows"))
    val estNum = (0 until AmsK).map(i => col(s"s$i") * col(s"s$i"))
      .reduce(_ + _)
    val est = estNum.cast("double") / lit(AmsK.toDouble)
    exact.crossJoin(broadcast(sk))
      .select(col("n_rows"), col("n_keys"), col("f2_exact"),
        est.as("ams_est"),
        (est / col("f2_exact").cast("double")).as("est_ratio"))
  }

  val queries: Seq[Q] = Seq(
    Q("sketch_ams_f2", amsF2, Some {
      val signs = (0 until AmsK).map(i =>
        s"CAST(SUM(${oAmsSign(i)}) AS BIGINT) AS s$i").mkString(", ")
      val estNum = (0 until AmsK).map(i => s"s$i*s$i").mkString(" + ")
      s"""WITH kk AS MATERIALIZED (SELECT l_partkey AS k FROM lineitem),
         |sk AS (SELECT $signs FROM kk),
         |ex AS (SELECT CAST(SUM(f*f) AS BIGINT) AS f2_exact,
         |         COUNT(*) AS n_keys, CAST(SUM(f) AS BIGINT) AS n_rows
         |       FROM (SELECT k, COUNT(*) AS f FROM kk GROUP BY k) q)
         |SELECT n_rows, n_keys, f2_exact,
         |  CAST($estNum AS DOUBLE) / ${AmsK.toDouble} AS ams_est,
         |  (CAST($estNum AS DOUBLE) / ${AmsK.toDouble})
         |    / CAST(f2_exact AS DOUBLE) AS est_ratio
         |FROM ex, sk""".stripMargin
    }),
    Q("udaf_weighted_disc", weightedDiscByFlag, Some(
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS wavg_disc,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),
    Q("approx_distinct", approxDistinct, Some(
      """SELECT COUNT(DISTINCT o_custkey) AS exact_custkeys, TRUE AS within_bound
        |FROM orders""".stripMargin)),
    Q("sketch_approx_quantiles", approxQuantiles, Some(
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.95) AS p95,
        |  COUNT(*) AS n,
        |  TRUE AS p50_in_band, TRUE AS p95_in_band
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),
    Q("sketch_heavy_hitters", heavyHitters, Some(
      s"""SELECT row_number() OVER (ORDER BY count DESC, word) AS rn, word, count
         |FROM (SELECT word, COUNT(*) AS count FROM (${WordCount.cleanedSql})
         |      WHERE word <> '' GROUP BY word)
         |ORDER BY count DESC, word LIMIT 10""".stripMargin)),
    Q("sketch_hll_union", hllUnionRollup, Some(
      """SELECT r_name, COUNT(DISTINCT c_custkey) AS exact_custkeys,
        |  TRUE AS within_bound
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin)),
    // The oracle replays the SKETCH itself: same hash, same k minima,
    // same estimator arithmetic (the (k-1)·P numerator is interpolated
    // as one exact-in-double integer so both engines divide the same
    // two doubles). COALESCE guards the empty-year edge (DuckDB's
    // list() over zero rows is NULL where the aggregate's empty buffer
    // is []).
    Q("sketch_kmv_intersect", kmvIntersect, Some {
      val est = (l: String) =>
        s"CASE WHEN len($l) < 64 THEN CAST(len($l) AS DOUBLE) " +
          s"ELSE CAST(${63L * Sketches.P} AS DOUBLE) / CAST($l[64] AS DOUBLE) END"
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS in95,
         |    MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS in96
         |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
         |  GROUP BY o_custkey),
         |h AS (SELECT in95, in96,
         |  (${Sketches.seedA(40)} * o_custkey + ${Sketches.seedB(40)}) % ${Sketches.P} AS h
         |  FROM per),
         |ska AS (SELECT COALESCE(list_slice(list_sort(list(h)), 1, 64), []) AS l
         |  FROM h WHERE in95 = 1),
         |skb AS (SELECT COALESCE(list_slice(list_sort(list(h)), 1, 64), []) AS l
         |  FROM h WHERE in96 = 1),
         |u AS (SELECT list_slice(list_sort(list_distinct(list_cat(ska.l, skb.l))), 1, 64) AS l
         |  FROM ska, skb),
         |ex AS (SELECT CAST(SUM(in95) AS BIGINT) AS e95, CAST(SUM(in96) AS BIGINT) AS e96,
         |  CAST(SUM(in95 * in96) AS BIGINT) AS eb FROM per)
         |SELECT ex.e95 AS exact_1995, ex.e96 AS exact_1996, ex.eb AS exact_both,
         |  ${est("ska.l")} AS est_1995,
         |  ${est("skb.l")} AS est_1996,
         |  (CAST(len(list_filter(u.l, x -> list_contains(ska.l, x) AND list_contains(skb.l, x))) AS DOUBLE)
         |     / CAST(len(u.l) AS DOUBLE)) * (${est("u.l")}) AS est_both
         |FROM ex, ska, skb, u""".stripMargin
    }),
    // oracle: the same replayed sketches; union estimate from the
    // merged minima, differences by the same inclusion-exclusion
    Q("sketch_kmv_union_diff", kmvSetAlgebra, Some {
      val est = (l: String) =>
        s"CASE WHEN len($l) < 64 THEN CAST(len($l) AS DOUBLE) " +
          s"ELSE CAST(${63L * Sketches.P} AS DOUBLE) / CAST($l[64] AS DOUBLE) END"
      s"""WITH per AS (
         |  SELECT o_custkey,
         |    MAX(CASE WHEN year(o_orderdate) = 1995 THEN 1 ELSE 0 END) AS in95,
         |    MAX(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS in96
         |  FROM orders WHERE year(o_orderdate) IN (1995, 1996)
         |  GROUP BY o_custkey),
         |h AS (SELECT in95, in96,
         |  (${Sketches.seedA(40)} * o_custkey + ${Sketches.seedB(40)}) % ${Sketches.P} AS h
         |  FROM per),
         |ska AS (SELECT COALESCE(list_slice(list_sort(list(h)), 1, 64), []) AS l
         |  FROM h WHERE in95 = 1),
         |skb AS (SELECT COALESCE(list_slice(list_sort(list(h)), 1, 64), []) AS l
         |  FROM h WHERE in96 = 1),
         |u AS (SELECT list_slice(list_sort(list_distinct(list_cat(ska.l, skb.l))), 1, 64) AS l
         |  FROM ska, skb),
         |ex AS (SELECT
         |  CAST(SUM(CASE WHEN in95 = 1 AND in96 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e95,
         |  CAST(SUM(CASE WHEN in96 = 1 AND in95 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS e96,
         |  COUNT(*) AS eu FROM per)
         |SELECT ex.e95 AS exact_only_1995, ex.e96 AS exact_only_1996,
         |  ex.eu AS exact_union,
         |  ${est("u.l")} AS est_union,
         |  (${est("u.l")}) - (${est("skb.l")}) AS est_only_1995,
         |  (${est("u.l")}) - (${est("ska.l")}) AS est_only_1996
         |FROM ex, ska, skb, u""".stripMargin
    }),
    Q("sketch_countmin", countMinWords, Some(
      s"""WITH toks AS (SELECT word FROM (${WordCount.cleanedSql}) WHERE word <> ''),
         |wc AS (SELECT word, COUNT(*) AS n FROM toks GROUP BY word),
         |wh AS (SELECT word, n, ${graft.Core.oPolyHash("word")} AS h FROM wc),
         |seeds(r, a, b) AS (VALUES ${Sketches.oSeedRows(3)}),
         |probe AS (SELECT word, n, r, ((a * h + b) % ${Sketches.P}) % 16 AS cell
         |  FROM wh CROSS JOIN seeds),
         |cellsum AS (SELECT r, cell, SUM(n) AS s FROM probe GROUP BY r, cell)
         |SELECT word, n, CAST(MIN(s) AS BIGINT) AS est,
         |  CAST(MIN(s) AS BIGINT) - n AS overcount
         |FROM probe JOIN cellsum USING (r, cell)
         |GROUP BY word, n
         |ORDER BY n DESC, word LIMIT 10""".stripMargin)),
    Q("sketch_join_size", joinSizeSketch, Some(
      s"""WITH seeds(r, a, b) AS (VALUES ${Sketches.oSeedRows(3)}),
         |ca AS (SELECT r, ((a * o_orderkey + b) % ${Sketches.P}) % 32768 AS cell,
         |    COUNT(*) AS s
         |  FROM orders CROSS JOIN seeds GROUP BY 1, 2),
         |cb AS (SELECT r, ((a * l_orderkey + b) % ${Sketches.P}) % 32768 AS cell,
         |    COUNT(*) AS s
         |  FROM lineitem CROSS JOIN seeds GROUP BY 1, 2),
         |prod AS (SELECT ca.r, SUM(ca.s * cb.s) AS p
         |  FROM ca JOIN cb USING (r, cell) GROUP BY ca.r),
         |ex AS (SELECT COUNT(*) AS exact_join_rows
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey)
         |SELECT ex.exact_join_rows,
         |  CAST((SELECT MIN(p) FROM prod) AS BIGINT) AS est_join_rows,
         |  CAST((SELECT MIN(p) FROM prod) AS BIGINT) - ex.exact_join_rows AS overcount
         |FROM ex""".stripMargin)),
  )
}
