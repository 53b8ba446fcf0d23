package graft.operators

import graft.{Q, Tables}
import graft.Core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Referential-integrity / key-uniqueness audit — the trust gate a
  * pipeline runs before joining a 100 TB fact drop against its
  * dimensions. (Column-level profiling lives in
  * [[Pipeline.profileColumns]]; this module covers CROSS-table
  * constraints, which no single-scan profile can see.)
  *
  * Scale posture: each FK check is one LEFT ANTI join shuffling the
  * child on its key with a keys-only parent projection (dimension
  * parents broadcast below the AQE threshold); each PK check is one
  * partial+final count per key. The five single-row audit results
  * union into one |constraints|-row report — every branch is an
  * independent job stage, so a scheduler runs them concurrently.
  */
object Quality {

  /** One row per constraint: child row count + violation count.
    *
    * Every FK over the same child table rides ONE scan of it: the
    * child left-joins each parent's DISTINCT keys (null parent key =
    * orphan), and one aggregate emits the row count plus every
    * constraint's violation count, unpivoted to a row per
    * constraint — so lineitem (the 100 TB table) is read once for
    * both of its FKs, not once per branch per FK. */
  def integrity(s: SparkSession, d: String): DataFrame = {
    def pkeys(t: String, k: String) =
      Tables(s, d, t).select(col(k)).distinct()
    def fkRows(child: DataFrame, fks: Seq[(String, String, DataFrame, String)]): DataFrame = {
      val joined = fks.foldLeft(child.select(fks.map(f => col(f._2)): _*)) {
        case (acc, (_, ck, parent, pk)) =>
          acc.join(parent, col(ck) === col(pk), "left")
      }
      val aggs = count(lit(1)).as("n_child") +: fks.map { case (name, _, _, pk) =>
        sum(when(col(pk).isNull, 1L).otherwise(0L)).as(s"v_$name")
      }
      val stacked = fks.map(f => s"'${f._1}', n_child, v_${f._1}").mkString(", ")
      joined.agg(aggs.head, aggs.tail: _*)
        .selectExpr(s"stack(${fks.size}, $stacked) AS " +
          "(constraint_name, n_child, n_violations)")
    }
    def dupKeys(name: String, t: DataFrame, k: String): DataFrame =
      t.groupBy(col(k)).agg(count(lit(1)).as("m"))
        .agg(
          // coalesce to 0: on an empty child table sum() yields NULL
          // while the oracle's COALESCE spelling yields 0
          coalesce(sum(col("m")), lit(0L)).as("n_child"),
          coalesce(sum(when(col("m") > 1, col("m")).otherwise(0L)), lit(0L))
            .as("n_violations"))
        .select(lit(name).as("constraint_name"), col("n_child"), col("n_violations"))
    val o = Tables(s, d, "orders")
    fkRows(Tables(s, d, "lineitem"), Seq(
      ("fk_lineitem_orders", "l_orderkey", pkeys("orders", "o_orderkey"), "o_orderkey"),
      ("fk_lineitem_part", "l_partkey", pkeys("part", "p_partkey"), "p_partkey")))
      .unionAll(fkRows(o, Seq(
        ("fk_orders_customer", "o_custkey",
          pkeys("customer", "c_custkey"), "c_custkey"))))
      .unionAll(dupKeys("pk_orders", o, "o_orderkey"))
      .unionAll(dupKeys("pk_customer", Tables(s, d, "customer"), "c_custkey"))
      .orderBy("constraint_name")
  }

  /** Join-key SKEW report — the diagnostic that decides which keys
    * need the salted-join / AQE-skew treatment BEFORE a 100 TB
    * shuffle discovers it the hard way: per candidate shuffle key,
    * total rows, distinct keys, the heaviest key's row count, and
    * the skew ratio max/avg. Each column costs one partial+final
    * count per key plus a second tiny aggregate over the per-key
    * counts; the hottest key itself rides a struct-max (ties to the
    * smallest key), never a sort. The ratio is ONE double division
    * of exact integers, so it hash-matches the oracle bit-for-bit. */
  def keySkew(s: SparkSession, d: String): DataFrame = {
    def one(name: String, t: DataFrame, k: String): DataFrame =
      t.groupBy(col(k)).agg(count(lit(1)).as("m"))
        .agg(
          coalesce(sum(col("m")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(max(col("m")), lit(0L)).as("max_rows"),
          max(struct(col("m"), (-col(k)).as("negk"))).as("h"))
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          col("max_rows"), (-col("h.negk")).as("hot_key"),
          ((col("max_rows") * col("n_keys")).cast("double") / col("n_rows"))
            .as("skew_ratio"))
        // empty-table parity with the oracle: its rn=1 inner join
        // emits no row for a keyless table, so the engine must drop
        // the would-be NaN/NULL accounting row too
        .filter(col("n_rows") > 0)
    one("events.user_id", Tables(s, d, "events"), "user_id")
      .unionAll(one("lineitem.l_orderkey", Tables(s, d, "lineitem"), "l_orderkey"))
      .unionAll(one("lineitem.l_partkey", Tables(s, d, "lineitem"), "l_partkey"))
      .unionAll(one("orders.o_custkey", Tables(s, d, "orders"), "o_custkey"))
      .orderBy("key_name")
  }

  /** Exact two-sample Kolmogorov–Smirnov drift statistic — the
    * classic distribution-equality test between a deterministic
    * 80/20 train/holdout split of event values (the validation-drift
    * alarm `pipeline_token_drift` runs for TOKENS, here for a numeric
    * measure: KS = max CDF gap catches shape changes rate-difference
    * monitors miss). Everything is exact integers until ONE double
    * division: per distinct value the two sample counts, cumulative
    * counts by value order, and the gap |F1·n2 − F2·n1| maximized as
    * a decimal — so the oracle matches bit-for-bit.
    *
    * The ordered cumsum is the scale-correct TWO-PHASE spelling (same
    * idiom as `pipeline_global_ids`): range-repartition on value,
    * per-partition running sums under a partitioned window, then
    * broadcast per-partition offsets — never a single-partition
    * global window. Cumulative products ride decimal(38,0): at
    * catalog scale F·n is ~1e22, past long. Shuffles carry (value)
    * then (pid) keys; the heavy table never sorts globally. */
  def ksDrift(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val tr = when(
      pmod(col("user_id") * lit(2654435761L), lit(HashMod)) % 100 < 80, 1L)
      .otherwise(0L)
    val perVal = Tables(s, d, "events")
      .select(col("value"), tr.as("tr"))
      .groupBy("value")
      .agg(sum(col("tr")).as("c1"), sum(lit(1L) - col("tr")).as("c2"))
    val parts = cached(perVal.repartitionByRange(32, col("value"))
      .withColumn("pid", spark_partition_id()))
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    // |partitions| rows: the deliberate tiny single-partition window
    val offs = parts.groupBy("pid")
      .agg(sum("c1").as("s1"), sum("c2").as("s2"))
      .select(col("pid"),
        coalesce(sum("s1").over(prior), lit(0L)).as("o1"),
        coalesce(sum("s2").over(prior), lit(0L)).as("o2"))
    val w = Window.partitionBy("pid").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = parts.agg(sum("c1").as("n1"), sum("c2").as("n2"))
    parts
      .withColumn("l1", sum("c1").over(w))
      .withColumn("l2", sum("c2").over(w))
      .join(broadcast(offs), "pid")
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs((col("o1") + col("l1")).cast(dec) * col("n2") -
          (col("o2") + col("l2")).cast(dec) * col("n1")).as("gap"))
      .groupBy("n1", "n2")
      .agg(max("gap").as("max_gap"))
      // max_gap is F·n-scaled (~1e22 at catalog scale, past long):
      // the decimal arithmetic stays internal, but the OUTPUT is a
      // string — exact at any magnitude (no bigint wrap, no 2^53
      // double loss) and canonical on both engines, where a decimal
      // output column trips the driver hasher's decimal128-vs-
      // DECIMAL rendering asymmetry (r14's one red row).
      .select(col("n1"), col("n2"),
        col("max_gap").cast(dec).cast("string").as("max_gap"),
        (col("max_gap").cast("double") /
          (col("n1") * col("n2")).cast("double")).as("ks_stat"))
  }

  /** Numeric-measure columns [[corrMatrix]] profiles; all have ≤ 2
    * decimal places in the driver data, so cents-quantization is
    * exact. */
  private val CorrCols =
    Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** Pearson correlation MATRIX over lineitem's numeric measures —
    * the numeric half of a data profile (the column profiler sees
    * per-column stats; correlation is the cheapest cross-column
    * signal a feature-selection / anomaly pass reads). Spark's
    * `corr()` aggregates doubles in partition order, so its result is
    * not reproducible across partitionings, let alone engines; here
    * every moment is EXACT: measures quantize to integer cents
    * (`round(x*100)` — both engines round the identical IEEE
    * product, and all four columns carry ≤ 2 decimals), per-row
    * products fit in long, and sums accumulate in decimal(38,0)
    * (HUGEINT in the oracle). The r = (n·Σxy − ΣxΣy) / (√(n·Σx²−(Σx)²)
    * · √(n·Σy²−(Σy)²)) formula then runs on exact integers with ONE
    * cast-to-double + sqrt per term, spelled identically in both
    * engines — bit-for-bit reproducible.
    *
    * Scale: ONE scan, one map-side-partial 1-row aggregate carrying
    * n + k sums + k(k+1)/2 product sums (15 longs/decimals for k=4);
    * the k(k−1)/2 correlations derive from shared moments in the
    * final projection. At 100 TB (6e11 rows) the largest moment
    * n·Σprice² ≈ 4e37 still fits decimal(38,0) — headroom quantified,
    * not assumed. */
  def corrMatrix(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val k = CorrCols.length
    val dec = DecimalType(38, 0)
    val q = Tables(s, d, "lineitem")
      .select(CorrCols.map(c => round(col(c) * 100).cast("long").as(c)): _*)
    val aggs = count(lit(1)).cast(dec).as("n") +:
      (CorrCols.map(c => sum(col(c).cast(dec)).as(s"s_$c")) ++
        (for { i <- 0 until k; j <- i until k } yield
          sum((col(CorrCols(i)) * col(CorrCols(j))).cast(dec)).as(s"p_${i}_$j")))
    val m = q.agg(aggs.head, aggs.tail: _*)
    def varTerm(i: Int) =
      (col("n") * col(s"p_${i}_$i") -
        col(s"s_${CorrCols(i)}") * col(s"s_${CorrCols(i)}")).cast("double")
    def corrOf(i: Int, j: Int) =
      (col("n") * col(s"p_${i}_$j") -
        col(s"s_${CorrCols(i)}") * col(s"s_${CorrCols(j)}")).cast("double") /
        (sqrt(varTerm(i)) * sqrt(varTerm(j)))
    val pairs = for { i <- 0 until k; j <- (i + 1) until k } yield
      struct(lit(CorrCols(i)).as("col_a"), lit(CorrCols(j)).as("col_b"),
        corrOf(i, j).as("pearson_r"))
    m.select(explode(array(pairs: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("p.pearson_r"))
      .orderBy("col_a", "col_b")
  }

  private val HistBuckets = 8

  /** Exact equi-depth histogram over the event values — the
    * distribution profile a pipeline stores next to a table so later
    * scans can range-prune and joins can pick salt factors (the
    * equi-WIDTH histogram is `events_histogram`; equi-DEPTH is the
    * one that stays informative under skew because every bucket
    * holds the same row count by construction). Exact, not sketched:
    * each value's GLOBAL rank comes from the same two-phase
    * range-partition spelling as `pipeline_global_ids` (per-partition
    * row_number + broadcast cumulative offsets — never a
    * single-partition global window), and bucket = rank·B div N is
    * pure integer arithmetic, so boundaries are reproducible
    * bit-for-bit where an approx-quantile sketch is
    * parameter-dependent. Values quantize to cents first (the
    * `stream_user_stats` spelling), making the total order and the
    * per-bucket min/max integer-exact. Shuffles: one range exchange
    * of (cents, event_id); the rest is |partitions|- and B-row
    * frames. */
  def equidepthHist(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = HistBuckets
    val ev = Tables(s, d, "events")
      .select(floor(col("value") * 100 + 0.5).cast("long").as("v"),
        col("event_id"))
    val parts = cached(ev.repartitionByRange(32, col("v"), col("event_id"))
      .withColumn("pid", spark_partition_id()))
    // |partitions| rows: the deliberate tiny single-partition window
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy("pid").agg(count(lit(1)).as("cnt"))
      .select(col("pid"),
        coalesce(sum("cnt").over(prior), lit(0L)).as("off"))
    val local = Window.partitionBy("pid").orderBy("v", "event_id")
    val tot = parts.agg(count(lit(1)).as("n"))
    parts
      .withColumn("lrk", row_number().over(local).cast("long"))
      .join(broadcast(offs), "pid")
      .crossJoin(broadcast(tot))
      .select(col("v"),
        expr(s"((off + lrk - 1) * $B) div n").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min("v").as("min_cents"), max("v").as("max_cents"))
      .orderBy("bucket")
  }

  /** Equi-depth histogram READ from a maintained `(v, cnt)`
    * FREQUENCY table — the streaming twin's read-time metric. The
    * per-bucket counts of [[equidepthHist]] depend only on the value
    * MULTISET (tie order within equal values moves event_ids between
    * buckets, never counts or min/max), so the histogram derives
    * exactly from frequencies: each value's rank run is
    * [cb, cb+cnt) where cb is the cumulative count of smaller
    * values (the same two-phase range-partition prefix sum —
    * never a single-partition global window), and its contribution
    * to bucket b is the integer overlap of that run with b's rank
    * interval [⌈bn/B⌉, ⌈(b+1)n/B⌉). Each frequency row explodes
    * into at most the ≤ B buckets it spans — |distinct values| ×
    * span rows total, never the row count. */
  def equidepthFromFreqs(freqs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val B = HistBuckets
    val parts = cached(freqs.repartitionByRange(32, col("v"))
      .withColumn("pid", spark_partition_id()))
    val prior = Window.orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = parts.groupBy("pid").agg(sum("cnt").as("pcnt"))
      .select(col("pid"),
        coalesce(sum("pcnt").over(prior), lit(0L)).as("off"))
    val local = Window.partitionBy("pid").orderBy("v")
    val tot = parts.agg(sum("cnt").as("n"))
    parts
      .withColumn("lcb", coalesce(
        sum("cnt").over(local.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .join(broadcast(offs), "pid")
      .crossJoin(broadcast(tot))
      .select(col("v"), col("cnt"), (col("off") + col("lcb")).as("cb"), col("n"))
      .select(col("v"), col("cnt"), col("cb"), col("n"),
        explode(sequence(expr(s"(cb * $B) div n"),
          expr(s"((cb + cnt - 1) * $B) div n"))).as("bucket"))
      .select(col("v"), col("bucket"),
        (least(expr(s"((bucket + 1) * n + ${B - 1}) div $B"),
          col("cb") + col("cnt")) -
          greatest(expr(s"(bucket * n + ${B - 1}) div $B"), col("cb")))
          .as("contrib"))
      .groupBy("bucket")
      .agg(sum("contrib").as("n_rows"),
        min("v").as("min_cents"), max("v").as("max_cents"))
      .orderBy("bucket")
  }

  /** Shared batch/streaming oracle for [[weightedMedian]]. */
  val oWeightedMedianSql: String =
    """WITH li AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(round(l_quantity) AS BIGINT) AS w
      |  FROM lineitem),
      |fr AS (SELECT flag, cents, CAST(SUM(w) AS BIGINT) AS w
      |       FROM li GROUP BY 1, 2),
      |c AS (SELECT flag, cents,
      |        CAST(SUM(w) OVER (PARTITION BY flag ORDER BY cents
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |      FROM fr),
      |t AS (SELECT flag, CAST(SUM(w) AS BIGINT) AS total_weight
      |      FROM fr GROUP BY flag)
      |SELECT t.flag AS l_returnflag, t.total_weight,
      |  CAST(MIN(cents) AS BIGINT) AS median_cents
      |FROM c JOIN t USING (flag)
      |WHERE cum >= (total_weight + 1) // 2
      |GROUP BY 1, 2 ORDER BY l_returnflag""".stripMargin

  /** Shared batch/streaming oracle for the equi-depth histogram. */
  val oEquidepthSql: String =
    s"""WITH q AS (
       |  SELECT CAST(floor(value * 100 + 0.5) AS BIGINT) AS v, event_id
       |  FROM events),
       |r AS (SELECT v, row_number() OVER (ORDER BY v, event_id) - 1 AS rk FROM q),
       |t AS (SELECT COUNT(*) AS n FROM q)
       |SELECT CAST((rk * $HistBuckets) // n AS BIGINT) AS bucket,
       |  COUNT(*) AS n_rows, MIN(v) AS min_cents, MAX(v) AS max_cents
       |FROM r CROSS JOIN t GROUP BY 1 ORDER BY bucket""".stripMargin

  /** WEIGHTED MEDIAN per group — the "typical unit price" diagnostic
    * (price cents weighted by quantity, grouped by return flag):
    * the plain median treats a 1-unit and a 50-unit line item
    * equally; the weighted median answers what a typical UNIT sold
    * for. Exact by the lower-median convention: the smallest value
    * whose cumulative weight reaches ⌈W/2⌉ — all integers, no
    * interpolation, so both engines agree bit-for-bit.
    *
    * Scale: the fact first collapses to a (flag, cents) frequency
    * table (one shuffle); cumulative weights use the two-phase
    * range-partition spelling (per-partition running sums +
    * broadcast per-(flag, partition) offsets — never a
    * single-partition global window over the value axis; the
    * |groups × partitions| offset frame is the only tiny window). */
  def weightedMedian(s: SparkSession, d: String): DataFrame =
    weightedMedianFromFreq(Tables(s, d, "lineitem")
      .select(col("l_returnflag").as("flag"),
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        round(col("l_quantity")).cast("long").as("w"))
      .groupBy("flag", "cents").agg(sum("w").as("w")))

  /** The weighted median read from a (flag, cents, w) frequency
    * table — shared by [[weightedMedian]] and the streaming twin
    * (whose maintained state IS this additive fold). */
  def weightedMedianFromFreq(freqs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = cached(freqs
      .repartitionByRange(32, col("flag"), col("cents"))
      .withColumn("pid", spark_partition_id()))
    val prior = Window.partitionBy("flag").orderBy("pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = fr.groupBy("flag", "pid").agg(sum("w").as("c"))
      .select(col("flag"), col("pid"),
        coalesce(sum("c").over(prior), lit(0L)).as("off"))
    val local = Window.partitionBy("flag", "pid").orderBy("cents")
      .rowsBetween(Window.unboundedPreceding, 0)
    val tot = fr.groupBy("flag").agg(sum("w").as("total_weight"))
    fr.withColumn("lc", sum("w").over(local))
      .join(broadcast(offs), Seq("flag", "pid"))
      .join(broadcast(tot), "flag")
      .filter(col("off") + col("lc") >= expr("(total_weight + 1) div 2"))
      .groupBy(col("flag").as("l_returnflag"), col("total_weight"))
      .agg(min("cents").as("median_cents"))
      .select("l_returnflag", "total_weight", "median_cents")
      .orderBy("l_returnflag")
  }

  /** Robust outlier gate: per event type the exact MEDIAN of the
    * cents-quantized values, the MAD (median absolute deviation),
    * and the count of values beyond 3σ-equivalent (|v − med| >
    * 4.4478·MAD, the Gaussian-consistency constant 3·1.4826 written
    * as ONE literal so both engines parse the identical double) —
    * the data-quality alarm that, unlike mean/stddev z-scores, a few
    * corrupt rows cannot drag along with them. Medians are the exact
    * interpolated percentile (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the same (n−1)·p lower+frac·(upper−lower)
    * formula) over integer cents, so every intermediate is an exact
    * IEEE double and the comparison is bit-reproducible. Scale: two
    * scans of a cached (type, cents) projection, per-type exact
    * percentiles (each type's values shuffle to its own aggregation
    * state — at 100 TB swap in the rank-band spelling
    * `events_value_deciles` already demonstrates if a single type
    * outgrows an executor), and one broadcast of the |types|-row
    * median table back onto the deviation pass. */
  def madOutliers(s: SparkSession, d: String): DataFrame = {
    val K = 4.4478 // 3 * 1.4826, one literal on both engines
    val ev = cached(Tables(s, d, "events")
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("v")))
    val med = ev.groupBy("event_type")
      .agg(percentile(col("v"), lit(0.5)).as("median_cents"))
    val dev = cached(ev.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("v").cast("double") - col("median_cents"))))
    val stats = dev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        max(col("median_cents")).as("median_cents"), // constant per type
        percentile(col("adev"), lit(0.5)).as("mad_cents"),
        max(col("adev")).as("max_abs_dev"))
    dev.join(broadcast(stats.select("event_type", "mad_cents")), "event_type")
      .groupBy("event_type")
      .agg(sum(when(col("adev") > col("mad_cents") * K, 1L).otherwise(0L))
        .as("n_outliers"))
      .join(stats, "event_type")
      .select(col("event_type"), col("n_events"), col("median_cents"),
        col("mad_cents"), col("max_abs_dev"), col("n_outliers"))
      .orderBy("event_type")
  }

  /** CUPED variance-reduced A/B metric (Deng et al., WSDM'13) — the
    * experiment-analysis operator: users split into two deterministic
    * hash arms, the experiment window split at the observed midpoint
    * day into a PRE period (covariate X = per-user pre-period spend)
    * and a POST period (outcome Y); the adjusted outcome
    * Ŷ = Y − θ·(X − X̄) with θ = cov(X,Y)/var(X) removes the
    * between-user variance the pre-period already explains, the
    * standard sensitivity lever for low-powered experiments.
    *
    * Everything is exact until a FIXED shape of IEEE double ops:
    * values quantize to integer cents (2-decimal data — the
    * `corrMatrix` precedent), per-user X/Y are exact longs, pooled
    * moments (n, ΣX, ΣY, ΣX², ΣXY) accumulate in decimal(38,0) /
    * HUGEINT, and θ / means are single exact-integer-to-double
    * divisions spelled identically in both engines — bit-for-bit
    * reproducible where a naive covariance over doubles is
    * partition-order-dependent.
    *
    * Scale posture: one events scan → per-user partial+final agg
    * (|users| rows); the pooled-moment frame is ONE row and the
    * per-arm frame TWO rows, both broadcast into the final
    * projection. The midpoint day is a 1-row min/max aggregate, not
    * a driver-side constant, so the operator needs no calendar
    * configuration. ΣX² headroom: X ≤ 10^9 cents/user keeps n·ΣX²
    * within decimal(38,0) to ~10^18 users. */
  def abCuped(s: SparkSession, d: String): DataFrame =
    cupedFromDayCents(
      Tables(s, d, "events")
        .select(col("user_id"),
          round(col("value") * 100).cast("long").as("cents"),
          epochUs(col("ts")).as("us"))
        .withColumn("day", expr("us div 86400000000"))
        .groupBy("user_id", "day")
        .agg(sum("cents").as("cents")))

  /** The CUPED metric from the ADDITIVE (user_id, day, cents) state
    * table — shared by [[abCuped]] and the streaming maintenance twin
    * (`stream_ab_cuped`): per-(user, day) cents sums are exactly the
    * state a stream can fold per micro-batch (integer addition is
    * associative/commutative), while the pre/post split, θ, and the
    * adjusted means are corpus-level reads over the final state. */
  def cupedFromDayCents(udc: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val mid = udc.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val user = cached(udc.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("day") <= col("mid"), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") > col("mid"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("arm",
        pmod(col("user_id") * lit(2654435761L), lit(HashMod)) % 2))
    val m = user.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"),
      sum(col("x").cast(dec) * col("x")).as("sxx"),
      sum(col("x").cast(dec) * col("y")).as("sxy"))
    val arm = user.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum(col("x").cast(dec)).as("sxa"),
      sum(col("y").cast(dec)).as("sya"))
    val theta = (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
      (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
    val meanY = col("sya").cast("double") / col("n_users").cast("double")
    val meanXa = col("sxa").cast("double") / col("n_users").cast("double")
    val meanX = col("sx").cast("double") / col("n").cast("double")
    arm.crossJoin(broadcast(m))
      .select(col("arm"), col("n_users"),
        meanY.as("mean_y_cents"),
        (meanY - theta * (meanXa - meanX)).as("mean_y_adj_cents"),
        theta.as("theta"))
      .orderBy("arm")
  }

  /** DIFFERENCE-IN-DIFFERENCES on per-user spend — the most-used
    * causal baseline next to [[abCuped]]'s variance reduction: the
    * 2×2 of (arm × pre/post-midpoint) mean cents per user, each
    * arm's post−pre trend, and DiD = trend₁ − trend₀ — the estimate
    * that survives a level difference between arms that a plain
    * post-period comparison would misread as an effect. Sums are
    * exact cents in decimal(38,0); the six means and three
    * differences are a fixed double shape. The deterministic hash
    * arms make this an A/A on the driver corpus — DiD ≈ 0 is itself
    * the parallel-trends sanity check. One events scan, a
    * |users|-row agg, a 2-row arm frame. */
  def abDiffInDiff(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val udc = Tables(s, d, "events")
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"),
        epochUs(col("ts")).as("us"))
      .withColumn("day", expr("us div 86400000000"))
      .groupBy("user_id", "day").agg(sum("cents").as("cents"))
    val mid = udc.agg(expr("(min(day) + max(day)) div 2").as("mid"))
    val user = udc.crossJoin(broadcast(mid))
      .groupBy("user_id")
      .agg(
        sum(when(col("day") <= col("mid"), col("cents")).otherwise(0L)).as("x"),
        sum(when(col("day") > col("mid"), col("cents")).otherwise(0L)).as("y"))
      .withColumn("arm",
        pmod(col("user_id") * lit(2654435761L), lit(HashMod)) % 2)
    val arm = user.groupBy("arm").agg(
      count(lit(1)).as("n_users"),
      sum(col("x").cast(dec)).as("sx"),
      sum(col("y").cast(dec)).as("sy"))
    val trend = (col("sy").cast("double") / col("n_users").cast("double")) -
      (col("sx").cast("double") / col("n_users").cast("double"))
    val t = arm.select(col("arm"), col("n_users"),
      (col("sx").cast("double") / col("n_users").cast("double"))
        .as("mean_pre_cents"),
      (col("sy").cast("double") / col("n_users").cast("double"))
        .as("mean_post_cents"),
      trend.as("trend_cents"))
    // the 1-row estimate joins back onto both arm rows so the output
    // is one tidy 2-row frame carrying its own headline number
    val did = t.agg(
      sum(when(col("arm") === 1, col("trend_cents")).otherwise(0.0)).as("t1"),
      sum(when(col("arm") === 0, col("trend_cents")).otherwise(0.0)).as("t0"))
      .select((col("t1") - col("t0")).as("did_cents"))
    t.crossJoin(broadcast(did)).orderBy("arm")
  }

  /** MANN–WHITNEY U rank-sum test on per-user spend — the
    * NONPARAMETRIC member of the A/B family ([[abCuped]] compares
    * means, [[abConversionZtest]] proportions): heavy-tailed spend
    * distributions defeat mean tests, and the rank test's answer —
    * does one arm stochastically dominate — is the robust launch
    * question. Everything is integer-exact until the final z:
    * midranks over tied cents are kept DOUBLED (2·cb + cnt + 1 ∈ ℤ,
    * the half-integer dodge), so the rank sum, 2U₁ = R₁·2 −
    * n₁(n₁+1), and the tie correction Σ(t³−t) are exact longs; the
    * normal-approximation z = (2U₁ − n₀n₁) / (2·√Var) is one fixed
    * shape of double ops with the tie-corrected variance
    * Var = n₀n₁/12 · ((n+1) − Σ(t³−t)/(n(n−1))).
    *
    * Scale: the fact collapses to |users| rows; ranks come from the
    * cents-frequency table (|distinct values| rows) — per-arm rank
    * sums are a frequency-weighted aggregate, so no per-user rank
    * row ever needs a global window (the tiny cumulative here is
    * over distinct cents values; the two-phase spelling swaps in if
    * the value domain outgrows a partition). */
  def abMannWhitney(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val user = cached(Tables(s, d, "events")
      .select(col("user_id"), round(col("value") * 100).cast("long").as("cents"))
      .groupBy("user_id").agg(sum("cents").as("y"))
      .withColumn("arm",
        pmod(col("user_id") * lit(2654435761L), lit(HashMod)) % 2))
    val freq = user.groupBy("y")
      .agg(count(lit(1)).as("t"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("t1"))
    // |distinct spend values|-row frame: the deliberate tiny window
    val byY = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, -1)
    val ranked = freq
      .withColumn("cb", coalesce(sum("t").over(byY), lit(0L)))
      .withColumn("mr2", lit(2L) * col("cb") + col("t") + 1L)
    ranked.agg(
        sum(col("t") - col("t1")).as("n0"),
        sum(col("t1")).as("n1"),
        sum(col("t1") * col("mr2")).as("r1_2"),
        sum(col("t") * col("t") * col("t") - col("t")).as("ties"))
      .select(col("n0"), col("n1"),
        (col("r1_2") - col("n1") * (col("n1") + 1)).as("u1_2"),
        col("ties"),
        ((col("r1_2") - col("n1") * (col("n1") + 1) - col("n0") * col("n1"))
          .cast("double") /
          (lit(2.0) * sqrt(
            (col("n0") * col("n1")).cast("double") / lit(12.0) *
              ((col("n0") + col("n1") + 1).cast("double") -
                col("ties").cast("double") /
                  ((col("n0") + col("n1")).cast("double") *
                    (col("n0") + col("n1") - 1).cast("double"))))))
          .as("z"))
  }

  /** Two-proportion z-test on conversion — [[abCuped]]'s sibling for
    * BINARY outcomes: per hash arm, the share of users whose purchase
    * spend exceeds the global median user spend, and the
    * pooled-variance z statistic
    * (p₁−p₀)/√(p̂(1−p̂)(1/n₀+1/n₁)) the launch decision reads. The
    * deterministic hash arms make this an A/A test on the driver
    * data — z near 0 is itself the check that the splitter is
    * unbiased. Counts are exact longs; p's, p̂, and z are a fixed
    * shape of IEEE double ops spelled identically in both engines.
    *
    * Scale posture: one scan → per-user any-purchase flag
    * (partial+final max over |users| rows) → a 2-row arm aggregate
    * pivoted into ONE output row by a conditional aggregate. No
    * window, no join. */
  def abConversionZtest(s: SparkSession, d: String): DataFrame = {
    // conversion = per-user purchase spend ABOVE the global median
    // user spend. A fixed absolute threshold saturates (p = 0 or 1)
    // whenever the value distribution shifts — observed at both test
    // SFs — and a saturated proportion has pooled variance exactly 0;
    // a data-derived median keeps p ≈ 0.5 at ANY corpus. The median
    // is the same interpolated percentile both engines share
    // (`percentile` ≡ `quantile_cont` — the madOutliers parity), and
    // the degenerate all-/none-convert case (all spends equal) still
    // emits NULL explicitly below instead of tripping ANSI
    // divide-by-zero.
    val spend = Tables(s, d, "events")
      .groupBy("user_id")
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("cents"))
    val med = spend.agg(percentile(col("cents"), lit(0.5)).as("med"))
    val user = spend.crossJoin(broadcast(med))
      .select(col("user_id"),
        when(col("cents").cast("double") > col("med"), 1L).otherwise(0L)
          .as("conv"))
      .withColumn("arm",
        pmod(col("user_id") * lit(2654435761L), lit(HashMod)) % 2)
    val wide = user.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n0"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("arm") === 0, col("conv")).otherwise(0L)).as("c0"),
      sum(when(col("arm") === 1, col("conv")).otherwise(0L)).as("c1"))
    val p0 = col("c0").cast("double") / col("n0").cast("double")
    val p1 = col("c1").cast("double") / col("n1").cast("double")
    val pp = (col("c0") + col("c1")).cast("double") /
      (col("n0") + col("n1")).cast("double")
    val z = (p1 - p0) / sqrt(pp * (lit(1.0) - pp) *
      (lit(1.0) / col("n0").cast("double") +
        lit(1.0) / col("n1").cast("double")))
    wide.select(col("n0"), col("n1"), col("c0"), col("c1"),
      p0.as("p0"), p1.as("p1"),
      when(col("c0") + col("c1") > 0 &&
        col("c0") + col("c1") < col("n0") + col("n1"), z)
        .otherwise(lit(null).cast("double")).as("z"))
  }

  /** `ab_cuped`'s oracle — also the oracle of `stream_ab_cuped`,
    * whose maintained state folds to the identical metric. */
  val oCupedSql: String =
    s"""WITH q AS MATERIALIZED (
       |  SELECT user_id, CAST(round(value*100) AS BIGINT) AS cents,
       |    epoch_us(ts) // 86400000000 AS day FROM events),
       |mid AS MATERIALIZED (SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM q),
       |u AS MATERIALIZED (
       |  SELECT user_id,
       |    (user_id * 2654435761) % ${graft.Core.HashMod} % 2 AS arm,
       |    CAST(SUM(CASE WHEN day <= (SELECT mid FROM mid) THEN cents ELSE 0 END) AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN day > (SELECT mid FROM mid) THEN cents ELSE 0 END) AS BIGINT) AS y
       |  FROM q GROUP BY user_id),
       |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
       |        SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |        SUM(CAST(x AS HUGEINT)*x) AS sxx, SUM(CAST(x AS HUGEINT)*y) AS sxy
       |      FROM u),
       |a AS (SELECT arm, COUNT(*) AS n_users,
       |        SUM(CAST(x AS HUGEINT)) AS sxa, SUM(CAST(y AS HUGEINT)) AS sya
       |      FROM u GROUP BY arm)
       |SELECT arm, n_users,
       |  CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_y_cents,
       |  CAST(sya AS DOUBLE) / CAST(n_users AS DOUBLE)
       |    - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
       |      * (CAST(sxa AS DOUBLE)/CAST(n_users AS DOUBLE)
       |         - CAST(sx AS DOUBLE)/CAST(n AS DOUBLE)) AS mean_y_adj_cents,
       |  CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS theta
       |FROM a, m ORDER BY arm""".stripMargin

  /** Benford-expected share of first digit d, log10(1+1/d) — computed
    * ONCE here and embedded as the same 17-digit literal in both
    * engines' plans (log10 itself has no cross-engine bit guarantee;
    * a shared literal trivially does). SCIENTIFIC notation is
    * load-bearing: DuckDB types a plain 17-digit literal as
    * DECIMAL(18,18) and its decimal→double conversion lands one ulp
    * off Scala's direct parse; an e-notation literal is a DOUBLE in
    * both parsers. */
  private val BenfordShare: Map[Int, String] =
    (1 to 9).map(dd => dd -> f"${math.log10(1.0 + 1.0 / dd)}%.17e").toMap

  /** Benford first-digit audit over the transaction values — the
    * classic fabricated-data screen (organic multiplicative amounts
    * follow log10(1+1/d); uniform or hand-typed ones don't). The
    * first significant digit comes from the CENTS STRING (identical
    * text both engines — no float log in the digit extraction),
    * counts are exact, and the deviation from the Benford share is a
    * fixed double shape against the embedded literals. Measured on
    * the driver data: the synthetic amounts are log-spread enough to
    * read NEAR-Benford (max per-digit deviation ≈ 0.019 at sf0.01) —
    * so the registered rows pin a clean audit, and `dev` is the
    * number that moves when fabricated or truncated values land.
    *
    * Scale: one scan → 9-group partial+final agg + a 1-row total. */
  def benfordDigits(s: SparkSession, d: String): DataFrame = {
    val cents = round(col("value") * 100).cast("long")
    val counts = Tables(s, d, "events")
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum("n").as("t"))
    val benford = (2 to 9).foldLeft(
      when(col("digit") === 1, lit(BenfordShare(1).toDouble))) { (acc, dd) =>
      acc.when(col("digit") === dd, lit(BenfordShare(dd).toDouble))
    }
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("t").cast("double")).as("share"),
        benford.as("benford_share"),
        abs(col("n").cast("double") / col("t").cast("double") - benford)
          .as("dev"))
      .orderBy("digit")
  }

  /** χ² test-of-independence CELLS between two categorical columns
    * (order priority × order status) — the categorical sibling of
    * [[corrMatrix]]: a data profile reads the per-cell contribution
    * (obs−E)²/E to see WHICH category pair drives dependence, not
    * just whether the summed statistic crosses a threshold. All
    * counts are exact longs; the contribution is computed from the
    * integer identity (obs·n − r·c)²/(n·r·c) so every intermediate
    * up to ONE fixed shape of double ops is exact: obs·n and r·c
    * accumulate in decimal(38,0) (HUGEINT in the oracle — at 6e11
    * orders r·c ≤ 3.6e23, past long), the difference casts to
    * double once, and dev²/(rc·n) is the identical IEEE expression
    * on both engines. (The summed χ² statistic is deliberately NOT
    * emitted: a sum of doubles is accumulation-order-dependent; the
    * driver-side reader can total the handful of cells itself.)
    *
    * Scale: one scan → |cells| partial+final agg; row totals, column
    * totals, and n are tiny re-aggregations of the CELLS frame (not
    * second scans) broadcast back onto it. */
  def chi2Cells(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val obs = cached(Tables(s, d, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n_obs")))
    val rowT = obs.groupBy("priority").agg(sum("n_obs").as("r"))
    val colT = obs.groupBy("status").agg(sum("n_obs").as("c"))
    val tot = obs.agg(sum("n_obs").as("n"))
    val dev = (col("n_obs").cast(dec) * col("n") -
      col("r").cast(dec) * col("c")).cast("double")
    val rc = (col("r").cast(dec) * col("c")).cast("double")
    obs.join(broadcast(rowT), "priority")
      .join(broadcast(colT), "status")
      .crossJoin(broadcast(tot))
      .select(col("priority"), col("status"), col("n_obs"),
        (rc / col("n").cast("double")).as("expected"),
        ((dev * dev) / (rc * col("n").cast("double"))).as("chi2_contrib"))
      .orderBy("priority", "status")
  }

  /** Key-concentration profile — Gini impurity / HHI / effective key
    * count per candidate shuffle key. [[keySkew]] reads the single
    * HOTTEST key; concentration reads the whole distribution: HHI =
    * Σm²/n² is the probability two random rows share a key (the
    * collision rate a hash-partitioned shuffle actually experiences),
    * gini = 1 − HHI, and n²/Σm² is the "effective number of keys" —
    * the partition-count ceiling beyond which more reducers stop
    * helping. Σm² accumulates in decimal(38,0) (≤ n² ≈ 3.6e23 at
    * catalog scale, past long); each output double is one
    * exact-decimal division, bit-identical on both engines.
    *
    * Scale: per key one partial+final count, then a 1-row aggregate
    * per key column; the report is |key columns| rows. */
  def giniConcentration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    def one(name: String, t: DataFrame, k: String): DataFrame =
      t.groupBy(col(k)).agg(count(lit(1)).as("m"))
        .agg(
          coalesce(sum(col("m")), lit(0L)).as("n_rows"),
          count(lit(1)).as("n_keys"),
          coalesce(sum(col("m").cast(dec) * col("m")), lit(0).cast(dec))
            .as("s2"))
        .filter(col("n_rows") > 0)
        .select(lit(name).as("key_name"), col("n_rows"), col("n_keys"),
          (col("s2").cast("double") /
            (col("n_rows").cast(dec) * col("n_rows")).cast("double")).as("hhi"),
          (lit(1.0) - col("s2").cast("double") /
            (col("n_rows").cast(dec) * col("n_rows")).cast("double")).as("gini"),
          ((col("n_rows").cast(dec) * col("n_rows")).cast("double") /
            col("s2").cast("double")).as("effective_keys"))
    one("events.event_type", Tables(s, d, "events"), "event_type")
      .unionAll(one("events.user_id", Tables(s, d, "events"), "user_id"))
      .unionAll(one("lineitem.l_partkey", Tables(s, d, "lineitem"), "l_partkey"))
      .unionAll(one("orders.o_orderpriority", Tables(s, d, "orders"),
        "o_orderpriority"))
      .orderBy("key_name")
  }

  val queries: Seq[Q] = Seq(
    // oracle: the same integer identity over HUGEINT with the same
    // single-cast double shape — cells match bit-for-bit
    Q("quality_chi2_cells", chi2Cells, Some(
      """WITH obs AS MATERIALIZED (
        |  SELECT o_orderpriority AS priority, o_orderstatus AS status,
        |    COUNT(*) AS n_obs
        |  FROM orders GROUP BY 1, 2),
        |r AS (SELECT priority, CAST(SUM(n_obs) AS BIGINT) AS r FROM obs GROUP BY priority),
        |c AS (SELECT status, CAST(SUM(n_obs) AS BIGINT) AS c FROM obs GROUP BY status),
        |t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM obs)
        |SELECT obs.priority, obs.status, obs.n_obs,
        |  CAST(CAST(r.r AS HUGEINT) * c.c AS DOUBLE) / CAST(t.n AS DOUBLE)
        |    AS expected,
        |  (CAST(CAST(obs.n_obs AS HUGEINT) * t.n - CAST(r.r AS HUGEINT) * c.c AS DOUBLE)
        |   * CAST(CAST(obs.n_obs AS HUGEINT) * t.n - CAST(r.r AS HUGEINT) * c.c AS DOUBLE))
        |  / (CAST(CAST(r.r AS HUGEINT) * c.c AS DOUBLE) * CAST(t.n AS DOUBLE))
        |    AS chi2_contrib
        |FROM obs JOIN r USING (priority) JOIN c USING (status) CROSS JOIN t
        |ORDER BY priority, status""".stripMargin)),
    // oracle: the same exact Σm² in HUGEINT and the same
    // one-division-per-column double shape
    Q("quality_gini_concentration", giniConcentration, Some(
      """WITH stats AS MATERIALIZED (
        |  SELECT 'events.event_type' AS key_name, event_type AS k, COUNT(*) AS m
        |  FROM events GROUP BY event_type
        |  UNION ALL
        |  SELECT 'events.user_id', CAST(user_id AS VARCHAR), COUNT(*)
        |  FROM events GROUP BY user_id
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', CAST(l_partkey AS VARCHAR), COUNT(*)
        |  FROM lineitem GROUP BY l_partkey
        |  UNION ALL
        |  SELECT 'orders.o_orderpriority', o_orderpriority, COUNT(*)
        |  FROM orders GROUP BY o_orderpriority),
        |a AS (SELECT key_name, CAST(SUM(m) AS BIGINT) AS n_rows,
        |        COUNT(*) AS n_keys, SUM(CAST(m AS HUGEINT) * m) AS s2
        |      FROM stats GROUP BY key_name)
        |SELECT key_name, n_rows, n_keys,
        |  CAST(s2 AS DOUBLE) / CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE)
        |    AS hhi,
        |  1.0 - CAST(s2 AS DOUBLE) / CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE)
        |    AS gini,
        |  CAST(CAST(n_rows AS HUGEINT) * n_rows AS DOUBLE) / CAST(s2 AS DOUBLE)
        |    AS effective_keys
        |FROM a ORDER BY key_name""".stripMargin)),
    Q("quality_benford", benfordDigits, Some {
      val shares = (1 to 9)
        .map(dd => s"WHEN $dd THEN ${BenfordShare(dd)}").mkString(" ")
      s"""WITH c AS MATERIALIZED (
         |  SELECT CAST(substring(CAST(CAST(round(value*100) AS BIGINT) AS VARCHAR), 1, 1) AS INTEGER) AS digit
         |  FROM events),
         |n AS (SELECT digit, COUNT(*) AS n FROM c GROUP BY digit),
         |t AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM n)
         |SELECT digit, n,
         |  CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share,
         |  CASE digit $shares END AS benford_share,
         |  abs(CAST(n AS DOUBLE) / CAST(t AS DOUBLE)
         |      - CASE digit $shares END) AS dev
         |FROM n CROSS JOIN t ORDER BY digit""".stripMargin
    }),
    Q("ab_conversion_ztest", abConversionZtest, Some(
      s"""WITH sp AS MATERIALIZED (
         |  SELECT user_id,
         |    CAST(SUM(CASE WHEN event_type = 'purchase'
         |             THEN CAST(round(value*100) AS BIGINT) ELSE 0 END) AS BIGINT)
         |      AS cents
         |  FROM events GROUP BY user_id),
         |u AS MATERIALIZED (
         |  SELECT user_id,
         |    (user_id * 2654435761) % ${graft.Core.HashMod} % 2 AS arm,
         |    CASE WHEN CAST(cents AS DOUBLE) >
         |      (SELECT quantile_cont(cents, 0.5) FROM sp) THEN 1 ELSE 0 END AS conv
         |  FROM sp),
         |w AS (SELECT
         |  CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         |  CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |  CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS c0,
         |  CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS c1
         |  FROM u)
         |SELECT n0, n1, c0, c1,
         |  CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE) AS p0,
         |  CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE) AS p1,
         |  CASE WHEN c0 + c1 > 0 AND c0 + c1 < n0 + n1 THEN
         |    (CAST(c1 AS DOUBLE)/CAST(n1 AS DOUBLE)
         |      - CAST(c0 AS DOUBLE)/CAST(n0 AS DOUBLE))
         |    / sqrt((CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE))
         |           * (1.0 - CAST(c0+c1 AS DOUBLE)/CAST(n0+n1 AS DOUBLE))
         |           * (1.0/CAST(n0 AS DOUBLE) + 1.0/CAST(n1 AS DOUBLE)))
         |  ELSE NULL END AS z
         |FROM w""".stripMargin)),
    // oracle: identical exact-moment CUPED; every double op has the
    // same operands and order on both engines
    Q("ab_cuped", abCuped, Some(oCupedSql)),
    // oracle: one global ordered cumsum (fine at oracle size; the
    // engine's two-phase spelling exists for the 100 TB case) over
    // the same integer counts and the same exact gap arithmetic
    Q("quality_ks_drift", ksDrift, Some(
      s"""WITH e AS (
         |  SELECT value,
         |    CASE WHEN (user_id * 2654435761) % ${graft.Core.HashMod} % 100 < 80
         |         THEN 1 ELSE 0 END AS tr
         |  FROM events),
         |v AS (SELECT value, CAST(SUM(tr) AS BIGINT) AS c1,
         |        CAST(SUM(1 - tr) AS BIGINT) AS c2 FROM e GROUP BY value),
         |c AS (SELECT SUM(c1) OVER win AS f1, SUM(c2) OVER win AS f2 FROM v
         |      WINDOW win AS (ORDER BY value
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |t AS (SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         |        CAST(SUM(c2) AS BIGINT) AS n2 FROM v)
         |SELECT n1, n2,
         |  CAST(CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS DECIMAL(38,0)) AS VARCHAR) AS max_gap,
         |  CAST(MAX(ABS(f1 * n2 - f2 * n1)) AS DOUBLE)
         |    / CAST(n1 * n2 AS DOUBLE) AS ks_stat
         |FROM c CROSS JOIN t GROUP BY n1, n2""".stripMargin)),
    // oracle: identical cents-quantization + HUGEINT moments + the
    // same double-cast/sqrt spelling, so r matches bit-for-bit
    Q("quality_corr_matrix", corrMatrix, Some {
      val k = CorrCols.length
      val qCols = CorrCols.zipWithIndex
        .map { case (c, i) => s"CAST(round($c*100) AS BIGINT) AS c$i" }
        .mkString(", ")
      val sums = (0 until k)
        .map(i => s"SUM(CAST(c$i AS HUGEINT)) AS s$i").mkString(", ")
      val prods = (for { i <- 0 until k; j <- i until k }
        yield s"SUM(CAST(c$i AS HUGEINT)*c$j) AS p${i}_$j").mkString(", ")
      val rows = (for { i <- 0 until k; j <- (i + 1) until k } yield
        s"SELECT '${CorrCols(i)}' AS col_a, '${CorrCols(j)}' AS col_b, " +
          s"CAST(n*p${i}_$j - s$i*s$j AS DOUBLE) / " +
          s"(sqrt(CAST(n*p${i}_$i - s$i*s$i AS DOUBLE)) * " +
          s"sqrt(CAST(n*p${j}_$j - s$j*s$j AS DOUBLE))) AS pearson_r FROM m")
        .mkString(" UNION ALL ")
      s"""WITH q AS (SELECT $qCols FROM lineitem),
         |m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, $sums, $prods FROM q)
         |$rows
         |ORDER BY col_a, col_b""".stripMargin
    }),
    // oracle: one global ordered row_number (fine at oracle size; the
    // engine's two-phase rank exists for the 100 TB case) over the
    // same cents quantization and the same integer bucket formula
    Q("quality_equidepth_hist", equidepthHist, Some(oEquidepthSql)),
    // oracle: one per-group ordered cumulative sum (fine at oracle
    // size; the engine's two-phase spelling is the 100 TB case) over
    // the same integer lower-median rule
    Q("quality_weighted_median", weightedMedian, Some(oWeightedMedianSql)),
    // oracle: the same exact-cents 2x2 and the identical mean/trend
    // double shapes; the zero branches are 0e0 double literals
    Q("ab_diff_in_diff", abDiffInDiff, Some(
      s"""WITH udc AS (
         |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
         |  FROM events GROUP BY 1, 2),
         |m AS (SELECT (MIN(day) + MAX(day)) // 2 AS mid FROM udc),
         |u AS (SELECT user_id,
         |        CAST(SUM(CASE WHEN day <= mid THEN cents ELSE 0 END) AS BIGINT) AS x,
         |        CAST(SUM(CASE WHEN day > mid THEN cents ELSE 0 END) AS BIGINT) AS y,
         |        (user_id * 2654435761) % ${graft.Core.HashMod} % 2 AS arm
         |      FROM udc, m GROUP BY user_id, arm),
         |a AS (SELECT arm, COUNT(*) AS n_users,
         |        SUM(CAST(x AS HUGEINT)) AS sx,
         |        SUM(CAST(y AS HUGEINT)) AS sy FROM u GROUP BY arm),
         |t AS (SELECT arm, n_users,
         |        CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_pre_cents,
         |        CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE) AS mean_post_cents,
         |        CAST(sy AS DOUBLE) / CAST(n_users AS DOUBLE)
         |          - CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE) AS trend_cents
         |      FROM a),
         |d AS (SELECT SUM(CASE WHEN arm = 1 THEN trend_cents ELSE 0e0 END)
         |           - SUM(CASE WHEN arm = 0 THEN trend_cents ELSE 0e0 END)
         |        AS did_cents FROM t)
         |SELECT t.arm, t.n_users, mean_pre_cents, mean_post_cents,
         |  trend_cents, did_cents
         |FROM t, d ORDER BY arm""".stripMargin)),
    // oracle: the same doubled midranks over the cents-frequency
    // table, the same exact longs through 2U1 and the tie term, and
    // the identical z shape (e-notation double literals)
    Q("ab_mann_whitney", abMannWhitney, Some(
      s"""WITH u AS (
         |  SELECT user_id,
         |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM events GROUP BY user_id),
         |a AS (SELECT y,
         |        (user_id * 2654435761) % ${graft.Core.HashMod} % 2 AS arm
         |      FROM u),
         |f AS (SELECT y, COUNT(*) AS t,
         |        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS t1
         |      FROM a GROUP BY y),
         |r AS (SELECT t, t1,
         |        2 * COALESCE(SUM(t) OVER (ORDER BY y
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          + t + 1 AS mr2
         |      FROM f),
         |m AS (SELECT CAST(SUM(t - t1) AS BIGINT) AS n0,
         |        CAST(SUM(t1) AS BIGINT) AS n1,
         |        CAST(SUM(t1 * mr2) AS BIGINT) AS r1_2,
         |        CAST(SUM(t * t * t - t) AS BIGINT) AS ties FROM r)
         |SELECT n0, n1, CAST(r1_2 - n1 * (n1 + 1) AS BIGINT) AS u1_2, ties,
         |  CAST(r1_2 - n1 * (n1 + 1) - n0 * n1 AS DOUBLE) /
         |  (2e0 * sqrt(CAST(n0 * n1 AS DOUBLE) / 12e0 *
         |    (CAST(n0 + n1 + 1 AS DOUBLE) - CAST(ties AS DOUBLE) /
         |      (CAST(n0 + n1 AS DOUBLE) * CAST(n0 + n1 - 1 AS DOUBLE))))) AS z
         |FROM m""".stripMargin)),
    // oracle: quantile_cont IS Spark's percentile (same interpolated
    // (n-1)p formula); the 4.4478 consistency constant is one shared
    // literal so both engines compare against the identical double
    Q("quality_mad_outliers", madOutliers, Some(
      """WITH e AS (
        |  SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
        |  FROM events),
        |med AS (SELECT event_type, quantile_cont(v, 0.5) AS median_cents
        |        FROM e GROUP BY event_type),
        |dev AS (SELECT e.event_type, ABS(CAST(v AS DOUBLE) - median_cents) AS adev,
        |               median_cents
        |        FROM e JOIN med USING (event_type)),
        |st AS (SELECT event_type, COUNT(*) AS n_events,
        |         MAX(median_cents) AS median_cents,
        |         quantile_cont(adev, 0.5) AS mad_cents,
        |         MAX(adev) AS max_abs_dev
        |       FROM dev GROUP BY event_type)
        |SELECT st.event_type, st.n_events, st.median_cents, st.mad_cents,
        |  st.max_abs_dev,
        |  CAST(SUM(CASE WHEN dev.adev > st.mad_cents * 4.4478
        |       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN st USING (event_type)
        |GROUP BY 1, 2, 3, 4, 5 ORDER BY st.event_type""".stripMargin)),
    Q("quality_key_skew", keySkew, Some(
      """WITH stats AS (
        |  SELECT 'events.user_id' AS key_name, user_id AS k, COUNT(*) AS m
        |  FROM events GROUP BY user_id
        |  UNION ALL
        |  SELECT 'lineitem.l_orderkey', l_orderkey, COUNT(*)
        |  FROM lineitem GROUP BY l_orderkey
        |  UNION ALL
        |  SELECT 'lineitem.l_partkey', l_partkey, COUNT(*)
        |  FROM lineitem GROUP BY l_partkey
        |  UNION ALL
        |  SELECT 'orders.o_custkey', o_custkey, COUNT(*)
        |  FROM orders GROUP BY o_custkey),
        |agg AS (
        |  SELECT key_name, CAST(SUM(m) AS BIGINT) AS n_rows,
        |    COUNT(*) AS n_keys, CAST(MAX(m) AS BIGINT) AS max_rows
        |  FROM stats GROUP BY key_name),
        |hot AS (
        |  SELECT key_name, k AS hot_key,
        |    row_number() OVER (PARTITION BY key_name
        |      ORDER BY m DESC, k ASC) AS rn
        |  FROM stats)
        |SELECT a.key_name, a.n_rows, a.n_keys, a.max_rows, h.hot_key,
        |  CAST(a.max_rows * a.n_keys AS DOUBLE) / a.n_rows AS skew_ratio
        |FROM agg a JOIN hot h ON h.key_name = a.key_name AND h.rn = 1
        |ORDER BY a.key_name""".stripMargin)),
    Q("quality_integrity", integrity, Some(
      """SELECT 'fk_lineitem_orders' AS constraint_name,
        |  (SELECT COUNT(*) FROM lineitem) AS n_child,
        |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS n_violations
        |UNION ALL
        |SELECT 'fk_lineitem_part',
        |  (SELECT COUNT(*) FROM lineitem),
        |  (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
        |UNION ALL
        |SELECT 'fk_orders_customer',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
        |UNION ALL
        |SELECT 'pk_orders',
        |  (SELECT COUNT(*) FROM orders),
        |  (SELECT COALESCE(CAST(SUM(m) AS BIGINT), 0) FROM
        |    (SELECT COUNT(*) AS m FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1))
        |UNION ALL
        |SELECT 'pk_customer',
        |  (SELECT COUNT(*) FROM customer),
        |  (SELECT COALESCE(CAST(SUM(m) AS BIGINT), 0) FROM
        |    (SELECT COUNT(*) AS m FROM customer GROUP BY c_custkey HAVING COUNT(*) > 1))
        |ORDER BY constraint_name""".stripMargin)),
  )
}
