package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Explicit scalar-function-library coverage (SURVEY §2b "scalar fn
  * library"): date/time arithmetic, string manipulation, math, and
  * null semantics, each verified against DuckDB's spelling of the
  * same function. Everything here is per-row expression work inside
  * whole-stage codegen — the library surface a reference user gets
  * "for free" when switching to Spark.
  */
object ScalarFns {

  /** Date functions over order dates: extract, truncate, add,
    * diff, format, day-of-week. */
  def dateFns(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("qtr_start"),
        date_format(date_add(col("o_orderdate"), 90), "yyyy-MM-dd").as("due_date"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate")).as("age_days"))
      .orderBy("o_orderkey")

  /** String functions over part names: case, pad, substring,
    * replace, split/size, position, reverse, translate. */
  def stringFns(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "part")
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_uc"),
        lpad(col("p_partkey").cast("string"), 10, "0").as("key_padded"),
        substring(col("p_name"), 1, 8).as("name_prefix"),
        translate(col("p_type"), " ", "_").as("type_snake"),
        size(split(col("p_name"), " ")).as("name_words"),
        instr(col("p_type"), "BRASS").cast("int").as("brass_pos"),
        reverse(col("p_brand")).as("brand_rev"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Math + null semantics: abs/round/floor/ceil/sign, integer
    * modulo, null-generating division guarded by nullif, coalesce,
    * and null-safe comparison folded into a flag. */
  def mathNullFns(s: SparkSession, d: String): DataFrame =
    Tables(s, d, "supplier")
      .select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("bal_abs"),
        round(col("s_acctbal"), 1).as("bal_round1"),
        floor(col("s_acctbal")).cast("long").as("bal_floor"),
        ceil(col("s_acctbal")).cast("long").as("bal_ceil"),
        signum(col("s_acctbal")).cast("long").as("bal_sign"),
        pmod(col("s_suppkey"), lit(7)).as("key_mod7"),
        // nullif guards div-by-zero; coalesce restores a default —
        // both engines must agree null-for-null
        coalesce(col("s_acctbal") / nullif(pmod(col("s_suppkey"), lit(5)), lit(0)),
          lit(-1.0)).as("bal_per_mod"),
        (col("s_nationkey") <=> lit(3)).cast("int").as("is_nation3"))
      .orderBy("s_suppkey")

  /** Complex-type functions: array build/sort/slice/distinct/join/
    * indexing (negative too), membership, map construction + lookup,
    * and struct pack/field-access — per-row, codegen'd, the
    * collection surface of the function library. Array-valued
    * intermediates are rendered to strings/scalars in the output so
    * the comparison stays representation-independent. */
  def complexFns(s: SparkSession, d: String): DataFrame = {
    val words = split(col("p_name"), " ")
    Tables(s, d, "part")
      .select(
        col("p_partkey"),
        array_join(sort_array(words), "-").as("words_sorted"),
        array_join(slice(words, 1, 3), "-").as("first3"),
        element_at(words, -1).as("last_word"),
        array_contains(words, "green").as("has_green"),
        size(array_distinct(words)).as("n_uniq"),
        element_at(map(lit("brand"), col("p_brand")), "brand").as("brand_via_map"),
        struct(col("p_size").as("sz"), col("p_brand").as("br"))
          .getField("sz").as("size_via_struct"))
      .orderBy("p_partkey")
  }

  /** Higher-order array functions — transform / filter / aggregate
    * (fold) / exists / forall / zip_with — over the per-order
    * quantity vector. These are the lambda surface Catalyst codegens
    * per-row (no UDF): every output here is one pass over a small
    * array inside whole-stage codegen. Quantities are cast to long
    * and the array is sorted so every derived value is exact integer
    * arithmetic over a deterministic multiset — hash-comparable with
    * no floating-point caveats. */
  def arrayHigherOrder(s: SparkSession, d: String): DataFrame = {
    val qs = col("qs")
    Tables(s, d, "lineitem")
      .groupBy("l_orderkey")
      .agg(sort_array(collect_list(col("l_quantity").cast("long"))).as("qs"))
      .select(
        col("l_orderkey"),
        size(qs).as("n_items"),
        aggregate(qs, lit(0L), (a, x) => a + x).as("total_qty"),
        aggregate(transform(qs, x => x * x), lit(0L), (a, x) => a + x).as("sum_sq"),
        size(filter(qs, _ > 30L)).as("n_large"),
        exists(qs, _ === 1L).cast("int").as("has_single"),
        forall(qs, _ <= 50L).cast("int").as("all_le50"),
        aggregate(zip_with(qs, reverse(qs), (a, b) => a * b),
          lit(0L), (a, x) => a + x).as("rev_dot"))
      .orderBy("l_orderkey")
  }

  val queries: Seq[Q] = Seq(
    Q("scalar_arrays", arrayHigherOrder, Some(
      """WITH a AS (
        |  SELECT l_orderkey, list_sort(list(CAST(l_quantity AS BIGINT))) AS qs
        |  FROM lineitem GROUP BY l_orderkey)
        |SELECT l_orderkey,
        |  CAST(len(qs) AS INTEGER) AS n_items,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT), qs), (a, b) -> a + b) AS total_qty,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(qs, x -> x * x)), (a, b) -> a + b) AS sum_sq,
        |  CAST(len(list_filter(qs, x -> x > 30)) AS INTEGER) AS n_large,
        |  CAST(list_contains(qs, 1) AS INTEGER) AS has_single,
        |  CAST(len(list_filter(qs, x -> x > 50)) = 0 AS INTEGER) AS all_le50,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, len(qs)),
        |      k -> qs[k] * qs[len(qs) + 1 - k])), (a, b) -> a + b) AS rev_dot
        |FROM a ORDER BY l_orderkey""".stripMargin)),
    Q("scalar_complex", complexFns, Some(
      """SELECT p_partkey,
        |  array_to_string(list_sort(string_split(p_name, ' ')), '-') AS words_sorted,
        |  array_to_string(string_split(p_name, ' ')[1:3], '-') AS first3,
        |  string_split(p_name, ' ')[-1] AS last_word,
        |  list_contains(string_split(p_name, ' '), 'green') AS has_green,
        |  CAST(len(list_distinct(string_split(p_name, ' '))) AS INTEGER) AS n_uniq,
        |  MAP {'brand': p_brand}['brand'][1] AS brand_via_map,
        |  struct_pack(sz := p_size, br := p_brand).sz AS size_via_struct
        |FROM part ORDER BY p_partkey""".stripMargin)),
    Q("scalar_dates", dateFns, Some(
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS qtr_start,
        |  strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
        |  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS age_days
        |FROM orders ORDER BY o_orderkey""".stripMargin)),
    Q("scalar_strings", stringFns, Some(
      """SELECT p_partkey,
        |  upper(p_brand) AS brand_uc,
        |  lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
        |  substring(p_name, 1, 8) AS name_prefix,
        |  replace(p_type, ' ', '_') AS type_snake,
        |  CAST(len(string_split(p_name, ' ')) AS INTEGER) AS name_words,
        |  CAST(instr(p_type, 'BRASS') AS INTEGER) AS brass_pos,
        |  reverse(p_brand) AS brand_rev,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin)),
    Q("scalar_math_null", mathNullFns, Some(
      """SELECT s_suppkey,
        |  abs(s_acctbal) AS bal_abs,
        |  round(s_acctbal, 1) AS bal_round1,
        |  CAST(floor(s_acctbal) AS BIGINT) AS bal_floor,
        |  CAST(ceil(s_acctbal) AS BIGINT) AS bal_ceil,
        |  CAST(sign(s_acctbal) AS BIGINT) AS bal_sign,
        |  s_suppkey % 7 AS key_mod7,
        |  coalesce(s_acctbal / nullif(s_suppkey % 5, 0), -1.0) AS bal_per_mod,
        |  CAST(s_nationkey = 3 AS INTEGER) AS is_nation3
        |FROM supplier ORDER BY s_suppkey""".stripMargin)),
  )
}
