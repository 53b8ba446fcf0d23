package graft

import org.apache.spark.sql.functions._
import graft.plans.TextHashes

/** The injected Catalyst functions are a SQL surface, not just a
  * Column-API one: `spark.sql.extensions=graft.plans.GraftExtensions`
  * registers each under its SQL name. Each test calls a function
  * from PLAIN SQL text and checks it against the equivalent
  * Column-API / built-in spelling, so a SQL-only user (a notebook, a
  * JDBC client) gets the identical semantics the operators use. */
class SqlSurfaceSpec extends SparkSpec {

  test("scalar signature functions are callable from plain SQL") {
    val row = spark.sql(
      """SELECT
        |  clean_word('C++ Café!') AS cw,
        |  char_gram_hashes('abcdef') AS cg,
        |  simhash48(array('foo', 'bar', 'baz')) AS sh,
        |  minhash_sigs(array(1L, 2L, 3L), array(3L, 5L)) AS mh,
        |  dot_double(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
        |  jaccard_long(array(1L, 2L), array(2L, 3L)) AS jc
        |""".stripMargin).head()
    // clean_word ≡ the built-in spelling it rewrites
    assert(row.getString(0) === "ccaf")
    // char_gram_hashes: 2 distinct 5-grams of "abcdef"
    assert(row.getSeq[Long](1).length === 2)
    assert(row.getLong(2) !== 0L)
    assert(row.getSeq[Long](3).length === 2)
    assert(row.getDouble(4) === 11.0)
    // |{1,2} ∩ {2,3}| / |{1,2} ∪ {2,3}| = 1/3
    assert(row.getDouble(5) === 1.0 / 3.0)
  }

  test("SQL calls equal the Column-API calls the operators use") {
    import spark.implicits._
    val df = Seq("the quick brown fox", "pack my box with jugs")
      .toDF("text")
      .withColumn("ctext", regexp_replace(lower(col("text")), "[^a-z0-9]", ""))
    val diff = df
      .withColumn("api", TextHashes.charGramHashes(col("ctext")))
      .withColumn("sqlv", expr("char_gram_hashes(ctext)"))
      .filter(col("api") =!= col("sqlv"))
    assert(diff.count() === 0)
  }

  test("topk_counts aggregate works from plain SQL over a view") {
    import spark.implicits._
    Seq(("a", 5L), ("b", 3L), ("c", 9L), ("d", 1L))
      .toDF("word", "count").createOrReplaceTempView("wc_sql_surface")
    val tk = spark.sql(
      "SELECT topk_counts(word, count, 2) AS tk FROM wc_sql_surface")
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(tk.map(r => (r.getString(0), r.getLong(1))) === Seq(("c", 9L), ("a", 5L)))
    spark.catalog.dropTempView("wc_sql_surface")
  }

  test("hyperplane_buckets is callable from SQL on a real embedding") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("embd", graft.functions.Vectors.toD(col("embedding")))
    val bad = e.selectExpr("hyperplane_buckets(embd) AS b")
      .filter(size(col("b")) =!= graft.functions.Vectors.Tables)
    assert(bad.count() === 0)
  }

  test("VARIANT path extraction equals the string JSON path") {
    val viaVariant = graft.operators.Events.variantExtract(spark, sf).collect().toSeq
    val viaString = graft.operators.Events.jsonExtract(spark, sf).collect().toSeq
    assert(viaVariant.nonEmpty)
    assert(viaVariant == viaString)
  }
}
