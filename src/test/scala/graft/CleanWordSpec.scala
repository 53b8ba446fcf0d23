package graft

import graft.operators.WordCount
import graft.plans.{CleanWord, CleanWordUtil}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** The native clean_word expression: byte-level semantics, the
  * optimizer rewrite, and end-to-end equality with the built-in
  * composition. */
class CleanWordSpec extends SparkSpec {
  import spark.implicits._

  private def cleanUtil(s: String): String =
    CleanWordUtil.clean(UTF8String.fromString(s)).toString

  test("byte-level clean matches the reference fixtures") {
    assert(cleanUtil("Hello,") == "hello")
    assert(cleanUtil("c++") == "c")
    assert(cleanUtil("007") == "007")
    assert(cleanUtil("café") == "caf")   // multi-byte é stripped
    assert(cleanUtil("it’s") == "its")
    assert(cleanUtil("?!-") == "")
    assert(cleanUtil("") == "")
    assert(cleanUtil("AbC09z") == "abc09z")
  }

  test("rewrite is observationally identical to the composition on non-ASCII") {
    // chars whose Unicode lowercase maps INTO ascii alnum must
    // survive exactly like the built-in path. The reference value is
    // built from the same primitives the built-ins use
    // (UTF8String.toLowerCase + Java regex) -- an SQL literal would
    // be constant-folded through the rewrite itself.
    for (s <- Seq("\u0130stanbul", "\u212AKelvin", "\u01C5ungla", "caf\u00e9", "\u1E9E3")) {
      val viaBuiltins = UTF8String.fromString(s)
        .toLowerCase.toString.replaceAll("[^a-z0-9]", "")
      assert(cleanUtil(s) == viaBuiltins, s"input: $s")
    }
  }

  test("optimizer rewrites the regex composition into clean_word") {
    // parquet-backed plan: a literal relation would be constant-folded
    // away before the assertion could observe the expression
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val df = docs.select(regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("w"))
    assert(df.queryExecution.optimizedPlan.toString.contains("clean_word"))
    // a different pattern must NOT be rewritten
    val other = docs.select(regexp_replace(lower(col("text")), "[^a-z]", "").as("w"))
    assert(!other.queryExecution.optimizedPlan.toString.contains("clean_word"))
    val lit = Seq("Hello, World!").toDF("text")
      .select(regexp_replace(lower(col("text")), "[^a-z0-9]", "").as("w"))
    assert(lit.as[String].collect().sameElements(Array("helloworld")))
  }

  test("native expression equals the built-in composition on a corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    // the session rewrites this into CleanWord (asserted above); the
    // reference implementation is the byte-level util applied locally
    val viaExpr = docs.selectExpr(
      "doc_id", "regexp_replace(lower(text), '[^a-z0-9]', '') AS w")
      .as[(Long, String)].collect().toMap
    val local = docs.select("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, t) => id -> cleanUtil(t) }.toMap
    assert(viaExpr == local)
  }

  test("flagship wordcount result is unchanged under the rewrite") {
    // the session has the extension on, so this runs with CleanWord
    val rows = WordCount.wordCount(Seq("Hello, hello! HELLO world. World?").toDF("text"))
      .as[(String, Long)].collect().toSeq
    assert(rows == Seq(("hello", 3L), ("world", 2L)))
  }
}
