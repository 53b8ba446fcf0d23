package graft

import graft.operators.WordCount
import org.apache.spark.sql.functions.{col, explode, split}

/** The DataSource V2 synthetic-docs connector: schema, determinism
  * across partitionings, option handling, and end-to-end use as a
  * wordcount input. */
class SourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(opts: (String, String)*) = {
    val r = spark.read.format("graft.sources.SyntheticDocsSource")
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("produces the requested rows with the declared schema") {
    val df = read("rows" -> "57", "partitions" -> "5")
    assert(df.schema.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(df.count() == 57)
    assert(df.select("doc_id").as[Long].collect().sorted.toSeq == (0L until 57L))
  }

  test("content is a pure function of seed — partitioning-invariant") {
    val a = read("rows" -> "40", "partitions" -> "1").as[(Long, String)].collect().toMap
    val b = read("rows" -> "40", "partitions" -> "7").as[(Long, String)].collect().toMap
    assert(a == b)
    val other = read("rows" -> "40", "partitions" -> "1", "seed" -> "7")
      .as[(Long, String)].collect().toMap
    assert(a != other)
  }

  test("parallelism equals the partitions option") {
    assert(read("rows" -> "100", "partitions" -> "6").rdd.getNumPartitions == 6)
  }

  test("the full vocabulary is reachable") {
    // guards the wordIndex arithmetic: a masking/precedence slip
    // collapses the distribution onto the first couple of words
    val words = read("rows" -> "300", "wordsPerDoc" -> "20")
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().as[String].collect().toSet
    val vocab = "the quick brown fox jumps over a lazy dog and runs far away".split(" ").toSet
    assert(words == vocab)
  }

  test("column pruning reaches the scan; pruned scans stay correct") {
    val pruned = read("rows" -> "50").select("doc_id")
    // the BatchScan node's output is just doc_id — text is never generated
    val scanLine = pruned.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("doc_id") && !scanLine.contains("text"), scanLine)
    assert(pruned.as[Long].collect().toSet == (0L until 50L).toSet)
    // text-only projection (column order differs from source order)
    val textOnly = read("rows" -> "10").select("text")
    assert(textOnly.as[String].collect().forall(_.nonEmpty))
    // count(*) scans zero columns
    assert(read("rows" -> "33").count() == 33L)
  }

  test("limit pushdown caps partition output and the result") {
    val df = read("rows" -> "100000", "partitions" -> "8").limit(7)
    assert(df.collect().length == 7)
  }

  test("doc_id range filters push into partition planning (partition skipping)") {
    // semantics: the filtered read returns exactly the range
    val df = read("rows" -> "1000", "partitions" -> "4")
      .filter(col("doc_id") >= 900 && col("doc_id") < 950)
    assert(df.select("doc_id").as[Long].collect().sorted.toSeq == (900L until 950L))
    // mechanism: planned partitions cover ONLY [900, 950) — the
    // skipped prefix is never generated. Drive the SPI directly
    // (DocsRange is private; its case-class toString carries the
    // bounds).
    import org.apache.spark.sql.connector.read._
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    val table = new graft.sources.SyntheticDocsSource().getTable(
      null, Array.empty,
      java.util.Map.of("rows", "1000", "partitions", "4"))
    val sb = table.asInstanceOf[org.apache.spark.sql.connector.catalog.SupportsRead]
      .newScanBuilder(new CaseInsensitiveStringMap(java.util.Map.of()))
    val rest = sb.asInstanceOf[SupportsPushDownFilters].pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("doc_id", 900L),
      org.apache.spark.sql.sources.LessThan("doc_id", 950L),
      org.apache.spark.sql.sources.EqualTo("text", "x"))) // unsupported
    assert(rest.toSeq == Seq(org.apache.spark.sql.sources.EqualTo("text", "x")))
    val parts = sb.build().toBatch.planInputPartitions()
    val spans = parts.map(_.toString).map { t =>
      val m = "DocsRange\\((\\d+),(\\d+),".r.findFirstMatchIn(t).get
      (m.group(1).toLong, m.group(2).toLong)
    }
    assert(spans.forall { case (a, b) => a >= 900L && b <= 950L }, spans.toSeq)
    assert(spans.map { case (a, b) => b - a }.sum == 50L, spans.toSeq)
  }

  test("bloom-written parquet skips absent keys where footer ranges cannot") {
    import scala.jdk.CollectionConverters._
    val (_, dir) = graft.operators.Connectors.bloomSkipWithDir(spark, sf)
    val conf = spark.sessionState.newHadoopConf()
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).sortBy(_.getName)
    assert(files.nonEmpty)
    // the whole-table custkey span, for the "ranges cannot prune" claim
    var globalMin = Long.MaxValue; var globalMax = Long.MinValue
    var groups = 0; var absentRejected = 0
    val absentKey = java.lang.Long.valueOf(1000000001L) // a BloomProbes miss
    for (f <- files) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        for (b <- reader.getFooter.getBlocks.asScala) {
          val ck = b.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey").get
          // 1) the bloom filter is physically present in the footer
          val bf = reader.getBloomFilterDataReader(b).readBloomFilter(ck)
          assert(bf != null, s"no bloom filter in ${f.getName}")
          // 2) no false negatives: a key really in this row group is found
          val st = ck.getStatistics
          val lo = st.genericGetMin.asInstanceOf[Number].longValue
          val hi = st.genericGetMax.asInstanceOf[Number].longValue
          globalMin = math.min(globalMin, lo); globalMax = math.max(globalMax, hi)
          assert(bf.findHash(bf.hash(java.lang.Long.valueOf(lo))))
          // 3) the absent probe is (deterministically, on this data)
          // answered "definitely not present" — the row-group skip
          if (!bf.findHash(bf.hash(absentKey))) absentRejected += 1
          groups += 1
        }
      } finally reader.close()
    }
    assert(absentRejected == groups,
      s"absent key not rejected by $absentRejected/$groups row groups")
    // 4) footer RANGES could NOT make that kind of skip for in-range
    // probes: the orderkey-sorted layout leaves every row group's
    // custkey span covering ≥ half the global span, so min/max
    // pruning on a mid-range point probe excludes nothing — the bloom
    // filter is the only skipping signal on this column
    for (f <- files) {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), conf))
      try {
        for (b <- reader.getFooter.getBlocks.asScala) {
          val st = b.getColumns.asScala
            .find(_.getPath.toDotString == "o_custkey").get.getStatistics
          val span = st.genericGetMax.asInstanceOf[Number].longValue -
            st.genericGetMin.asInstanceOf[Number].longValue
          assert(span * 2 >= globalMax - globalMin,
            s"row group span $span unexpectedly narrow — range stats would prune")
        }
      } finally reader.close()
    }
  }

  test("feeds the flagship wordcount end to end") {
    val counts = WordCount.wordCount(
      read("rows" -> "200", "words" -> "Alpha beta! beta?", "wordsPerDoc" -> "5"))
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("alpha", "beta"))
    assert(counts.values.sum == 1000L)
  }
}
