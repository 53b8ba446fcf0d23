package graft.operators

import graft.{Q, Tables}
import graft.Core.cached
import graft.functions.Vectors
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (north star):
  * brute-force cosine top-k as the exact baseline, hyperplane-LSH
  * bucketed top-k as the approximate scale path, and a
  * partition-pruned k-NN self-join.
  *
  * Scale posture:
  *  - Brute force broadcasts the (tiny) query set and makes ONE scan
  *    over the corpus — a broadcast nested-loop with per-row cosine,
  *    then a per-query top-k. Linear in corpus size, zero shuffle of
  *    the corpus. This is the honest ANN baseline at any scale.
  *  - LSH top-k joins query buckets to corpus buckets (equi-join on
  *    (table, bucket)) so each query scores only its candidate set —
  *    the classic sub-linear ANN path. Recall vs the brute-force
  *    baseline is MEASURED by the registered `sim_lsh_recall` query
  *    (per-query overlap of the two top-k sets).
  *  - The k-NN self-join blocks on `label` (an IVF-style coarse
  *    partition): one shuffle on the block key, quadratic only
  *    within each (small) block, never globally.
  *
  * Tie-breaking is total everywhere (score DESC, id ASC) so results
  * are deterministic and oracle-comparable; cosine arithmetic is the
  * fixed-shape fold of [[graft.functions.Vectors]] — bit-identical
  * in DuckDB.
  */
object Similarity {

  private val NQueries = 5
  private val K = 5

  private def embs(s: SparkSession, d: String) = Tables(s, d, "embeddings")

  /** embd (double array) + nrm precomputed once per vector, so every
    * pair stage folds one dot product, not dot + two norms. */
  private def withD(df: DataFrame): DataFrame =
    df.withColumn("embd", Vectors.toD(col("embedding")))
      .withColumn("nrm", Vectors.norm(col("embd")))

  private def score = col("dp") / (col("qn") * col("nrm"))

  /** Exact top-k neighbors of the first [[NQueries]] vectors by
    * brute-force scan: broadcast queries × one corpus pass. */
  def topkBrute(s: SparkSession, d: String): DataFrame = {
    val e = withD(embs(s, d))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embd").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    e.select(col("vec_id"), col("embd"), col("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  private val TripletNegK = 3

  /** Hard-negative triplet mining — the pair/triple generator a
    * contrastive embedding-training pipeline runs over its corpus:
    * for each anchor, the single nearest SAME-label vector (the
    * positive) and the [[TripletNegK]] nearest DIFFERENT-label
    * vectors (the hard negatives — random negatives are too easy to
    * teach a margin), with `margin` = pos_score − neg_score per
    * triple. A negative margin flags the anchors whose hardest
    * negative already outranks their positive — exactly the triples
    * a training run must keep. Same execution posture as
    * [[topkBrute]]: anchors broadcast, ONE corpus pass scores both
    * roles, two bounded per-anchor windows pick positives and
    * negatives. At 100 TB the anchor set is the (small) training
    * batch — the corpus-side plan is a scan, never a self-shuffle;
    * the LSH-bucketed candidate path ([[topkLsh]]) slots in when
    * exactness is traded for probe cost. */
  def tripletMining(s: SparkSession, d: String): DataFrame = {
    val e = withD(embs(s, d))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("embd").as("qv"), col("nrm").as("qn"))
    val scored = cached(e.select(col("vec_id"), col("label"), col("embd"), col("nrm"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("score", score)
      .select(col("q_id"), col("q_label"), col("vec_id"), col("label"),
        col("score")))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    val pos = scored.filter(col("label") === col("q_label"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("q_id"), col("vec_id").as("pos_id"),
        col("score").as("pos_score"))
    val neg = scored.filter(col("label") =!= col("q_label"))
      .withColumn("neg_rank", row_number().over(w))
      .filter(col("neg_rank") <= TripletNegK)
      .select(col("q_id"), col("neg_rank"), col("vec_id").as("neg_id"),
        col("score").as("neg_score"))
    pos.join(neg, "q_id")
      .select(col("q_id"), col("pos_id"), col("pos_score"),
        col("neg_rank"), col("neg_id"), col("neg_score"),
        (col("pos_score") - col("neg_score")).as("margin"))
      .orderBy("q_id", "neg_rank")
  }

  /** Approximate top-k via hyperplane LSH: candidates share a bucket
    * with the query in ≥ 1 of the 8 tables; exact cosine re-ranks
    * the candidates only. */
  def topkLsh(s: SparkSession, d: String): DataFrame = {
    val e = cached(withD(embs(s, d)))
    val entries = cached(e
      .select(col("vec_id"), posexplode(Vectors.lshBuckets(col("embd"))))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket")))
    val qEntries = entries.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val cand = entries.join(broadcast(qEntries), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    cand
      .join(broadcast(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embd").as("qv"), col("nrm").as("qn"))), "q_id")
      .join(e.select(col("vec_id"), col("embd"), col("nrm")), "vec_id")
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** k-NN self-join blocked on `label` (IVF-style coarse partition):
    * each vector's top-3 neighbors within its block. The re-rank is
    * the engine's own [[graft.plans.TopKPerGroup]] heap operator over
    * a NARROW (q_id, label, vec_id, score) projection — the window
    * spelling would sort every query's full candidate block (and
    * would carry whatever columns ride along); the heap keeps 3 rows
    * per query in O(cands · log 3). The rank column is then a window
    * over the REDUCED ≤3-row groups, which costs no extra exchange:
    * the heap's output keeps the q_id clustering. */
  def knnPerLabel(s: SparkSession, d: String): DataFrame = {
    val e = cached(withD(embs(s, d)))
    val a = e.select(col("vec_id").as("q_id"), col("label"), col("embd").as("qv"), col("nrm").as("qn"))
    val b = e.select(col("vec_id"), col("label"), col("embd"), col("nrm"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    val scored = a.join(b, Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("score", score)
      .select("q_id", "label", "vec_id", "score")
    graft.plans.TopKPerGroup(scored,
        Seq("q_id"), Seq("score" -> false, "vec_id" -> true), 3)
      .withColumn("rn", row_number().over(w))
      .select(col("q_id"), col("label"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** IVF-style probe: `label` cells are the coarse quantizer; each
    * cell's deterministic representative is its min-vec_id member (a
    * "medoid-lite" — k-means centroids would need a deterministic
    * training story, and the PROBE structure is what matters here).
    * Queries rank cells by cosine to the representative, probe the
    * top-3 cells (nprobe=3), and exact-score only those members —
    * the classic two-level ANN: O(cells) + O(probed fraction), never
    * a full scan. */
  def topkIvf(s: SparkSession, d: String): DataFrame = {
    val e = cached(withD(embs(s, d)))
    val repW = Window.partitionBy("label").orderBy("vec_id")
    val reps = e.withColumn("rn", row_number().over(repW))
      .filter(col("rn") === 1)
      .select(col("label"), col("embd").as("rv"), col("nrm").as("rn_nrm"))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embd").as("qv"), col("nrm").as("qn"))
    val probeW = Window.partitionBy("q_id").orderBy(col("rscore").desc, col("label"))
    val probed = q.crossJoin(broadcast(reps))
      .withColumn("rscore", Vectors.dotd(col("qv"), col("rv")) / (col("qn") * col("rn_nrm")))
      .withColumn("prb", row_number().over(probeW))
      .filter(col("prb") <= 3)
      .select("q_id", "label", "qv", "qn")
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    probed.join(e.select(col("vec_id"), col("label"), col("embd"), col("nrm")), Seq("label"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("score", score)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Measured ANN recall (not a comment claim): per query, the
    * fraction of the exact brute-force top-k that the LSH top-k
    * actually returned. Both sides are the registered queries
    * themselves, so this row moves whenever the LSH parameters
    * (tables / bits) move — the health metric for the approximate
    * path. */
  private def recallVs(brute: DataFrame, approx: DataFrame): DataFrame =
    brute.select(col("q_id"), col("vec_id"))
      .join(approx.select(col("q_id"), col("vec_id")).withColumn("hit", lit(1L)),
        Seq("q_id", "vec_id"), "left")
      .groupBy("q_id")
      .agg(count(lit(1)).as("k"), sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .withColumn("recall", col("hits").cast("double") / col("k"))
      .select("q_id", "k", "hits", "recall")
      .orderBy("q_id")

  def lshRecall(s: SparkSession, d: String): DataFrame =
    recallVs(topkBrute(s, d), topkLsh(s, d))

  /** Exact MIPS (maximum inner product) top-k baseline — recommender
    * retrieval ranks by RAW dot product, not cosine: a long vector
    * with the right direction beats a short one, which cosine
    * deliberately erases. Same broadcast-queries single-scan shape as
    * [[topkBrute]], ranking by `dp` alone. */
  def topkMipsBrute(s: SparkSession, d: String): DataFrame = {
    val e = withD(embs(s, d))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embd").as("qv"))
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    e.select(col("vec_id"), col("embd"))
      .crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("score", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Sub-linear MIPS via the AUGMENTED-VECTOR reduction (Bachrach et
    * al., RecSys'14): append xe = √(M²−‖x‖²) to every corpus vector
    * (M = max corpus norm, a 1-row broadcast) — all augmented vectors
    * then share length M, so COSINE order over the augmented space is
    * exactly INNER-PRODUCT order over the originals, and the same
    * hyperplane-LSH tables the cosine path uses become a MIPS index.
    * Queries carry 0 in the extra coordinate, so their buckets are
    * the plain codegen'd [[graft.functions.Vectors.lshBuckets]];
    * corpus vectors bucket through the (Dim+1)-weight
    * [[graft.functions.Vectors.mipsBucket]] fold. Candidates from the
    * bucket join re-rank by EXACT raw dot, and
    * [[mipsRecall]] measures the index's health against the
    * brute-force MIPS truth — the same registered-recall discipline
    * as `sim_lsh_recall`. (The driver corpus is unit-normalized, so
    * here xe ≈ 0, MIPS coincides with cosine, and the measured recall
    * lands exactly on `sim_lsh_recall`'s numbers — the transform's
    * value shows on mixed-norm corpora, where cosine LSH without it
    * ranks the WRONG vectors, not just fewer of them.) */
  def topkMips(s: SparkSession, d: String): DataFrame = {
    val e = cached(withD(embs(s, d))
      .withColumn("x2", Vectors.dotd(col("embd"), col("embd"))))
    val m2 = e.agg(max(col("x2")).as("m2"))
    val corpus = e.crossJoin(broadcast(m2))
      .withColumn("xe", sqrt(col("m2") - col("x2")))
    val centries = corpus
      .select(col("vec_id"), posexplode(array(
        (0 until Vectors.Tables).map(t =>
          Vectors.mipsBucket(col("embd"), col("xe"), t)): _*)))
      .select(col("vec_id"), col("pos").as("tbl"), col("col").as("bucket"))
    val qentries = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id"), posexplode(Vectors.lshBuckets(col("embd"))))
      .select(col("vec_id").as("q_id"), col("pos").as("tbl"),
        col("col").as("bucket"))
    val cand = centries.join(broadcast(qentries), Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id").distinct()
    val w = Window.partitionBy("q_id").orderBy(col("score").desc, col("vec_id"))
    cand
      .join(broadcast(e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("embd").as("qv"))), "q_id")
      .join(e.select(col("vec_id"), col("embd")), "vec_id")
      .withColumn("score", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Measured MIPS-index recall vs the brute-force dot truth. */
  def mipsRecall(s: SparkSession, d: String): DataFrame =
    recallVs(topkMipsBrute(s, d), topkMips(s, d))

  /** Measured IVF recall vs the exact baseline — the nprobe-tuning
    * feedback signal, same shape as [[lshRecall]]. */
  def ivfRecall(s: SparkSession, d: String): DataFrame =
    recallVs(topkBrute(s, d), topkIvf(s, d))

  private def oCosQ = Vectors.oCos("q.embedding", "e.embedding", Vectors.Dim)

  private def oBruteSql =
    s"""SELECT q_id, vec_id, score, rn FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id, $oCosQ AS score,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $oCosQ DESC, e.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries)
       |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin

  private def oLshSql =
    s"""WITH b AS (${Vectors.oBucketCte()}),
       |cand AS (
       |  SELECT DISTINCT qb.vec_id AS q_id, eb.vec_id AS vec_id
       |  FROM b qb JOIN b eb ON qb.tbl = eb.tbl AND qb.bucket = eb.bucket
       |  WHERE qb.vec_id < $NQueries AND eb.vec_id <> qb.vec_id),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id, $oCosQ AS score
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.q_id
       |  JOIN embeddings e ON e.vec_id = cand.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= $K
       |ORDER BY q_id, rn""".stripMargin

  private def oIvfSql =
    s"""WITH reps AS (
       |  SELECT label, embedding AS rv FROM (
       |    SELECT label, embedding,
       |      row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
       |    FROM embeddings) WHERE rn = 1),
       |probed AS (
       |  SELECT q_id, label FROM (
       |    SELECT q.vec_id AS q_id, reps.label,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY ${Vectors.oCos("q.embedding", "reps.rv", Vectors.Dim)} DESC, reps.label) AS prb
       |    FROM embeddings q CROSS JOIN reps
       |    WHERE q.vec_id < $NQueries) WHERE prb <= 3),
       |scored AS (
       |  SELECT probed.q_id, e.vec_id, $oCosQ AS score
       |  FROM probed
       |  JOIN embeddings e ON e.label = probed.label
       |  JOIN embeddings q ON q.vec_id = probed.q_id
       |  WHERE e.vec_id <> probed.q_id),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= $K
       |ORDER BY q_id, rn""".stripMargin

  private def oDotQ = Vectors.oDot("q.embedding", "e.embedding", Vectors.Dim)

  private def oMipsBruteSql =
    s"""SELECT q_id, vec_id, score, rn FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id, $oDotQ AS score,
       |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $oDotQ DESC, e.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries)
       |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin

  private def oMipsSql =
    s"""WITH x2 AS MATERIALIZED (
       |  SELECT vec_id, ${Vectors.oDot("embedding", "embedding", Vectors.Dim)} AS x2
       |  FROM embeddings),
       |m AS (SELECT MAX(x2) AS m2 FROM x2),
       |aug AS MATERIALIZED (
       |  SELECT e.vec_id, e.embedding, sqrt(m.m2 - x2.x2) AS xe
       |  FROM embeddings e JOIN x2 USING (vec_id) CROSS JOIN m),
       |cb AS MATERIALIZED (
       |  SELECT vec_id, t AS tbl,
       |    ${Vectors.oMipsBucket("embedding", "xe", "t")} AS bucket
       |  FROM aug CROSS JOIN (SELECT unnest(generate_series(0, ${Vectors.Tables - 1})) AS t)),
       |qb AS MATERIALIZED (
       |  SELECT vec_id, t AS tbl, ${Vectors.oBucket("embedding", "t")} AS bucket
       |  FROM embeddings CROSS JOIN (SELECT unnest(generate_series(0, ${Vectors.Tables - 1})) AS t)
       |  WHERE vec_id < $NQueries),
       |cand AS (
       |  SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS vec_id
       |  FROM qb JOIN cb ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
       |  WHERE cb.vec_id <> qb.vec_id),
       |scored AS (
       |  SELECT cand.q_id, cand.vec_id, $oDotQ AS score
       |  FROM cand
       |  JOIN embeddings q ON q.vec_id = cand.q_id
       |  JOIN embeddings e ON e.vec_id = cand.vec_id),
       |ranked AS (
       |  SELECT q_id, vec_id, score,
       |    row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
       |  FROM scored)
       |SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= $K
       |ORDER BY q_id, rn""".stripMargin

  /** Oracle recall template: an exact top-k left-joined to an
    * approximate top-k's SQL. */
  private def oRecallVs(baseSql: String, approxSql: String): String =
    s"""SELECT b.q_id AS q_id, COUNT(*) AS k,
       |  CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
       |FROM ($baseSql) b LEFT JOIN ($approxSql) l
       |  ON b.q_id = l.q_id AND b.vec_id = l.vec_id
       |GROUP BY b.q_id ORDER BY q_id""".stripMargin

  private def oRecall(approxSql: String): String = oRecallVs(oBruteSql, approxSql)

  /** Per-label centroids (the E-step accumulator of k-means / the
    * class prototype of a nearest-centroid classifier), in long
    * format (label, dim, centroid).
    *
    * Cross-row double addition is order-dependent, and aggregation
    * order is nondeterministic under partitioning — so the components
    * are first quantized to fixed point (`floor(x · 1e7)`, exact in a
    * long) and summed EXACTLY; one double division at the end. The
    * result is deterministic across any cluster size / partitioning
    * and bit-equal in the oracle — the quantization error (≤ 1e-7
    * per component, data is O(1)) is far below any downstream
    * decision threshold.
    *
    * Scale: `posexplode` fans each row out ×Dim BEFORE the exchange,
    * but partial aggregation folds every partition down to ≤
    * |labels|·Dim rows map-side, so the shuffle carries sketches, not
    * components. */
  private def centroidRows(s: SparkSession, d: String): DataFrame =
    embs(s, d)
      .select(col("label"), posexplode(Vectors.toD(col("embedding"))))
      .groupBy(col("label"), col("pos").cast("long").as("dim"))
      .agg(sum(floor(col("col") * 1e7)).as("s"), count(lit(1)).as("n"))
      .select(col("label"), col("dim"),
        (col("s").cast("double") / col("n") / 1e7).as("centroid"))

  def centroids(s: SparkSession, d: String): DataFrame =
    centroidRows(s, d).orderBy("label", "dim")

  /** One Lloyd (k-means) assignment step: every vector is reassigned
    * to its nearest [[centroids]] centroid; output is the
    * (label, cluster) confusion matrix — |labels|² rows telling a
    * training pipeline how coherent its class partitioning is.
    *
    * Scale shape: the k·Dim centroid table broadcasts; the corpus
    * makes ONE scan, scoring each row against all k prototypes
    * map-side via dist² = ‖x‖² − 2·x·c + ‖c‖² (each term a fixed
    * left-fold, so distances — and the argmin — are deterministic and
    * oracle-exact). The per-vector argmin is `min(struct(dist,
    * clab))`, which partial aggregation collapses k-to-1 map-side —
    * the only shuffles carry ≤ N argmin rows and the k² accounting. */
  def kmeansAssign(s: SparkSession, d: String): DataFrame = {
    val cent = centroidRows(s, d)
      .groupBy(col("label").as("clab"))
      .agg(collect_list(struct(col("dim"), col("centroid"))).as("cs"))
      .select(col("clab"),
        transform(array_sort(col("cs")), x => x.getField("centroid")).as("cv"))
      .withColumn("cc", Vectors.dotd(col("cv"), col("cv")))
      .agg(collect_list(struct(col("clab"), col("cv"), col("cc"))).as("cents"))
    val vx = embs(s, d)
      .select(col("vec_id"), col("label"), Vectors.toD(col("embedding")).as("embd"))
      .withColumn("xx", Vectors.dotd(col("embd"), col("embd")))
    // map-side argmin over the one-row broadcast centroid array (the
    // kmeansLoop spelling): identical dist expression and the same
    // (dist, clab) struct order as the former min(struct) aggregate,
    // so the confusion matrix is bit-identical — but the N-row
    // Sort+Exchange+SortAggregate of the per-vector groupBy is gone;
    // the only remaining shuffle carries the ≤ |labels|² cell tallies.
    vx.crossJoin(broadcast(cent))
      .withColumn("m", array_min(transform(col("cents"), c =>
        struct(
          (col("xx") - lit(2.0) * Vectors.dotd(col("embd"), c.getField("cv"))
            + c.getField("cc")).as("dist"),
          c.getField("clab").as("clab")))))
      .groupBy(col("label"), col("m.clab").as("cluster"))
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "cluster")
  }

  /** (clab, dim, c) centroid rows → (clab, cv, cc): the dense ordered
    * component array plus its precomputed self-dot, the broadcastable
    * form every assignment step consumes. */
  private def cwOf(centRows: DataFrame): DataFrame =
    centRows
      .groupBy("clab")
      .agg(collect_list(struct(col("dim"), col("c"))).as("cs"))
      .select(col("clab"),
        transform(array_sort(col("cs")), x => x.getField("c")).as("cv"))
      .withColumn("cc", Vectors.dotd(col("cv"), col("cv")))

  /** Full Lloyd's k-means: [[KmeansRounds]] assignment/update rounds
    * seeded by the per-label mean centroids (deterministic init).
    * Output per final cluster: member count, quantized inertia
    * (Σ dist², the convergence measure), and a quantized centroid
    * checksum pinning every component of the post-update prototypes.
    *
    * Scale shape — the classic iterate-on-broadcast loop: the corpus
    * projection (embd, ‖x‖²) is cached ONCE; each round broadcasts
    * the k·Dim centroid table, scores map-side (dist² = ‖x‖² − 2·x·c
    * + ‖c‖², fixed-fold, oracle-exact), collapses the per-vector
    * argmin k-to-1 in the partial aggregate, and re-aggregates
    * centroids as quantized integer component sums — order-
    * independent, so the whole T-round trajectory is bit-reproducible
    * on both engines. Per round the shuffles carry ≤ N argmin rows
    * and k·Dim centroid sketches; the corpus itself never moves. A
    * cluster that loses all members drops out of the next round on
    * both engines identically. */
  def kmeansFull(s: SparkSession, d: String): DataFrame =
    kmeansRounds(s, d, KmeansRounds)

  /** [[kmeansFull]] with an explicit round count — exposed so the
    * spec can assert Lloyd's invariant (inertia is non-increasing in
    * the round count), i.e. that the loop genuinely optimizes. */
  private[graft] def kmeansRounds(s: SparkSession, d: String, rounds: Int): DataFrame =
    kmeansLoop(s, d, rounds,
      centroidRows(s, d)
        .select(col("label").as("clab"), col("dim"), col("centroid").as("c")))

  /** Fully UNSUPERVISED k-means: k = [[KmeansSeeds]] seed vectors
    * chosen by a deterministic hash rank over vec_ids (multiplicative
    * hash mod P is injective below P, so ranks are tie-free) — no
    * label column consulted anywhere, answering the "k-means only
    * works because labels exist" objection to [[kmeansFull]]'s
    * label-mean seeding. Seed selection plans as
    * TakeOrderedAndProject (per-partition top-k merge, never a
    * global sort); the rank-within-8 window runs over 8 rows. */
  def kmeansSeeded(s: SparkSession, d: String): DataFrame = {
    val h = pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod))
    val picked = embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .orderBy(h, col("vec_id"))
      .limit(KmeansSeeds)
    val w = Window.orderBy(pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod)), col("vec_id"))
    val cent0 = picked
      .withColumn("clab", (row_number().over(w) - 1).cast("long"))
      .select(col("clab"), posexplode(col("embd")))
      .select(col("clab"), col("pos").cast("long").as("dim"), col("col").as("c"))
    kmeansLoop(s, d, KmeansRounds, cent0)
  }

  private def kmeansLoop(
      s: SparkSession, d: String, rounds: Int, cent0: DataFrame): DataFrame = {
    val vx = cached(embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .withColumn("xx", Vectors.dotd(col("embd"), col("embd"))))
    // one assignment step: nearest centroid per vector, computed
    // ENTIRELY map-side — the k centroids collapse to one array row
    // that broadcasts, and the per-vector argmin is array_min over the
    // per-centroid (dist, clab) structs. Same total order as the
    // previous min(struct(dist, clab)) aggregate (field-by-field
    // struct comparison, ties break on cluster id), and each dist is
    // the identical ‖x‖² − 2·x·c + ‖c‖² expression, so the argmin is
    // bit-identical and order-independent even though collect_list's
    // array order is not deterministic. The previous aggregate
    // spelling planned as BroadcastNestedLoopJoin (k× row expansion)
    // → Sort → Exchange → SortAggregate (min-of-struct is not
    // hash-aggregable) — a full shuffle of N embedding-carrying rows
    // PER ROUND; this spelling shuffles nothing in the assignment.
    // PRECONDITION: cw is non-empty (update() always emits ≥1 cluster
    // and every seed frame is literal). With an EMPTY cw the old
    // crossJoin(broadcast(cw)) produced zero rows, while collect_list
    // over zero rows yields one empty-array row and array_min returns
    // null — N rows with null cl/dist. Don't reuse this helper on a
    // possibly-empty centroid frame without filtering m.isNotNull.
    def assign(cw: DataFrame): DataFrame = {
      val cents = cw.agg(
        collect_list(struct(col("clab"), col("cv"), col("cc"))).as("cents"))
      vx.crossJoin(broadcast(cents))
        .withColumn("m", array_min(transform(col("cents"), c =>
          struct(
            (col("xx") - lit(2.0) * Vectors.dotd(col("embd"), c.getField("cv"))
              + c.getField("cc")).as("dist"),
            c.getField("clab").as("clab")))))
        .select(col("vec_id"), col("m.clab").as("cl"), col("m.dist").as("dist"), col("embd"))
    }
    // one update step: quantized-exact component means per cluster
    def update(assigned: DataFrame): DataFrame =
      assigned.select(col("cl"), posexplode(col("embd")))
        .groupBy(col("cl").as("clab"), col("pos").cast("long").as("dim"))
        .agg(sum(floor(col("col") * 1e7)).as("s"), count(lit(1)).as("n"))
        .select(col("clab"), col("dim"),
          (col("s").cast("double") / col("n") / 1e7).as("c"))
    var cw = cwOf(cent0)
    for (r <- 1 until rounds) {
      cw = cwOf(update(assign(cw)))
      // parquet-leaf cut every CkptEvery rounds (see Core.CkptEvery):
      // k rows of (clab, cv, cc) — the write is trivia, the bounded
      // plan depth is the point. Never fires at KmeansRounds/PqRounds.
      if (r % graft.Core.CkptEvery == 0) cw = graft.Core.ckptRound(cw, "graft-km-ckpt")
    }
    val fin = cached(assign(cw)) // final assignment feeds stats AND centroids
    val stats = fin.groupBy(col("cl").as("cluster"))
      .agg(count(lit(1)).as("n_vectors"),
        (sum(floor(col("dist") * 1e7)).cast("double") / 1e7).as("inertia"))
    val checksum = update(fin)
      .groupBy(col("clab").as("cluster"))
      .agg(sum(floor(col("c") * 1e7)).cast("long").as("centroid_checksum"))
    stats.join(checksum, "cluster").orderBy("cluster")
  }

  private val KmeansRounds = 3
  private val KmeansSeeds = 8

  // -------------------------------------------------------------------
  // Product quantization (PQ) — the memory-bound ANN scale path
  // -------------------------------------------------------------------

  private val PqM = 8                      // subspaces
  private val PqSubDim = Vectors.Dim / PqM // dims per subspace
  private val PqK = 16                     // codewords per subspace
  private val PqRounds = 2                 // Lloyd updates after seeding
  private val PqPool = 50                  // ADC shortlist size for re-rank

  /** Each vector exploded into its M subvectors:
    * (vec_id, sub, sv, xx) with xx = ‖sv‖² precomputed. */
  private def subVectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .withColumn("sub", explode(sequence(lit(0L), lit(PqM - 1L))))
      .select(col("vec_id"), col("sub"),
        slice(col("embd"), (col("sub") * PqSubDim + 1).cast("int"), lit(PqSubDim)).as("sv"))
      .withColumn("xx", Vectors.dotd(col("sv"), col("sv")))

  /** (sub, code, cv, cc): one codebook row per subspace codeword. */
  private def pqCw(centRows: DataFrame): DataFrame =
    centRows
      .groupBy("sub", "code")
      .agg(collect_list(struct(col("dim"), col("c"))).as("cs"))
      .select(col("sub"), col("code"),
        transform(array_sort(col("cs")), x => x.getField("c")).as("cv"))
      .withColumn("cc", Vectors.dotd(col("cv"), col("cv")))

  /** Nearest codeword per (vector, subspace) — all M subspace
    * assignments in ONE pass: the codebook (M·k rows) broadcasts,
    * distances fold map-side (dist² = ‖x‖² − 2·x·c + ‖c‖², the
    * oracle-exact shape), and partial aggregation collapses the
    * k-way argmin before the exchange. */
  private def pqAssign(sv: DataFrame, cw: DataFrame): DataFrame =
    sv.join(broadcast(cw), "sub")
      .withColumn("dist",
        col("xx") - lit(2.0) * Vectors.dotd(col("sv"), col("cv")) + col("cc"))
      .groupBy("vec_id", "sub")
      .agg(min(struct(col("dist"), col("code"))).as("m"), first("sv").as("sv"))
      .select(col("vec_id"), col("sub"), col("m.code").as("code"), col("sv"))

  /** Quantized-exact codeword update (per sub, code, within-dim). */
  private def pqUpdate(assigned: DataFrame): DataFrame =
    assigned.select(col("sub"), col("code"), posexplode(col("sv")))
      .groupBy(col("sub"), col("code"), col("pos").cast("long").as("dim"))
      .agg(sum(floor(col("col") * 1e7)).as("s"), count(lit(1)).as("n"))
      .select(col("sub"), col("code"), col("dim"),
        (col("s").cast("double") / col("n") / 1e7).as("c"))

  /** The shared product-quantization pipeline up to ADC scores —
    * the method that makes billion-vector ANN memory-bound feasible:
    * vectors compress to M small codes (here 8×4 bits = 4 bytes vs
    * 64 floats = 256 bytes, a 64× index shrink), and queries never
    * touch raw corpus vectors at SCORING time.
    *
    * Training: M per-subspace k-means codebooks (k = [[PqK]]), seeded
    * by the deterministic hash-rank vectors ([[kmeansSeeded]]'s
    * trick) + [[PqRounds]] quantized-exact Lloyd updates — all M
    * trainings run in the SAME plan with `sub` as a key column.
    * Encoding: one corpus pass against the broadcast codebook
    * (map-side argmin). Query: per (query, sub, codeword) distance
    * table (M·k rows per query, broadcast), then score =
    * Σ_sub lut[sub, code(x, sub)] — a broadcast equi-join on
    * (sub, code) + an integer partial-sum aggregate. LUT entries are
    * quantized to integer 1e-7 units so the M-way sums are
    * order-independent longs, bit-equal in the oracle.
    *
    * Scale: SCORING never shuffles raw vectors — only codes and
    * integer partial sums move; the |queries|·N partial-sum stream is
    * the same shape every ADC implementation scans. TRAINING's
    * argmin exchange does carry (vec, sub, subvector) rows (the
    * update step needs each subvector next to its winning code); at
    * 100 TB codebooks train on a bounded sample — the standard PQ
    * posture — and encoding stays a map-side pass either way. The
    * codes table IS the index, 4 bytes/vector. */
  private def pqScores(s: SparkSession, d: String): DataFrame = {
    val sv = cached(subVectors(embs(s, d)))
    val h = pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod))
    val seeds = embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .orderBy(h, col("vec_id"))
      .limit(PqK)
    val w = Window.orderBy(
      pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod)), col("vec_id"))
    val cw0 = seeds
      .withColumn("code", (row_number().over(w) - 1).cast("long"))
      .withColumn("sub", explode(sequence(lit(0L), lit(PqM - 1L))))
      .select(col("sub"), col("code"),
        slice(col("embd"), (col("sub") * PqSubDim + 1).cast("int"), lit(PqSubDim)).as("cv"))
      .withColumn("cc", Vectors.dotd(col("cv"), col("cv")))
    var cw = cw0
    for (_ <- 1 to PqRounds) cw = pqCw(pqUpdate(pqAssign(sv, cw)))
    val codes = pqAssign(sv, cw).select("vec_id", "sub", "code")
    val lut = sv.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("sub"), col("sv").as("qv"), col("xx").as("qxx"))
      .join(broadcast(cw), "sub")
      .withColumn("qd",
        col("qxx") - lit(2.0) * Vectors.dotd(col("qv"), col("cv")) + col("cc"))
      .select(col("q_id"), col("sub"), col("code"),
        floor(col("qd") * 1e7).cast("long").as("lq"))
    codes.join(broadcast(lut), Seq("sub", "code"))
      .filter(col("vec_id") =!= col("q_id"))
      .groupBy("q_id", "vec_id")
      .agg(sum(col("lq")).as("adcq"))
  }

  /** Pure ADC top-k — pins every stage of the PQ pipeline (codebook
    * training, encoding, LUT, integer score sums) through the hash
    * check. This is the quantization-fidelity signal; the RETRIEVAL
    * path a user runs is [[pqRerank]]. */
  def pqAdc(s: SparkSession, d: String): DataFrame = {
    val rw = Window.partitionBy("q_id").orderBy(col("adcq"), col("vec_id"))
    pqScores(s, d)
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"),
        (col("adcq").cast("double") / 1e7).as("adc"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Two-stage PQ retrieval — the production ANN serving shape: the
    * compressed index (ADC) shortlists [[PqPool]] candidates per
    * query, then exact L2 re-ranks ONLY the shortlist to top-k. At
    * scale the expensive exact arithmetic touches PqPool raw vectors
    * per query instead of N; the shortlist size is the recall/cost
    * dial ([[pqRecall]] measures where it sits). */
  def pqRerank(s: SparkSession, d: String): DataFrame = {
    val pw = Window.partitionBy("q_id").orderBy(col("adcq"), col("vec_id"))
    val pool = pqScores(s, d)
      .withColumn("prn", row_number().over(pw))
      .filter(col("prn") <= PqPool)
      .select("q_id", "vec_id")
    val e = embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .withColumn("xx", Vectors.dotd(col("embd"), col("embd")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embd").as("qv"), col("xx").as("qxx"))
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    pool
      .join(e, "vec_id")
      .join(broadcast(q), "q_id")
      .withColumn("dist",
        col("qxx") - lit(2.0) * Vectors.dotd(col("qv"), col("embd")) + col("xx"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select(col("q_id"), col("vec_id"), col("dist"), col("rn"))
      .orderBy("q_id", "rn")
  }

  /** Exact-L2 top-k baseline (same (‖q‖² − 2·q·x) + ‖x‖² arithmetic
    * as the ADC folds) — what PQ approximates; feeds [[pqRecall]]. */
  private def topkL2(s: SparkSession, d: String): DataFrame = {
    val e = embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("embd"))
      .withColumn("xx", Vectors.dotd(col("embd"), col("embd")))
    val q = e.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("embd").as("qv"), col("xx").as("qxx"))
    val w = Window.partitionBy("q_id").orderBy(col("dist"), col("vec_id"))
    e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("dist",
        col("qxx") - lit(2.0) * Vectors.dotd(col("qv"), col("embd")) + col("xx"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= K)
      .select("q_id", "vec_id")
  }

  /** Measured recall of the re-ranked PQ retrieval vs the exact-L2
    * top-k — the health metric that moves when M / k / training
    * rounds / shortlist size move. */
  def pqRecall(s: SparkSession, d: String): DataFrame =
    recallVs(topkL2(s, d), pqRerank(s, d))

  /** Oracle CTE: the quantized-centroid rows of [[centroidRows]]. */
  private val oCentCte =
    s"""cent AS (
       |  SELECT label AS clab, dim,
       |    CAST(SUM(CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 10000000.0) AS BIGINT)) AS DOUBLE)
       |      / COUNT(*) / 10000000.0 AS c
       |  FROM embeddings
       |  CROSS JOIN (SELECT unnest(generate_series(0, ${Vectors.Dim - 1})) AS dim) dims
       |  GROUP BY label, dim)""".stripMargin

  /** Oracle fold: `acc + f(k)` over 1-based dims, the [[Vectors.dotd]]
    * sequence. */
  private def oFold(term: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, ${Vectors.Dim}), " +
      s"k -> $term)), (x, y) -> x + y)"

  /** Symmetric int8 quantization of the embedding column — the
    * compression step an ANN serving tier applies before indexing
    * (4× smaller vectors, SIMD-friendly integer dot products). Per
    * vector: scale = max |x|, q_i = floor(x_i·127/scale + 0.5); the
    * result columns are the scale plus integer digests (sum/min/max)
    * of the quantized vector, which pin every q_i through exact
    * arithmetic both engines reproduce (`floor(+0.5)` instead of
    * `round`, whose half-way rule differs across engines). Map-side
    * per-row work — no shuffle, scales linearly. */
  def quantizeInt8(s: SparkSession, d: String): DataFrame =
    embs(s, d)
      .withColumn("e", Vectors.toD(col("embedding")))
      .withColumn("scale", array_max(transform(col("e"), x => abs(x))))
      .filter(col("scale") > 0)
      .withColumn("q", transform(col("e"),
        x => floor(x * lit(127.0) / col("scale") + lit(0.5))))
      .select(col("vec_id"), col("scale"),
        aggregate(col("q"), lit(0L), (a, x) => a + x).as("q_sum"),
        array_min(col("q")).as("q_min"), array_max(col("q")).as("q_max"))
      .orderBy("vec_id")

  /** One oracle Lloyd round: score → argmin-assign → quantized
    * centroid update, mirroring [[kmeansFull]]'s `assign`/`update`
    * with identical arithmetic shape. */
  private def oKmeansRound(i: Int): String =
    s"""scored$i AS MATERIALIZED (
       |  SELECT vec_id, embedding, clab,
       |    (xx - 2.0 * ${oFold("CAST(embedding[k] AS DOUBLE) * cv[k]")}) + cc AS dist
       |  FROM vx CROSS JOIN cw$i),
       |assigned$i AS MATERIALIZED (
       |  SELECT vec_id, embedding, clab, dist,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clab) AS rn
       |  FROM scored$i),
       |cent${i + 1} AS MATERIALIZED (
       |  SELECT clab, dim,
       |    CAST(SUM(CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 10000000.0) AS BIGINT)) AS DOUBLE)
       |      / COUNT(*) / 10000000.0 AS c
       |  FROM assigned$i CROSS JOIN dims WHERE rn = 1 GROUP BY clab, dim),
       |carr${i + 1} AS MATERIALIZED (SELECT clab, list(c ORDER BY dim) AS cv FROM cent${i + 1} GROUP BY clab),
       |cw${i + 1} AS MATERIALIZED (SELECT clab, cv, ${oFold("cv[k] * cv[k]")} AS cc FROM carr${i + 1})""".stripMargin

  /** The full oracle replay parameterized by the `cent0` seed CTE —
    * shared by the label-mean and hash-seeded variants. */
  private def oKmeansChain(cent0Cte: String): String = {
    val rounds = (0 until KmeansRounds).map(oKmeansRound).mkString(",\n")
    val last = KmeansRounds - 1
    s"""WITH dims AS (SELECT unnest(generate_series(0, ${Vectors.Dim - 1})) AS dim),
       |vx AS MATERIALIZED (
       |  SELECT vec_id, embedding,
       |    ${Vectors.oDot("embedding", "embedding", Vectors.Dim)} AS xx
       |  FROM embeddings),
       |$cent0Cte,
       |carr0 AS MATERIALIZED (SELECT clab, list(c ORDER BY dim) AS cv FROM cent0 GROUP BY clab),
       |cw0 AS MATERIALIZED (SELECT clab, cv, ${oFold("cv[k] * cv[k]")} AS cc FROM carr0),
       |$rounds,
       |stats AS (
       |  SELECT clab AS cluster, COUNT(*) AS n_vectors,
       |    CAST(SUM(CAST(floor(dist * 10000000.0) AS BIGINT)) AS DOUBLE) / 10000000.0 AS inertia
       |  FROM assigned$last WHERE rn = 1 GROUP BY clab),
       |chk AS (
       |  SELECT clab AS cluster,
       |    CAST(SUM(CAST(floor(c * 10000000.0) AS BIGINT)) AS BIGINT) AS centroid_checksum
       |  FROM cent$KmeansRounds GROUP BY clab)
       |SELECT cluster, n_vectors, inertia, centroid_checksum
       |FROM stats JOIN chk USING (cluster) ORDER BY cluster""".stripMargin
  }

  private val oKmeansFull: String = oKmeansChain(
    s"""cent0 AS (
       |  SELECT label AS clab, dim,
       |    CAST(SUM(CAST(floor(CAST(embedding[dim + 1] AS DOUBLE) * 10000000.0) AS BIGINT)) AS DOUBLE)
       |      / COUNT(*) / 10000000.0 AS c
       |  FROM embeddings CROSS JOIN dims GROUP BY label, dim)""".stripMargin)

  private val oKmeansSeeded: String = oKmeansChain(
    s"""cent0 AS (
       |  SELECT clab, dim, CAST(embedding[dim + 1] AS DOUBLE) AS c
       |  FROM (
       |    SELECT embedding,
       |      row_number() OVER (ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id) - 1 AS clab
       |    FROM embeddings
       |    ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id
       |    LIMIT $KmeansSeeds) seeds
       |  CROSS JOIN dims)""".stripMargin)

  /** Oracle fold over the PqSubDim-element double lists (already
    * cast at CTE-build time, so terms carry no CASTs). */
  private def oFoldSub(term: String): String =
    s"list_reduce(list_prepend(0.0, list_transform(generate_series(1, $PqSubDim), " +
      s"k -> $term)), (x, y) -> x + y)"

  /** One oracle PQ training round: assign every (vector, subspace)
    * to its nearest `cw$i` codeword, recompute quantized means →
    * `cw${i+1}`. */
  private def oPqRound(i: Int): String =
    s"""a$i AS MATERIALIZED (
       |  SELECT vec_id, sub, sv, code,
       |    row_number() OVER (PARTITION BY vec_id, sub ORDER BY dist, code) AS rn
       |  FROM (
       |    SELECT s.vec_id, s.sub, s.sv, c.code,
       |      (s.xx - 2.0 * ${oFoldSub("s.sv[k] * c.cv[k]")}) + c.cc AS dist
       |    FROM sv s JOIN cw$i c ON s.sub = c.sub)),
       |cent${i + 1} AS MATERIALIZED (
       |  SELECT sub, code, dim,
       |    CAST(SUM(CAST(floor(sv[dim + 1] * 10000000.0) AS BIGINT)) AS DOUBLE)
       |      / COUNT(*) / 10000000.0 AS c
       |  FROM a$i CROSS JOIN sdims WHERE rn = 1 GROUP BY sub, code, dim),
       |carr${i + 1} AS MATERIALIZED (SELECT sub, code, list(c ORDER BY dim) AS cv FROM cent${i + 1} GROUP BY sub, code),
       |cw${i + 1} AS MATERIALIZED (SELECT sub, code, cv, ${oFoldSub("cv[k] * cv[k]")} AS cc FROM carr${i + 1})""".stripMargin

  /** The shared PQ replay prefix: subvectors → hash seeds →
    * [[PqRounds]] Lloyd updates → final codebook → codes + query LUT
    * → integer ADC sums. Mirrors [[pqScores]] CTE-for-stage. */
  private val oPqAdcCte: String = {
    val rounds = (0 until PqRounds).map(oPqRound).mkString(",\n")
    s"""subs AS (SELECT unnest(generate_series(0, ${PqM - 1})) AS sub),
       |sdims AS (SELECT unnest(generate_series(0, ${PqSubDim - 1})) AS dim),
       |svx AS MATERIALIZED (
       |  SELECT vec_id, sub,
       |    list_transform(generate_series(1, $PqSubDim),
       |      k -> CAST(embedding[sub * $PqSubDim + k] AS DOUBLE)) AS sv
       |  FROM embeddings CROSS JOIN subs),
       |sv AS MATERIALIZED (SELECT vec_id, sub, sv, ${oFoldSub("sv[k] * sv[k]")} AS xx FROM svx),
       |seeds AS (
       |  SELECT embedding,
       |    row_number() OVER (ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id) - 1 AS code
       |  FROM embeddings
       |  ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id
       |  LIMIT $PqK),
       |cw0arr AS MATERIALIZED (
       |  SELECT sub, code,
       |    list_transform(generate_series(1, $PqSubDim),
       |      k -> CAST(embedding[sub * $PqSubDim + k] AS DOUBLE)) AS cv
       |  FROM seeds CROSS JOIN subs),
       |cw0 AS MATERIALIZED (SELECT sub, code, cv, ${oFoldSub("cv[k] * cv[k]")} AS cc FROM cw0arr),
       |$rounds,
       |codes AS MATERIALIZED (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT s.vec_id, s.sub, c.code,
       |      row_number() OVER (PARTITION BY s.vec_id, s.sub ORDER BY
       |        (s.xx - 2.0 * ${oFoldSub("s.sv[k] * c.cv[k]")}) + c.cc, c.code) AS rn
       |    FROM sv s JOIN cw$PqRounds c ON s.sub = c.sub) WHERE rn = 1),
       |lut AS MATERIALIZED (
       |  SELECT s.vec_id AS q_id, s.sub, c.code,
       |    CAST(floor(((s.xx - 2.0 * ${oFoldSub("s.sv[k] * c.cv[k]")}) + c.cc)
       |      * 10000000.0) AS BIGINT) AS lq
       |  FROM sv s JOIN cw$PqRounds c ON s.sub = c.sub
       |  WHERE s.vec_id < $NQueries),
       |adc AS (
       |  SELECT l.q_id, co.vec_id, SUM(l.lq) AS adcq
       |  FROM codes co JOIN lut l ON co.sub = l.sub AND co.code = l.code
       |  WHERE co.vec_id <> l.q_id
       |  GROUP BY 1, 2)""".stripMargin
  }

  private val oPqAdcSql: String =
    s"""WITH $oPqAdcCte
       |SELECT q_id, vec_id, CAST(adcq AS DOUBLE) / 10000000.0 AS adc, rn
       |FROM (
       |  SELECT q_id, vec_id, adcq,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adcq, vec_id) AS rn
       |  FROM adc)
       |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin

  /** Exact-L2 baseline in the same ((‖q‖² − 2·q·x) + ‖x‖²) shape. */
  private val oL2Sql: String = {
    val qq = Vectors.oDot("q.embedding", "q.embedding", Vectors.Dim)
    val qe = Vectors.oDot("q.embedding", "e.embedding", Vectors.Dim)
    val ee = Vectors.oDot("e.embedding", "e.embedding", Vectors.Dim)
    s"""SELECT q_id, vec_id FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ($qq - 2.0 * $qe) + $ee, e.vec_id) AS rn
       |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
       |  WHERE q.vec_id < $NQueries)
       |WHERE rn <= $K""".stripMargin
  }

  private val oPqRerankSql: String = {
    val qq = Vectors.oDot("q.embedding", "q.embedding", Vectors.Dim)
    val qe = Vectors.oDot("q.embedding", "e.embedding", Vectors.Dim)
    val ee = Vectors.oDot("e.embedding", "e.embedding", Vectors.Dim)
    s"""WITH $oPqAdcCte,
       |pool AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT q_id, vec_id,
       |      row_number() OVER (PARTITION BY q_id ORDER BY adcq, vec_id) AS prn
       |    FROM adc) WHERE prn <= $PqPool)
       |SELECT q_id, vec_id, dist, rn FROM (
       |  SELECT p.q_id AS q_id, p.vec_id AS vec_id,
       |    ($qq - 2.0 * $qe) + $ee AS dist,
       |    row_number() OVER (PARTITION BY p.q_id
       |      ORDER BY ($qq - 2.0 * $qe) + $ee, p.vec_id) AS rn
       |  FROM pool p
       |  JOIN embeddings e ON e.vec_id = p.vec_id
       |  JOIN embeddings q ON q.vec_id = p.q_id)
       |WHERE rn <= $K ORDER BY q_id, rn""".stripMargin
  }

  // -------------------------------------------------------------------
  // SemDeDup — semantic near-dup pruning inside unsupervised clusters
  // -------------------------------------------------------------------

  private val SemDedupT = 0.4

  /** SemDeDup-style semantic dedup: cluster first, compare only
    * within a cluster. Every embedding is assigned to its nearest of
    * [[KmeansSeeds]] deterministic hash-rank seed vectors (the
    * unsupervised seeding [[kmeansSeeded]] uses), then in-cluster
    * pairs at cosine ≥ [[SemDedupT]] mark the higher vec_id as a
    * prune candidate (keep-lowest-id policy). Output per pruned
    * vector: its cluster, how many lower-id near-dups it saw, and
    * the id it dedups to (the minimum such neighbor).
    *
    * Scale: the global all-pairs comparison never happens — the
    * cluster assignment is one broadcast of k·Dim seed floats plus a
    * map-side argmin (partial-agg collapses the k candidate rows
    * before the exchange), and the pair stage is an equi-join keyed
    * by cluster, quadratic only within a cluster. At 100 TB k grows
    * with the corpus (SemDeDup runs ~100k clusters for billions of
    * vectors) so blocks stay near-constant-size; AQE's skew-join
    * splitting handles any oversized cluster. Same blocking contract
    * as [[Dedup.embeddingLsh]]'s hyperplane buckets, but with the
    * cluster granularity tunable independently of recall. */
  def semanticDedup(s: SparkSession, d: String): DataFrame = {
    val e = withD(embs(s, d))
      .withColumn("xx", Vectors.dotd(col("embd"), col("embd")))
    val hh = pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod))
    val w = Window.orderBy(
      pmod(col("vec_id") * lit(2654435761L), lit(graft.Core.HashMod)), col("vec_id"))
    val seeds = embs(s, d)
      .select(col("vec_id"), Vectors.toD(col("embedding")).as("sv"))
      .orderBy(hh, col("vec_id"))
      .limit(KmeansSeeds)
      .withColumn("clab", (row_number().over(w) - 1).cast("long"))
      .withColumn("cc", Vectors.dotd(col("sv"), col("sv")))
      .select("clab", "sv", "cc")
    // cached: both sides of the in-cluster self-join read the same
    // assignment; without it the argmin (and its exchange) runs twice
    val assigned = cached(
      e.crossJoin(broadcast(seeds))
        .withColumn("dist",
          col("xx") - lit(2.0) * Vectors.dotd(col("embd"), col("sv")) + col("cc"))
        .groupBy("vec_id")
        .agg(min(struct(col("dist"), col("clab"))).as("m"),
          first("embd").as("embd"), first("nrm").as("nrm"))
        .select(col("vec_id"), col("m.clab").as("cluster"), col("embd"), col("nrm")))
    assigned
      .join(assigned.select(col("cluster"), col("vec_id").as("nb_id"),
        col("embd").as("nbv"), col("nrm").as("nbn")), "cluster")
      .filter(col("nb_id") < col("vec_id"))
      .withColumn("cos_sim",
        Vectors.dotd(col("embd"), col("nbv")) / (col("nrm") * col("nbn")))
      .filter(col("cos_sim") >= SemDedupT)
      .groupBy("cluster", "vec_id")
      .agg(count(lit(1)).as("n_close_lower"), min("nb_id").as("kept_as"))
      .orderBy("vec_id")
  }

  private val oSemanticDedupSql: String =
    s"""WITH e AS (SELECT vec_id, embedding,
       |    ${Vectors.oDot("embedding", "embedding", Vectors.Dim)} AS xx
       |  FROM embeddings),
       |seeds AS (
       |  SELECT row_number() OVER (
       |      ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id) - 1 AS clab,
       |    embedding AS sv
       |  FROM embeddings
       |  ORDER BY (vec_id * 2654435761) % ${graft.Core.HashMod}, vec_id
       |  LIMIT $KmeansSeeds),
       |sw AS (SELECT clab, sv, ${Vectors.oDot("sv", "sv", Vectors.Dim)} AS cc FROM seeds),
       |scored AS (
       |  SELECT e.vec_id, e.embedding, sw.clab,
       |    (e.xx - 2.0 * ${Vectors.oDot("e.embedding", "sw.sv", Vectors.Dim)}) + sw.cc AS dist
       |  FROM e CROSS JOIN sw),
       |asg AS (
       |  SELECT vec_id, embedding, clab,
       |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clab) AS rn
       |  FROM scored),
       |a AS (SELECT vec_id, clab AS cluster, embedding FROM asg WHERE rn = 1),
       |pr AS (
       |  SELECT x.cluster, x.vec_id, y.vec_id AS nb_id,
       |    ${Vectors.oCos("x.embedding", "y.embedding", Vectors.Dim)} AS cos_sim
       |  FROM a x JOIN a y ON x.cluster = y.cluster AND y.vec_id < x.vec_id)
       |SELECT cluster, vec_id, COUNT(*) AS n_close_lower, MIN(nb_id) AS kept_as
       |FROM pr WHERE cos_sim >= $SemDedupT
       |GROUP BY cluster, vec_id ORDER BY vec_id""".stripMargin

  // -------------------------------------------------------------------
  // Hybrid retrieval — BM25 + embedding legs fused by reciprocal rank
  // -------------------------------------------------------------------

  private val RrfK = 60
  private val RrfLeg = 20
  private val RrfOut = 10

  /** Hybrid search by reciprocal-rank fusion: the lexical leg is the
    * BM25 top-[[RrfLeg]] shortlist ([[TextAnalysis.bm25]]), the
    * semantic leg is the cosine top-[[RrfLeg]] against a query vector
    * (vec 0's embedding); each doc scores
    * Σ_leg 1/([[RrfK]] + rank), absent legs contributing 0 — the
    * standard fusion that needs no score calibration between
    * incomparable scales (BM25 weights vs cosine).
    *
    * Scale: both legs are top-k shortlists, never full rankings — the
    * semantic leg plans as broadcast-query scan + TakeOrderedAndProject
    * (per-partition heaps, no global sort), the lexical leg is the
    * filtered-aggregation BM25 plan; only the two k-row shortlists
    * meet in the fusion join, so rank assignment (a window over ≤ k
    * rows) and the full-outer fusion are driver-scale no matter the
    * corpus size. */
  def hybridRrf(s: SparkSession, d: String): DataFrame = {
    val lexW = Window.orderBy(col("score").desc, col("doc_id"))
    val lex = TextAnalysis.bm25(s, d)
      .select(col("doc_id"), col("score"))
      .withColumn("lex_rank", row_number().over(lexW))
      .select("doc_id", "lex_rank")
    val e = withD(embs(s, d))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embd").as("qv"), col("nrm").as("qn"))
    val semW = Window.orderBy(col("score").desc, col("doc_id"))
    val sem = e.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .withColumn("score",
        Vectors.dotd(col("embd"), col("qv")) / (col("nrm") * col("qn")))
      .select(col("vec_id").as("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RrfLeg)
      .withColumn("sem_rank", row_number().over(semW))
      .select("doc_id", "sem_rank")
    lex.join(sem, Seq("doc_id"), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (lit(RrfK) + col("lex_rank")), lit(0.0))
          + coalesce(lit(1.0) / (lit(RrfK) + col("sem_rank")), lit(0.0)))
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(RrfOut)
      .select("doc_id", "lex_rank", "sem_rank", "rrf_score")
  }

  private val oHybridRrfSql: String =
    s"""WITH ${TextAnalysis.oBm25Cte},
       |lexall AS (SELECT doc_id, (w_table + w_spark + w_query) AS score FROM p),
       |lex AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
       |  FROM lexall ORDER BY score DESC, doc_id LIMIT $RrfLeg),
       |qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
       |semall AS (
       |  SELECT e.vec_id AS doc_id, ${Vectors.oCos("e.embedding", "qv.q", Vectors.Dim)} AS score
       |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0),
       |sem AS (
       |  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS sem_rank
       |  FROM semall ORDER BY score DESC, doc_id LIMIT $RrfLeg),
       |f AS (
       |  SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id, lex_rank, sem_rank
       |  FROM lex FULL OUTER JOIN sem ON lex.doc_id = sem.doc_id)
       |SELECT doc_id, lex_rank, sem_rank,
       |  (COALESCE(CAST(1 AS DOUBLE) / ($RrfK + lex_rank), CAST(0 AS DOUBLE))
       |   + COALESCE(CAST(1 AS DOUBLE) / ($RrfK + sem_rank), CAST(0 AS DOUBLE))) AS rrf_score
       |FROM f ORDER BY rrf_score DESC, doc_id LIMIT $RrfOut""".stripMargin

  private val oPqRecallSql: String =
    s"""SELECT b.q_id AS q_id, COUNT(*) AS k,
       |  CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |  CAST(SUM(CASE WHEN l.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS recall
       |FROM ($oL2Sql) b LEFT JOIN ($oPqRerankSql) l
       |  ON b.q_id = l.q_id AND b.vec_id = l.vec_id
       |GROUP BY b.q_id ORDER BY q_id""".stripMargin

  private val MmrShort = 16
  private val MmrK = 8

  /** Maximal Marginal Relevance reranking (Carbonell & Goldstein,
    * SIGIR'98) — the diversity stage a retrieval pipeline runs on its
    * shortlist: greedily pick the candidate maximizing
    * λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s) with λ = 1/2 (a
    * power of two, exactly representable), so near-duplicates of an
    * already-selected result are demoted even when their raw
    * relevance is high. Selection is inherently sequential; each of
    * the [[MmrK]] rounds reads ONE row back (the round's winner — the
    * BPE-winner loop-control precedent) so the per-round plans stay
    * flat LocalTableScans instead of a 2^rounds self-referencing
    * tree, while scoring itself stays distributed over the cached
    * shortlist frames. Ties break to the smaller vec_id; every
    * similarity is the shared left-fold dot, so both engines walk the
    * identical greedy trajectory.
    *
    * Scale: the corpus pass is [[topkBrute]]'s broadcast-query scan
    * (top-[[MmrShort]] by exact cosine); everything after is
    * quadratic ONLY in the shortlist (16² pair sims) — the declared
    * in-shortlist cost every MMR implementation pays. */
  def mmrRerank(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = withD(embs(s, d))
    val q = e.filter(col("vec_id") === 0)
      .select(col("embd").as("qv"), col("nrm").as("qn"))
    val short = cached(e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= 0)
      .withColumn("dp", Vectors.dotd(col("qv"), col("embd")))
      .withColumn("rel", score)
      .orderBy(col("rel").desc, col("vec_id"))
      .limit(MmrShort)
      .select(col("vec_id"), col("embd"), col("nrm"), col("rel")))
    val simmat = cached(short
      .select(col("vec_id").as("a"), col("embd").as("ea"), col("nrm").as("na"))
      .crossJoin(short.select(col("vec_id").as("b"), col("embd").as("eb"),
        col("nrm").as("nb")))
      .filter(col("a") =!= col("b"))
      .select(col("a"), col("b"),
        (Vectors.dotd(col("ea"), col("eb")) / (col("na") * col("nb")))
          .as("sim")))
    val first = short.orderBy(col("rel").desc, col("vec_id")).limit(1)
      .select(col("vec_id"), col("rel")).collect().head
    var picks = Vector((1, first.getLong(0), first.getDouble(1),
      first.getDouble(1)))
    for (r <- 2 to MmrK) {
      val ids = picks.map(_._2)
      val pick = short
        .filter(!col("vec_id").isInCollection(ids))
        .join(simmat.filter(col("b").isInCollection(ids))
          .groupBy(col("a").as("vec_id")).agg(max("sim").as("msim")),
          "vec_id")
        .select(col("vec_id"), col("rel"),
          (col("rel") * 0.5 - col("msim") * 0.5).as("mmr_score"))
        .orderBy(col("mmr_score").desc, col("vec_id")).limit(1)
        .collect().head
      picks :+= ((r, pick.getLong(0), pick.getDouble(1), pick.getDouble(2)))
    }
    picks.toDF("rank", "vec_id", "rel", "mmr_score").orderBy("rank")
  }

  val queries: Seq[Q] = Seq(
    // oracle: the same greedy trajectory unrolled — shortlist, pair
    // sims, then MmrK selection rounds as MATERIALIZED CTEs (each
    // round references its predecessor twice — remaining filter and
    // max-sim — the inlining-explosion class)
    Q("sim_rerank_mmr", mmrRerank, Some {
      val oCosE = Vectors.oCos("a.embedding", "b.embedding", Vectors.Dim)
      val rounds = (2 to MmrK).map { r =>
        s"""s$r AS MATERIALIZED (
           |  SELECT c.vec_id, c.rel, $r AS rank,
           |    c.rel * 0.5 - m.msim * 0.5 AS mmr_score
           |  FROM short c JOIN (
           |    SELECT sm.a AS vec_id, MAX(sm.sim) AS msim
           |    FROM sm JOIN sel${r - 1} s ON sm.b = s.vec_id GROUP BY sm.a) m
           |    USING (vec_id)
           |  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel${r - 1})
           |  ORDER BY mmr_score DESC, c.vec_id LIMIT 1),
           |sel$r AS MATERIALIZED (
           |  SELECT * FROM sel${r - 1} UNION ALL
           |  SELECT vec_id, rel, rank, mmr_score FROM s$r)""".stripMargin
      }.mkString(",\n")
      s"""WITH qv AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
         |short AS MATERIALIZED (
         |  SELECT e.vec_id, e.embedding,
         |    ${Vectors.oCos("qv.embedding", "e.embedding", Vectors.Dim)} AS rel
         |  FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> 0
         |  ORDER BY rel DESC, e.vec_id LIMIT $MmrShort),
         |sm AS MATERIALIZED (
         |  SELECT a.vec_id AS a, b.vec_id AS b, $oCosE AS sim
         |  FROM short a JOIN short b ON a.vec_id <> b.vec_id),
         |sel1 AS MATERIALIZED (
         |  SELECT vec_id, rel, 1 AS rank, rel AS mmr_score FROM short
         |  ORDER BY rel DESC, vec_id LIMIT 1),
         |$rounds
         |SELECT rank, vec_id, rel, mmr_score FROM sel$MmrK ORDER BY rank""".stripMargin
    }),
    Q("dedup_semantic", semanticDedup, Some(oSemanticDedupSql)),
    Q("search_hybrid_rrf", hybridRrf, Some(oHybridRrfSql)),
    Q("sim_pq_adc", pqAdc, Some(oPqAdcSql)),
    Q("sim_pq_rerank", pqRerank, Some(oPqRerankSql)),
    Q("sim_pq_recall", pqRecall, Some(oPqRecallSql)),
    Q("sim_kmeans_full", kmeansFull, Some(oKmeansFull)),
    Q("sim_kmeans_seeded", kmeansSeeded, Some(oKmeansSeeded)),
    Q("sim_centroids", centroids, Some(
      s"""WITH $oCentCte
         |SELECT clab AS label, dim, c AS centroid
         |FROM cent ORDER BY label, dim""".stripMargin)),
    Q("sim_kmeans_assign", kmeansAssign, Some(
      s"""WITH $oCentCte,
         |carr AS (SELECT clab, list(c ORDER BY dim) AS cv FROM cent GROUP BY clab),
         |cw AS (SELECT clab, cv, ${oFold("cv[k] * cv[k]")} AS cc FROM carr),
         |vx AS MATERIALIZED (
         |  SELECT vec_id, label, embedding,
         |    ${Vectors.oDot("embedding", "embedding", Vectors.Dim)} AS xx
         |  FROM embeddings),
         |scored AS (
         |  SELECT vec_id, label, clab,
         |    (xx - 2.0 * ${oFold("CAST(embedding[k] AS DOUBLE) * cv[k]")}) + cc AS dist
         |  FROM vx CROSS JOIN cw),
         |assigned AS (
         |  SELECT vec_id, label, clab,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, clab) AS rn
         |  FROM scored)
         |SELECT label, clab AS cluster, COUNT(*) AS n
         |FROM assigned WHERE rn = 1
         |GROUP BY label, clab ORDER BY label, cluster""".stripMargin)),
    Q("sim_topk_brute", topkBrute, Some(oBruteSql)),
    // oracle: the same one-pass scoring with the same (score DESC,
    // vec_id) tie order, positives and negatives ranked separately
    Q("sim_triplet_mining", tripletMining, Some(
      s"""WITH scored AS MATERIALIZED (
         |  SELECT q.vec_id AS q_id, q.label AS q_label, e.vec_id AS vec_id,
         |    e.label AS label, $oCosQ AS score
         |  FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
         |  WHERE q.vec_id < $NQueries),
         |pos AS (
         |  SELECT q_id, vec_id AS pos_id, score AS pos_score FROM (
         |    SELECT q_id, vec_id, score,
         |      row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |    FROM scored WHERE label = q_label) WHERE rn = 1),
         |neg AS (
         |  SELECT q_id, rn AS neg_rank, vec_id AS neg_id, score AS neg_score FROM (
         |    SELECT q_id, vec_id, score,
         |      row_number() OVER (PARTITION BY q_id ORDER BY score DESC, vec_id) AS rn
         |    FROM scored WHERE label <> q_label) WHERE rn <= $TripletNegK)
         |SELECT pos.q_id, pos_id, pos_score, neg_rank, neg_id, neg_score,
         |  pos_score - neg_score AS margin
         |FROM pos JOIN neg ON pos.q_id = neg.q_id
         |ORDER BY pos.q_id, neg_rank""".stripMargin)),
    Q("sim_topk_lsh", topkLsh, Some(oLshSql)),
    Q("sim_lsh_recall", lshRecall, Some(oRecall(oLshSql))),
    Q("sim_topk_mips", topkMips, Some(oMipsSql)),
    Q("sim_mips_recall", mipsRecall, Some(oRecallVs(oMipsBruteSql, oMipsSql))),
    Q("sim_ivf_recall", ivfRecall, Some(oRecall(oIvfSql))),
    Q("sim_topk_ivf", topkIvf, Some(oIvfSql)),
    Q("sim_knn_label", knnPerLabel, Some(
      s"""SELECT q_id, label, vec_id, score, rn FROM (
         |  SELECT q.vec_id AS q_id, q.label AS label, e.vec_id AS vec_id, $oCosQ AS score,
         |    row_number() OVER (PARTITION BY q.vec_id ORDER BY $oCosQ DESC, e.vec_id) AS rn
         |  FROM embeddings q JOIN embeddings e
         |    ON q.label = e.label AND e.vec_id <> q.vec_id)
         |WHERE rn <= 3 ORDER BY q_id, rn""".stripMargin)),
    Q("sim_quantize_int8", quantizeInt8, Some(
      s"""WITH e AS (SELECT vec_id,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings),
         |sc AS (SELECT vec_id, e, list_max(list_transform(e, x -> abs(x))) AS scale FROM e),
         |q AS (SELECT vec_id, scale,
         |    list_transform(e, x -> CAST(floor(x * CAST(127 AS DOUBLE) / scale
         |      + CAST(0.5 AS DOUBLE)) AS BIGINT)) AS q
         |  FROM sc WHERE scale > 0)
         |SELECT vec_id, scale,
         |  list_reduce(list_prepend(CAST(0 AS BIGINT), q), (a, b) -> a + b) AS q_sum,
         |  list_min(q) AS q_min, list_max(q) AS q_max
         |FROM q ORDER BY vec_id""".stripMargin)),
  )
}
