package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Ann

/** Gate queries for similarity search over the `embeddings` table:
  * brute-force cosine top-k (exact baseline), IVF-style cell-restricted
  * top-k (the scale path), and embedding-cosine near-dup pairs.
  *
  * Cosines are computed in double (float→double widening is exact) and
  * rounded to 6 decimals BEFORE ranking, with an id tie-break — so the
  * top-k set and ordering are deterministic across engines even though the
  * two engines' dot products can differ in the last ulp.
  */
object AnnQueries {

  def bruteForce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Ann.bruteForceTopK(emb, emb.filter($"vec_id" < 10), 10)
  }

  def ivf(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Ann.ivfTopK(emb, emb.filter($"vec_id" < 10), 10, "label")
  }

  /** Label-free IVF: Lloyd-trained coarse quantizer (seed cells =
    * hash(vec_id) mod 8 — deterministic), then the same cell-restricted
    * top-k. No SQL oracle (k-means in SQL is not practical); the driver
    * records the rows-only check, and AnnSpec pins Lloyd behavior AND
    * asserts recall@10 ≥ 0.6 against the exact q29 brute-force result —
    * the quantitative gate for this entry.
    *
    * Scale shape: the corpus is cached ONCE and feeds the seed M-step,
    * every Lloyd E/M round, and the final assignment (uncached, each of
    * those re-derives the full scan lineage — iterations×rescans at
    * 100 TB). [[Ann.assignCells]] returns `(id, embedding, cell)` directly,
    * so no join back to the corpus is needed anywhere. The session-level
    * `clearCache()` in Verify/Bench drops the cache after the run. */
  def ivfTrained(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .withColumn("seed", pmod(xxhash64($"vec_id"), lit(8)).cast("int"))
      .cache()
    val centroids = Ann.trainCentroids(emb, "seed", iters = 2)
    val celled = Ann.assignCells(emb, centroids)
    val probes = Ann.probeCells(emb.filter($"vec_id" < 10), centroids, nprobe = 3)
    Ann.ivfTopK(celled, probes, 10, "cell")
  }

  /** Embedding near-dup pairs: same-cell (label) pairs with cosine ≥ 0.35,
    * through [[Ann.nearDupPairs]]' hot-cell guard — cells above the cap
    * pair only within a sign-byte LSH sub-bucket, so no cell can go
    * quadratic at 100 TB. The gate corpus' cells (≤ ~600 vectors at sf0.1)
    * sit far under the 10k cap, so the output here is exactly the
    * unguarded pairing and the SQL oracle still matches hash-exact. */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame =
    Ann.nearDupPairs(Tables.embeddings(spark, dir),
      threshold = 0.35, hotCellCap = 10000)

  /** Metadata-filtered ("hybrid") search: top-k cosine restricted to the
    * candidates passing a document-metadata predicate — the retrieval shape
    * of filtered RAG queries. The filter applies BEFORE scoring: the lang
    * predicate pushes into the documents scan, the id semi-join prunes the
    * corpus (both sides are pre-partitioned on the id key in Tables.load,
    * so the join is co-located), and only surviving vectors reach the
    * bounded TopK aggregate. At 100 TB with a selective filter this beats
    * post-filtering an unfiltered top-k both on cost and on recall (no
    * k-starvation when most neighbors fail the predicate). */
  def filteredAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val en = Tables.documents(spark, dir).filter($"lang" === "en")
      .select($"doc_id".as("vec_id"))
    Ann.bruteForceTopK(emb.join(en, Seq("vec_id"), "left_semi"),
      emb.filter($"vec_id" < 10), 10)
  }

  /** Int8-quantized top-k with per-survivor precision audit: the corpus is
    * ranked on [[Ann.quantize]]d vectors (integer dot products — exact in
    * double, so bit-identical on any engine) and the full-precision cosine
    * plus quantization error are computed ONLY for the k kept neighbors.
    * The 8×-smaller scoring input is the bandwidth lever at 100 TB; the
    * in-query `quant_err` column is the evidence the loss is tolerable. */
  def quantizedAnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    Ann.quantizedTopK(emb, emb.filter($"vec_id" < 10), 10)
  }

  /** kNN LABEL PROPAGATION — the weak-supervision / auto-labeling pass of
    * a training-data pipeline: each query vector takes the majority label
    * of its 10 exact nearest neighbors (q29's deterministic rank rule:
    * 6-decimal cosine, id tie-break), vote ties broken toward the smaller
    * label. The neighbor search is the bounded TopK aggregate; the label
    * lookup is an id equi-join against the (pre-partitioned) corpus; the
    * vote is a two-level hash-agg + 1-row-per-query max_by — every stage
    * keyed and bounded, nothing grows with corpus size except the scan. */
  def knnClassify(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val topk = Ann.bruteForceTopK(emb, emb.filter($"vec_id" < 50), 10)
    topk.join(emb.select($"vec_id".as("cand_id"), $"label"), "cand_id")
      .groupBy($"query_id", $"label").agg(count(lit(1)).as("votes"))
      .groupBy($"query_id")
      .agg(max(struct($"votes", (-$"label").as("nl"))).as("m"))
      .select($"query_id", (-$"m.nl").cast("int").as("predicted_label"),
        $"m.votes".as("votes"))
  }

  /** MUTUAL-kNN pairs: (a, b) kept iff b is in a's top-5 AND a is in b's
    * top-5 — the reciprocal-neighbor criterion that seeds density
    * clustering and high-precision near-dup blocking (one-directional
    * neighbors are noisy near cluster boundaries; mutual ones rarely
    * are). One all-corpus top-k pass builds the directed neighbor edges;
    * MUTUALITY is then a pure equi-join of the edge list with itself
    * reversed — k·n edges joined on (a,b), never a rescore. The gate's
    * exact top-k is brute force (every vector a query); at corpus scale
    * the same mutuality join runs unchanged over IVF-produced edges
    * (q30/q77) — the operator composes with any neighbor source. */
  def mutualKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val directed = Ann.bruteForceTopK(emb, emb, 5)
      .select($"query_id".as("a"), $"cand_id".as("b"), $"cosine")
    directed
      .join(directed.select($"b".as("a"), $"a".as("b")), Seq("a", "b"))
      .filter($"a" < $"b")
      .select($"a".as("vec_a"), $"b".as("vec_b"), $"cosine")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q148_mutual_knn" -> (mutualKnn _),
    "q142_knn_classify" -> (knnClassify _),
    "q108_quantized_ann" -> (quantizedAnn _),
    "q97_filtered_ann" -> (filteredAnn _),
    "q29_ann_bruteforce" -> (bruteForce _),
    "q30_ann_ivf" -> (ivf _),
    "q31_embedding_near_dup" -> (embeddingNearDup _),
    "q77_ann_ivf_trained" -> (ivfTrained _))

  /** Cosine in DuckDB, mirroring Ann.cosine's formula dot/(sqrt·sqrt). */
  private def cosSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  val oracle: Map[String, String] = Map(
    "q148_mutual_knn" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings
         |), c AS (
         |  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings
         |), s AS (
         |  SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
         |  FROM c, q WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, cand_id, cosine,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, cand_id ASC) AS rnk
         |  FROM s
         |), t AS (
         |  SELECT query_id, cand_id, cosine FROM r WHERE rnk <= 5
         |)
         |SELECT t1.query_id AS vec_a, t1.cand_id AS vec_b, t1.cosine
         |FROM t t1 JOIN t t2
         |  ON t2.query_id = t1.cand_id AND t2.cand_id = t1.query_id
         |WHERE t1.query_id < t1.cand_id""".stripMargin,
    "q142_knn_classify" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 50
         |), c AS (
         |  SELECT vec_id AS cand_id, label, CAST(embedding AS DOUBLE[]) AS cv
         |  FROM embeddings
         |), s AS (
         |  SELECT query_id, cand_id, label, ${cosSql("qv", "cv")} AS cosine
         |  FROM c, q WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, label,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, cand_id ASC) AS rnk
         |  FROM s
         |), v AS (
         |  SELECT query_id, label, count(*) AS votes
         |  FROM r WHERE rnk <= 10 GROUP BY query_id, label
         |), w AS (
         |  SELECT query_id, label, votes,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY votes DESC, label ASC) AS rn
         |  FROM v
         |)
         |SELECT query_id, CAST(label AS INTEGER) AS predicted_label, votes
         |FROM w WHERE rn = 1""".stripMargin,
    "q108_quantized_ann" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         |    list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))) AS maxabs
         |  FROM embeddings
         |), qn AS (
         |  SELECT vec_id, v,
         |    CAST(list_transform(v, x -> floor(x * (CAST(127.0 AS DOUBLE) / maxabs))) AS DOUBLE[]) AS qv
         |  FROM e WHERE maxabs > CAST(0.0 AS DOUBLE)
         |), q AS (
         |  SELECT vec_id AS query_id, qv AS qq FROM qn WHERE vec_id < 10
         |), c AS (
         |  SELECT vec_id AS cand_id, qv AS cq FROM qn
         |), s AS (
         |  SELECT query_id, cand_id, ${cosSql("qq", "cq")} AS q_cosine
         |  FROM c, q WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, cand_id, q_cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY q_cosine DESC, cand_id ASC) AS INTEGER) AS rank
         |  FROM s
         |), t AS (
         |  SELECT * FROM r WHERE rank <= 10
         |)
         |SELECT t.query_id, t.cand_id, t.q_cosine,
         |  ${cosSql("a.v", "b.v")} AS cosine,
         |  abs(t.q_cosine - ${cosSql("a.v", "b.v")}) AS quant_err,
         |  t.rank
         |FROM t
         |JOIN qn a ON t.query_id = a.vec_id
         |JOIN qn b ON t.cand_id = b.vec_id""".stripMargin,
    "q97_filtered_ann" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10
         |), c AS (
         |  SELECT e.vec_id AS cand_id, CAST(e.embedding AS DOUBLE[]) AS cv
         |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
         |  WHERE d.lang = 'en'
         |), s AS (
         |  SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
         |  FROM c, q WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INTEGER) AS rank
         |  FROM s
         |)
         |SELECT query_id, cand_id, cosine, rank FROM r WHERE rank <= 10""".stripMargin,
    "q29_ann_bruteforce" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id < 10
         |), c AS (
         |  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
         |), s AS (
         |  SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
         |  FROM c, q WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INTEGER) AS rank
         |  FROM s
         |)
         |SELECT query_id, cand_id, cosine, rank FROM r WHERE rank <= 10""".stripMargin,
    "q30_ann_ivf" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv, label AS cell
         |  FROM embeddings WHERE vec_id < 10
         |), c AS (
         |  SELECT vec_id AS cand_id, CAST(embedding AS DOUBLE[]) AS cv, label AS cell FROM embeddings
         |), s AS (
         |  SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
         |  FROM c JOIN q USING (cell) WHERE query_id <> cand_id
         |), r AS (
         |  SELECT query_id, cand_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id ASC) AS INTEGER) AS rank
         |  FROM s
         |)
         |SELECT query_id, cand_id, cosine, rank FROM r WHERE rank <= 10""".stripMargin,
    "q31_embedding_near_dup" ->
      s"""WITH e AS (
         |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, label FROM embeddings
         |)
         |SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
         |  ${cosSql("a.v", "b.v")} AS cosine
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE ${cosSql("a.v", "b.v")} >= CAST(0.35 AS DOUBLE)""".stripMargin)
}
