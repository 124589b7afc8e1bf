package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Extension surface beyond the reference (SURVEY §7.3).
  *
  * Two paths:
  *  - [[bruteForceTopK]]: exact cosine top-k of a (small, broadcast) query
  *    set against the corpus — the correctness baseline. Scales linearly in
  *    corpus size: queries broadcast, corpus never shuffles.
  *  - [[ivfTopK]]: IVF-style — probe only the corpus cells whose centroid is
  *    nearest the query. At 100 TB the cell assignment is the partition
  *    prune: a `cell` equi-join replaces the cross product.
  *
  * Vector math runs through a fused native Catalyst expression with codegen
  * ([[graft.functions.Native.ArrayCosine]]); the equivalent higher-order
  * function formulation is kept as the readable baseline. No UDFs anywhere.
  */
object Ann {

  /** Dot product of two array<double> columns (sequential left fold —
    * deterministic association order). Reference formulation via built-in
    * higher-order functions; the hot paths use [[graft.functions.Native]]'s
    * fused codegen expression, which computes the identical op sequence. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision (cast float embeddings first:
    * float widening is exact, and double folds are engine-stable). HOF
    * lambdas are interpreted per element (not codegen'd), so this is the
    * readable baseline; [[cosineFast]] is the bit-identical fused loop. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Codegen'd single-pass cosine — bit-identical to [[cosine]] (same
    * left-fold order), ~interpreter-to-compiled speedup on wide vectors. */
  def cosineFast(a: Column, b: Column): Column =
    graft.functions.Native.cosine(a, b)

  /** Exact top-k by cosine for each query vector. `queries` must be small
    * (it is broadcast); the corpus side streams, and the per-query top-k is
    * a BOUNDED aggregate ([[graft.functions.TopK]]): partial states carry at
    * most k entries per (partition, query), so the only shuffle is
    * k·|queries|·partitions rows — a row_number window here would exchange
    * the entire |corpus|×|queries| scored set. Ranking uses the
    * 6-decimal-rounded cosine with an id tie-break so results are
    * deterministic across engines and runs. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"))
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFast(col("qv"), col("cv")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Fold a (query_id, cand_id, cosine) scored set into ranked top-k rows
    * via the bounded aggregate. */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.scoredTopK(col("cosine"), col("cand_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("query_id"), col("s.cand_id").as("cand_id"),
        col("s.cosine").as("cosine"), (col("pos") + 1).cast("int").as("rank"))

  /** IVF-style ANN: restrict each query to corpus rows in the same cell
    * (inverted-file partition). `cellCol` is any coarse-quantizer output —
    * here the corpus ships a label column; in a real index it is the
    * nearest-centroid assignment. The equi-join on cell replaces the cross
    * product: cost drops by the cell count, and the join shuffles on the
    * cell key only. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      cellCol: String, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("qv"), col(cellCol).as("cell"))
    val c = corpus.select(col(idCol).as("cand_id"),
      col(vecCol).cast("array<double>").as("cv"), col(cellCol).as("cell"))
    val scored = c.join(broadcast(q), Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"),
        round(cosineFast(col("qv"), col("cv")), 6).as("cosine"))
    rankTopK(scored, k)
  }

  /** Assign every corpus vector to its nearest centroid by cosine (the IVF
    * coarse-quantization step). Centroids are tiny → broadcast cross join,
    * then a per-vector argmax (rank-1 window with id tie-break). Feed the
    * output's `cell` column to [[ivfTopK]] for a label-free IVF index. */
  def assignCells(corpus: DataFrame, centroids: DataFrame,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol), col(vecCol).cast("array<double>").as("__v"))
    val cents = centroids.select(col("cell").as("__cell"), col("centroid"))
    val scored = c.crossJoin(broadcast(cents))
      .select(col(idCol), col("__cell"),
        cosineFast(col("__v"), col("centroid")).as("__cos"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__cos").desc, col("__cell").asc)
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") === 1)
      .select(col(idCol), col("__cell").as("cell"))
  }

  /** IVF coarse-quantizer training: Lloyd iterations composed from
    * [[assignCells]] (E-step) and [[cellCentroids]] (M-step). The driver
    * loop runs a tiny fixed count of iterations; every step is fully
    * distributed (broadcast centroids, one shuffle per M-step on the cell
    * key). Initialize from any seed assignment — e.g. `pmod(hash(id), k)`
    * — and feed the result to [[ivfTopK]]. Empty cells drop out (standard
    * Lloyd behavior); deterministic given a deterministic seed. */
  def trainCentroids(corpus: DataFrame, seedCellCol: String, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    var centroids = cellCentroids(corpus, seedCellCol, vecCol)
    var i = 1
    while (i < iters) {
      val assigned = corpus.join(
        assignCells(corpus, centroids, idCol, vecCol)
          .withColumnRenamed("cell", "__assigned"), idCol)
      centroids = cellCentroids(assigned, "__assigned", vecCol)
      i += 1
    }
    centroids
  }

  /** K-means-free coarse centroids: mean vector per cell via per-dimension
    * aggregation (posexplode → avg per (cell, dim) → re-assemble). Used to
    * build a real IVF assignment when no label exists. */
  def cellCentroids(corpus: DataFrame, cellCol: String,
      vecCol: String = "embedding"): DataFrame = {
    corpus.select(col(cellCol).as("cell"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x")).as("cx"))
      .groupBy(col("cell"))
      .agg(array_sort(collect_list(struct(col("dim"), col("cx")))).as("pairs"))
      .select(col("cell"), transform(col("pairs"), p => p.getField("cx")).as("centroid"))
  }
}
