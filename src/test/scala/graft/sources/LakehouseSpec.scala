package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Physical-claim proofs for the round-11 lakehouse read/write paths:
  * q229's external zone-map planning (files pruned BEFORE any footer is
  * opened), q230's merge-on-read positional deletes (no base file ever
  * rewritten; position-applied deletes equal value-applied deletes), and
  * q231's three-way branch merge (row conservation + conflict census
  * tied to the construction rule). The DuckDB gate proves the logical
  * results; these pin what the gate's `require`s claim physically.
  */
class LakehouseSpec extends SparkSpec {
  import spark.implicits._

  test("q229: one manifest row per file, counts reconcile, month probe prunes") {
    val (dataPath, statsPath) =
      graft.ops.SourceQueries.zoneMapLayout(spark, sf0001)
    val manifest = spark.read.parquet(statsPath).collect()
    val nFiles = new java.io.File(dataPath).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(manifest.length == nFiles, "one manifest row per data file")
    assert(manifest.map(_.getAs[Long]("n_rows")).sum ==
      spark.read.parquet(dataPath).count(),
      "manifest row counts must reconcile with the data")
    val lo = java.sql.Date.valueOf("1997-06-01")
    val hi = java.sql.Date.valueOf("1997-06-30")
    val selected = manifest.count(r =>
      !r.getAs[java.sql.Date]("max_day").before(lo) &&
        !r.getAs[java.sql.Date]("min_day").after(hi))
    assert(selected >= 1 && selected * 4 <= manifest.length,
      s"one-month probe kept $selected of ${manifest.length} files")
    // completeness: the pruned plan must still see every matching row
    val rawN = graft.Tables.lineitem(spark, sf0001)
      .filter(to_date($"l_shipdate").between(lit(lo), lit(hi))).count()
    val gate = graft.ops.SourceQueries.zoneMapPrunedScan(spark, sf0001)
    assert(gate.agg(sum($"n_rows")).collect().head.getLong(0) == rawN,
      "zone-map pruning dropped matching rows")
  }

  test("q230: deletes never rewrite base files; positions equal values") {
    val (basePath, delPath) = graft.ops.SourceQueries.morLayout(spark, sf0001)
    def sig(p: String) = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.length, f.lastModified)).sortBy(_._1).toSeq
    val before = sig(basePath)
    val out = graft.ops.SourceQueries.morPositionalDeletes(spark, sf0001)
      .collect()
    assert(sig(basePath) == before,
      "the merge-on-read read path rewrote a base data file")
    val docs = graft.Tables.documents(spark, sf0001)
    val nDel = docs.filter($"doc_id" % 7 === 3).count()
    assert(spark.read.parquet(delPath).count() == nDel,
      "delete vector cardinality drifted from its predicate")
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.count() - nDel,
      "survivor count: position-applied must equal value-applied")
  }

  test("q231: branch merge conserves rows; conflicts match the bucket rule") {
    val out = graft.ops.SourceQueries.branchMerge(spark, sf0001).collect()
    val c = graft.Tables.customer(spark, sf0001)
    val nBase = c.count()
    val nIns = c.filter(pmod($"c_custkey", lit(16)).isin(1, 2)).count()
    assert(out.map(_.getAs[Long]("n_customers")).sum == nBase + nIns,
      "merge must keep every base row (bucket-13 resurrected) plus both" +
        " branches' inserts")
    assert(out.map(_.getAs[Long]("n_uu_conflicts")).sum ==
      c.filter(pmod($"c_custkey", lit(16)) === 5).count(),
      "update-update conflicts are exactly the bucket-5 keys")
    assert(out.map(_.getAs[Long]("n_du_conflicts")).sum ==
      c.filter(pmod($"c_custkey", lit(16)) === 13).count(),
      "delete-vs-update conflicts are exactly the bucket-13 keys")
  }
}
