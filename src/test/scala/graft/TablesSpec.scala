package graft

/** Pins the load-time parallelism policy (Tables.load scaladoc, r6):
  * compute-heavy corpora (documents, embeddings) get one hash exchange so
  * per-row CPU before the first shuffle fans out; TPC-H facts and events
  * stay on their raw scan partitioning — every gate query over them reaches
  * its own shuffle, so a load exchange would be a second full-data shuffle
  * per query (measured +0.22 s per lineitem query at sf0.1, benefit nil). */
class TablesSpec extends SparkSpec {

  private def hasExchange(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange")

  test("facts and events load with no exchange above the scan") {
    for (t <- Seq("lineitem", "orders", "customer", "nation"))
      assert(!hasExchange(Tables.load(spark, sf0001, t)),
        s"$t must not be respread at load — its queries shuffle on their own keys")
    // events goes through the ns→us bridge (a Project, never an Exchange)
    assert(!hasExchange(Tables.events(spark, sf0001)))
  }

  test("documents and embeddings are spread when the scan under-parallelizes") {
    for (t <- Seq("documents", "embeddings")) {
      val df = Tables.load(spark, sf0001, t)
      val raw = spark.read.parquet(s"$sf0001/$t.parquet").rdd.getNumPartitions
      if (raw * 2 < spark.sparkContext.defaultParallelism)
        assert(df.rdd.getNumPartitions >= spark.sparkContext.defaultParallelism,
          s"$t scan yields $raw partitions — load must fan it out for the " +
            "per-row-heavy operators (shingling, vector math)")
      else
        assert(!hasExchange(df), s"$t already parallel enough — no exchange")
    }
  }

  test("column pruning passes through the documents spread") {
    // the exchange must not widen the scan: a 1-column projection above
    // Tables.documents should reach the parquet reader as a 1-2 column
    // ReadSchema (id key rides along for the hash partitioning)
    val plan = Tables.documents(spark, sf0001).select("lang")
      .queryExecution.executedPlan.toString
    val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(plan)
      .map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$plan"))
    val cols = read.split(",").map(_.trim.takeWhile(_ != ':')).toSet
    assert(cols.subsetOf(Set("lang", "doc_id")),
      s"spread widened the scan to $cols")
  }
}
