package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table support: pre-shuffle fact tables into a fixed number of
  * hash buckets on their join key at WRITE time, so every subsequent join
  * or aggregation on that key runs with zero exchange — the write-once,
  * join-many trade that pays for itself after the first query. This is the
  * 100 TB co-location strategy for repeated fact-fact joins (e.g.
  * lineitem⋈orders on orderkey): both sides bucketed (same key, same
  * count) ⇒ Catalyst plans a sort-merge join with NO shuffle on either
  * side (verified in BucketingSpec by asserting the executed plan is
  * exchange-free).
  *
  * Bucket count guidance: target ~128 MB–1 GB per bucket at full scale;
  * bucket counts must match (or divide evenly) across co-joined tables.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted parquet table — managed (warehouse)
    * by default, or EXTERNAL at `path` (the catalog keeps the bucket spec
    * either way; an explicit path keeps gate scratch out of the
    * warehouse). Sorting within buckets additionally removes the sort
    * step of later sort-merge joins. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .format("parquet")
    path.fold(w.saveAsTable(table)) { p =>
      // overwrite on an external table re-resolves against the OLD
      // catalog entry; drop first so re-runs recreate cleanly
      df.sparkSession.sql(s"DROP TABLE IF EXISTS $table")
      w.option("path", p).saveAsTable(table)
    }
  }

  /** Exchange-free equi-join of two co-bucketed tables. The `merge` hint
    * pins the sort-merge strategy the bucket layout feeds — without it, a
    * small side would auto-broadcast and the co-location would go unused
    * (fine for results, wrong for proving the zero-shuffle plan). */
  def bucketedJoin(spark: org.apache.spark.sql.SparkSession,
      leftTable: String, rightTable: String, key: String): DataFrame =
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable).hint("merge"), key)
}
