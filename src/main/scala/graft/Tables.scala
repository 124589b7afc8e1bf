package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the test corpus (one parquet file per table, see TESTDATA.md).
  *
  * Parquet carries its own schema in the footer, so no `inferSchema` pass is
  * needed (the reference's CSV double-scan — `code/experiment.py:283,325` — is
  * structurally impossible here). Column pruning + predicate pushdown reach
  * the scan automatically because every loader returns the raw scan and all
  * projection/filtering stays declarative on top of it.
  */
object Tables {
  /** Parquet scan with an adaptive parallelism floor: the test corpus ships
    * ONE row group per file, and parquet row groups are the unit of split —
    * no file-split config can spread one row group over more than one task,
    * so every downstream operator would run single-threaded. When the scan
    * yields far fewer partitions than the session's parallelism, insert one
    * round-robin exchange (a few MB here) so aggregation/join work fans out.
    * At production scale (many files / many row groups) the condition is
    * false and no exchange is added; Catalyst still pushes filters and
    * projections below the repartition either way. */
  /** Fact tables get spread by a hash of their (uniform, unique) id key —
    * hash exchange, unlike round-robin, needs no sort-before-repartition
    * pass. Dimension tables are never respread: they end up broadcast, and
    * an exchange before a BroadcastExchange is pure overhead. */
  private val factKeys = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "events" -> "event_id", "documents" -> "doc_id", "embeddings" -> "vec_id")

  /** `df.rdd.getNumPartitions` plans the scan (driver-side work per call);
    * the answer is a pure function of the files on disk, so memoize it —
    * the 100+-query bench suite × several tables each would otherwise
    * re-plan the same scans hundreds of times. */
  private val scanPartsCache = scala.collection.concurrent.TrieMap.empty[String, Int]

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    factKeys.get(name) match {
      case Some(key) =>
        val scanParts =
          scanPartsCache.getOrElseUpdate(s"$dir/$name", df.rdd.getNumPartitions)
        val target = spark.sparkContext.defaultParallelism
        if (scanParts * 2 < target)
          df.repartition(target, org.apache.spark.sql.functions.col(key))
        else df
      case None => df
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  /** `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects. Read it as raw long nanos (legacy conf) and
    * rebuild a micros timestamp with integral division — `div`, not `/`:
    * float division of ~1.7e18 ns exceeds double's 2^53 integer range and
    * would corrupt low-order digits. Floor semantics match DuckDB's ns→us
    * truncation, so oracle comparisons stay exact. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    rebuildNanosTs(load(spark, dir, "events"))
  }

  /** The ONE ns→us bridge (see [[events]]' doc for the `div`-not-`/`
    * rationale) — also applied by the streaming gate drives (q81/q90/q92),
    * which must read the raw long themselves because `readStream` needs the
    * on-disk schema. Any change to the bridge must stay here or the
    * streaming twins silently diverge from the batch oracles they share. */
  def rebuildNanosTs(df: DataFrame): DataFrame =
    df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
      org.apache.spark.sql.functions.expr("ts div 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
