package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types.StructType

/** Source/sink surface (SURVEY §2.1 S1–S5, re-expressed Spark-first).
  *
  * The reference reads header CSVs with `inferSchema` (a full extra pass
  * over the data — `code/experiment.py:283,325`) and writes subsample CSVs
  * via driver-side pandas (`code/create_subsample.py:76,94`). Here every
  * read takes an explicit `StructType` (one pass, deterministic types, no
  * driver bottleneck) and every write is a distributed `DataFrameWriter`.
  * Paths are Hadoop-FS URIs, so `file://`, `hdfs://`, `s3a://`, `gs://`
  * all work unchanged — the reference's GCS usage (`README.md:28-39`) is a
  * path scheme, not a connector, at this layer.
  *
  * Scale notes baked into the writers: `maxRecordsPerFile` bounds output
  * file size (small-file storms and 10 GB monoliths are both poison at
  * 100 TB), partitioned layouts feed partition pruning, and bucketed
  * layouts (see [[graft.operators.Bucketing]]) remove the shuffle from
  * repeated fact-fact joins.
  */
object Sources {

  /** Header CSV with explicit schema — S1/S2. `nullValue` defaults to the
    * reference corpus's `\N` sentinel (`data/Sample_NHL_EventData.csv:2`);
    * a failed cast under the permissive mode yields null, mirroring the
    * reference's cast-to-null cleanup (`code/experiment.py:291-298`). */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      nullValue: String = "\\N"): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("nullValue", nullValue)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Schema-discovery CSV read (the reference's `inferSchema` behavior —
    * costs a full extra scan; use [[readCsv]] in production). */
  def readCsvInferred(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Distributed header-CSV sink — S4 without the reference's
    * driver-side pandas funnel. */
  def writeCsv(df: DataFrame, path: String, maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .option("header", "true")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .csv(path)

  /** JSON-lines read with explicit schema (schema-on-read for document
    * corpora; pass the schema — letting Spark sample JSONL at 100 TB is an
    * extra pass just like inferSchema). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** JSON-lines sink (interchange format for document pipelines). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Hive-style partitioned parquet: one directory per distinct value of
    * `partitionCols` — queries filtering on those columns prune whole
    * directories before any I/O. Cap cardinality (≲ 10k partitions); high-
    * cardinality keys belong in bucketing, not partitioning. */
  def writePartitionedParquet(df: DataFrame, path: String,
      partitionCols: Seq[String], maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
      .parquet(path)

  /** XML read (Spark 4's built-in xml source, one row per `rowTag`
    * element) with explicit schema — same no-inference contract as
    * [[readJsonl]]: sampling XML at corpus scale is a wasted pass. */
  def readXml(spark: SparkSession, path: String, schema: StructType,
      rowTag: String = "row"): DataFrame =
    spark.read.schema(schema).option("rowTag", rowTag).xml(path)

  /** XML sink — the interchange format of crawl dumps and feed exports
    * (the usual ARRIVAL format of raw web corpora; columnar formats are
    * what the pipeline converts INTO). Distributed: one file per
    * partition, each a well-formed document of `rowTag` elements. */
  def writeXml(df: DataFrame, path: String, rowTag: String = "row"): Unit =
    df.write.mode(SaveMode.Overwrite).option("rowTag", rowTag).xml(path)

  /** ORC read — the second columnar format (ORC and parquet share the
    * predicate-pushdown / column-pruning / partition-pruning machinery via
    * the same v2 file-source framework, so every scan optimization in
    * ARCHITECTURE.md applies unchanged). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink with the same file-size bound as the parquet writers. */
  def writeOrc(df: DataFrame, path: String,
      partitionCols: Seq[String] = Nil, maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode(SaveMode.Overwrite)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).orc(path)
  }

  /** Console sink — S3 (`.show()` of small result frames). */
  def printResult(df: DataFrame, rows: Int = 20): Unit =
    df.show(rows, truncate = false)

  /** DATA-FILE COMPACTION (the q203 operator) — the lakehouse maintenance
    * op every streaming sink output needs: bin-pack a directory of many
    * small parquet files into ~`targetBytes` files. Sizing comes from the
    * actual on-disk footprint (a metadata listing, driver-side and
    * O(files) — at warehouse scale the same numbers come from the table
    * manifest, never a recursive scan), and the rewrite is a `coalesce`,
    * NOT a `repartition`: partition-merging moves no rows between
    * executors and shuffles nothing — compaction is an I/O rewrite, and a
    * shuffle would make it cost a full re-cluster at 100 TB. Returns
    * (input file count, output file count, input bytes). Correctness of
    * the rewrite is the caller's reconciliation problem — q203 closes the
    * loop with the shard manifest. */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): (Int, Int, Long) = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    def partFiles(p: String): Seq[java.io.File] =
      Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith("part-") && !f.getName.endsWith(".crc"))
        .toSeq
    val in = partFiles(inPath)
    require(in.nonEmpty, s"no parquet part files under $inPath")
    val totalBytes = in.map(_.length).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nOut)
      .write.mode(SaveMode.Overwrite).parquet(outPath)
    (in.size, partFiles(outPath).size, totalBytes)
  }

  // ---------------------------------------------- hidden partitioning

  /** Iceberg-style HIDDEN PARTITIONING: the table is laid out by a
    * TRANSFORM of a data column — here bucket(n) = key mod n, written as
    * a real partition-directory column — and the READER, not the user,
    * owes the translation from data predicates to layout predicates.
    * [[writeKeyBucketed]] derives the bucket column at write time;
    * [[readKeyLookup]] appends the implied transform predicate to a
    * key-set lookup, which Catalyst turns into partition pruning (the
    * bucket column is a directory, so the filter never touches data
    * files outside the matching buckets). Without the rewrite the bucket
    * column is invisible to the query and every lookup scans all n
    * directories — the difference between O(1) and O(n) directories per
    * point read at warehouse scale. HiddenPartitionSpec pins the pruned
    * partition count on the executed scan. */
  def writeKeyBucketed(df: DataFrame, path: String, srcCol: String,
      nBuckets: Int, partCol: String): Unit =
    df.withColumn(partCol, pmod(col(srcCol), lit(nBuckets)))
      .write.partitionBy(partCol).mode(SaveMode.Overwrite).parquet(path)

  def readKeyLookup(spark: SparkSession, path: String, srcCol: String,
      nBuckets: Int, partCol: String, keys: Seq[Long]): DataFrame = {
    require(keys.nonEmpty, "hidden-partition lookup needs at least one key")
    val buckets = keys.map(k => ((k % nBuckets) + nBuckets) % nBuckets).distinct
    spark.read.parquet(path)
      .where(col(srcCol).isin(keys: _*) && col(partCol).isin(buckets: _*))
      .drop(partCol)
  }
}
