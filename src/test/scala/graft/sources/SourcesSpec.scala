package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Round-trip checks for the source/sink surface: \N null sentinel, explicit
  * schemas, partitioned layout on disk. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  // Scratch registers the dir for shutdown-hook deletion — a test run
  // leaves /tmp clean (the old bare createTempDirectory leaked 4 dirs/run)
  private def tmp(prefix: String): String =
    graft.Scratch.fresh(prefix).toString

  test("CSV round-trip preserves values; \\N parses as null") {
    val dir = tmp("graft-csv")
    // write raw text so the \N sentinel is under our control
    val raw = s"$dir/in"
    Files.createDirectories(java.nio.file.Paths.get(raw))
    Files.write(java.nio.file.Paths.get(s"$raw/part.csv"),
      "id,name,score\n1,alice,3.5\n2,\\N,1.25\n3,carol,\\N\n".getBytes)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType)))
    val df = Sources.readCsv(spark, raw, schema)
    assert(df.count() == 3)
    assert(df.filter($"name".isNull).select("id").as[Long].collect().toSeq == Seq(2L))
    assert(df.filter($"score".isNull).select("id").as[Long].collect().toSeq == Seq(3L))

    val out = s"$dir/out"
    Sources.writeCsv(df, out)
    val back = Sources.readCsv(spark, out, schema)
    assert(back.orderBy("id").collect().toSeq == df.orderBy("id").collect().toSeq)
  }

  test("JSONL round-trip with explicit schema") {
    val dir = tmp("graft-jsonl")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val df = Seq((1L, "hello world"), (2L, "the quick fox")).toDF("doc_id", "text")
    Sources.writeJsonl(df, dir)
    val back = Sources.readJsonl(spark, dir, schema)
    assert(back.orderBy("doc_id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "hello world"), (2L, "the quick fox")))
  }

  test("ORC round-trip, partitioned layout, and pushed filters") {
    val dir = tmp("graft-orc")
    val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "a", 3.5))
      .toDF("id", "grp", "v")
    Sources.writeOrc(df, dir, partitionCols = Seq("grp"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("grp=a", "grp=b"))
    val back = Sources.readOrc(spark, dir)
    assert(back.orderBy("id").select("id", "v").as[(Long, Double)].collect().toSeq
      == Seq((1L, 1.5), (2L, 2.5), (3L, 3.5)))
    // same scan machinery as parquet: partition AND data filters push down
    val pruned = back.filter($"grp" === "a" && $"id" > 1L)
    assert(pruned.count() == 1)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan(id,1"))
  }

  test("XML round-trip escapes entities and preserves newlines byte-exactly") {
    val dir = tmp("graft-xml")
    val hostile = Seq(
      (1L, "a & b < c > d \"quoted\" 'apos'"),
      (2L, "line one\nline two\n\ttabbed"),
      (3L, "]]> cdata-closer & <tag-like/> content"),
      (4L, "unicode: café 中文 😀"))
      .toDF("id", "text")
    Sources.writeXml(hostile, dir, rowTag = "doc")
    val back = Sources.readXml(spark, dir, hostile.schema, rowTag = "doc")
      .as[(Long, String)].collect().toMap
    val orig = hostile.as[(Long, String)].collect().toMap
    assert(back == orig, s"XML hop mangled content: $back vs $orig")
  }

  test("partitioned parquet write lays out one directory per key value") {
    val dir = tmp("graft-part")
    val df = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "a", 3.0))
      .toDF("id", "grp", "v")
    Sources.writePartitionedParquet(df, dir, Seq("grp"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(dirs == Set("grp=a", "grp=b"))
    // partition filter prunes at the file-index level
    val pruned = Sources.readParquet(spark, dir).filter($"grp" === "a")
    assert(pruned.count() == 2)
    assert(pruned.queryExecution.executedPlan.toString.contains("PartitionFilters"))
  }

  test("compactParquet bin-packs small files without losing or duplicating a row") {
    val in = tmp("compact-in")
    val rows = (1 to 5000).map(i => (i.toLong, s"doc $i", i * 7 % 101))
    rows.toDF("id", "text", "score").repartition(32)
      .write.mode("overwrite").parquet(in)
    val out = tmp("compact-out")
    val (nIn, nOut, bytes) = Sources.compactParquet(spark, in, out,
      targetBytes = 1L << 30) // huge target → one output file
    assert(nIn == 32 && nOut == 1, s"$nIn -> $nOut")
    assert(bytes > 0)
    // the rewrite is content-preserving to the multiset
    val got = spark.read.parquet(out).as[(Long, String, Int)].collect().sorted
    assert(got.toSeq == rows.sorted, "compaction changed the data")
    // sizing: a small target yields several files, each a coalesce output
    val out2 = tmp("compact-out2")
    val (_, nOut2, _) = Sources.compactParquet(spark, in, out2,
      targetBytes = math.max(1, bytes / 4))
    assert(nOut2 >= 2 && nOut2 < 32, s"expected a partial pack, got $nOut2")
    assert(spark.read.parquet(out2).count() == 5000)
    // no input → loud failure, not an empty output table
    intercept[IllegalArgumentException] {
      Sources.compactParquet(spark, tmp("compact-empty"), tmp("x"), 1024)
    }
  }
}
