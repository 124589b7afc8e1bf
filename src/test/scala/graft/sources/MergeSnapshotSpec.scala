package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Physical claims of the q205/q206/q207 generation-table family that the
  * oracles can't see: the copy-on-write merge must rewrite ONLY the
  * touched buckets (the rest are references), published snapshots must be
  * byte-immutable, and the pointer must flip to the new generation. */
class MergeSnapshotSpec extends SparkSpec {

  test("merge rewrites 2 buckets, references 14, and never touches gen-000001 bytes") {
    import scala.jdk.CollectionConverters._
    val out = graft.ops.SourceQueries.mergeUpsert(spark, sf0001)
    val root = Paths.get(graft.Scratch.named(
      s"q205_${graft.Scratch.dirKey(sf0001)}").toString)
    val baseGen = root.resolve("gen-000001")

    def digest(p: java.nio.file.Path): Map[String, Long] =
      Files.walk(p).iterator().asScala
        .filter(f => Files.isRegularFile(f) && f.toString.endsWith(".parquet"))
        .map(f => p.relativize(f).toString -> Files.size(f)).toMap
    val before = digest(baseGen)
    assert(before.nonEmpty, "base generation has no parquet files")

    // the merged summary flows (oracle checks the values; here: shape)
    assert(out.columns.toSeq ==
      Seq("c_mktsegment", "n_customers", "total_cents", "n_inserted", "max_custkey"))
    assert(out.count() > 0)

    val current = Paths.get(
      graft.operators.Ann.currentGenerationPath(spark, root.toString))
    assert(current.getFileName.toString != "gen-000001", "pointer did not flip")
    val (links, real) = (0 until 16)
      .map(b => current.resolve(s"bucket=$b"))
      .partition(Files.isSymbolicLink)
    assert(links.size == 14 && real.size == 2,
      s"COW drifted: ${real.size} rewritten, ${links.size} referenced")
    // rewritten buckets are exactly the delta's (3: updates, 7: inserts)
    assert(real.map(_.getFileName.toString).sorted ==
      Seq("bucket=3", "bucket=7"))
    // every reference points INTO the base generation (no hidden copy)
    links.foreach { l =>
      assert(Files.readSymbolicLink(l).startsWith(baseGen),
        s"$l does not reference the base generation")
    }
    // snapshot immutability: same files, same sizes after the merge
    assert(digest(baseGen) == before, "the merge mutated a published snapshot")
  }

  test("delete-carrying merge rewrites 3 buckets and the CDC diff reports removals") {
    graft.ops.SourceQueries.mergeDelete(spark, sf0001).count() // force publish
    val root = Paths.get(graft.Scratch.named(
      s"q211_${graft.Scratch.dirKey(sf0001)}").toString)
    val current = Paths.get(
      graft.operators.Ann.currentGenerationPath(spark, root.toString))
    val (links, nonLinks) = (0 until 16)
      .map(b => current.resolve(s"bucket=$b"))
      .partition(Files.isSymbolicLink)
    assert(links.size == 13)
    // of the three touched buckets, 3 and 7 are rewritten with survivors
    // + upserts; bucket 11 lost every key, so its partition directory is
    // simply never written — absent, not empty
    val (rewritten, absent) = nonLinks.partition(Files.exists(_))
    assert(rewritten.map(_.getFileName.toString).sorted ==
      Seq("bucket=3", "bucket=7"), s"rewrote $rewritten")
    assert(absent.map(_.getFileName.toString) == Seq("bucket=11"), s"$absent")
    assert(spark.read.parquet(current.toString).where("bucket = 11").count() == 0)
    val statuses = graft.ops.SourceQueries.cdcWithDeletes(spark, sf0001)
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "changed", "removed", "unchanged"),
      s"CDC alphabet incomplete: $statuses")
  }

  test("vacuum pins a referenced ancestor: keep=1 under a COW current deletes nothing") {
    import org.apache.spark.sql.functions._
    // fresh 2-generation root: gen-2 is a COW merge borrowing 14 buckets
    // from gen-1 — retention {gen-2} must transitively pin gen-1, or the
    // live snapshot loses 14/16 of its data
    val root = graft.Scratch.fresh("vacuum-pin").toString
    graft.Tables.customer(spark, sf0001)
      .withColumn("bucket", pmod(col("c_custkey"), lit(16)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$root/gen-000001")
    graft.operators.Ann.publishGeneration(spark, root, "gen-000001")
    val before = graft.ops.SourceQueries.mergeUpsertInto(spark, sf0001, root)
    val (deleted, kept) = graft.ops.SourceQueries.vacuumGenerations(
      spark, root, keep = 1)
    assert(deleted.isEmpty, s"vacuum deleted a pinned ancestor: $deleted")
    assert(kept == Seq("gen-000001", "gen-000002"), s"kept $kept")
    // and the live snapshot still reads every row
    val after = spark.read.parquet(
      graft.operators.Ann.currentGenerationPath(spark, root)).count()
    assert(after == before, s"vacuum changed the live view: $after vs $before")
  }

  test("CDC diff never reports removals for a pure upsert delta") {
    val diff = graft.ops.SourceQueries.snapshotDiff(spark, sf0001)
    val statuses = diff.select("status").distinct()
      .collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "changed", "unchanged"),
      s"unexpected statuses: $statuses")
  }

  test("partition retention drops expired months without writing a byte") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    graft.ops.SourceQueries.partitionRetention(spark, sf0001).collect()
    val root = graft.ops.SourceQueries.retentionRoot(spark, sf0001)
    val gen = Paths.get(
      graft.operators.Ann.currentGenerationPath(spark, root))
    val entries = Files.list(gen).iterator().asScala
      .filter(_.getFileName.toString.startsWith("ship_month=")).toSeq
    assert(entries.nonEmpty)
    // every surviving month is a reference, none predates the cutoff
    entries.foreach { p =>
      assert(Files.isSymbolicLink(p), s"$p was copied, not referenced")
      assert(p.getFileName.toString.stripPrefix("ship_month=") >= "1999-01",
        s"expired month survived retention: $p")
    }
    // the root holds metadata only — retention wrote zero data bytes
    val dataFiles = Files.walk(Paths.get(root)).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        p.getFileName.toString.endsWith(".parquet")).toSeq
    assert(dataFiles.isEmpty, s"retention copied data: $dataFiles")
  }

  test("schema-evolving merge leaves a genuinely mixed-schema generation") {
    import java.nio.file.{Files, Paths}
    // run the gate (publishes the q225 generation), then inspect layout
    graft.ops.SourceQueries.mergeSchemaEvolution(spark, sf0001).collect()
    val root = graft.Scratch.named(
      s"q225_${graft.Scratch.dirKey(sf0001)}").toString
    val gen = Paths.get(
      graft.operators.Ann.currentGenerationPath(spark, root))
    // rewritten buckets carry c_tier; referenced buckets must NOT — a
    // table-wide rewrite would be a migration, not evolution
    def schemaOf(bucket: Int): Seq[String] =
      spark.read.parquet(gen.resolve(s"bucket=$bucket").toString)
        .schema.fieldNames.toSeq
    assert(schemaOf(5).contains("c_tier"), "rewritten bucket lost the new column")
    assert(schemaOf(9).contains("c_tier"))
    assert(!schemaOf(3).contains("c_tier"),
      "referenced bucket gained c_tier — the merge rewrote what it should reference")
    assert(Files.isSymbolicLink(gen.resolve("bucket=3")))
    // the mergeSchema read reconciles: tier NULL everywhere but the delta
    val cur = spark.read.option("mergeSchema", "true").parquet(gen.toString)
    val tiers = cur.groupBy("c_tier").count().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(tiers.keySet == Set(None, Some("gold"), Some("new")), s"$tiers")
    assert(tiers(Some("gold")) > 0 && tiers(Some("new")) > 0)
  }
}
