package graft.hockey

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Game-level 20% subsampler — the distributed Spark counterpart of the
  * reference's single-process chunked-pandas script
  * (ref code/create_subsample.py:16-94; SURVEY §3.3). Game-level (not
  * row-level) sampling keeps events↔results referentially intact: sample
  * the distinct GameID set once, then left-semi join both tables against it
  * (C3 + J3 + S4). The chunked read (S5) is unnecessary — the scan is
  * already distributed and bounded per partition.
  *
  * Usage: runMain graft.hockey.Subsample <eventsCsv> <resultsCsv> <outDir>
  *   [fraction=0.2] [seed=42]
  */
object Subsample {

  def main(args: Array[String]): Unit = {
    val Array(eventsPath, resultsPath, outDir, rest @ _*) = args
    val fraction = rest.headOption.map(_.toDouble).getOrElse(0.2)
    val seed = rest.lift(1).map(_.toLong).getOrElse(42L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("HockeySubsample")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try run(spark, eventsPath, resultsPath, outDir, fraction, seed)
    finally spark.stop()
  }

  def run(spark: SparkSession, eventsPath: String, resultsPath: String,
      outDir: String, fraction: Double = 0.2, seed: Long = 42L): Unit = {
    // All-string reads: the subsampler is a verbatim row filter — parsing
    // values (dates especially) would rewrite them on output and break
    // byte-level fidelity with the source files.
    val results = spark.read.option("header", "true").csv(resultsPath)
    val events = spark.read.option("header", "true").csv(eventsPath)

    val sampledGames = results.select(col("Game Id").as("sampled_game"))
      .distinct()
      .sample(withReplacement = false, fraction, seed)
      .cache()
    println(s"Sampled ${sampledGames.count()} games")

    results.join(sampledGames, col("Game Id") === col("sampled_game"), "left_semi")
      .write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/results_subset")
    events.join(sampledGames, col("GameID") === col("sampled_game"), "left_semi")
      .write.mode("overwrite").option("header", "true")
      .csv(s"$outDir/events_subset")
  }
}
