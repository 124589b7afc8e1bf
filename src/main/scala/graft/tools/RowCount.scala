package graft.tools

/** Tiny diagnostic: run registered gates against the base corpus AND
  * (optionally) ScaleProbe's scaled/skewed scratch builds in one JVM,
  * printing output row counts — used to audit that a gate processes the
  * FULL corpus on the probe's scratch builds (r15: the streaming state
  * meter showed q216's peak state at 4× far BELOW its 1× peak, raising
  * the question of whether the multi-file scaled corpus advances the
  * watermark mid-drive and drops rows as late).
  *
  * Usage: runMain graft.tools.RowCount <sfDir> <factor> <gate> [...]
  *   factor 0 = base dir only; N = also the salted N× and skewed N×.
  */
object RowCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val factor = args(1).toInt
    val gates = args.drop(2)
    val spark = graft.LocalSession.fromEnv(defaultCpus = "8")
    val dirs = Seq("base" -> sfDir) ++ (if (factor > 0)
      Seq(s"scaled${factor}x" -> ScaleProbe.scaledCorpus(spark, sfDir, factor),
        s"skewed${factor}x" -> ScaleProbe.skewedCorpus(spark, sfDir, factor))
    else Seq.empty)
    gates.foreach { gate =>
      val fn = graft.SparkEntry.queries.getOrElse(gate,
        sys.error(s"unknown gate: $gate"))
      dirs.foreach { case (label, dir) =>
        val n = fn(spark, dir).count()
        println(s"""{"gate":"$gate","corpus":"$label","rows":$n}""")
        spark.catalog.clearCache()
      }
    }
    spark.stop()
  }
}
