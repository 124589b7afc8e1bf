package graft.ops

import graft.SparkSpec

/** Executed-plan proofs for the round-9 curation operators' scale claims —
  * the SkewSpec/BucketingSpec pattern: a Scaladoc that says "this runs as
  * X" gets an assertion on the actual plan, not just prose.
  *  - q170 claims the pre-filter is Spark's NATIVE BloomFilterMightContain
  *    expression (codegen'd, not a UDF): the physical plan must contain
  *    it, and must contain no Scala UDF node.
  *  - q174/q178 claim the top-k executes as TakeOrderedAndProject
  *    (per-partition bounded heaps — no global sort of the corpus): the
  *    plan must contain that node.
  */
class CurationPlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q170's bloom pre-filter is the native expression, not a UDF") {
    val plan = planOf(PipelineQueries.bloomDecontaminate(spark, sf0001))
    assert(plan.contains("might_contain"),
      s"expected BloomFilterMightContain in the plan:\n$plan")
    assert(!plan.contains("UDF"), "bloom pre-filter must not be a Scala UDF")
  }

  test("q174's top-(k+1) runs as TakeOrderedAndProject, no global sort") {
    val plan = planOf(PipelineQueries.prioritySampleK(spark, sf0001, 10))
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in the plan:\n$plan")
  }

  test("q178's top-20 runs as TakeOrderedAndProject") {
    val plan = planOf(TextQueries.boilerplateSpans(spark, sf0001))
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in the plan:\n$plan")
  }
}
