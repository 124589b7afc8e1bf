package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session extension exposing the native expressions to SQL and installing
  * the graft optimizer rules:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_cosine(a, b), graft_rolling_hash(text) FROM t")
  * }}}
  *
  * For an already-built session, `Native.registerSql(spark)` installs the
  * same functions on the live registry (optimizer rules can only be
  * injected at build time).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RangeJoinRule)
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[Native.ArrayCosine].getName, "graft_cosine"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Native.ArrayCosine(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[Native.RollingHash].getName, "graft_rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Native.RollingHash(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[Native.WordShingles].getName, "graft_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        Native.WordShingles(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue())))
  }
}
