package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.bridge
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths where Spark's built-in
  * higher-order array functions fall out of whole-stage codegen (their
  * lambdas are interpreted per element). Each expression participates in
  * codegen via `doGenCode`, so vector math compiles into the enclosing
  * stage's generated Java loop. Numeric contract: identical operation order
  * to the HOF formulations they replace (sequential left-fold sums in
  * double), so results are bit-identical and the DuckDB oracles don't move.
  */
object Native {

  /** Cosine similarity over two array<double> columns in one fused pass
    * (dot, |a|², |b|² in a single loop; same left-fold order as the
    * aggregate/zip_with formulation). Elements are assumed non-null
    * (embedding vectors); shorter array bounds the loop. */
  case class ArrayCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    // strict input typing: getDouble on an int/float-backed ArrayData would
    // read misaligned bytes and return garbage, so reject anything that is
    // not array<double> at analysis time (SQL callers must cast)
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case org.apache.spark.sql.types.ArrayType(DoubleType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
    override def prettyName: String = "graft_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        dot += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val (n, dot, na, nb, i, xi, yi) = (ctx.freshName("n"), ctx.freshName("dot"),
          ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"),
          ctx.freshName("xi"), ctx.freshName("yi"))
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xi = $a.getDouble($i);
           |  double $yi = $b.getDouble($i);
           |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
      copy(left = l, right = r)
  }

  /** Polynomial rolling-hash document fingerprint over the utf-8 bytes:
    * h ← (h·31 + byte) mod 1e9+7. For ASCII text this equals the
    * per-codepoint formulation, which is what the DuckDB oracle mirrors
    * (ascii(substr(...)) + list_reduce). Codegen'd byte loop — no UDF. */
  case class RollingHash(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType = LongType

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def prettyName: String = "graft_rolling_hash"

    private val Mod = 1000000007L

    override def nullSafeEval(s: Any): Any = {
      val bytes = s.asInstanceOf[UTF8String].getBytes
      var h = 0L
      var i = 0
      while (i < bytes.length) {
        h = (h * 31L + (bytes(i) & 0xffL)) % Mod
        i += 1
      }
      h
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val (bytes, h, i) = (ctx.freshName("bytes"), ctx.freshName("h"), ctx.freshName("i"))
        s"""
           |byte[] $bytes = $s.getBytes();
           |long $h = 0L;
           |for (int $i = 0; $i < $bytes.length; $i++) {
           |  $h = ($h * 31L + ($bytes[$i] & 0xffL)) % ${Mod}L;
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** One-pass word-shingle implementation shared by interpreted eval and
    * generated code (the generated loop calls this static forwarder).
    * Tokenization must match Spark's `split(text, "\\s+")` + drop-empties:
    * Java `\s` is the six ASCII whitespace chars, so maximal runs of
    * anything else are tokens (multibyte UTF-8 never collides with ASCII
    * bytes). Documents shorter than n tokens collapse to one whole-text
    * shingle — including the empty document → [""]. */
  private val Space = UTF8String.fromString(" ")

  /** Byte-level whitespace scan: separators are the six ASCII whitespace
    * bytes (Java `\s`), and UTF-8 continuation/multibyte bytes are all
    * >= 0x80 (negative as signed Java bytes), so scanning bytes can never
    * split inside a multibyte character. Tokens are zero-copy
    * `UTF8String.fromBytes` slices — no String decode, no re-encode. */
  private def tokenSlices(s: UTF8String): java.util.ArrayList[UTF8String] = {
    val bytes = s.getBytes
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val len = bytes.length
    while (i < len) {
      val b = bytes(i)
      if (b == 0x20 || (b >= 0x09 && b <= 0x0D)) i += 1
      else {
        val start = i
        while (i < len && {
          val d = bytes(i)
          d != 0x20 && (d < 0x09 || d > 0x0D)
        }) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      }
    }
    out
  }

  /** Whitespace tokens with empties dropped — static forwarder for the
    * generated code of [[Tokens]]. */
  def tokensImpl(s: UTF8String): ArrayData = {
    val toks = tokenSlices(s)
    val arr = new Array[Any](toks.size)
    var i = 0
    while (i < arr.length) { arr(i) = toks.get(i); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  def wordShinglesImpl(s: UTF8String, n: Int): ArrayData = {
    val toks = tokenSlices(s)
    val m = toks.size
    val out =
      if (m >= n) {
        val arr = new Array[Any](m - n + 1)
        val win = new Array[UTF8String](n)
        var j = 0
        while (j <= m - n) {
          var k = 0
          while (k < n) { win(k) = toks.get(j + k); k += 1 }
          arr(j) = UTF8String.concatWs(Space, win: _*)
          j += 1
        }
        arr
      } else {
        val all = new Array[UTF8String](m)
        var k = 0
        while (k < m) { all(k) = toks.get(k); k += 1 }
        Array[Any](UTF8String.concatWs(Space, all: _*))
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Word n-gram ("shingle") array in one codegen'd pass — replaces the
    * interpreted transform/sequence/slice/concat_ws HOF chain, the hottest
    * stage of the MinHash/Jaccard dedup pipelines. Bit-identical output to
    * the HOF formulation (asserted in NativeSpec). */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle size must be >= 1")
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def prettyName: String = "graft_shingles"

    override def nullSafeEval(s: Any): Any =
      wordShinglesImpl(s.asInstanceOf[UTF8String], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Native.wordShinglesImpl($s, $n);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Whitespace tokenization (empties dropped) in one codegen'd pass —
    * replaces split + interpreted filter-lambda for the text-analysis
    * family. Same scanner as [[WordShingles]]. */
  case class Tokens(child: Expression)
      extends UnaryExpression {
    override def dataType: DataType =
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, containsNull = false)

    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case org.apache.spark.sql.types.StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a string argument, got ${other.simpleString}")
      }
    override def prettyName: String = "graft_tokens"

    override def nullSafeEval(s: Any): Any =
      tokensImpl(s.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s =>
        s"${ev.value} = graft.functions.Native.tokensImpl($s);")

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column wrappers (classic-API expression↔column bridge). */
  def cosine(a: Column, b: Column): Column =
    bridge.column(ArrayCosine(bridge.expression(a), bridge.expression(b)))

  def rollingHash(text: Column): Column =
    bridge.column(RollingHash(bridge.expression(text)))

  def shingles(text: Column, n: Int): Column =
    bridge.column(WordShingles(bridge.expression(text), n))

  def tokensNative(text: Column): Column =
    bridge.column(Tokens(bridge.expression(text)))

  /** Install `graft_cosine` / `graft_rolling_hash` as SQL functions on a
    * live session (new sessions: use [[GraftExtensions]] via
    * `spark.sql.extensions` instead). */
  def registerSql(spark: org.apache.spark.sql.SparkSession): Unit = {
    bridge.registerFunction(spark, "graft_cosine",
      exprs => ArrayCosine(exprs(0), exprs(1)))
    bridge.registerFunction(spark, "graft_rolling_hash",
      exprs => RollingHash(exprs.head))
    bridge.registerFunction(spark, "graft_shingles",
      exprs => WordShingles(exprs(0),
        exprs(1).eval().asInstanceOf[Number].intValue()))
    bridge.registerFunction(spark, "graft_tokens",
      exprs => Tokens(exprs.head))
  }
}
