package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.TextSim

/** Native Catalyst expressions for the reference's similarity scalars —
  * the two semantics Spark's built-in function library cannot express
  * (X6 rapidfuzz token_sort_ratio and X7's levenshtein RATIO with its
  * both-empty => 0 rule; /root/reference/services/disambiguation.py:313-379)
  * — exposed as SQL functions `graft_token_sort_ratio(a,b)` and
  * `graft_lev_ratio(a,b)`.
  *
  * Both generate code (defineCodeGen emits one static call per row inside
  * the surrounding WholeStageCodegen span — no Row boxing, no ScalaUDF
  * serialization barrier) and evaluate through the same TextSim core the
  * fused pipeline scorer and the no-Spark oracle run, so the SQL surface
  * can never drift from the engine semantics.
  *
  * Registration: `GraftFunctions.register(spark)` on an existing session,
  * or `--conf spark.sql.extensions=graft.functions.GraftExtensions` at
  * submit time (the standard injection path on a cluster).
  */
object GraftFunctions {

  // static entry points referenced from generated code
  def tokenSortRatio(a: UTF8String, b: UTF8String): Double =
    TextSim.tokenSortRatio(a.toString, b.toString)

  def levRatio(a: UTF8String, b: UTF8String): Double =
    TextSim.levRatio(a.toString, b.toString)

  /** Index-order dot product over two double arrays. Summation order is
    * ascending index — bit-identical IEEE result to the left fold
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` it replaces, without the
    * per-row intermediate array or the higher-order-function lambda
    * evaluator. Inputs are fixed-dimension embedding vectors: no null
    * elements (enforced upstream by the double cast of non-null parquet
    * floats). Mismatched lengths THROW rather than silently summing over
    * the shorter prefix — engine vectors never disagree on dim, so a
    * mismatch is a malformed input that must fail loud, not produce a
    * plausible partial sum (the zip_with spelling nulled it out). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: array lengths differ ($n vs ${b.numElements()})")
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_token_sort_ratio"),
      new ExpressionInfo(classOf[TokenSortRatioExpr].getName, "graft_token_sort_ratio"),
      (args: Seq[Expression]) => TokenSortRatioExpr(asString(args(0)), asString(args(1)))),
    (FunctionIdentifier("graft_lev_ratio"),
      new ExpressionInfo(classOf[LevRatioExpr].getName, "graft_lev_ratio"),
      (args: Seq[Expression]) => LevRatioExpr(asString(args(0)), asString(args(1)))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotExpr].getName, "graft_dot"),
      (args: Seq[Expression]) => DotExpr(asDoubleArray(args(0)), asDoubleArray(args(1)))))

  // implicit input cast at build time (the ImplicitCastInputTypes trait's
  // signature is private[sql], so the coercion happens in the builder)
  private def asString(e: Expression): Expression =
    if (e.dataType == StringType) e else Cast(e, StringType)

  // coerce e.g. the engine's native array<float> embedding columns, mirroring
  // the implicit input cast of the built-in higher-order spelling
  private def asDoubleArray(e: Expression): Expression = e.dataType match {
    case ArrayType(DoubleType, _) => e
    case _ => Cast(e, ArrayType(DoubleType))
  }

  /** Register on a live session (tests / REPL). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }

  private[functions] def inject(ext: SparkSessionExtensions): Unit =
    functions.foreach(ext.injectFunction)
}

/** spark.sql.extensions entry point: the native scalar functions plus the
  * interval-join optimizer rewrite. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.inject(ext)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
  }
}

/** Shared shape of the two string-similarity expressions. */
abstract class GraftBinaryStringDouble extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got (${left.dataType}, ${right.dataType})")

  /** Fully-qualified static method the generated code calls. */
  protected def staticCall: String

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"$staticCall($a, $b)")
}

/** X6 — rapidfuzz fuzz.token_sort_ratio / 100. */
case class TokenSortRatioExpr(left: Expression, right: Expression)
    extends GraftBinaryStringDouble {
  override protected def staticCall = "graft.functions.GraftFunctions.tokenSortRatio"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.tokenSortRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenSortRatioExpr =
    copy(left = newLeft, right = newRight)
}

/** X7 — 1 - lev(a,b)/max(|a|,|b|), 0.0 when both empty. */
case class LevRatioExpr(left: Expression, right: Expression)
    extends GraftBinaryStringDouble {
  override protected def staticCall = "graft.functions.GraftFunctions.levRatio"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.levRatio(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LevRatioExpr =
    copy(left = newLeft, right = newRight)
}

/** Embedding dot product `graft_dot(array<double>, array<double>)` — the hot
  * scalar of every similarity operator (brute-force/IVF top-k, cosine
  * near-dup, LSH verify). The built-in spelling
  * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` allocates an intermediate array
  * and evaluates two lambdas per row; this compiles to one static call (a
  * tight primitive loop) inside the surrounding WholeStageCodegen span.
  * Null array => null (nullIntolerant); see GraftFunctions.dot for the
  * element contract. */
case class DotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  private def isDoubleArray(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isDoubleArray(left.dataType) && isDoubleArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftFunctions.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftFunctions.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotExpr =
    copy(left = newLeft, right = newRight)
}
