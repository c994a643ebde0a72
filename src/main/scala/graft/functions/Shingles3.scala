package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass distinct word-3-gram shingles: `shingles3(toks)` returns
  * the array [[graft.ext.TextExpr.shinglesE]] builds through
  *
  * {{{
  *   CASE WHEN size(toks) >= 3 THEN array_distinct(transform(
  *     sequence(0, size(toks)-3),
  *     i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
  *   ELSE array() END
  * }}}
  *
  * — same elements, same first-occurrence order — without the
  * CodegenFallback lambda chain's per-position allocations (a
  * sequence array, a transform array, and an array_distinct pass per
  * ROW). One LinkedHashSet pass inside whole-stage codegen (the
  * [[TokenStats]] static-helper pattern). r21: this is the shingle
  * scan the minhash pair pipeline's verify joins evaluate twice per
  * query.
  *
  * Null contract: NULL array → NULL; < 3 tokens → empty array (the
  * CASE arm); NULL ELEMENTS are skipped by concat_ws exactly as
  * before (cannot occur from the whitespace tokenizer).
  */
case class Shingles3(child: Expression) extends UnaryExpression {

  override def prettyName: String = "shingles3"

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case ArrayType(NullType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${dt.sql}")
    }

  override def nullSafeEval(arr: Any): Any =
    Shingles3.compute(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => s"""
      ${ev.value} = graft.functions.Shingles3$$.MODULE$$.compute($arr);
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Shingles3 {

  private val Space = UTF8String.fromString(" ")

  /** The one-pass fold; shared by interpreted eval and generated code.
    * Never returns null (empty array for < 3 tokens). */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](math.max(16, n * 2))
    var i = 0
    while (i <= n - 3) {
      seen.add(UTF8String.concatWs(Space,
        if (arr.isNullAt(i)) null else arr.getUTF8String(i),
        if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1),
        if (arr.isNullAt(i + 2)) null else arr.getUTF8String(i + 2)))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** Idempotently register `shingles3` for SQL/expr use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingles3",
      exprs => {
        require(exprs.length == 1,
          s"shingles3 requires exactly 1 argument (toks), got ${exprs.length}")
        Shingles3(exprs.head)
      },
      "built-in")
}
