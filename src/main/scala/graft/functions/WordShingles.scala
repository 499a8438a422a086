package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass word-3-gram shingle assembly over a token array. The
  * declarative alternatives both misbehave (the [[Trigrams]] lesson
  * replayed at the token level, re-measured the hard way in r19):
  * a `transform(sequence…)` lambda inside a pure-Project pipeline
  * gets its tokenizer child INLINED by CollapseProject/filter
  * pushdown and re-splits the text per iteration (O(tokens²) regex
  * work per document — q_dedup_minhash measured 10.2 s vs 2.3 s at
  * sf0.1), and the explode + window(`lead`×2) form pays a full
  * sort shuffle of every token row per call. This expression builds
  * the joined 3-gram array in a single O(tokens) pass; consumers
  * take `array_distinct` (sets), `size` (counts) or `posexplode`
  * (positioned rows) on top. Join semantics mirror
  * `concat_ws(" ", …)` exactly (nulls skipped) so the emitted
  * strings are bit-identical to the pre-r19 forms. */
object WordShinglesImpl {
  private val Space = UTF8String.fromString(" ")

  def compute(arr: ArrayData): GenericArrayData = {
    val len = arr.numElements()
    if (len < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](len - 2)
    var i = 0
    while (i < len - 2) {
      out(i) = UTF8String.concatWs(Space,
        if (arr.isNullAt(i)) null else arr.getUTF8String(i),
        if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1),
        if (arr.isNullAt(i + 2)) null else arr.getUTF8String(i + 2))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_shingles3(array<string>) -> array<string>` as a native
  * codegen'd expression (same pattern as [[Trigrams]] / [[SimHash]]). */
case class WordShingles(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles3 expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "word_shingles3"

  override protected def nullSafeEval(input: Any): Any =
    WordShinglesImpl.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShinglesImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles3", exprs => WordShingles(exprs.head), "built-in")

  def wordShingles3(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("word_shingles3", c)
  }
}
