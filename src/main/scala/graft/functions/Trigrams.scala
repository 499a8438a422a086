package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass character-trigram extraction. The declarative forms both
  * misbehave at scale: a `transform(sequence…)` lambda re-evaluates
  * the (projection-collapsed) input string per iteration (O(len²)),
  * and explode-positions-then-substring copies the whole string into
  * every generated row. This expression builds the array in a single
  * O(len) pass; `explode` then emits only the 3-char slices. */
object TrigramsImpl {
  def compute(s: UTF8String): GenericArrayData = {
    val n = s.numChars()
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    var i = 0
    while (i < n - 2) {
      // substringSQL is 1-based and code-point aware (matches both
      // Spark's `substring` and DuckDB's `substr` semantics)
      out(i) = s.substringSQL(i + 1, 3)
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `trigrams(string) -> array<string>` as a native codegen'd
  * expression (same pattern as [[SimHash]]). */
case class Trigrams(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"trigrams expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType)
  override def prettyName: String = "trigrams"

  override protected def nullSafeEval(input: Any): Any =
    TrigramsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TrigramsImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Trigrams =
    copy(child = newChild)
}

object Trigrams {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "trigrams", exprs => Trigrams(exprs.head), "built-in")

  def trigrams(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("trigrams", c)
  }
}
