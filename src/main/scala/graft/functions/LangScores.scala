package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-language trigram-profile scoring (r20; guide §2.4 /
  * the [[Trigrams]]/[[WordShingles]] native-kernel pattern): for a
  * (lowercased) text, `lang_scores(text)` returns `array<long>` of
  * length [[LangId.langOrder]].size — element i = Σ weight of the
  * text's character trigrams in language i's profile.
  *
  * This folds [[LangId]]'s whole scoring front — trigram explode
  * (one row per character position), broadcast profile join, and the
  * corpus-scale groupBy(doc_id) exchange — into a single map-side
  * pass: one hash lookup per character position against the static
  * ~90-entry profile table, zero shuffles. Trigram extraction is
  * `substringSQL(i, 3)` — identical, code-point-aware windows to
  * [[TrigramsImpl]], so the scores are exactly the sums the exploded
  * form produced (languages with no matching trigram read 0 where the
  * join form produced no row; [[LangId.predict]] maps both to the
  * same argmax — weights are positive, so a real score is ≥ 1).
  */
object LangScoresImpl {
  private val nLangs = LangId.langOrder.size

  // Profile lookup as an open-addressed long->long[nLangs] table: a
  // 3-char window whose UTF-8 encoding is <= 7 bytes packs, with its
  // byte length, into ONE long key (byte-exact equality — no decode,
  // no per-window allocation). Every profile trigram is <= 6 bytes
  // (asserted below), so longer windows can't match and are skipped.
  private val TableBits = 9 // 512 slots for ~90 entries
  private val TableMask = (1 << TableBits) - 1
  private val keys = new Array[Long](TableMask + 1) // 0 = empty (no real key is 0: len bits set)
  private val vals = new Array[Array[Long]](TableMask + 1)

  private def slotOf(key: Long): Int = {
    // 64->TableBits mix (splitmix64 finalizer), then linear probe
    var h = key
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    var i = (h & TableMask).toInt
    while (keys(i) != 0L && keys(i) != key) i = (i + 1) & TableMask
    i
  }

  locally {
    val idx = LangId.langOrder.zipWithIndex.toMap
    LangId.profiles.foreach { case (l, t, w) =>
      val b = UTF8String.fromString(t).getBytes
      require(b.length <= 7, s"profile trigram '$t' exceeds 7 UTF-8 bytes")
      var key = b.length.toLong << 56
      var i = 0
      while (i < b.length) { key |= (b(i) & 0xffL) << (i * 8); i += 1 }
      val slot = slotOf(key)
      if (keys(slot) == 0L) { keys(slot) = key; vals(slot) = new Array[Long](nLangs) }
      vals(slot)(idx(l)) += w
    }
  }

  def compute(s: UTF8String): GenericArrayData = {
    val out = new Array[Long](nLangs)
    val b = s.getBytes
    val nBytes = b.length
    // rolling byte offsets of chars i .. i+3 (off(3) = end of window)
    var o0 = 0; var o1 = 0; var o2 = 0; var o3 = 0
    var chars = 0
    while (o3 < nBytes && chars < 3) {
      o3 += UTF8String.numBytesForFirstByte(b(o3))
      chars += 1
      if (chars == 1) o1 = o3
      if (chars == 2) o2 = o3
    }
    while (chars == 3) {
      val len = o3 - o0
      if (len <= 7) {
        var key = len.toLong << 56
        var i = o0
        while (i < o3) { key |= (b(i) & 0xffL) << ((i - o0) * 8); i += 1 }
        val slot = slotOf(key)
        if (keys(slot) != 0L) {
          val w = vals(slot)
          var j = 0
          while (j < nLangs) { out(j) += w(j); j += 1 }
        }
      }
      // slide the window one char
      o0 = o1; o1 = o2; o2 = o3
      if (o3 < nBytes) o3 += UTF8String.numBytesForFirstByte(b(o3))
      else chars = 0
    }
    new GenericArrayData(out)
  }
}

/** `lang_scores(string) -> array<long>` as a native codegen'd
  * expression (same pattern as [[Trigrams]] / [[WordShingles]]). */
case class LangScores(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_scores expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lang_scores"

  override protected def nullSafeEval(input: Any): Any =
    LangScoresImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangScoresImpl.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

object LangScores {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "lang_scores", exprs => LangScores(exprs.head), "built-in")

  def langScores(spark: SparkSession, c: Column): Column = {
    register(spark)
    call_function("lang_scores", c)
  }
}
