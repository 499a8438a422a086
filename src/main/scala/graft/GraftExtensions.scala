package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotDouble, DotLong, LshBandKeys, SimHash, Trigrams}

/** Session extension installing the engine's native functions into the
  * Catalyst function registry, so pure-SQL users get them without any
  * Scala imports:
  *
  * {{{
  *   spark-sql --conf spark.sql.extensions=graft.GraftExtensions
  *   > SELECT simhash(text), trigrams(text)[0] FROM documents;
  *   > SELECT dot_long(a.qv, b.qv) FROM ...;
  * }}}
  *
  * This is the idiomatic packaging for engine add-ons (the same hook
  * Delta/Iceberg use); the per-session `register` helpers on each
  * function object remain for programmatic use. Functions injected
  * here are per-session, survive `spark.newSession()`, and are
  * codegen'd like built-ins.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("simhash"),
      info("simhash", "simhash(array<string>) - 64-bit SimHash of a token array"),
      (es: Seq[Expression]) => SimHash(es.head)))
    ext.injectFunction((FunctionIdentifier("trigrams"),
      info("trigrams", "trigrams(str) - array of character trigrams, one O(len) pass"),
      (es: Seq[Expression]) => Trigrams(es.head)))
    ext.injectFunction((FunctionIdentifier("dot_long"),
      info("dot_long", "dot_long(array<bigint>, array<bigint>) - exact integer dot product"),
      (es: Seq[Expression]) => DotLong(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("dot_double"),
      info("dot_double", "dot_double(array<double>, array<double>) - double dot product"),
      (es: Seq[Expression]) => DotDouble(es(0), es(1))))
    ext.injectFunction((FunctionIdentifier("lsh_band_keys"),
      info("lsh_band_keys",
        "lsh_band_keys(array<bigint>, nBands, bitsPerBand) - hyperplane LSH band keys"),
      (es: Seq[Expression]) => LshBandKeys(es(0), es(1), es(2))))
  }
}
