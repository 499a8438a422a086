package graft

import org.apache.spark.sql.functions._

import graft.functions.{SimHash, SimHashImpl}
import graft.operators.SimHashDedup

class SimHashSpec extends SparkTestBase {
  import spark.implicits._

  test("SimHashImpl: identical token sets hash identically") {
    assert(SimHashImpl.fnv1a("spark".getBytes) != SimHashImpl.fnv1a("query".getBytes))
    assert(SimHashImpl.hamming(0L, 0L) == 0)
    assert(SimHashImpl.hamming(0L, -1L) == 64)
  }

  test("expression evaluates through codegen and matches a small edit") {
    SimHash.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy cat again and again"),
      (3L, "completely different words about database engines and storage")
    ).toDF("doc_id", "text")
    val sigs = SimHashDedup.signatures(spark, docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d12 = SimHashImpl.hamming(sigs(1L), sigs(2L))
    val d13 = SimHashImpl.hamming(sigs(1L), sigs(3L))
    assert(d12 < d13, s"near-dup hamming $d12 should be < unrelated $d13")
    assert(d12 <= 16)
  }

  test("banded near-dup pairing finds the close pair only") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda nu"),
      (3L, "one two three four five six seven eight nine ten eleven twelve")
    ).toDF("doc_id", "text")
    val pairs = SimHashDedup.nearDupPairs(spark, docs, "doc_id", "text",
        maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("interpreted eval (no codegen) agrees with codegen path") {
    SimHash.register(spark)
    val df = Seq((1L, "a b c d e f g h")).toDF("id", "text")
    val viaExpr = df.select(
      call_function("simhash", split(col("text"), " ")).as("s"))
      .collect()(0).getLong(0)
    val direct = SimHashImpl.compute(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        Array("a", "b", "c", "d", "e", "f", "g", "h")
          .map(org.apache.spark.unsafe.types.UTF8String.fromString)))
    assert(viaExpr == direct)
  }
}
