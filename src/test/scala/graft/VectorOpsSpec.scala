package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.VectorOps

/** The native vector kernels must be BIT-IDENTICAL to the declarative
  * higher-order-function forms they replaced (oracle parity depends on
  * it): same left-to-right accumulation for doubles, same integer
  * arithmetic for the quantized dot and the LSH band-key mix. */
class VectorOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def quant(c: org.apache.spark.sql.Column) =
    transform(c, e => floor(e.cast(DoubleType) * 1000).cast(LongType))

  test("dot_long matches aggregate(zip_with) exactly on real embeddings") {
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), quant(col("embedding")).as("qv"))
    val hof = aggregate(zip_with(col("qv"), col("qv"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val diff = e.select(
      (VectorOps.dotLong(spark, col("qv"), col("qv")) - hof).as("d"))
      .filter(col("d") =!= 0L).count()
    assert(diff == 0)
  }

  test("dot_double matches the HOF form bitwise (same accumulation order)") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id").as("id"), col("embedding").as("v"))
    val pairs = e.crossJoin(e.select(col("id").as("id2"), col("v").as("v2")))
      .filter(col("id") < col("id2")).limit(500)
    val hof = aggregate(
      zip_with(col("v"), col("v2"), (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    // bitwise: compare the raw IEEE bits, not approximate equality
    val diff = pairs.select(VectorOps.dotDouble(spark, col("v"), col("v2")).as("a"),
        hof.as("b"))
      .filter(expr("cast(a as string) != cast(b as string) OR a != b")).count()
    assert(diff == 0)
  }

  test("lsh_band_keys matches the SQL integer-mix formula per band") {
    // Recompute one band key declaratively and compare for all bands
    val nBands = 32
    val bits = 4
    def signExpr(band: org.apache.spark.sql.Column, h: Int, i: org.apache.spark.sql.Column) = {
      val m = band * lit(1619L) + lit(h * 31337L) + i * lit(2621L) + lit(1013904223L)
      val mix = (m * m) % lit(4294967296L)
      lit(1L) - lit(2L) * shiftright(mix, 13).bitwiseAND(lit(1L))
    }
    val e = Tables.embeddings(spark, sfDir).limit(50)
      .select(col("vec_id"), quant(col("embedding")).as("qv"))
    val native = e.select(col("vec_id"),
      posexplode(VectorOps.lshBandKeys(spark, col("qv"), nBands, bits)))
      .select(col("vec_id"), col("pos").cast(LongType).as("band"), col("col").as("key"))
    val declarative = e
      .select(col("vec_id"), col("qv"),
        explode(sequence(lit(0L), lit(nBands - 1L))).as("band"))
      .select(col("vec_id"), col("band"),
        (0 until bits).map { h =>
          val dot = aggregate(
            transform(col("qv"), (x, i) => x * signExpr(col("band"), h, i.cast(LongType))),
            lit(0L), (acc, v) => acc + v)
          when(dot >= 0, lit(1L << h)).otherwise(lit(0L))
        }.reduce(_ + _).as("key"))
    assert(native.exceptAll(declarative).count() == 0)
    assert(declarative.exceptAll(native).count() == 0)
    assert(native.count() == 50L * nBands)
  }

  test("dot kernels go NULL on length mismatch or null element, like the HOF form") {
    val mism = Seq((Seq(1L, 2L), Seq(3L, 4L, 5L))).toDF("a", "b")
    val hof = aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0L), (acc, v) => acc + v)
    val r1 = mism.select(VectorOps.dotLong(spark, col("a"), col("b")).as("k"),
      hof.as("h")).collect()(0)
    assert(r1.isNullAt(0) && r1.isNullAt(1))
    val withNull = Seq((Seq(Some(1L), None), Seq(Some(3L), Some(4L))))
      .toDF("a", "b")
    val r2 = withNull.select(VectorOps.dotLong(spark, col("a"), col("b")).as("k"),
      hof.as("h")).collect()(0)
    assert(r2.isNullAt(0) && r2.isNullAt(1))
    // lsh_band_keys: a null element zeroes every band key (the
    // declarative when/otherwise(0) twin)
    val keys = withNull.select(VectorOps.lshBandKeys(spark, col("a"), 4, 4))
      .collect()(0).getSeq[Long](0)
    assert(keys == Seq(0L, 0L, 0L, 0L))
  }

  test("kernels reject wrong input types at analysis") {
    val df = Seq((Array(1L, 2L), Array(1.0, 2.0))).toDF("a", "b")
    intercept[Exception] {
      df.select(VectorOps.dotLong(spark, col("a"), col("b"))).collect()
    }
  }
}
