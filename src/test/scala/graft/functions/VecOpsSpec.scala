package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Native vector expressions: HyperplaneBands' precomputed sign matrix
  * must reproduce the original per-row hash derivation bit-for-bit
  * (signatures are persisted implicitly through q61's oracle — any drift
  * would silently change the candidate pair set).
  */
class VecOpsSpec extends SparkSpec {

  /** The original definition: signs derived per (bit, dim) inside the row
    * loop — the spec's independent reference for the cached sign table.
    */
  private def referenceBands(vec: Array[Float], numBits: Int,
                             rowsPerBand: Int): Seq[Long] = {
    val numBands = numBits / rowsPerBand
    val out = new Array[Long](numBands)
    var b = 0
    var k = 0
    while (b < numBands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        var acc = 0.0
        var i = 0
        while (i < vec.length) {
          val h = XXH64.hashLong(i.toLong, 0x9E3779B97F4A7C15L * k + 42L)
          val v = vec(i).toDouble
          acc += (if (h < 0) -v else v)
          i += 1
        }
        sig = (sig << 1) | (if (acc > 0) 1L else 0L)
        r += 1
        k += 1
      }
      out(b) = sig ^ (b.toLong << 32)
      b += 1
    }
    out.toSeq
  }

  test("HyperplaneBands sign-table signatures are bit-identical to the per-row hash derivation") {
    val gen = Gen.chooseNum(1, 96).flatMap(d =>
      Gen.listOfN(d, Gen.chooseNum(-4.0f, 4.0f)))
    (0 until 40).foreach { i =>
      val vec = gen(Gen.Parameters.default, Seed(i.toLong)).get.toArray
      val got = VecOpsUtil
        .hyperplaneBands(new GenericArrayData(vec.map(_.toDouble.toFloat)), 128, 8)
        .toLongArray().toSeq
      got shouldBe referenceBands(vec, 128, 8)
    }
  }

  test("PqAdc sums the coded LUT entries, interpreted and codegen'd alike") {
    import org.apache.spark.sql.functions.{col, typedlit}
    import spark.implicits._
    // m=3 subspaces, k=2 entries: codes pick lut[j*2 + code_j]
    val lut = Seq(10.0, 20.0, 30.0, 40.0, 50.0, 60.0)
    // build codes from a RANGE column so the projection is NOT foldable —
    // a local-relation frame would be constant-folded by the optimizer and
    // this test would never execute PqAdc.doGenCode (only nullSafeEval)
    val df = spark.range(0, 3)
      .withColumn("codes", org.apache.spark.sql.functions.array(
        (col("id") % 2).cast("int"),                       // 0, 1, 0
        ((col("id") >= 2).cast("int") * 9 + (col("id") % 2).cast("int")), // 0, 1, 9
        (col("id") - col("id")).cast("int")))              // 0, 0, 0
      .withColumn("lut", typedlit(lut))
    // id=0: codes(0,0,0) -> 10+30+50 = 90
    // id=1: codes(1,1,0) -> 20+40+50 = 110
    // id=2: codes(0,9,0) -> out-of-range middle code scores 0 -> 10+0+50 = 60
    val got = df
      .withColumn("s", VecOps.pqAdcf(col("codes"), col("lut"), k = 2))
      .orderBy("id").select("s").as[Double].collect().toSeq
    got shouldBe Seq(90.0, 110.0, 60.0)
    // interpreted path agrees (codegen ran above via the projection)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType, IntegerType}
    PqAdc(
      Literal.create(Seq(0, 1, 0), ArrayType(IntegerType)),
      Literal.create(lut, ArrayType(DoubleType)), 2)
      .eval(null) shouldBe 100.0
  }

  test("PqEncode packs bytes and PqAdc reads them unsigned: encode->ADC pipeline, codegen'd and interpreted") {
    import org.apache.spark.sql.functions.{array, col, lit, typedlit, when}
    import spark.implicits._
    // m=2 subspaces of subDim=2, k=2 entries each: subspace j's entries are
    // the unit axes, so the nearest-entry code is just "which axis is set"
    val cb = Array(1f, 0f, 0f, 1f, /* subspace 0: c0=[1,0], c1=[0,1] */
                   1f, 0f, 0f, 1f) /* subspace 1: same */
    // non-foldable vectors from a RANGE column (same rationale as below:
    // a local relation would constant-fold past doGenCode)
    val df = spark.range(0, 4)
      .withColumn("v", array(
        when(col("id") % 2 === 0, 1f).otherwise(0f),
        when(col("id") % 2 === 0, 0f).otherwise(1f),
        when(col("id") < 2, 1f).otherwise(0f),
        when(col("id") < 2, 0f).otherwise(1f)))
      .withColumn("codes", VecOps.pqEncodef(col("v"), cb, m = 2, k = 2))
      // query [3,4,5,6] against the axis codebook -> lut = [3,4,5,6]
      .withColumn("lut", typedlit(Seq(3.0, 4.0, 5.0, 6.0)))
      .withColumn("adc", VecOps.pqAdcf(col("codes"), col("lut"), k = 2))
    df.schema("codes").dataType shouldBe org.apache.spark.sql.types.BinaryType
    // id=0: codes(0,0) -> 3+5; id=1: (1,0) -> 4+5; id=2: (0,1) -> 3+6;
    // id=3: (1,1) -> 4+6
    df.orderBy("id").select("adc").as[Double].collect().toSeq shouldBe
      Seq(8.0, 9.0, 9.0, 10.0)
    // interpreted path: packed bytes read UNSIGNED (0x81 = 129, out of
    // range for k=2 -> scores 0 for that subspace, never a negative index)
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType}
    PqAdc(
      Literal.create(Array[Byte](1, 0x81.toByte), BinaryType),
      Literal.create(Seq(3.0, 4.0, 5.0, 6.0), ArrayType(DoubleType)), 2)
      .eval(null) shouldBe 4.0
  }

  test("HyperplaneBands: zero vector and repeated calls are deterministic") {
    val zero = new GenericArrayData(Array.fill(16)(0.0f))
    val a = VecOpsUtil.hyperplaneBands(zero, 128, 8).toLongArray().toSeq
    val b = VecOpsUtil.hyperplaneBands(zero, 128, 8).toLongArray().toSeq
    a shouldBe b
    a.length shouldBe 16
    // all-zero dots never satisfy acc > 0 -> every band is just its index mix
    a.zipWithIndex.foreach { case (sig, band) => sig shouldBe (band.toLong << 32) }
  }
}
