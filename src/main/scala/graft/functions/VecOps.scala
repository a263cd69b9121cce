package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.{toColumn, toExpression}
import org.apache.spark.sql.graftnative.typeCollection
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native dot product of two `array<float>` columns, accumulated
  * left-to-right in double precision.
  *
  * Purpose: the equivalent `aggregate(zip_with(a, b, ...), 0d, ...)`
  * higher-order-function chain is a CodegenFallback — every pair
  * evaluation allocates closures and boxes elements, which dominated the
  * embedding benchmarks. This expression generates a tight primitive loop
  * inside whole-stage codegen (~20x on the all-pairs cosine join) while
  * producing a bit-identical result (same fold order, so the DuckDB
  * `list_reduce` oracle still hash-matches).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane (SimHash-for-vectors, Charikar) LSH band signatures
  * for an `array<float>` embedding: `numBits` sign bits — bit k is the
  * sign of the dot product with a Rademacher (±1) hyperplane whose signs
  * are derived from a seeded hash of (bit index, dimension) — grouped into
  * bands of `rowsPerBand` bits, each band packed into one long (band index
  * mixed into the high bits so signatures from different bands never
  * collide by accident).
  *
  * P(bit agrees) = 1 - angle/pi, so a band of r bits collides with
  * probability (1 - theta/pi)^r and any-of-b-bands recall is
  * 1-(1-p^r)^b — the usual LSH S-curve; with r=8, b=16 a pair at
  * cosine 0.99 is recalled with P ~ 1-1e-9 while background pairs
  * (cosine ~0) collide at ~6%. Same narrow-projection rationale as
  * [[graft.functions.MinHashBands]]: signatures at scan speed, only the
  * small (vec_id, band, sig) table is shuffled.
  */
case class HyperplaneBands(child: Expression, numBits: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numBits % rowsPerBand == 0, "numBits must divide into bands")

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "hyperplane_bands"

  override protected def nullSafeEval(input: Any): Any =
    VecOpsUtil.hyperplaneBands(input.asInstanceOf[ArrayData], numBits, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.VecOpsUtil.hyperplaneBands($c, $numBits, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object VecOpsUtil {

  /** Lazily-built Rademacher sign matrix, one per (numBits, dimension):
    * entry [k*d + i] is the ±1.0 hyperplane sign for (bit k, dim i),
    * derived from the same seeded XXH64 as before. Computed ONCE per JVM
    * (per executor — no broadcast needed, the matrix is a pure function of
    * its key) instead of numBits × d hash calls PER ROW, which made
    * signature generation hash-bound rather than FLOP-bound (~10x on the
    * q61 projection stage). ~numBits × d × 8 bytes, e.g. 128 × 64 = 64 KiB.
    */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Double]]()

  private def signTable(numBits: Int, d: Int): Array[Double] = {
    val key = java.lang.Long.valueOf((numBits.toLong << 32) | d.toLong)
    var t = signCache.get(key)
    if (t == null) {
      t = new Array[Double](numBits * d)
      var k = 0
      while (k < numBits) {
        var i = 0
        while (i < d) {
          // Rademacher +-1 from the sign bit of a seeded hash of (bit, dim)
          val h = XXH64.hashLong(i.toLong, 0x9E3779B97F4A7C15L * k + 42L)
          t(k * d + i) = if (h < 0) -1.0 else 1.0
          i += 1
        }
        k += 1
      }
      signCache.putIfAbsent(key, t)
    }
    t
  }

  /** See [[HyperplaneBands]]. Public + static-shaped so generated code can
    * call it directly. The hyperplane family is fixed (pure function of
    * bit index x dimension), so signatures are deterministic across runs
    * and executors with no broadcast of a projection matrix. ±1.0 × v is
    * IEEE-identical to the previous branch-select (including -0.0), so
    * signatures are bit-for-bit unchanged.
    */
  def hyperplaneBands(arr: ArrayData, numBits: Int, rowsPerBand: Int): ArrayData = {
    val d = arr.numElements()
    val signs = signTable(numBits, d)
    val numBands = numBits / rowsPerBand
    val bands = new Array[Long](numBands)
    var b = 0
    var k = 0
    while (b < numBands) {
      var sig = 0L
      var r = 0
      while (r < rowsPerBand) {
        var acc = 0.0
        var i = 0
        val base = k * d
        while (i < d) {
          acc += signs(base + i) * arr.getFloat(i).toDouble
          i += 1
        }
        sig = (sig << 1) | (if (acc > 0) 1L else 0L)
        r += 1
        k += 1
      }
      bands(b) = sig ^ (b.toLong << 32)
      b += 1
    }
    new GenericArrayData(bands)
  }
}

/** Product-quantization ADC (asymmetric distance computation) score:
  * given a candidate's PQ `codes` — either BYTE-PACKED `binary` (one
  * unsigned byte per subspace, the scan format: 16 B/vector at m=16) or
  * `array<int>` (the SQL-surface form) — and a query's flat lookup table
  * `lut` (array<double>, laid out [subspace j][codebook entry c] at
  * j*k + c, holding the query subvector · centroid dot products), returns
  * sum_j lut[j*k + codes[j]] ≈ query · candidate.
  *
  * This is THE point of PQ at scale: candidate scoring is m table reads
  * instead of a d-element multiply-add (m=16 vs d=64 here), and only the
  * m small codes — not the vectors — are scanned. Native codegen for the
  * same reason as [[VecDot]]: the equivalent
  * aggregate(zip_with(codes, sequence(...), ...)) HOF chain is a
  * CodegenFallback that boxes every lookup. A code outside [0, k) scores
  * 0 for its subspace (defensive: cannot happen for codes produced by
  * the trainer, and must never silently read another subspace's entry;
  * packed bytes read unsigned, so k up to 256 is addressable).
  */
case class PqAdc(left: Expression, right: Expression, k: Int)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(typeCollection(BinaryType, ArrayType(IntegerType)), ArrayType(DoubleType))

  override def dataType: DataType = DoubleType

  override def prettyName: String = "pq_adc"

  private def packed: Boolean = left.dataType == BinaryType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val lut = b.asInstanceOf[ArrayData]
    val n = lut.numElements()
    var acc = 0.0
    if (packed) {
      val codes = a.asInstanceOf[Array[Byte]]
      var j = 0
      while (j < codes.length) {
        val c = codes(j) & 0xFF
        val idx = j * k + c
        if (c < k && idx < n) acc += lut.getDouble(idx)
        j += 1
      }
    } else {
      val codes = a.asInstanceOf[ArrayData]
      val m = codes.numElements()
      var j = 0
      while (j < m) {
        val c = codes.getInt(j)
        val idx = j * k + c
        if (c >= 0 && c < k && idx < n) acc += lut.getDouble(idx)
        j += 1
      }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val idx = ctx.freshName("idx")
      val acc = ctx.freshName("acc")
      if (packed)
        s"""
           |int $n = $b.numElements();
           |double $acc = 0.0;
           |for (int $j = 0; $j < $a.length; $j++) {
           |  int $c = $a[$j] & 0xFF;
           |  int $idx = $j * $k + $c;
           |  if ($c < $k && $idx < $n) $acc += $b.getDouble($idx);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      else {
        val m = ctx.freshName("m")
        s"""
           |int $m = $a.numElements();
           |int $n = $b.numElements();
           |double $acc = 0.0;
           |for (int $j = 0; $j < $m; $j++) {
           |  int $c = $a.getInt($j);
           |  int $idx = $j * $k + $c;
           |  if ($c >= 0 && $c < $k && $idx < $n) $acc += $b.getDouble($idx);
           |}
           |${ev.value} = $acc;
         """.stripMargin
      }
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}

/** PQ encoder: nearest codebook entry per subspace in ONE expression,
  * emitted BYTE-PACKED (`binary`, one unsigned byte per subspace — the
  * persisted scan format: m bytes/vector, 16 B here vs 256 B for the raw
  * 64-float vector; requires k <= 256, enforced at construction).
  * `cb` is the flattened [m][k][subDim] codebook, carried as a reference
  * object into codegen — the equivalent built from m*k per-centroid
  * VecDot columns plans a >1000-node expression tree whose Catalyst
  * optimization alone dominated the query runtime (measured on q81);
  * here planning sees one opaque node and the whole encode is three
  * tight loops. Input must be the unit-normalized vector (spherical PQ).
  */
case class PqEncode(child: Expression, cb: Array[Float], m: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(k <= 256, s"pq_encode packs one byte per subspace: k=$k > 256")

  private val subDim = cb.length / (m * k)

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = BinaryType

  override def prettyName: String = "pq_encode"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_encode: vector has ${x.numElements()} elements, codebook needs ${m * subDim}")
    val codes = new Array[Byte](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bd = Double.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0.0
        var i = 0
        val base = (j * k + c) * subDim
        while (i < subDim) {
          val t = x.getFloat(j * subDim + i).toDouble - cb(base + i)
          dist += t * t
          i += 1
        }
        if (dist < bd) { bd = dist; best = c }
        c += 1
      }
      codes(j) = best.toByte
      j += 1
    }
    codes
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val best = ctx.freshName("best")
      val bd = ctx.freshName("bd"); val dist = ctx.freshName("dist")
      val base = ctx.freshName("base"); val t = ctx.freshName("t")
      s"""
         |if ($x.numElements() < $m * $subDim)
         |  throw new IllegalArgumentException(
         |    "pq_encode: vector has " + $x.numElements() + " elements, codebook needs " + ($m * $subDim));
         |byte[] $codes = new byte[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $best = 0; double $bd = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $dist = 0.0;
         |    int $base = ($j * $k + $c) * $subDim;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      double $t = (double) $x.getFloat($j * $subDim + $i) - $cbRef[$base + $i];
         |      $dist += $t * $t;
         |    }
         |    if ($dist < $bd) { $bd = $dist; $best = $c; }
         |  }
         |  $codes[$j] = (byte) $best;
         |}
         |${ev.value} = $codes;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** PQ query lookup table: lut[j*k + c] = querySubvector_j · centroid_jc,
  * one expression per query row (same planning rationale as
  * [[PqEncode]]). Input must be the unit-normalized query vector.
  */
case class PqLut(child: Expression, cb: Array[Float], m: Int, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  private val subDim = cb.length / (m * k)

  override def inputTypes = Seq(ArrayType(FloatType))

  override def dataType: DataType = ArrayType(DoubleType)

  override def prettyName: String = "pq_lut"

  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    if (x.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"pq_lut: vector has ${x.numElements()} elements, codebook needs ${m * subDim}")
    val lut = new Array[Double](m * k)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < k) {
        var acc = 0.0
        var i = 0
        val base = (j * k + c) * subDim
        while (i < subDim) {
          acc += x.getFloat(j * subDim + i).toDouble * cb(base + i)
          i += 1
        }
        lut(j * k + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqcb", cb, "float[]")
    nullSafeCodeGen(ctx, ev, x => {
      val lut = ctx.freshName("lut")
      val j = ctx.freshName("j"); val c = ctx.freshName("c")
      val i = ctx.freshName("i"); val acc = ctx.freshName("acc")
      val base = ctx.freshName("base")
      s"""
         |if ($x.numElements() < $m * $subDim)
         |  throw new IllegalArgumentException(
         |    "pq_lut: vector has " + $x.numElements() + " elements, codebook needs " + ($m * $subDim));
         |double[] $lut = new double[$m * $k];
         |for (int $j = 0; $j < $m; $j++) {
         |  for (int $c = 0; $c < $k; $c++) {
         |    double $acc = 0.0;
         |    int $base = ($j * $k + $c) * $subDim;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $acc += (double) $x.getFloat($j * $subDim + $i) * $cbRef[$base + $i];
         |    }
         |    $lut[$j * $k + $c] = $acc;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($lut);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

object VecOps {

  /** `vec_dot(a, b)` as a Column. */
  def dotf(a: Column, b: Column): Column =
    toColumn(VecDot(toExpression(a), toExpression(b)))

  /** `pq_adc(codes, lut)` as a Column (k = codebook entries per subspace). */
  def pqAdcf(codes: Column, lut: Column, k: Int): Column =
    toColumn(PqAdc(toExpression(codes), toExpression(lut), k))

  /** `pq_encode(unitVec)` as a Column (cb = flattened [m][k][subDim]). */
  def pqEncodef(unitVec: Column, cb: Array[Float], m: Int, k: Int): Column =
    toColumn(PqEncode(toExpression(unitVec), cb, m, k))

  /** `pq_lut(unitQuery)` as a Column (cb = flattened [m][k][subDim]). */
  def pqLutf(unitQuery: Column, cb: Array[Float], m: Int, k: Int): Column =
    toColumn(PqLut(toExpression(unitQuery), cb, m, k))

  /** L2 norm of an `array<float>` column (sqrt of the self dot product). */
  def normf(a: Column): Column =
    org.apache.spark.sql.functions.sqrt(dotf(a, a))

  /** `hyperplane_bands(vec)` as a Column. */
  def hyperplaneBandsf(vec: Column, numBits: Int, rowsPerBand: Int): Column =
    toColumn(HyperplaneBands(toExpression(vec), numBits, rowsPerBand))
}
