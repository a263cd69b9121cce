package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftnative.{toColumn, toExpression}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass shingle hashing for the dedup family (q36/q37/q38).
  *
  * Why native: the declarative chain
  * `array_sort(transform(array_distinct(transform(sequence(...), trigram)),
  * xxhash64))` is a stack of interpreted higher-order functions
  * (CodegenFallback — closure + boxing per element) that cost ~2.5 s at
  * sf0.1 just to materialize. This expression does the whole job —
  * tokenize, hash each word-trigram, sort, dedupe — in one primitive-array
  * pass per row, inside whole-stage codegen (the generated code calls the
  * static [[TextHashUtil.shingleHash]] helper, so rows stay unboxed in the
  * surrounding pipeline).
  *
  * Semantics: tokens are single-space splits (same as `split(text, ' ')`);
  * a shingle is 3 consecutive tokens; the hash is an XXH64 chain over the
  * per-token XXH64s, so equal trigram strings get equal hashes and token
  * boundaries are preserved (tokens cannot contain the separator). Output
  * is the SORTED DISTINCT `array<long>` — sorted so a global-order prefix
  * is `slice` and a merge-intersection is linear; distinct to match
  * `array_distinct` on the string shingles. Texts under 3 tokens yield an
  * empty array (same guard as the declarative form).
  */
case class ShingleHash(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "shingle_hash"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.shingleHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.shingleHash($c)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHash =
    copy(child = newChild)
}

/** Count of common elements between two SORTED DISTINCT `array<long>`
  * columns, via a linear merge — no per-row hash set, no result-array
  * allocation (both of which make `size(array_intersect(a, b))` the
  * bottleneck of candidate-pair verification: ~3.5 s for ~570 k pairs at
  * sf0.1). Inputs MUST be sorted ascending and duplicate-free
  * ([[ShingleHash]] output is); the merge is then exact.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val nx = x.numElements()
    val ny = y.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $nx = $a.numElements();
         |int $ny = $b.numElements();
         |int $i = 0; int $j = 0; long $c = 0L;
         |while ($i < $nx && $j < $ny) {
         |  long $xv = $a.getLong($i);
         |  long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

/** MinHash+LSH band signatures in one pass: for an `array<long>` of
  * feature hashes, computes `numHashes` seeded-permutation minima
  * (hash_i(e) = XXH64(e, seed=i)) and folds each group of `rowsPerBand`
  * minima into one XXH64-chained band signature. Output:
  * `array<long>` of length `numHashes / rowsPerBand`.
  *
  * Why native: the declarative form is explode (|corpus| x |doc| rows
  * through a shuffle) + a 64-column min aggregate (a huge generated
  * aggregate class) + re-hash into bands. This is a narrow per-row
  * projection instead — LSH banding becomes scan-shaped, and only the
  * tiny (doc_id, band, sig) table is ever shuffled.
  */
case class MinHashBands(child: Expression, numHashes: Int, rowsPerBand: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")

  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "minhash_bands"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.minHashBands(input.asInstanceOf[ArrayData], numHashes, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHashUtil.minHashBands($c, $numHashes, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

/** 64-bit SimHash of an `array<long>` of feature hashes: per-bit majority
  * vote over the features' own bits (the features are already uniform
  * 64-bit hashes, so no re-hash is needed). Same narrow-projection
  * rationale as [[MinHashBands]] — replaces an explode + 64-column vote
  * aggregate with a per-row loop.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashUtil.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashUtil.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object TextHashUtil {

  private val Seed = 42L
  private val Space = UTF8String.fromString(" ")

  /** See [[ShingleHash]]. Public + static-shaped so generated code can
    * call it directly.
    */
  def shingleHash(s: UTF8String): ArrayData = {
    val toks = s.split(Space, -1)
    if (toks.length < 3) return new GenericArrayData(Array.empty[Long])
    val th = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      th(i) = XXH64.hashUnsafeBytes(t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)
      i += 1
    }
    val out = new Array[Long](toks.length - 2)
    i = 0
    while (i < out.length) {
      out(i) = XXH64.hashLong(th(i + 2),
        XXH64.hashLong(th(i + 1), XXH64.hashLong(th(i), Seed)))
      i += 1
    }
    java.util.Arrays.sort(out)
    var w = 0
    var r = 0
    while (r < out.length) {
      if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    new GenericArrayData(if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  /** See [[MinHashBands]]. Empty input yields an empty array (docs with no
    * shingles generate no band rows, matching the explode-based form where
    * they simply had no feature rows).
    */
  def minHashBands(arr: ArrayData, numHashes: Int, rowsPerBand: Int): ArrayData = {
    val n = arr.numElements()
    val numBands = numHashes / rowsPerBand
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val e = arr.getLong(i)
      var h = 0
      while (h < numHashes) {
        val v = XXH64.hashLong(e, h.toLong)
        if (v < mins(h)) mins(h) = v
        h += 1
      }
      i += 1
    }
    val bands = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var sig = XXH64.hashLong(b.toLong, Seed)
      var r = 0
      while (r < rowsPerBand) {
        sig = XXH64.hashLong(mins(b * rowsPerBand + r), sig)
        r += 1
      }
      bands(b) = sig
      b += 1
    }
    new GenericArrayData(bands)
  }

  /** See [[SimHash64]]. Empty input yields 0L — callers filter empty-feature
    * docs out before blocking (an all-zero signature would otherwise make
    * every empty doc a candidate pair of every other).
    */
  def simHash64(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}

object TextHash {

  /** `shingle_hash(text)` as a Column. */
  def shingleHashf(text: Column): Column =
    toColumn(ShingleHash(toExpression(text)))

  /** `intersect_count(a, b)` as a Column. */
  def intersectCountf(a: Column, b: Column): Column =
    toColumn(IntersectCount(toExpression(a), toExpression(b)))

  /** `minhash_bands(features)` as a Column. */
  def minHashBandsf(features: Column, numHashes: Int, rowsPerBand: Int): Column =
    toColumn(MinHashBands(toExpression(features), numHashes, rowsPerBand))

  /** `simhash64(features)` as a Column. */
  def simHash64f(features: Column): Column =
    toColumn(SimHash64(toExpression(features)))
}
