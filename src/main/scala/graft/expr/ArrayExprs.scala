package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Kernels for numeric-array hot loops (jaccard verification, cosine ANN). */
object ArrayKernels {

  /** |a ∩ b| for two long arrays with distinct elements (shingle-hash
    * sets): copy, sort, merge-count. O((n+m)·log) with two primitive-array
    * allocations — versus `array_intersect`'s per-row boxed hash set. */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val xs = a.toLongArray()
    val ys = b.toLongArray()
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var cnt = 0
    while (i < xs.length && j < ys.length) {
      if (xs(i) < ys(j)) i += 1
      else if (xs(i) > ys(j)) j += 1
      else { cnt += 1; i += 1; j += 1 }
    }
    cnt
  }

  /** PQ asymmetric-distance score: Σ_m lut[m][codes[m]], accumulated in
    * ascending-m order (same IEEE fold as the zip_with+aggregate Column
    * form it replaces — that form evaluates TWO interpreted
    * HigherOrderFunctions and allocates an m-array per candidate pair,
    * measured 88 s for the 50M-pair 10× replica scan; this kernel is the
    * codegen'd O(m) lookup loop ADC is supposed to be). */
  def pqAdcScore(lut: ArrayData, codes: ArrayData): Double = {
    var s = 0.0
    var m = 0
    val n = codes.numElements()
    while (m < n) {
      s += lut.getArray(m).getDouble(codes.getInt(m))
      m += 1
    }
    s
  }

  /** Full MinHash signature in ONE pass over the shingle array:
    * out(i) = min over shingles h of (a(i)·h + b(i)) mod P, P = 1e9+7
    * (identical arithmetic to the per-seed Column formula
    * `array_min(transform(sh, h => (a*h + b) % P))`, which evaluates an
    * interpreted HigherOrderFunction per seed — this kernel replaces
    * `nSeeds` of those with one fused codegen'd loop; a,b < P and h < P so
    * a·h + b < 2^61 never overflows). */
  def minHashSig(shingles: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val n = a.length
    val out = new Array[Long](n)
    java.util.Arrays.fill(out, Long.MaxValue)
    val m = shingles.numElements()
    var j = 0
    while (j < m) {
      val h = shingles.getLong(j)
      var i = 0
      while (i < n) {
        val v = (a(i) * h + b(i)) % TextKernels.P
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Sign-random-projection LSH signature for cosine similarity: bit i is
    * set iff v · rᵢ > 0, where rᵢ is a deterministic Rademacher (±1) vector
    * derived from `seed` by an inline SplitMix64-style mix — no plane
    * materialization, dimension-agnostic, one pass over the vector per
    * signature. Agreement probability per bit for vectors at angle θ is
    * 1 − θ/π (Goemans–Williamson), the standard cosine-LSH family. */
  def cosineLshSig(v: ArrayData, nBits: Int, seed: Long): Long = {
    val d = v.numElements()
    var sig = 0L
    var i = 0
    while (i < nBits) {
      var acc = 0.0
      var j = 0
      while (j < d) {
        // SplitMix64 finalizer over (seed, bit, dim) — cheap, well mixed.
        var z = seed + (i.toLong << 32) + j + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        z = z ^ (z >>> 31)
        val r = if ((z & 1L) == 0L) 1.0 else -1.0
        acc += v.getDouble(j) * r
        j += 1
      }
      if (acc > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** Sequential-order dot product of two double arrays — same left-to-right
    * accumulation as `aggregate(zip_with(..))` and DuckDB's list kernel, so
    * results stay bit-identical with the oracle. */
  def dotProduct(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }
}

/** long_intersect_size(array<long>, array<long>) → int. */
case class LongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"long_intersect_size expects two array<bigint>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.sortedIntersectSize(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expr.ArrayKernels.sortedIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): LongIntersectSize = copy(left = l, right = r)
  override def prettyName: String = "long_intersect_size"
}

/** minhash_sig(array<long>) → array<long>: the full MinHash signature under
  * the (a, b) seed family, fused into one codegen'd pass. */
case class MinHashSig(child: Expression, a: Seq[Long], b: Seq[Long])
    extends UnaryExpression {
  require(a.nonEmpty && a.length == b.length, "seed arrays must align")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<bigint>, got ${t.sql}")
  }
  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray
  override def nullSafeEval(x: Any): Any =
    ArrayKernels.minHashSig(x.asInstanceOf[ArrayData], aArr, bArr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bArr, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.expr.ArrayKernels.minHashSig($c, $aRef, $bRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}

/** cosine_lsh_sig(array<double>) → long: sign-random-projection signature. */
case class CosineLshSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64, s"nBits in [1,64], got $nBits")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cosine_lsh_sig expects array<double>, got ${t.sql}")
  }
  override def nullSafeEval(x: Any): Any =
    ArrayKernels.cosineLshSig(x.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.ArrayKernels.cosineLshSig($c, $nBits, ${seed}L)")
  override protected def withNewChildInternal(newChild: Expression): CosineLshSig =
    copy(child = newChild)
  override def prettyName: String = "cosine_lsh_sig"
}

/** dot_product(array<double>, array<double>) → double. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"dot_product expects two array<double>, got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayKernels.dotProduct($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): DotProduct = copy(left = l, right = r)
  override def prettyName: String = "dot_product"
}

/** pq_adc_score(array<array<double>>, array<int>) → double: the PQ ADC
  * lookup fold Σ_m lut[m][codes[m]] as one codegen'd kernel — the per-
  * candidate hot path of [[graft.ops.Similarity.pqTopK]]. Codes are
  * trusted in-range (the encoder emits 0..kCents−1 literals). */
case class PqAdcScore(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ArrayType(DoubleType, _), _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<array<double>>, array<int>), got " +
          s"${left.dataType.sql} and ${right.dataType.sql}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.pqAdcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expr.ArrayKernels.pqAdcScore($a, $b)")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PqAdcScore = copy(left = l, right = r)
  override def prettyName: String = "pq_adc_score"
}

/** bloom_might_contain(bigint) → boolean: membership probe against a
  * driver-built [[org.apache.spark.util.sketch.BloomFilter]] carried as a
  * reference object into the generated code — the scan-side refinement for
  * decontamination ([[graft.ops.Dedup.contaminated]]): train shingles that
  * cannot be benchmark shingles are dropped BEFORE the shuffle join. False
  * positives only pass extra rows to the exact join; never wrong results. */
case class BloomMightContainLong(
    child: Expression,
    bloom: org.apache.spark.util.sketch.BloomFilter) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects bigint, got ${t.sql}")
  }
  override def nullSafeEval(x: Any): Any =
    bloom.mightContainLong(x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
  override def prettyName: String = "bloom_might_contain"
}
