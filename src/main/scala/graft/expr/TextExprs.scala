package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernels behind the text expressions. The Catalyst expressions below
  * compile to single static calls into these loops — versus the built-in
  * composition (`aggregate(split(s,''), …)`, per-bit `aggregate` folds)
  * which evaluates interpreted HigherOrderFunctions per character/bit and
  * dominated the profile (documents pipeline measured 10-20× faster here).
  *
  * Hash contract (shared with the DuckDB oracle twins in
  * [[graft.ops.TextSql]]): 31-base polynomial over Unicode CODE POINTS,
  * mod P = 1e9+7 — identical to
  * `list_reduce(…string_split(s,'')…, unicode(c)…)`.
  */
object TextKernels {
  val P = 1000000007L

  /** Polynomial hash of a string over its code points. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Hash of the space-joined k-token window starting at `from` — equal to
    * polyHash(tokens.slice(from, from+k).mkString(" ")) without building
    * the string. */
  private def windowHash(tokens: Array[String], from: Int, k: Int): Long = {
    var acc = 0L
    var t = from
    while (t < from + k) {
      val s = tokens(t)
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31 + cp) % P
        i += Character.charCount(cp)
      }
      if (t != from + k - 1) acc = (acc * 31 + ' '.toInt) % P
      t += 1
    }
    acc
  }

  /** Distinct k-shingle hashes of a token array (order of first
    * appearance — consumers are set/min operations). */
  def shingleHashes(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return ArrayData.toArrayData(Array.empty[Long])
    val strs = new Array[String](n)
    var i = 0
    while (i < n) {
      strs(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - k) {
      seen.add(windowHash(strs, i, k))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    ArrayData.toArrayData(out)
  }

  /** Σ over unigram+bigram feature grams of `weights[polyHash(gram) mod
    * dim]` — the hashed-n-gram linear-model logit numerator
    * ([[graft.ops.TextAnalysis.modelQualityScore]]) as ONE JVM loop.
    * Addition order is unigrams left-to-right THEN bigrams left-to-right:
    * exactly the left fold of the oracle twin (and of the HOF composition
    * this replaces, which paid an interpreted lambda + element_at per gram
    * — measured 81 s single-task on a 5.5k-doc scan vs milliseconds here).
    * Bigram hashes fold token, ' ', token without building the joined
    * string ([[windowHash]]). */
  def ngramWeightSum(tokens: ArrayData, weights: Array[Double], dim: Int): Double = {
    val n = tokens.numElements()
    val strs = new Array[String](n)
    var i = 0
    while (i < n) {
      strs(i) = if (tokens.isNullAt(i)) "" else tokens.getUTF8String(i).toString
      i += 1
    }
    var sum = 0.0
    i = 0
    while (i < n) {
      sum += weights((windowHash(strs, i, 1) % dim).toInt)
      i += 1
    }
    i = 0
    while (i < n - 1) {
      sum += weights((windowHash(strs, i, 2) % dim).toInt)
      i += 1
    }
    sum
  }

  /** 30-bit SimHash over a hash array: bit j set iff Σ over hashes of
    * (2·bit_j − 1) is positive. */
  def simHashBits(hashes: ArrayData): Long = {
    val counts = new Array[Int](30)
    var i = 0
    while (i < hashes.numElements()) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < 30) {
        counts(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 30) {
      if (counts(j) > 0) v |= (1L << j)
      j += 1
    }
    v
  }
}

/** polyhash(string) → long, codegen'd as one static call. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"poly_hash expects string, got ${t.sql}")
  }
  override def nullSafeEval(s: Any): Any =
    TextKernels.polyHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
  override def prettyName: String = "poly_hash"
}

/** shingle_hashes(array<string>, k) → array<long> (distinct). */
case class TokenShingleHashes(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"shingle size must be >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes expects array<string>, got ${t.sql}")
  }
  override def nullSafeEval(ts: Any): Any =
    TextKernels.shingleHashes(ts.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.shingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): TokenShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** ngram_weight_sum(array<string>, frozen weights, dim) → double: the
  * hashed unigram+bigram linear-model logit numerator in one codegen'd
  * static call. Weights ride as a Seq (value equality keeps plan
  * canonicalization sound) and reach generated code via addReferenceObj. */
case class NgramWeightSum(child: Expression, weights: Seq[Double], dim: Int)
    extends UnaryExpression {
  require(dim >= 1 && weights.size == dim,
    s"ngram_weight_sum needs |weights| == dim >= 1, got ${weights.size}/$dim")
  @transient private lazy val warr: Array[Double] = weights.toArray
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_weight_sum expects array<string>, got ${t.sql}")
  }
  override def nullSafeEval(ts: Any): Any =
    TextKernels.ngramWeightSum(ts.asInstanceOf[ArrayData], warr, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramWeights", warr, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.ngramWeightSum($c, $ref, $dim)")
  }
  override protected def withNewChildInternal(newChild: Expression): NgramWeightSum =
    copy(child = newChild)
  override def prettyName: String = "ngram_weight_sum"
}

/** simhash30(array<long>) → long. */
case class SimHash30(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash30 expects array<long>, got ${t.sql}")
  }
  override def nullSafeEval(hs: Any): Any =
    TextKernels.simHashBits(hs.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextKernels.simHashBits($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash30 =
    copy(child = newChild)
  override def prettyName: String = "simhash30"
}
