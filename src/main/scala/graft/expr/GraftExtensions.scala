package graft.expr

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registers graft's native expressions as SQL functions, so
  * `spark.sql("SELECT token_intersection_size(a, b) …")` works for SQL-only
  * users. Activate with
  * `.config("spark.sql.extensions", "graft.expr.GraftExtensions")` or
  * programmatically via `SparkSession.builder.withExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def unary(name: String, usage: String, f: Expression => Expression) =
    (new FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 1, s"$name takes 1 argument")
        f(args.head)
      })

  private def binary(name: String, usage: String,
                     f: (Expression, Expression) => Expression) =
    (new FunctionIdentifier(name), info(name, usage),
      (args: Seq[Expression]) => {
        require(args.length == 2, s"$name takes 2 arguments")
        f(args(0), args(1))
      })

  /** Extract a literal int argument (SQL callers pass banding/seed knobs as
    * literals — they parameterize codegen, they can't be column-valued). */
  private def litInt(e: Expression, name: String, arg: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _)
        if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
    case other => throw new IllegalArgumentException(
      s"$name: $arg must be an int-range integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(binary("token_intersection_size",
      "|a ∩ b| of two string-token arrays", TokenIntersectionSize(_, _)))
    ext.injectFunction(binary("long_intersect_size",
      "|a ∩ b| of two bigint arrays", LongIntersectSize(_, _)))
    ext.injectFunction(binary("dot_product",
      "sequential dot product of two double arrays", DotProduct(_, _)))
    ext.injectFunction(unary("poly_hash",
      "31-base polynomial code-point hash mod 1e9+7", PolyHash(_)))
    ext.injectFunction(unary("simhash30",
      "30-bit simhash of a bigint hash array", SimHash30(_)))
    ext.injectFunction((new FunctionIdentifier("token_shingle_hashes"),
      info("token_shingle_hashes", "distinct k-shingle hashes of a token array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "token_shingle_hashes takes (tokens, k)")
        TokenShingleHashes(args(0), litInt(args(1), "token_shingle_hashes", "k"))
      }))
    ext.injectFunction((new FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "n-slot MinHash signature of a bigint hash array"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "minhash_sig takes (hashes, nSlots)")
        val n = litInt(args(1), "minhash_sig", "nSlots")
        require(n >= 1 && n <= graft.ops.Dedup.MaxHashes,
          s"minhash_sig: nSlots in [1, ${graft.ops.Dedup.MaxHashes}]")
        val seeds = graft.ops.Dedup.Seeds.take(n)
        MinHashSig(args(0), seeds.map(_._1), seeds.map(_._2))
      }))
    ext.injectFunction((new FunctionIdentifier("cosine_lsh_sig"),
      info("cosine_lsh_sig", "sign-random-projection signature of a double array"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "cosine_lsh_sig takes (vec, nBits, seed)")
        CosineLshSig(args(0), litInt(args(1), "cosine_lsh_sig", "nBits"),
          litInt(args(2), "cosine_lsh_sig", "seed").toLong)
      }))
  }
}
