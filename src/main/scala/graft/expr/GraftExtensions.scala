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
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name)

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
  }
}
