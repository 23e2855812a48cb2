package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  *  - [[cosineTopK]] — brute-force exact top-k: broadcast the query set,
  *    codegen'd zip_with/aggregate dot product, per-query window rank.
  *    The baseline and the oracle-checkable path.
  *  - [[partitionedTopK]] — IVF-style: candidates restricted to the same
  *    coarse partition (here the `label` column as the cell assignment),
  *    i.e. the cell-pruned search that makes 100 TB ANN tractable — the
  *    candidate join is an equi-join on the cell key instead of a cross
  *    join, so it shuffles |Q|+|C| not |Q|×|C|.
  *
  * Ordering is by similarity rounded to 9 dp with vec_id tie-break —
  * deterministic across engines despite last-ulp float differences.
  */
object Similarity {

  /** Sequential dot product via the codegen'd kernel
    * ([[graft.expr.DotProduct]]) — same left-to-right accumulation as the
    * interpreted `aggregate(zip_with(..))` it replaces, so oracle results
    * are bit-identical. Inputs are cast to array<double> first (a single
    * codegen'd Cast). */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      graft.expr.DotProduct(
        org.apache.spark.sql.graftbridge.Bridge.expression(a.cast("array<double>")),
        org.apache.spark.sql.graftbridge.Bridge.expression(b.cast("array<double>"))))

  def norm(a: Column): Column = sqrt(dot(a, a))

  private def ranked(joined: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("q_id").orderBy(graft.Num.rnd(col("sim"), 9).desc, col("c_id").asc)
    joined
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("rank"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** Exact cosine top-k of each query vector against the full corpus. */
  def cosineTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"),
      norm(col("embedding")).as("c_norm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("q_emb"),
      norm(col("embedding")).as("q_norm"))
    val joined = c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    ranked(joined, k)
  }

  /** Embedding-cosine near-duplicate pairs: exact all-pairs self-join with
    * the dot-product kernel, `a < b` dedupe, cosine ≥ threshold. The
    * brute-force baseline — at corpus scale the candidate set shrinks via
    * the same cell-pruned equi-join as [[partitionedTopK]] or random
    * hyperplane LSH before this exact verify. */
  def nearDupPairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val a = corpus.select(col("vec_id").as("a_id"), col("embedding").as("a_emb"),
      norm(col("embedding")).as("a_norm"))
    val b = corpus.select(col("vec_id").as("b_id"), col("embedding").as("b_emb"),
      norm(col("embedding")).as("b_norm"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("sim", dot(col("a_emb"), col("b_emb")) / (col("a_norm") * col("b_norm")))
      .filter(col("sim") >= threshold)
      .select(col("a_id"), col("b_id"), graft.Num.rnd(col("sim"), 6).as("sim"))
  }

  /** IVF-style top-k restricted to the query's coarse cell (cellCol). */
  def partitionedTopK(corpus: DataFrame, queries: DataFrame, cellCol: String,
                      k: Int): DataFrame = {
    val c = corpus.select(col(cellCol).as("cell"), col("vec_id").as("c_id"),
      col("embedding").as("c_emb"), norm(col("embedding")).as("c_norm"))
    val q = queries.select(col(cellCol).as("cell"), col("vec_id").as("q_id"),
      col("embedding").as("q_emb"), norm(col("embedding")).as("q_norm"))
    val joined = c.join(broadcast(q), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("sim", dot(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm")))
    ranked(joined, k)
  }
}
