package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality profiling — the schema-audit pass a training-data pipeline
  * runs before trusting a new drop: per-column row/null/distinct counts in
  * long (one-row-per-column) form.
  */
object Profile {

  /** Shared one-pass profile plan: per column a null-count aggregate plus
    * `distinctAgg(column)` — the only thing the exact and approx forms
    * disagree on — then a driver-sized stack unpivot of the single
    * aggregated row. */
  private def profileWith(df: DataFrame, cols: Seq[String],
                          distinctAgg: String => Column): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        distinctAgg(c).as(s"__nd_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stacked = cols.map { c =>
      s"'$c', __nn_$c, __nd_$c"
    }.mkString(", ")
    one.select(col("__rows"),
      expr(s"stack(${cols.size}, $stacked) AS (column, n_nulls, n_distinct)"))
      .select(col("column"), col("__rows").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }

  /** Per-column profile of `df` restricted to `cols`: total rows, null
    * count, exact distinct count — the three numbers every ingestion gate
    * checks (unexpected null rates and cardinality collapses are the two
    * classic upstream-breakage signals).
    *
    * Plan shape: ONE scan. The multi-column `countDistinct` aggregate goes
    * through Catalyst's Expand — the input is replicated once per profiled
    * column map-side, each replica carrying only its own column (the others
    * are nulled), then a single partial-aggregated shuffle counts them all.
    * That is |cols|× map volume but stays one job, no per-column re-scan;
    * at 100 TB profile the columns you gate on, or use
    * [[columnProfileApprox]] — the exact form is kept here because the
    * oracle hashes it. */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    profileWith(df, cols, c => count_distinct(col(c)))

  /** The 100 TB twin of [[columnProfile]]: HyperLogLog++ distinct counts
    * (`approx_count_distinct`, relative error `rsd`) instead of exact —
    * NO Expand replication (each sketch aggregates the original row
    * stream), one partial-aggregated pass whose state is |cols| fixed-size
    * HLL registers per task. Same output schema; `n_distinct` is an
    * estimate (OpsSpec pins it within 3·rsd of exact on a spread of
    * cardinalities). Exact stays the oracle-gated form; this is the one
    * you point at a petabyte. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
                          rsd: Double = 0.02): DataFrame =
    profileWith(df, cols, c => approx_count_distinct(col(c), rsd))
}
