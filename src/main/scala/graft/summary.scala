package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Match-rate summary statistics and distance diagnostics
  * (reference: cocoa/nearest_consented_customers.py:90-143).
  */
object Summary {

  /** Per-noconsent-row distance to the nearest matched neighbor
    * (`distance_to_nearest_neighbor`, reference :365-367): min over the
    * selected pairs. Output: cohort…, nc_idx, nc_value,
    * distance_to_nearest_neighbor. */
  def nearestDistances(selectedPairs: DataFrame, spec: CohortSpec): DataFrame =
    selectedPairs
      .groupBy((spec.cohortCols ++ Seq("nc_idx", "nc_value")).map(col(_)): _*)
      .agg(min("dist").as("distance_to_nearest_neighbor"))

  /** The 4-column summary frame
    * (`summary_statistics_matched_conversions`, reference :126-138), one row
    * per cohort. `noconsent` is the full cleaned noconsent cohort;
    * `matchedNc` is [[nearestDistances]] output (one row per MATCHED row).
    *
    * percentage_matched_conversion_value = matched value / total value × 100
    * percentage_matched_conversions      = matched rows / total rows × 100
    */
  def matchedSummary(noconsent: DataFrame, matchedNc: DataFrame, spec: CohortSpec): DataFrame = {
    val cohort = spec.cohortCols
    val totals = noconsent.groupBy(cohort.map(col(_)): _*)
      .agg(sum(col(spec.valueCol).cast("double")).as("__tot_value"),
           count(lit(1)).as("__tot_n"))
    val matched = matchedNc.groupBy(cohort.map(col(_)): _*)
      .agg(sum("nc_value").as("total_matched_conversion_value"),
           count(lit(1)).as("number_matched_conversions"))
    val joined =
      if (cohort.nonEmpty) totals.join(matched, cohort, "left")
      else totals.crossJoin(matched)
    joined.select((cohort.map(col(_)) ++ Seq(
      (coalesce(col("total_matched_conversion_value"), lit(0.0)) / col("__tot_value") * 100)
        .as("percentage_matched_conversion_value"),
      (coalesce(col("number_matched_conversions"), lit(0L)) / col("__tot_n") * 100)
        .as("percentage_matched_conversions"),
      coalesce(col("number_matched_conversions"), lit(0L))
        .as("number_matched_conversions"),
      coalesce(col("total_matched_conversion_value"), lit(0.0))
        .as("total_matched_conversion_value"))): _*)
  }

  /** Exact linear-interpolation quantile of nearest-neighbor distances —
    * the percentile-strategy radius (reference :140-143 `Series.quantile`,
    * which is numpy linear interpolation; Spark's exact `percentile`
    * matches — SURVEY §7.4.6. percentile_approx would NOT). Driver-side
    * scalar: this feeds the second pass as a literal. */
  def minRadiusByPercentile(matchedNc: DataFrame, p: Double): Double =
    matchedNc
      .agg(expr(s"percentile(distance_to_nearest_neighbor, $p)"))
      .first().getDouble(0)

  /** Cohort-scoped percentile radius. The reference derives the radius per
    * pipeline run — i.e. per date (:518-523 runs inside the per-date DoFn) —
    * so a multi-cohort run must compute the quantile within each cohort, not
    * pooled over all of them (ADVICE r01). Output: (cohort…, __radius), one
    * row per cohort — dimension-sized, broadcast into the radius filter by
    * [[NeighborJoin.withinRadiusPerCohort]]. No cohort columns ⇒ one global
    * row (the single-date case, where this equals
    * [[minRadiusByPercentile]]). */
  def minRadiusByPercentilePerCohort(matchedNc: DataFrame, p: Double,
                                     spec: CohortSpec): DataFrame =
    matchedNc
      .groupBy(spec.cohortCols.map(col(_)): _*)
      .agg(expr(s"percentile(distance_to_nearest_neighbor, $p)").as("__radius"))

  /** `.describe(percentiles=[.25,.5,.75,.9,.95,.99])`-shaped diagnostics
    * over nearest distances (reference :117-123), one row per cohort. */
  def nearestDistanceStats(matchedNc: DataFrame, spec: CohortSpec): DataFrame = {
    val d = col("distance_to_nearest_neighbor")
    matchedNc.groupBy(spec.cohortCols.map(col(_)): _*).agg(
      count(lit(1)).as("count"),
      avg(d).as("mean"),
      stddev_samp(d).as("std"),
      min(d).as("min"),
      expr("percentile(distance_to_nearest_neighbor, 0.25)").as("p25"),
      expr("percentile(distance_to_nearest_neighbor, 0.5)").as("p50"),
      expr("percentile(distance_to_nearest_neighbor, 0.75)").as("p75"),
      expr("percentile(distance_to_nearest_neighbor, 0.9)").as("p90"),
      expr("percentile(distance_to_nearest_neighbor, 0.95)").as("p95"),
      expr("percentile(distance_to_nearest_neighbor, 0.99)").as("p99"),
      max(d).as("max"))
  }
}
