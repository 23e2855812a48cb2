package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Softmax weighting + scatter-add redistribution
  * (reference: cocoa/nearest_consented_customers.py:376-467).
  */
object Adjust {

  /** Per-noconsent-row `softmax(−dist)` over its neighbor set, and the
    * weighted value share. Numerically stable exactly like
    * `scipy.special.softmax` — the max exponent of `softmax(−d)` sits at the
    * minimum distance, which is subtracted before exp
    * (reference: cocoa/nearest_consented_customers.py:404-410; SURVEY §7.4.2).
    *
    * Invariant (pinned in AdjustSpec): Σ weight == 1 and
    * Σ weighted_value == nc_value per noconsent row — conservation of each
    * declined conversion (reference test
    * cocoa/nearest_consented_customers_test.py:116-126).
    */
  def softmaxShares(pairs: DataFrame, spec: CohortSpec): DataFrame = {
    val w = Window.partitionBy((spec.cohortCols :+ "nc_idx").map(col(_)): _*)
    // Reference :400-402 raises on negative distances (a custom metric
    // could produce them; softmax(−d) would then overweight silently).
    // raise_error under when() is a codegen'd branch — free on the hot path.
    val dist = when(col("dist") < 0, raise_error(lit(
        "Distances should not contain negative values. " +
          "Please review which distance metric you used.")))
      .otherwise(col("dist"))
    val e = exp(-(dist - min(dist).over(w)))
    pairs
      .withColumn("weight", e / sum(e).over(w))
      .withColumn("weighted_value", col("nc_value") * col("weight"))
  }

  /** Scatter-add the shares onto the consent cohort — in Spark the pandas
    * `.loc[index, …] +=` loop (reference :446-458) becomes a hash
    * aggregation over the pairs relation followed by a left outer equi-join
    * back onto consent (broadcast-able: the aggregate is ≤ |C| rows).
    *
    * Semantics preserved:
    *  - unmatched consent rows keep 0 in the accumulators …
    *  - … except `average_distance`, where pandas' 0/0 yields NaN — we keep
    *    null (documented deviation, SURVEY §7.4.3);
    *  - `naive_adjusted_conversion` adds Σ(matched noconsent value)/|consent|
    *    — matched-only numerator over the FULL consent count
    *    (reference :463-466, SURVEY §2 A2) — computed per cohort.
    */
  def distribute(consent: DataFrame, shares: DataFrame, spec: CohortSpec): DataFrame = {
    val cohort = spec.cohortCols
    val byConsent = shares
      .groupBy((cohort :+ "c_idx").map(col(_)): _*)
      .agg(
        sum("weighted_value").as("adjusted_conversion"),
        (sum("dist") / count(lit(1))).as("average_distance"),
        count(lit(1)).cast("long").as("n_added_conversions"),
        sum("weight").as("sum_distribution_weights"))
      .withColumnRenamed("c_idx", spec.idCol)

    // Per-cohort naive scalar: matched nc values are one row per pair in
    // `shares` — dedupe to (nc_idx, nc_value) before summing.
    val naive = {
      val matchedNc = shares.select((cohort ++ Seq("nc_idx", "nc_value")).map(col(_)): _*).distinct()
        .groupBy(cohort.map(col(_)): _*).agg(sum("nc_value").as("__nc_sum"))
      val cCnt = consent.groupBy(cohort.map(col(_)): _*)
        .agg(count(lit(1)).as("__c_cnt"))
      val joined = if (cohort.nonEmpty) cCnt.join(matchedNc, cohort, "left")
        else cCnt.crossJoin(matchedNc)
      joined.select((cohort.map(col(_)) :+
        (coalesce(col("__nc_sum"), lit(0.0)) / col("__c_cnt")).as("__naive")): _*)
    }

    val joinKeys = cohort :+ spec.idCol
    val base = consent
      .join(broadcast(byConsent), joinKeys, "left")
      .na.fill(0.0, Seq("adjusted_conversion", "sum_distribution_weights"))
      .na.fill(0L, Seq("n_added_conversions"))
    val withNaive =
      if (cohort.nonEmpty) base.join(broadcast(naive), cohort, "left")
      else base.crossJoin(broadcast(naive))
    withNaive
      .withColumn("naive_adjusted_conversion",
        col(spec.valueCol) + coalesce(col("__naive"), lit(0.0)))
      .drop("__naive")
  }
}
