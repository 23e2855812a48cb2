package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort cleaning + feature encoding.
  *
  * Mirrors `cocoa/preprocess.py`: drop null / non-positive conversions,
  * union the cohorts with a consent flag so both sides share one feature
  * space, one-hot ("dummy") encode categoricals, split back by flag.
  *
  * Two encodings are provided:
  *  - [[tokenFeatures]] — each row's active categories as an
  *    `ArrayType(StringType)` token set. Preferred: the manhattan distance
  *    over one-hot dummies is a set-difference size (see [[Manhattan]]), so
  *    the wide data-dependent dummy schema never has to exist. O(#cats) per
  *    row instead of O(#distinct values) columns — this is what survives a
  *    100 TB scale-up.
  *  - [[dummyEncode]] — faithful `pd.get_dummies` wide expansion
  *    (data-dependent schema via a distinct pass), kept for API parity and
  *    oracle checks (reference: cocoa/preprocess.py:99-104).
  */
object Preprocess {

  /** Drop rows with null or non-positive conversion values
    * (reference: cocoa/preprocess.py:30-49 `_clean_data`). */
  def clean(df: DataFrame, conversionCol: String): DataFrame =
    df.na.drop(Seq(conversionCol)).filter(col(conversionCol) > 0)

  /** Vertical union with a 0/1 consent flag, noconsent first
    * (reference: cocoa/preprocess.py:108-148). Spark's unionByName replaces
    * the pandas positional concat; the `len(concat)==len(a)+len(b)` sanity
    * check (preprocess.py:136-139) holds trivially and is pinned in tests. */
  def unionWithConsentFlag(noconsent: DataFrame, consent: DataFrame): DataFrame =
    noconsent
      .withColumn("consent", lit(0))
      .unionByName(consent.withColumn("consent", lit(1)))

  /** Split a unioned frame back into (noconsent, consent)
    * (reference: cocoa/preprocess.py:145-147). */
  def splitByConsent(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("consent") === 0).drop("consent"),
     df.filter(col("consent") === 1).drop("consent"))

  /** Encode categorical columns as one token array: value v of column c
    * becomes token "c=v"; null categories contribute no token (pandas
    * get_dummies drops NaN). Equivalent information to the dummy block,
    * O(|catCols|) per row. */
  def tokenFeatures(catCols: Seq[String], outCol: String = "features"): Column =
    array_compact(array(catCols.map { c =>
      when(col(c).isNotNull, concat(lit(c + "="), col(c).cast("string")))
    }: _*)).as(outCol)

  /** Faithful `pd.get_dummies`: distinct pass over each categorical column,
    * then an indicator column per (col, value), alphabetically ordered like
    * pandas, named `col_value` with non-alphanumerics sanitized to '_'.
    * Data-dependent schema — use only where parity demands the wide form
    * (reference: cocoa/preprocess.py:99-104). */
  def dummyEncode(df: DataFrame, catCols: Seq[String]): DataFrame = {
    val indicator = catCols.flatMap { c =>
      val values = df.select(col(c).cast("string")).na.drop()
        .distinct().collect().map(_.getString(0)).sorted
      values.map { v =>
        when(col(c).cast("string") === v, 1).otherwise(0).as(sanitize(s"${c}_$v"))
      }
    }
    val keep = df.columns.filterNot(catCols.contains).map(col(_))
    df.select(keep ++ indicator: _*)
  }

  def sanitize(name: String): String = name.replaceAll("[^A-Za-z0-9_]", "_")

  /** Deterministic dense row ids — the Spark replacement for the pandas
    * positional index that the reference uses as the neighbor join key
    * (reference: cocoa/preprocess.py:134-135,
    * cocoa/nearest_consented_customers.py:317-319). `row_number` over an
    * explicit ordering, NOT monotonically_increasing_id, so reruns are
    * stable. Note: a global Window without partition keys funnels through a
    * single task — fine for oracle-sized data; at scale prefer carrying a
    * natural unique key (as the TPC-H adapter does with o_orderkey). */
  def withRowIds(df: DataFrame, orderCols: Seq[String], outCol: String = "idx"): DataFrame =
    df.withColumn(outCol,
      row_number().over(Window.orderBy(orderCols.map(col(_)): _*)).cast("long") - 1)

  /** Scale path for [[withRowIds]]: the same deterministic dense ids with
    * NO single-task stage. `repartitionByRange` range-partitions on the
    * order columns (each partition holds a contiguous key range, sorted
    * within via `sortWithinPartitions`), a driver-collected count per
    * partition turns into cumulative offsets (one tiny job over partition
    * counts — the classic zipWithIndex shape), and a `mapPartitions` adds
    * offset + local position. Output equals [[withRowIds]] row-for-row when
    * the ordering keys are unique — pinned by PreprocessSpec. */
  def withRowIdsDistributed(df: DataFrame, orderCols: Seq[String],
                            outCol: String = "idx"): DataFrame = {
    // Persisted (at RDD level) so the count job and the id job see the SAME
    // partitions: RangePartitioner samples by partition-iteration order, so
    // re-materializing the lineage after an upstream shuffle could split
    // differently. RDD caching (unlike Dataset.persist, which the cache
    // manager pins until an explicit unpersist) is ContextCleaner-managed:
    // the block is freed once the returned plan is garbage-collected, so
    // repeated calls don't accumulate cached copies.
    // Explicit partition count: an advisory repartitionByRange is fair game
    // for AQE coalescing (small bytes ⇒ one partition ⇒ the single-task
    // stage this op exists to avoid); an explicit count is binding.
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // RangePartitioner's bound sampling is a FULL pass over the input
    // (reservoir sample per partition), so an uncached lineage — often a
    // whole kernel-heavy admission chain — would run twice: once for the
    // sample, once for the shuffle. Pin the input across those two passes
    // and free it as soon as the counts action has materialized the
    // sorted RDD (the narrow projection the caller hands in, not the
    // corpus).
    // no-op when the caller already pinned the frame (e.g. the banded
    // prep's cohort projections): unpersisting here would silently drop
    // the caller's cache entry (uncache matches by plan).
    val callerPinned =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val inp = if (callerPinned) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = inp
      .repartitionByRange(n, orderCols.map(col(_)): _*)
      .sortWithinPartitions(orderCols.map(col(_)): _*)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.size.toLong))
    }.collect().sortBy(_._1).map(_._2)
    if (!callerPinned) inp.unpersist(blocking = false)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val withIds = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var next = offsets(pid)
      it.map { r =>
        val out = org.apache.spark.sql.Row.fromSeq(r.toSeq :+ next)
        next += 1
        out
      }
    }
    df.sparkSession.createDataFrame(withIds, schema)
  }

  /** Distributed PER-GROUP dense row ids — the scale twin of
    * `row_number().over(Window.partitionBy(groupCols…).orderBy(orderCols…))
    * − 1`, which ships EVERY row of a group through one task (a 100 TB
    * stratum = one sort on one core). Same zipWithIndex shape as
    * [[withRowIdsDistributed]], generalized: range-partition on
    * (group ++ order) — a group's rows may span partitions, but each
    * partition holds a contiguous sorted slice of it — then one tiny job
    * collects per-(partition, group) counts, cumulative offsets per group
    * across partitions, and a streaming per-partition pass adds
    * offset + local position. CONTRACT: the collected state is
    * O(|partitions| × |distinct groups|) driver rows and the offsets map
    * ships in every task closure — the operator is for BOUNDED-CARDINALITY
    * strata (languages, sources, shards; its caller
    * [[graft.ops.Sampling.interleaveByStrata]] is exactly that), not for
    * data-sized keys like user ids, where the per-group id should come
    * from a window over the key's own partition instead. Requires
    * (group ++ order) to form a total order. Equivalence to the window
    * form is pinned by PreprocessSpec. */
  def withGroupRowIdsDistributed(df: DataFrame, groupCols: Seq[String],
                                 orderCols: Seq[String],
                                 outCol: String = "idx"): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty (use withRowIdsDistributed)")
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val keyCols = groupCols ++ orderCols
    // pinned across the range-sample + shuffle double pass (see
    // withRowIdsDistributed), freed right after the counts action
    // no-op when the caller already pinned the frame (e.g. the banded
    // prep's cohort projections): unpersisting here would silently drop
    // the caller's cache entry (uncache matches by plan).
    val callerPinned =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val inp = if (callerPinned) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = inp
      .repartitionByRange(n, keyCols.map(col(_)): _*)
      .sortWithinPartitions(keyCols.map(col(_)): _*)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gIdx = groupCols.map(sorted.schema.fieldIndex)
    val counts = rdd.mapPartitionsWithIndex { case (pid, it) =>
      // LinkedHashMap: a partition sees each group as one contiguous run,
      // so this is O(groups-in-partition) entries however large the slice
      val m = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Long]
      it.foreach { r =>
        val k = gIdx.map(r.get)
        m.update(k, m.getOrElse(k, 0L) + 1L)
      }
      m.iterator.map { case (k, c) => (pid, k, c) }
    }.collect()
    if (!callerPinned) inp.unpersist(blocking = false)
    val offsets: Map[(Int, Seq[Any]), Long] = counts.groupBy(_._2)
      .flatMap { case (g, cs) =>
        val inOrder = cs.sortBy(_._1)
        inOrder.map(_._1).zip(inOrder.map(_._3).scanLeft(0L)(_ + _))
          .map { case (pid, off) => (pid, g) -> off }
      }
    val schema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val withIds = rdd.mapPartitionsWithIndex { case (pid, it) =>
      val next = scala.collection.mutable.HashMap.empty[Seq[Any], Long]
      it.map { r =>
        val k = gIdx.map(r.get)
        val v = next.getOrElse(k, offsets.getOrElse((pid, k), 0L))
        next.update(k, v + 1)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ v)
      }
    }
    df.sparkSession.createDataFrame(withIds, schema)
  }

  /** Distributed INCLUSIVE running SUM of `valueCol` (integral) in the
    * total order of `orderCols` — [[withRunningFlagCount]] generalized from
    * a 0/1 flag to an arbitrary long-valued column: the scale twin of
    * `sum(value).over(Window.orderBy(orderCols…).rowsBetween(
    * unboundedPreceding, currentRow))` without the one-task global window.
    * Same two-job shape (range-partition + sort, per-partition sums →
    * cumulative offsets, streaming pass); order keys must form a total
    * order. Used by the token-budget corpus selection. */
  def withRunningSum(df: DataFrame, orderCols: Seq[String],
                     valueCol: String, outCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // pinned across the range-sample + shuffle double pass (see
    // withRowIdsDistributed), freed right after the sums action
    // no-op when the caller already pinned the frame (e.g. the banded
    // prep's cohort projections): unpersisting here would silently drop
    // the caller's cache entry (uncache matches by plan).
    val callerPinned =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val inp = if (callerPinned) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = inp
      .repartitionByRange(n, orderCols.map(col(_)): _*)
      .sortWithinPartitions(orderCols.map(col(_)): _*)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    def v(r: org.apache.spark.sql.Row): Long = r.getAs[Number](vIdx).longValue()
    val sums = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.foldLeft(0L)(_ + v(_))))
    }.collect().sortBy(_._1).map(_._2)
    if (!callerPinned) inp.unpersist(blocking = false)
    val offsets = sums.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        acc += v(r)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Distributed INCLUSIVE running count of rows with `flagCol` != 0 in the
    * total order of `orderCols` — the zipWithIndex-shaped scale twin of
    * `sum(flag).over(Window.orderBy(orderCols…).rowsBetween(
    * unboundedPreceding, currentRow))`, which funnels every row through ONE
    * task when there is no partition key. Same two-job shape as
    * [[withRowIdsDistributed]]: range-partition + sort, one tiny job for
    * per-partition flag counts → cumulative offsets, then a streaming
    * per-partition pass. Requires the order keys to form a total order
    * (ties would make both forms nondeterministic). Used by the banded
    * neighbor join's global-cohort path; equivalence to the window form is
    * pinned by PreprocessSpec. */
  def withRunningFlagCount(df: DataFrame, orderCols: Seq[String],
                           flagCol: String, outCol: String): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // pinned across the range-sample + shuffle double pass (see
    // withRowIdsDistributed), freed right after the counts action
    // no-op when the caller already pinned the frame (e.g. the banded
    // prep's cohort projections): unpersisting here would silently drop
    // the caller's cache entry (uncache matches by plan).
    val callerPinned =
      df.storageLevel != org.apache.spark.storage.StorageLevel.NONE
    val inp = if (callerPinned) df
      else df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sorted = inp
      .repartitionByRange(n, orderCols.map(col(_)): _*)
      .sortWithinPartitions(orderCols.map(col(_)): _*)
    val rdd = sorted.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val flagIdx = sorted.schema.fieldIndex(flagCol)
    def flagged(r: org.apache.spark.sql.Row): Boolean =
      r.getAs[Number](flagIdx).longValue() != 0L
    val counts = rdd.mapPartitionsWithIndex { case (i, it) =>
      Iterator((i, it.count(flagged).toLong))
    }.collect().sortBy(_._1).map(_._2)
    if (!callerPinned) inp.unpersist(blocking = false)
    val offsets = counts.scanLeft(0L)(_ + _)
    val schema = sorted.schema.add(outCol, org.apache.spark.sql.types.LongType,
      nullable = false)
    val out = rdd.mapPartitionsWithIndex { case (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        if (flagged(r)) acc += 1
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ acc)
      }
    }
    df.sparkSession.createDataFrame(out, schema)
  }

  /** Split a `sep`-joined hierarchy string into `levels` level columns
    * (`furniture/living/sofa` style — reference: cocoa/preprocess.py:52-78
    * `_additional_feature_engineering` guidance + notebook cell 13's
    * `str.split('_')`). Missing levels yield null. */
  def splitHierarchy(df: DataFrame, column: String, sep: String, levels: Int): DataFrame = {
    val parts = split(col(column), java.util.regex.Pattern.quote(sep))
    (0 until levels).foldLeft(df) { (d, i) =>
      // get() (not element_at) — null on missing level rather than an ANSI
      // out-of-bounds error (spark.sql.ansi.enabled defaults on in Spark 4).
      d.withColumn(s"${column}_l$i", get(parts, lit(i)))
    }
  }
}
