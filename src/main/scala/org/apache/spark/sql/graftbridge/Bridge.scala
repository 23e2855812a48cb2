package org.apache.spark.sql.graftbridge

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.storage.StorageLevel

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 made these conversions `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so the library exposes
  * them from inside the sql package — the standard pattern for extension
  * libraries shipping native expressions.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether the session's cache manager holds no cached relations — the
    * assertion behind the index-handle lifecycle contract
    * ([[graft.ops.AnnIndex.unpersist]]). The manager is `private[sql]`, so
    * the check is exposed from inside the package like the conversions. */
  def cacheIsEmpty(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sharedState.cacheManager.isEmpty

  /** Eagerly materialize a DataFrame into an RDD-backed copy whose storage
    * the CALLER controls. `Dataset.localCheckpoint` persists its internal
    * RDD where neither `Dataset.unpersist` nor `Catalog.clearCache` can
    * reach it (the cache manager never registered it), so iterative
    * algorithms leak one full relation per round. This variant persists the
    * internal-row RDD directly and hands it back: `rdd.unpersist()` frees
    * the blocks deterministically, and any still-referenced tail is
    * ContextCleaner-managed (freed on GC) rather than pinned.
    * Rows are copied because `toRdd` reuses mutable UnsafeRows. */
  def materialized(df: DataFrame,
                   level: StorageLevel = StorageLevel.MEMORY_AND_DISK)
      : (DataFrame, RDD[InternalRow]) = {
    val ds = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.persist(level)
    rdd.count() // materialize now: downstream reads hit blocks, not lineage
    (ds.sparkSession.internalCreateDataFrame(rdd, ds.schema), rdd)
  }
}
