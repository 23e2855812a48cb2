package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: quantify expression-duplication cost in the shingle path. */
object DevKernel {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops._
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[devk] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = Cohorts.documents(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    docs.count()
    for (rep <- 1 to 3) {
      println(s"=== rep $rep ===")
      // a) as-is: filter(size>0) + shingles col + sig  (3 evals expected)
      t("buildLexIndex as-is") { noop(Dedup.buildLexIndex(docs, 0.5)) }
      // b) shingles computed once per row via a pre-materialized projection
      t("shingles only (1 eval)") {
        noop(docs.select(col("doc_id"),
          TextAnalysis.shingleHashes(col("text"), 3).as("shingles")))
      }
      // c) shingles + filter (2 evals expected)
      t("shingles + filter (2 evals)") {
        noop(docs.select(col("doc_id"),
          TextAnalysis.shingleHashes(col("text"), 3).as("shingles"))
          .filter(size(col("shingles")) > 0))
      }
      // d) tokens only — the split cost floor
      t("tokens only") {
        noop(docs.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("t")))
      }
      // e) qualityScore (4 token-evals? check)
      t("qualityScore") {
        noop(docs.select(col("doc_id"),
          TextAnalysis.qualityScore(col("text")).as("q")))
      }
      spark.catalog.clearCache()
      docs.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
    }
    val p = docs.select(col("doc_id"),
      TextAnalysis.qualityScore(col("text")).as("q"))
      .queryExecution.executedPlan.toString
    def cnt(s: String, n: String) =
      println(s"$n: " + s.sliding(n.length).count(_ == n))
    cnt(p, "split(text")
    spark.stop()
  }
}
