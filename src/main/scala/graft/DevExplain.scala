package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: count expensive-kernel occurrences in physical plans. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Cohorts.documents(spark, dir)
    val pairs = graft.ops.Dedup.minHashPairs(docs, 0.5)
    val plan = pairs.queryExecution.executedPlan.toString
    def cnt(s: String, n: String) =
      println(s"$n: " + s.sliding(n.length).count(_ == n))
    cnt(plan, "minhash_sig")
    cnt(plan, "MinHashSig")
    cnt(plan, "shingle_hashes")
    cnt(plan, "ShingleHashes")
    cnt(plan, "poly_hash")
    println("plan length: " + plan.length)
    // also the index-build side used by updateReleaseIndex
    val lex = graft.ops.Dedup.buildLexIndex(docs, 0.5)
    val p2 = lex.queryExecution.executedPlan.toString
    cnt(p2, "minhash_sig")
    cnt(p2, "shingle_hashes")
    spark.stop()
  }
}
