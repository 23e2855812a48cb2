package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: per-job wall breakdown of one deltaReleaseAssignments. */
object DevJobs {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "131072")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops._
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.CopyOnWriteArrayList[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (t0, d) = jobs.get(je.jobId)
        done.add((je.jobId, (System.nanoTime() - t0) / 1e9, d))
      }
    })
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val d0 = Cohorts.documents(spark, dir)
    val e0 = Cohorts.embeddings(spark, dir)
    val prevDocs = d0.filter(col("doc_id") % 10 =!= 0)
      .withColumn("text", when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" v1"))).otherwise(col("text")))
    val curDocs = d0.filter(col("doc_id") % 13 =!= 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val curEmb = e0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pbase = prevDocs.filter(col("source") =!= "src0")
      .select(col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(4L)).as("shard"),
        size(TextAnalysis.tokens(col("text"))).cast("long").as("tokens"),
        pmod(col("doc_id"), lit(3L)).as("pack_id"), col("source"))
      .filter(col("tokens") > 0)
      .withColumn("pack_key", concat_ws("/", lit("p"), col("lang"),
        col("shard"), col("pack_id")))
    val ppos = Sampling.shuffleOrder(pbase.select("pack_key").distinct(),
        "pack_key", "prevrel")
      .withColumn("out_shard", pmod(col("shuffle_pos"), lit(4L)))
    val prevAssign = pbase.join(ppos, "pack_key")
      .select("doc_id", "lang", "shard", "tokens", "pack_id", "pack_key",
        "source", "shuffle_pos", "out_shard")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    prevAssign.count()
    // warm rep
    noop(Curation.deltaReleaseAssignments(prevAssign, prevDocs, curDocs,
      curEmb, deltaTokenBudget = 3000, packBudget = 256, packShards = 2,
      outShards = 4))
    done.clear()
    val t0 = System.nanoTime()
    noop(Curation.deltaReleaseAssignments(prevAssign, prevDocs, curDocs,
      curEmb, deltaTokenBudget = 3000, packBudget = 256, packShards = 2,
      outShards = 4))
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq.sortBy(_._1)
    println(f"[devj] d1 wall ${wall}%.2f s, ${rows.size} jobs, job-wall sum ${rows.map(_._2).sum}%.2f s")
    rows.foreach { case (id, w, d) =>
      println(f"[devj] job $id%4d ${w}%6.2f s  ${d.take(80)}") }
    spark.stop()
  }
}
