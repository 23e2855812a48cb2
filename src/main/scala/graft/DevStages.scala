package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway: per-stage wall/name breakdown of one deltaReleaseAssignments
  * (call-site attribution via stage callSite in details). */
object DevStages {
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
    case class St(name: String, wall: Double, tasks: Int, taskTime: Double,
                  site: String)
    val done = new java.util.concurrent.CopyOnWriteArrayList[St]()
    // per-SQL-execution attribution: execution id -> (desc, start ns)
    val execs = new java.util.concurrent.ConcurrentHashMap[Long, (String, Long)]()
    val execDone = new java.util.concurrent.CopyOnWriteArrayList[(Long, String, Double)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for { a <- i.completionTime; b <- i.submissionTime }
          yield (a - b) / 1e3).getOrElse(0.0)
        val site = i.details.linesIterator
          .filter(l => l.contains("graft") && !l.contains("DevStages"))
          .take(2).mkString(" <- ")
        done.add(St(i.name, wall, i.numTasks,
          i.taskMetrics.executorRunTime / 1e3, site))
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            execs.put(s.executionId, (s.description, System.nanoTime()))
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionEnd =>
            Option(execs.get(s.executionId)).foreach { case (d, t0) =>
              execDone.add((s.executionId, d,
                (System.nanoTime() - t0) / 1e9))
            }
          case _ =>
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
    execDone.clear()
    val t0 = System.nanoTime()
    noop(Curation.deltaReleaseAssignments(prevAssign, prevDocs, curDocs,
      curEmb, deltaTokenBudget = 3000, packBudget = 256, packShards = 2,
      outShards = 4))
    val wall = (System.nanoTime() - t0) / 1e9
    import scala.jdk.CollectionConverters._
    val rows = done.asScala.toSeq
    println(f"[devs] d1 wall ${wall}%.2f s, ${rows.size} stages, " +
      f"stage-wall sum ${rows.map(_.wall).sum}%.2f s, " +
      f"task-time sum ${rows.map(_.taskTime).sum}%.2f s")
    rows.groupBy(_.site).toSeq
      .map { case (n, ss) =>
        (ss.map(_.taskTime).sum, ss.map(_.wall).sum, ss.size,
          ss.map(_.tasks).sum, n) }
      .sortBy(-_._1)
      .take(40)
      .foreach { case (tt, w, c, t, n) =>
        println(f"[devs] task ${tt}%7.2f s wall ${w}%6.2f s n=$c%3d tasks=$t%5d  ${n.take(150)}") }
    execDone.asScala.toSeq.sortBy(_._1).foreach { case (id, d, w) =>
      println(f"[deve] exec $id%4d ${w}%6.2f s  ${d.take(110)}") }
    spark.stop()
  }
}
