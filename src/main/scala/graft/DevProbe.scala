package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Throwaway dev probe: decompose q153_release_gen2's wall time by leg. */
object DevProbe {
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

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[devprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val d0 = Cohorts.documents(spark, dir)
      val e0 = Cohorts.embeddings(spark, dir)
      val prevDocs = d0.filter(col("doc_id") % 10 =!= 0)
        .withColumn("text", when(col("doc_id") % 7 === 0,
          concat(col("text"), lit(" v1"))).otherwise(col("text")))
      def clones(m: Long, off: Long) = d0.filter(col("doc_id") % 20 === m)
        .withColumn("doc_id", col("doc_id") + lit(off))
        .withColumn("source", lit("clone"))
        .withColumn("text", concat_ws(" ",
          transform(sequence(lit(1), lit(100)),
            i => concat(lit("dx"), col("doc_id").cast("string"),
              lit("t"), i.cast("string")))))
      def cloneEmb(m: Long, off: Long) = e0.filter(col("vec_id") % 20 === m)
        .withColumn("vec_id", col("vec_id") + lit(off))
      val curDocs = d0.filter(col("doc_id") % 13 =!= 0)
        .unionByName(clones(1L, 1000000L))
        .unionByName(clones(3L, 2000000L))
        .unionByName(clones(3L, 3000000L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val curEmb = e0
        .unionByName(cloneEmb(1L, 1000000L))
        .unionByName(cloneEmb(3L, 2000000L))
        .unionByName(cloneEmb(3L, 3000000L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
      val prevAssign = t("fixture prevAssign") {
        val f = pbase.join(ppos, "pack_key")
          .select("doc_id", "lang", "shard", "tokens", "pack_id", "pack_key",
            "source", "shuffle_pos", "out_shard")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        f.count(); f
      }
      def m(df: DataFrame): DataFrame = org.apache.spark.sql.graftbridge
        .Bridge.materialized(df,
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)._1
      val d1 = t("d1 deltaRelease (mat)") {
        m(Curation.deltaReleaseAssignments(prevAssign, prevDocs,
          curDocs, curEmb, deltaTokenBudget = 3000, packBudget = 256,
          packShards = 2, outShards = 4))
      }
      val priorIds = prevAssign.select("doc_id")
      val ix0 = t("buildReleaseIndex ix0 (mat)") {
        val ix = Curation.buildReleaseIndex(
          prevDocs.join(priorIds, "doc_id"),
          Cohorts.embeddings(spark, dir)
            .join(priorIds.select(col("doc_id").as("vec_id")), "vec_id"))
        graft.ops.ReleaseDedupIndex(m(ix.lexical), m(ix.semantic), ix.meta)
      }
      val ix1 = t("updateReleaseIndex ix1 (build only)") {
        Curation.updateReleaseIndex(ix0, d1, prevDocs, curDocs, curEmb)
      }
      val path = s"/tmp/graft_devprobe_gen2_index"
      t("writeReleaseIndex") { Io.writeReleaseIndex(ix1, path) }
      val ixr = t("readReleaseIndex") { Io.readReleaseIndex(spark, path) }
      val cur2 = curDocs.filter(col("doc_id") % 17 =!= 2)
        .withColumn("text", when(col("doc_id") % 11 === 5,
          concat(col("text"), lit(" v3"))).otherwise(col("text")))
        .unionByName(clones(7L, 4000000L))
        .unionByName(clones(9L, 5000000L))
        .unionByName(clones(9L, 6000000L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val emb2 = curEmb
        .unionByName(cloneEmb(7L, 4000000L))
        .unionByName(cloneEmb(9L, 5000000L))
        .unionByName(cloneEmb(9L, 6000000L))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("gen2 deltaRelease (noop)") {
        noop(Curation.deltaReleaseAssignments(d1, curDocs, cur2, emb2,
          deltaTokenBudget = 3000, packBudget = 256, packShards = 2,
          outShards = 4, generation = "d2", index = Some(ixr)))
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
