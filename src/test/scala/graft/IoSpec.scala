package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink coverage (SURVEY §2.A S1/S4/S5). */
class IoSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft-io").toString

  test("S1: dates file round-trips through text source (pipeline.py:331-333)") {
    val dir = tmpDir()
    Io.writeTextLines(Seq("2021-11-20", "2021-11-21", "").toDS(), s"$dir/dates")
    val dates = Io.readDatesFile(spark, s"$dir/dates").collect().map(_.toString)
    assert(dates.sorted.toSeq == Seq("2021-11-20", "2021-11-21"))
  }

  test("writeReleaseShards ships exact shard-<k>.parquet artifacts + manifest.csv that reconcile") {
    val dir = tmpDir()
    val rng = new scala.util.Random(7)
    val docs = (0L until 60L).map { i =>
      val base = if (i >= 50 && i < 55) i - 50 else i
      val text = (0 until 30).map(j => s"w${base}x$j").mkString(" ")
      (i, if (i % 2 == 0) "en" else "zh",
        if (i % 20 == 19) "src0" else s"src${i % 3}", text.length.toLong, text)
    }.toDF("doc_id", "lang", "source", "n_chars", "text")
    val emb = (0L until 60L).map { i =>
      val v = if (i == 16L || i == 6L) Array.fill(8)(0.9f)
        else Array.tabulate(8)(_ => rng.nextFloat() * 2 - 1)
      (i, v)
    }.toDF("vec_id", "embedding")
    val assign = graft.ops.Curation.releaseAssignments(docs, emb,
      tokenBudget = 500, packBudget = 64, packShards = 2, outShards = 3,
      alpha = 0.5, modelFloor = Some(0.0))
    Io.writeReleaseShards(assign, s"$dir/release")
    spark.catalog.clearCache()
    // manifest.csv exists under its exact name, one row per non-empty shard
    val manifest = spark.read.option("header", "true").csv(s"$dir/release/manifest.csv")
      .collect().map(r => r.getString(0) -> (r.getString(2).toLong, r.getString(3).toLong)).toMap
    assert(manifest.nonEmpty)
    // each manifest shard has its exact-named parquet whose rows/tokens
    // reconcile with the manifest
    manifest.foreach { case (shard, (nDocs, nTokens)) =>
      val f = new java.io.File(s"$dir/release/shard-$shard.parquet")
      assert(f.isFile, s"missing artifact ${f.getPath}")
      val rows = spark.read.parquet(f.getPath)
      assert(rows.count() == nDocs)
      assert(rows.agg(sum("tokens")).head.getLong(0) == nTokens)
    }
    // no staging leftovers or extra shard files beyond the manifest
    // (dot-prefixed .crc sidecars are LocalFileSystem checksum artifacts)
    val files = new java.io.File(s"$dir/release").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(files == manifest.keySet.map(s => s"shard-$s.parquet") + "manifest.csv")
    // byte-reproducible: a second write of the same assignment produces
    // identical shard files
    val before = manifest.keySet.map { s =>
      s -> java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/release/shard-$s.parquet")).toSeq
    }.toMap
    Io.writeReleaseShards(graft.ops.Curation.releaseAssignments(docs, emb,
      tokenBudget = 500, packBudget = 64, packShards = 2, outShards = 3,
      alpha = 0.5, modelFloor = Some(0.0)), s"$dir/release")
    spark.catalog.clearCache()
    before.foreach { case (s, bytes) =>
      assert(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(s"$dir/release/shard-$s.parquet")).toSeq == bytes,
        s"shard $s bytes not reproducible")
    }
  }

  /** Shared release fixture for the artifact tests: the 60-doc corpus the
    * writeReleaseShards test uses, buildable on ANY session (the fresh-
    * session reproducibility leg needs that). */
  private def releaseFixture(s: org.apache.spark.sql.SparkSession) = {
    val rng = new scala.util.Random(7)
    val docRows = (0L until 60L).map { i =>
      val base = if (i >= 50 && i < 55) i - 50 else i
      val text = (0 until 30).map(j => s"w${base}x$j").mkString(" ")
      (i, if (i % 2 == 0) "en" else "zh",
        if (i % 20 == 19) "src0" else s"src${i % 3}", text.length.toLong, text)
    }
    val embRows = (0L until 60L).map { i =>
      val v = if (i == 16L || i == 6L) Array.fill(8)(0.9f)
        else Array.tabulate(8)(_ => rng.nextFloat() * 2 - 1)
      (i, v)
    }
    (s.createDataFrame(docRows)
       .toDF("doc_id", "lang", "source", "n_chars", "text"),
     s.createDataFrame(embRows).toDF("vec_id", "embedding"))
  }

  private def releaseAssign(s: org.apache.spark.sql.SparkSession,
                            outShards: Int = 3) = {
    val (docs, emb) = releaseFixture(s)
    graft.ops.Curation.releaseAssignments(docs, emb, tokenBudget = 500,
      packBudget = 64, packShards = 2, outShards = outShards, alpha = 0.5,
      modelFloor = Some(0.0))
  }

  private def md5Of(path: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
      .map("%02x".format(_)).mkString
  }

  test("release builds are checksum-identical across dirs and a fresh session") {
    val dirA = tmpDir(); val dirB = tmpDir()
    Io.writeReleaseShards(releaseAssign(spark), s"$dirA/release")
    spark.catalog.clearCache()
    // second build: separate output dir AND a fresh session state — the
    // byte-reproducibility claim is about the PIPELINE, not one plan
    // instance reusing cached state
    val s2 = spark.newSession()
    Io.writeReleaseShards(releaseAssign(s2), s"$dirB/release")
    s2.catalog.clearCache()
    def artifacts(dir: String) = new java.io.File(s"$dir/release").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
    assert(artifacts(dirA) == artifacts(dirB) && artifacts(dirA).nonEmpty)
    artifacts(dirA).foreach { f =>
      assert(md5Of(s"$dirA/release/$f") == md5Of(s"$dirB/release/$f"),
        s"artifact $f differs between independent builds")
    }
  }

  test("re-release into the same dir deletes stale shard files (ADVICE r12)") {
    val dir = tmpDir()
    Io.writeReleaseShards(releaseAssign(spark, outShards = 3), s"$dir/release")
    spark.catalog.clearCache()
    val before = new java.io.File(s"$dir/release").listFiles()
      .map(_.getName).filter(_.startsWith("shard-")).toSet
    assert(before.size > 1, s"fixture should fill >1 shard, got $before")
    // re-cut with ONE output shard: every old shard-k (k>0) is now stale
    Io.writeReleaseShards(releaseAssign(spark, outShards = 1), s"$dir/release")
    spark.catalog.clearCache()
    val files = new java.io.File(s"$dir/release").listFiles()
      .map(_.getName).filterNot(_.startsWith(".")).toSet
    assert(files == Set("shard-0.parquet", "manifest.csv"),
      s"stale artifacts survived the re-release: $files")
    // a loader now sees exactly the manifest's shard set
    assert(Io.readReleaseShards(spark, s"$dir/release")
      .select("out_shard").distinct().collect().map(_.getLong(0)).toSeq == Seq(0L))
  }

  test("readReleaseShards reconciles artifacts with the manifest and fails loudly on drift") {
    val dir = tmpDir()
    val assign = releaseAssign(spark)
    Io.writeReleaseShards(assign, s"$dir/release")
    val total = assign.count()
    spark.catalog.clearCache()
    val back = Io.readReleaseShards(spark, s"$dir/release")
    assert(back.count() == total)
    // per-shard rows carry the file's shard id
    val manifest = spark.read.option("header", "true")
      .csv(s"$dir/release/manifest.csv")
      .collect().map(r => r.getString(0).toLong -> r.getString(2).toLong).toMap
    val counts = back.groupBy("out_shard").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts == manifest)
    // a stale extra shard file fails the reconcile
    val src = new java.io.File(s"$dir/release").listFiles()
      .filter(_.getName.startsWith("shard-")).head
    java.nio.file.Files.copy(src.toPath,
      java.nio.file.Paths.get(s"$dir/release/shard-99.parquet"))
    val e = intercept[IllegalArgumentException] {
      Io.readReleaseShards(spark, s"$dir/release")
    }
    assert(e.getMessage.contains("drifted"))
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(s"$dir/release/shard-99.parquet"))
    // a missing shard file fails too
    java.nio.file.Files.delete(src.toPath)
    assertThrows[IllegalArgumentException] {
      Io.readReleaseShards(spark, s"$dir/release")
    }
  }

  test("readReleaseShards verifies manifest content fingerprints (VERDICT r13 #4)") {
    val dir = tmpDir()
    Io.writeReleaseShards(releaseAssign(spark), s"$dir/release")
    spark.catalog.clearCache()
    // manifest carries a content_hash per shard and the clean read passes
    val m = spark.read.option("header", "true").csv(s"$dir/release/manifest.csv")
    assert(m.columns.contains("content_hash"))
    val total = Io.readReleaseShards(spark, s"$dir/release").count()
    assert(total > 0)
    // corrupt ONE row of one shard WITHOUT changing its row count — the
    // exact damage class the count check cannot see: rewrite the shard
    // with one doc_id perturbed, byte-for-byte same cardinality
    val shardFile = new java.io.File(s"$dir/release").listFiles()
      .filter(_.getName.startsWith("shard-")).head
    val rows = spark.read.parquet(shardFile.getPath)
    val minId = rows.agg(min("doc_id")).head.getLong(0)
    val corrupted = rows.withColumn("doc_id",
      when(col("doc_id") === minId, col("doc_id") + 1000000L)
        .otherwise(col("doc_id")))
    val staged = s"$dir/corrupt_staging"
    corrupted.coalesce(1).write.mode("overwrite").parquet(staged)
    val part = new java.io.File(staged).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, shardFile.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    // drop the LocalFileSystem .crc sidecar of the ORIGINAL bytes — the
    // test must reach the manifest content check, not Hadoop's local
    // checksum (a real object store has no sidecar)
    val crc = new java.io.File(shardFile.getParent, s".${shardFile.getName}.crc")
    if (crc.exists()) crc.delete()
    val e = intercept[IllegalArgumentException] {
      Io.readReleaseShards(spark, s"$dir/release")
    }
    assert(e.getMessage.contains("content hash"), e.getMessage)
  }

  test("readReleaseShards fails loudly on foreign names and empty releases (ADVICE r13)") {
    val dir = tmpDir()
    Io.writeReleaseShards(releaseAssign(spark), s"$dir/release")
    spark.catalog.clearCache()
    // a foreign file matching the glob with a non-numeric id surfaces
    // through the drift diagnostic, not a NumberFormatException
    val foreign = java.nio.file.Paths.get(s"$dir/release/shard-abc.parquet")
    java.nio.file.Files.write(foreign, Array[Byte](1, 2, 3))
    val e = intercept[IllegalArgumentException] {
      Io.readReleaseShards(spark, s"$dir/release")
    }
    assert(e.getMessage.contains("foreign"), e.getMessage)
    java.nio.file.Files.delete(foreign)
    // a zero-shard dir (header-only manifest) fails with a clear message,
    // not reduce()'s UnsupportedOperationException
    val empty = tmpDir()
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$empty/release"))
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$empty/release/manifest.csv"),
      "out_shard,n_packs,n_docs,n_tokens,source_mix,content_hash\n"
        .getBytes("UTF-8"))
    val e2 = intercept[IllegalArgumentException] {
      Io.readReleaseShards(spark, s"$empty/release")
    }
    assert(e2.getMessage.contains("empty"), e2.getMessage)
  }

  test("release dedup index round-trips its IndexMeta (ADVICE r13)") {
    val dir = tmpDir()
    val (docs, emb) = releaseFixture(spark)
    val ix = graft.ops.Curation.buildReleaseIndex(docs, emb,
      minhashThreshold = 0.5, shingleK = 3, srpSeed = 42L)
    Io.writeReleaseIndex(ix, s"$dir/ix")
    val back = Io.readReleaseIndex(spark, s"$dir/ix")
    assert(back.meta.contains(graft.ops.IndexMeta(0.5, 3, 42L)))
    // a re-cut at a different threshold refuses the restored artifact
    val prevAssign = releaseAssign(spark)
    val e = intercept[IllegalArgumentException] {
      graft.ops.Curation.deltaReleaseAssignments(prevAssign, docs, docs, emb,
        deltaTokenBudget = 500, minhashThreshold = 0.7, index = Some(back))
    }
    assert(e.getMessage.contains("built under"), e.getMessage)
    spark.catalog.clearCache()
  }

  test("outputPartitionsFor: size-aware write coalesce math at tiny and large stats") {
    val target = 128L << 20
    // tiny relation, wide plan: everything fits one target file
    assert(Io.outputPartitionsFor(1L << 20, 32, target) == 1)
    // exactly one target: one file
    assert(Io.outputPartitionsFor(target, 32, target) == 1)
    // one byte over a boundary rounds UP
    assert(Io.outputPartitionsFor(3 * target + 1, 32, target) == 4)
    // corpus-sized relation: never coalesce below the plan's parallelism
    assert(Io.outputPartitionsFor(100L << 40, 32, target) == 32)
    // unknown footprint keeps the plan's parallelism; degenerate inputs
    assert(Io.outputPartitionsFor(0L, 32, target) == 32)
    assert(Io.outputPartitionsFor(-1L, 32, target) == 32)
    assert(Io.outputPartitionsFor(5L << 20, 0, target) == 1)
    assert(Io.outputPartitionsFor(1L << 50, 1, target) == 1)
  }

  test("writeReleaseIndex coalesces small relations to few files, round-trips") {
    val dir = tmpDir()
    val docs = spark.range(200).select(col("id").as("doc_id"),
      concat(lit("alpha beta gamma delta token"), col("id").cast("string"))
        .as("text"))
    val emb = spark.range(200).select(col("id").as("vec_id"),
      array(col("id").cast("double"), lit(1.0), lit(2.0)).as("embedding"))
    val ix = graft.ops.Curation.buildReleaseIndex(docs, emb)
    Io.writeReleaseIndex(ix, s"$dir/ix")
    def parts(p: String) = new java.io.File(p).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    // a few-KB relation must land in ONE file, not shuffle.partitions many
    assert(parts(s"$dir/ix/lex-index.parquet") == 1)
    assert(parts(s"$dir/ix/sem-index.parquet") == 1)
    val back = Io.readReleaseIndex(spark, s"$dir/ix")
    assert(back.lexical.count() == ix.lexical.count())
    assert(back.semantic.count() == ix.semantic.count())
    assert(back.meta == ix.meta)
    spark.catalog.clearCache()
  }

  test("S2: date-range scan pushes the predicate to the parquet source") {
    val df = Io.scanDateRange(spark, "/root/testdata/sf0.001/orders.parquet",
      "o_orderdate", "1995-01-01", "1995-02-01")
    assert(df.count() == 16)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed to scan:\n$physical")
  }

  test("date-partitioned parquet prunes partitions at planning time") {
    val dir = tmpDir()
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    Io.writeParquetPerDate(orders, "o_orderdate", s"$dir/orders_bydate")
    val oneDay = spark.read.parquet(s"$dir/orders_bydate")
      .filter(col("__date") === "1995-01-05")
    val plan = oneDay.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(__date"),
      s"partition filter not applied:\n$plan")
    // pruned scan reads only that day's rows
    val expected = orders
      .filter(date_format(col("o_orderdate"), "yyyy-MM-dd") === "1995-01-05").count()
    assert(oneDay.count() == expected && expected > 0)
  }

  test("bucketed tables equi-join with no exchange and match the plain join") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    Io.writeBucketed(li, "li_b", "l_orderkey", 4)
    Io.writeBucketed(ord, "ord_b", "o_orderkey", 4)
    // merge hint: at test scale the tables would auto-broadcast, which is
    // not the plan bucketing exists for — at 100 TB both sides are fact
    // tables and the choice is shuffle-SMJ vs bucket-local SMJ.
    val joined = spark.table("li_b").hint("merge").join(spark.table("ord_b"),
      col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
    val plain = li.join(ord, col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
    // tolerance: double sums accumulate in bucket order vs scan order
    assert(math.abs(joined.agg(sum("o_totalprice")).head().getDouble(0) -
      plain.agg(sum("o_totalprice")).head().getDouble(0)) < 1e-3)
  }

  test("S4: per-date CSV sink writes one header-ed directory per date") {
    val dir = tmpDir()
    val df = Seq(
      ("2021-11-20", "g1", 10.0), ("2021-11-20", "g2", 20.0),
      ("2021-11-21", "g3", 30.0)
    ).toDF("d", "gclid", "adjusted_conversion")
      .withColumn("d", to_date(col("d")))
    Io.writeCsvPerDate(df, "d", s"$dir/out")
    val days = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("__date=")).map(_.getName).sorted
    assert(days.toSeq == Seq("__date=2021-11-20", "__date=2021-11-21"))
    val back = spark.read.option("header", "true").csv(s"$dir/out")
    assert(back.count() == 3)
    assert(back.columns.contains("gclid")) // header preserved
  }

  test("S4 exact names: <out>/<date>/<file>.csv artifacts, idempotent re-run") {
    val dir = tmpDir()
    val df = Seq(
      ("2021-11-20", "g1", 10.0), ("2021-11-20", "g2", 20.0),
      ("2021-11-21", "g3", 30.0)
    ).toDF("d", "gclid", "adjusted_conversion")
      .withColumn("d", to_date(col("d")))
    Io.writeCsvExact(df, "d", s"$dir/out", "adjustments_data.csv")
    // the reference's exact artifact paths (pipeline.py:265-295)
    for (day <- Seq("2021-11-20", "2021-11-21"))
      assert(new java.io.File(s"$dir/out/$day/adjustments_data.csv").isFile,
        s"missing exact artifact for $day")
    // no staging residue
    assert(!new java.io.File(s"$dir/out").listFiles()
      .exists(_.getName.startsWith(".staging")))
    val back = spark.read.option("header", "true")
      .csv(s"$dir/out/*/adjustments_data.csv")
    assert(back.count() == 3)
    assert(back.columns.contains("gclid"))
    // re-run replaces in place (per-date idempotence, any overwrite mode)
    Io.writeCsvExact(df.filter(col("gclid") =!= "g2"), "d", s"$dir/out",
      "adjustments_data.csv")
    assert(spark.read.option("header", "true")
      .csv(s"$dir/out/*/adjustments_data.csv").count() == 2)
  }

  test("S4 exact names: null date fails fast, maxRecordsPerFile can't split a date") {
    val dir = tmpDir()
    val bad = Seq(("2021-11-20", "g1", 10.0)).toDF("d", "gclid", "adjusted_conversion")
      .withColumn("d", to_date(col("d")))
      .union(Seq((null.asInstanceOf[String], "g2", 20.0))
        .toDF("d", "gclid", "adjusted_conversion").withColumn("d", to_date(col("d"))))
    val e = intercept[Exception] {
      Io.writeCsvExact(bad, "d", s"$dir/bad", "adjustments_data.csv")
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("null/unparseable")), msgs(e).mkString("; "))
    // a session-level record cap must not break the one-file-per-date
    // invariant (the staged write pins maxRecordsPerFile=0)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "1")
    try {
      val many = Seq(
        ("2021-11-20", "g1", 10.0), ("2021-11-20", "g2", 20.0),
        ("2021-11-20", "g3", 30.0)
      ).toDF("d", "gclid", "adjusted_conversion").withColumn("d", to_date(col("d")))
      Io.writeCsvExact(many, "d", s"$dir/capped", "adjustments_data.csv")
      assert(spark.read.option("header", "true")
        .csv(s"$dir/capped/2021-11-20/adjustments_data.csv").count() == 3)
    } finally spark.conf.unset("spark.sql.files.maxRecordsPerFile")
  }
}
