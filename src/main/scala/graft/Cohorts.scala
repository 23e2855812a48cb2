package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter mapping CoCoA cohort semantics onto the driver's TPC-H-ish
  * testdata (FIXTURES.md §2.1): orders ⋈ customer, consent flag
  * `o_orderkey % 5 != 0` (~80/20), conversion value `o_totalprice`,
  * categorical features (o_orderpriority, o_orderstatus, c_mktsegment) as a
  * token set, numeric passthrough `c_acctbal`, cohort scope = order month.
  *
  * The matching DuckDB oracle CTEs live in [[OracleCtes]] — Spark code and
  * SQL must stay column-name aligned (driver hashes sort columns by name).
  */
object Cohorts {
  val Lo = "1995-01-01"
  val Hi = "1996-01-01"

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Bytes under a table's parquet path (file or directory) — the size
    * signal for [[spreadIfLarge]]. Driver-side FS metadata only. */
  private def tableBytes(spark: SparkSession, dir: String, name: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$name.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
  }

  /** Below this input size a scan's work is too cheap to justify a full
    * exchange: the round-8 unconditional repartition fixed the 1-task
    * 100×-replica scan but charged every bench-SF cohort query ~0.4-1.4 s
    * of shuffle (q13 1.92→3.23 s, q18 3.71→5.13 s isolated — VERDICT r8
    * item 1). 64 MB ≈ half a default parquet row group: anything smaller
    * decodes in well under the cost of shuffling it. */
  private val SpreadBytes: Long = 64L << 20

  /** Effective parallelism of the parquet scan under `path`: a task only
    * materializes rows per ROW GROUP, so a single-row-group file yields one
    * populated task no matter how many byte-based splits the scheduler cuts
    * (the previous `df.rdd.getNumPartitions` gate over-counted exactly that
    * case — and forced a plan→RDD conversion per call; ADVICE r9). The
    * converse over-count is also capped: Spark packs every row group whose
    * midpoint falls inside a byte split into that ONE task, so a file's
    * contribution is min(rowGroups, byte splits) — a 640 MB file with 20
    * small row groups still yields only ~ceil(len/maxPartitionBytes)
    * populated tasks (ADVICE r10). Each non-empty file contributes ≥1, so
    * footers are only opened while the running total is still below
    * `enough` — at most `enough` driver-side metadata reads even on a
    * thousand-file table; an unreadable footer (corrupt/truncated, or the
    * file vanished between list and open) degrades to that minimum 1
    * instead of failing the query (ADVICE r10). */
  private def scanParallelism(spark: SparkSession, path: String,
                              enough: Int): Int = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return 0
    val files = {
      val it = fs.listFiles(p, true)
      val b = Seq.newBuilder[org.apache.hadoop.fs.LocatedFileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (f.isFile && f.getLen > 0 &&
            f.getPath.getName.endsWith(".parquet")) b += f
      }
      b.result()
    }
    if (files.size >= enough) return files.size
    // byteStringAsBytes handles every spelling the conf accepts ("128MB",
    // "134217728b", plain digits)
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB")).max(1L)
    var total = 0
    val it = files.iterator
    while (it.hasNext && total < enough) {
      val f = it.next()
      val splits = ((f.getLen + maxSplit - 1) / maxSplit).toInt.max(1)
      val rowGroups =
        try {
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f.getPath, conf))
          try r.getRowGroups.size finally r.close()
        } catch { case scala.util.control.NonFatal(_) => 1 }
      total += math.min(rowGroups, splits).max(1)
    }
    total
  }

  /** Spread `df` across the cluster ONLY when both (a) its source files are
    * big enough that serialized downstream work dominates the exchange and
    * (b) the scan's ROW-GROUP count yields too few populated tasks (a big
    * but multi-row-group file already splits — no exchange needed then).
    * `force` opts a CPU-heavy consumer in regardless of size (the exchange
    * must sit right after the SCAN — before the join+encode — or the heavy
    * build still serializes; measured: post-join spread left q61 at 4.8 s
    * where this placement gives 3.9 s on the same host). */
  private def spreadIfLarge(spark: SparkSession, df: DataFrame, bytes: Long,
                            path: String, force: Boolean): DataFrame = {
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    if (force || bytes >= SpreadBytes) {
      if (scanParallelism(spark, path, n / 2) < n / 2) df.repartition(n)
      else df
    } else df
  }

  /** documents, spread across the cluster: the table arrives as one parquet
    * file (= one partition), which would serialize the CPU-heavy
    * shingle/hash pipelines onto a single core. */
  def documents(spark: SparkSession, dir: String): DataFrame = {
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    table(spark, dir, "documents").repartition(n)
  }

  /** embeddings, spread for the same single-file reason: the corpus side
    * drives the parallelism of the similarity-search scans. */
  def embeddings(spark: SparkSession, dir: String): DataFrame = {
    val n = spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    table(spark, dir, "embeddings").repartition(n)
  }

  /** events loader, tolerant of the physical `ts` encoding — the driver's
    * generator has shipped TIMESTAMP(NANOS) (readable only as BIGINT),
    * plain BIGINT nanos (StressGen output), and TIMESTAMP(MICROS)
    * isAdjustedToUTC=false (⇒ TIMESTAMP_NTZ in Spark 4). All are
    * normalized to session-zone TIMESTAMP at microsecond grain: downstream
    * ops use `unix_micros`/`window()`, which require TimestampType, and
    * every entrypoint pins the session to UTC so the NTZ→LTZ cast is a
    * relabeling, not a shift. Branching on the *read* schema (instead of
    * assuming one encoding) makes a testdata regeneration a no-op here
    * rather than an analysis error in nine queries. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = spark.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: integer-divide to micros
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Base cohort frame: month, idx, value, features, c_acctbal, consent. */
  def base(spark: SparkSession, dir: String, lo: String = Lo, hi: String = Hi,
           spread: Boolean = false): DataFrame = {
    // Spread after the pushed-down date filter, but only when the scan is
    // LARGE and under-partitioned ([[spreadIfLarge]]): a big single parquet
    // file (one row group ⇒ one scan task regardless of byte splits) would
    // serialize the broadcast join + token encode + every banded-prep cache
    // build onto a single core — measured at the 100× replica. At bench SF
    // the same exchange is pure overhead (VERDICT r8 item 1), so the cheap
    // narrow plan is kept there. CPU-heavy consumers that win from the
    // spread even on small inputs (the cosine banded route's exact scoring,
    // q61) opt in with `spread = true`.
    val o = spreadIfLarge(spark,
      table(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
                col("o_orderdate") < lit(hi).cast("timestamp")),
      tableBytes(spark, dir, "orders"), s"$dir/orders.parquet",
      force = spread)
    val c = table(spark, dir, "customer")
    // customer is the small dimension: broadcast — no shuffle of orders.
    o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .select(
        date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderkey").as("idx"),
        col("o_totalprice").as("value"),
        array(
          concat(lit("pri="), col("o_orderpriority")),
          concat(lit("st="), col("o_orderstatus")),
          concat(lit("seg="), col("c_mktsegment"))).as("features"),
        col("c_acctbal"),
        when(col("o_orderkey") % 5 =!= 0, 1).otherwise(0).as("consent"))
  }

  /** (consent, noconsent) split of [[base]]. */
  def cohorts(spark: SparkSession, dir: String,
              spread: Boolean = false): (DataFrame, DataFrame) = {
    val b = base(spark, dir, spread = spread)
    (b.filter(col("consent") === 1).drop("consent"),
     b.filter(col("consent") === 0).drop("consent"))
  }

  /** The engine spec shared by every cohort query. */
  val spec: CohortSpec = CohortSpec(
    idCol = "idx", valueCol = "value", tokenCol = "features",
    numCols = Seq("c_acctbal"), cohortCols = Seq("month"), metric = Manhattan)
}

/** DuckDB oracle SQL building blocks mirroring [[Cohorts]] exactly.
  * Manhattan over the 3-token one-hot set == 6 − 2·|intersection|, plus
  * |Δ acctbal|. */
object OracleCtes {
  val base: String =
    """base AS (
      |  SELECT strftime(o_orderdate, '%Y-%m') AS month,
      |         o_orderkey AS idx,
      |         o_totalprice AS value,
      |         ['pri=' || o_orderpriority, 'st=' || o_orderstatus, 'seg=' || c_mktsegment] AS features,
      |         c_acctbal,
      |         CASE WHEN o_orderkey % 5 <> 0 THEN 1 ELSE 0 END AS consent
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      |    AND o_orderdate <  TIMESTAMP '1996-01-01')""".stripMargin

  val cohortSplit: String =
    """c AS (SELECT * FROM base WHERE consent = 1),
      |nc AS (SELECT * FROM base WHERE consent = 0)""".stripMargin

  val pairs: String =
    """pairs AS (
      |  SELECT nc.month, nc.idx AS nc_idx, nc.value AS nc_value,
      |         c.idx AS c_idx, c.value AS c_value,
      |         CAST(len(nc.features) + len(c.features)
      |              - 2 * len(list_intersect(nc.features, c.features)) AS DOUBLE)
      |           + abs(nc.c_acctbal - c.c_acctbal) AS dist
      |  FROM nc JOIN c ON nc.month = c.month)""".stripMargin

  def topk(k: Int): String =
    s"""topk AS (
       |  SELECT * FROM (
       |    SELECT *, CAST(row_number() OVER (
       |        PARTITION BY month, nc_idx ORDER BY dist, c_idx) AS BIGINT) AS rank
       |    FROM pairs) WHERE rank <= $k)""".stripMargin

  /** Softmax weights over the selected pairs relation `sel` (must expose
    * month, nc_idx, nc_value, c_idx, dist). Two stages — DuckDB rejects
    * nested window calls (min OVER inside sum OVER). */
  def softmax(sel: String): String =
    s"""shifted AS (
       |  SELECT *, exp(-(dist - min(dist) OVER (PARTITION BY month, nc_idx))) AS e
       |  FROM $sel),
       |shares AS (
       |  SELECT *,
       |         e / sum(e) OVER w AS weight,
       |         nc_value * e / sum(e) OVER w AS weighted_value
       |  FROM shifted
       |  WINDOW w AS (PARTITION BY month, nc_idx))""".stripMargin

  /** Everything up to the pairs relation. */
  val prefix: String = s"WITH $base,\n$cohortSplit,\n$pairs"
}
