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

  test("S2: date-range scan pushes the predicate to the parquet source") {
    val df = Io.scanDateRange(spark, "/root/testdata/sf0.001/orders.parquet",
      "o_orderdate", "1995-01-01", "1995-02-01")
    assert(df.count() == 16)
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(o_orderdate), GreaterThanOrEqual(o_orderdate"),
      s"date filter not pushed to scan:\n$physical")
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
}
