package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.expr.GraftExtensions

/** Custom Catalyst expressions: kernel semantics + SQL registration. */
class ExprSpec extends SparkSpec {
  import spark.implicits._

  test("token intersection kernel matches set semantics incl. nulls/empties") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("b", "c", "d"), 2),
      (Seq("a"), Seq.empty[String], 0),
      (Seq.empty[String], Seq.empty[String], 0)
    ).toDF("a", "b", "expected")
    val got = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expr.TokenIntersectionSize(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
          org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))).as("x"),
      col("expected"))
    got.collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("long intersect kernel equals array_intersect size on distinct arrays") {
    val df = Seq(
      (Seq(5L, 1L, 9L, 7L), Seq(7L, 2L, 1L)),
      (Seq(1L, 2L, 3L), Seq(4L, 5L)),
      (Seq.empty[Long], Seq(1L))
    ).toDF("a", "b")
    val got = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(
        graft.expr.LongIntersectSize(
          org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
          org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))).as("x"),
      size(array_intersect(col("a"), col("b"))).as("ref"))
    got.collect().foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("tokens_of kernel equals filter(split) incl. schema, whitespace runs, empties") {
    val df = Seq("a b  c", " leading", "trailing ", "", "   ", "one",
      "tab\tsep\nand newline").toDF("t")
    val old = df.select(filter(split(col("t"), "\\s+"), x => x =!= "").as("toks"))
    val knl = df.select(graft.ops.TextAnalysis.tokens(col("t")).as("toks"))
    assert(knl.schema == old.schema) // incl. element containsNull
    assert(knl.as[Seq[String]].collect().toSeq ==
      old.as[Seq[String]].collect().toSeq)
  }

  test("char_symbols kernel equals the transform/substr composition on non-empty words") {
    val df = Seq("a", "ab", "héllo", "x y").toDF("w")
    val old = df.select(transform(sequence(lit(1), length(col("w"))),
      i => col("w").substr(i, lit(1))).as("cs"))
    val knl = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expr.CharSymbols(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("w")))).as("cs"))
    assert(knl.as[Seq[String]].collect().toSeq ==
      old.as[Seq[String]].collect().toSeq)
  }

  test("marker_hits kernel equals the filter/array_contains composition") {
    val markers = Seq("the", "a", "of")
    val df = Seq(Seq("the", "cat", "of", "a", "THE"), Seq("x"),
      Seq.empty[String]).toDF("toks")
    val old = df.select(size(filter(col("toks"),
      t => array_contains(array(markers.map(lit): _*), t))).as("n"))
    val knl = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expr.MarkerHits(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("toks")),
        markers)).as("n"))
    assert(knl.as[Int].collect().toSeq == old.as[Int].collect().toSeq)
    assert(knl.as[Int].collect().head == 3)
  }

  test("bpe_merge_all kernel equals the interpreted aggregate fold per merge") {
    // the exact fold BpeMergeAll replaced (graft.ops.TextAnalysis
    // .bpeMergeExpr's former body) — kept here as the reference semantics
    def foldMerge(syms: org.apache.spark.sql.Column, a: String, b: String) =
      aggregate(syms, array().cast("array<string>"), (acc, x) =>
        when(size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(x))))
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val df = Seq(
      Seq("a", "a", "a", "a"),           // overlapping run: -> [aa, aa] -> [aaaa as (aa,aa)? no merge for that] stays [aa, aa]
      Seq("a", "a", "a", "b"),           // -> [aa, a, b] -> [aa, ab] -> [aaab]
      Seq("a", "b"),                     // -> [ab]
      Seq("b", "a", "b", "a", "a", "b"), // mixed positions
      Seq("x"),                          // no merge applies
      Seq.empty[String]                  // empty word
    ).toDF("syms")
    val kernel = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expr.BpeMergeAll(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("syms")),
        merges.map(_._1), merges.map(_._2))).as("out"))
      .as[Seq[String]].collect().toSeq
    val fold = df.select(
      merges.foldLeft(col("syms")) { case (c, (a, b)) => foldMerge(c, a, b) }
        .as("out"))
      .as[Seq[String]].collect().toSeq
    assert(kernel == fold)
    assert(kernel(1) == Seq("aaab")) // the chained-merge hand check
  }

  test("bpe_adjacent_pairs kernel equals the transform/element_at composition") {
    val df = Seq(Seq("a", "b", "c"), Seq("x"), Seq.empty[String])
      .toDF("syms")
    val kernel = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expr.BpeAdjacentPairs(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("syms"))))
        .as("p"))
      .as[Seq[(String, String)]].collect().toSeq
    val hof = df.select(
      when(size(col("syms")) >= 2,
        transform(sequence(lit(0), size(col("syms")) - 2), i =>
          struct(element_at(col("syms"), i + 1).as("l"),
            element_at(col("syms"), i + 2).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>")).as("p"))
      .as[Seq[(String, String)]].collect().toSeq
    assert(kernel == hof)
    assert(kernel.head == Seq(("a", "b"), ("b", "c")))
  }

  test("dot product kernel equals the zip_with/aggregate fold bit-for-bit") {
    val df = Seq((Seq(0.1, -2.5, 3.25), Seq(4.0, 0.5, -1.25))).toDF("a", "b")
    val kernel = df.select(
      org.apache.spark.sql.graftbridge.Bridge.column(graft.expr.DotProduct(
        org.apache.spark.sql.graftbridge.Bridge.expression(col("a")),
        org.apache.spark.sql.graftbridge.Bridge.expression(col("b")))))
      .as[Double].head()
    val hof = df.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)).as[Double].head()
    assert(kernel == hof) // exact: same accumulation order
  }

  test("extensions register SQL functions; poly_hash matches the DuckDB value") {
    // A fresh session over the same context picks up the extensions.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    try {
      val r = s2.sql(
        """SELECT token_intersection_size(array('a','b'), array('b','c')) AS x,
          |       poly_hash('spark') AS h,
          |       long_intersect_size(array(1L, 2L), array(2L, 3L)) AS li,
          |       dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS dp,
          |       token_shingle_hashes(array('a','b','c'), 3) AS tsh,
          |       minhash_sig(array(7L), 2) AS mh,
          |       cosine_lsh_sig(array(1.0D, -1.0D), 8, 42) AS cl
          |""".stripMargin).head()
      assert(r.getInt(0) == 1)
      // value cross-checked against DuckDB:
      // list_reduce(…string_split('spark','')…) = 109638365
      assert(r.getLong(1) == 109638365L)
      assert(r.getInt(2) == 1)
      assert(r.getDouble(3) == 11.0)
      // kernel parity with the Column API paths
      assert(r.getSeq[Long](4) ==
        spark.range(1).select(graft.ops.TextAnalysis
          .shingleHashes(lit("a b c"), 3)).as[Seq[Long]].head())
      val seeds = graft.ops.Dedup.Seeds.take(2)
      assert(r.getSeq[Long](5) ==
        seeds.map { case (a, b) => (a * 7 + b) % graft.ops.TextAnalysis.P })
      val viaCol = spark.range(1).select(
        org.apache.spark.sql.graftbridge.Bridge.column(
          graft.expr.CosineLshSig(
            org.apache.spark.sql.graftbridge.Bridge.expression(
              array(lit(1.0), lit(-1.0))), 8, 42L))).as[Long].head()
      assert(r.getLong(6) == viaCol)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
