package graft

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** One neighbor candidate inside the top-k buffer: ordered by
  * (dist, cIdx) — the same deterministic tie-break as the window form. */
final case class NeighborCand(dist: Double, cIdx: Long, cValue: Double)

/** Exact bounded-heap top-k as a typed [[Aggregator]] — the scale-proof
  * alternative to the window `row_number` plan (SURVEY §7.3 Phase-2):
  *
  *  - The window form SORTS every candidate pair per (cohort, nc_idx)
  *    group: the full |NC|×|C| pairs relation goes through
  *    `UnsafeExternalSorter` (per-insert execution-memory accounting, a
  *    contended lock at high core counts) and, pre-WindowGroupLimit, the
  *    exchange.
  *  - This form is a HASH aggregation: map-side partial buffers of at most
  *    k candidates per group, so the shuffle carries ≤ k·|groups|·|maps|
  *    rows, no sorter, no per-row memory accounting — the plan that
  *    survives a 100× pairs relation.
  *
  * Output rows are identical to `NeighborJoin.topK` (pinned by the
  * equivalence test in CocoaInvariantsSpec): ties broken by c_idx, ranks
  * dense from 1.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[NeighborCand, List[NeighborCand], Seq[NeighborCand]] {
  require(k >= 1, s"k must be >= 1, got $k")

  private val ord: Ordering[NeighborCand] = Ordering.by(c => (c.dist, c.cIdx))

  override def zero: List[NeighborCand] = Nil

  /** Insert keeping the buffer sorted ascending and bounded at k — k is
    * small (neighbor counts), so linear insertion beats heap overhead. */
  override def reduce(buf: List[NeighborCand], x: NeighborCand): List[NeighborCand] = {
    if (buf.lengthCompare(k) >= 0 && ord.gteq(x, buf.last)) buf
    else {
      val (lo, hi) = buf.span(ord.lt(_, x))
      val merged = lo ::: x :: hi
      if (merged.lengthCompare(k) > 0) merged.init else merged
    }
  }

  override def merge(a: List[NeighborCand], b: List[NeighborCand]): List[NeighborCand] =
    b.foldLeft(a)(reduce)

  override def finish(buf: List[NeighborCand]): Seq[NeighborCand] = buf

  override def bufferEncoder: Encoder[List[NeighborCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[NeighborCand]]()
  override def outputEncoder: Encoder[Seq[NeighborCand]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[NeighborCand]]()
}

object TopKAgg {

  /** `NeighborJoin.topK`-shaped result via hash aggregation: input is the
    * pairs relation (cohort…, nc_idx, nc_value, c_idx, c_value, dist);
    * output has the same schema + rank. Requires LONG consent row ids (the
    * TPC-H adapter and any numeric-keyed cohort); the composite-string-id
    * library path keeps the window form. */
  def topK(pairs: DataFrame, spec: CohortSpec, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    val keys = (spec.cohortCols :+ "nc_idx").map(col(_))
    pairs
      .groupBy(keys: _*)
      .agg(first("nc_value").as("nc_value"),
           agg(col("dist"), col("c_idx"), col("c_value")).as("__topk"))
      .select((spec.cohortCols.map(col(_)) ++ Seq(
        col("nc_idx"), col("nc_value"),
        posexplode(col("__topk")).as(Seq("__pos", "__cand")))): _*)
      .select((spec.cohortCols.map(col(_)) ++ Seq(
        col("nc_idx"), col("nc_value"),
        col("__cand.cIdx").as("c_idx"),
        col("__cand.cValue").as("c_value"),
        col("__cand.dist").as("dist"),
        (col("__pos") + 1).cast("integer").as("rank"))): _*)
  }
}
