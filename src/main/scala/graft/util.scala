package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine numeric conventions shared by queries and oracle SQL. */
object Num {
  /** Round with a +1e-9 bias. Products of small decimals frequently land
    * exactly on decimal half-boundaries (e.g. 0.49025 stored as
    * 0.49024999999999996), where Spark's BigDecimal HALF_UP and DuckDB's
    * double rounding disagree by one ulp of the last kept digit. The bias
    * pushes both engines off the attractor identically; oracle SQL applies
    * the same `ROUND(1e-9 + x, n)`. */
  def rnd(c: Column, n: Int): Column = round(c + lit(1e-9), n)
}
