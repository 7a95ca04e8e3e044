package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic 6-dp quantization for DOUBLE outputs the
  * driver hash-compares against the DuckDB oracle.
  *
  * `round(x, 6)` is NOT cross-engine deterministic on the same input
  * double: Spark rounds HALF_UP on the shortest decimal representation
  * (BigDecimal) while DuckDB rounds the binary value, and at a .5
  * boundary of the 7th digit they disagree — measured on this project:
  * round(41/640., 6) = 0.064063 (Spark) vs 0.064062 (DuckDB). Raw
  * small-integer rationals (jaccard = inter/union, recall = hits/n,
  * fractions, shares) land on such boundaries routinely.
  *
  * Both forms here consult ONLY the binary double with IEEE-defined ops
  * (multiply, add, floor, divide), so any engine given the same input
  * double produces the identical output double:
  *  - [[q6]]  — floor toward −∞ (the form retention/purity/quality use).
  *  - [[r6]]  — half-up via `floor(x·1e6 + 0.5)`: behaves like rounding
  *    (an epsilon-under-1.0 cosine still quantizes to 1.0, which the
  *    identical-vector specs rely on) without ever touching a decimal
  *    representation. Not always equal to `round(x, 6)` — at a boundary
  *    it takes the IEEE-arithmetic answer, which is exactly the point.
  *
  * The DuckDB mirror of each is the literal same expression:
  * `floor(x * 1e6) / 1e6` and `floor(x * 1e6 + 0.5) / 1e6`.
  *
  * Decimal-GRID sums (money columns with exact 2/4-dp values) may keep
  * `round(sum, 2|4)`: the sum sits exactly on the grid, so no boundary
  * ambiguity exists.
  */
private[graft] object Quant {
  def q6(c: Column): Column = floor(c * lit(1e6)) / lit(1e6)
  def r6(c: Column): Column = floor(c * lit(1e6) + lit(0.5)) / lit(1e6)
}
