package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact money arithmetic for cents-exact DOUBLE columns — the fix for
  * the float-summation-order seam the 10× gate exposed (round 14):
  * `sum(l_extendedprice * (1.0 - l_discount))` over millions of rows
  * per group diverges between engines past round(…, 4) because double
  * addition is order-dependent, and Spark partitionings order sums
  * differently from DuckDB's single-threaded fold.
  *
  * Kernel: scale to an INTEGER-VALUED DOUBLE grid first —
  * `round(x·100, 0)` is an exact integer in a double for every
  * cents-exact price (fixture: max |ep·100 − round(ep·100)| ≈ 1e-9),
  * products of two such grids stay exact below 2^53, and ADDITION OF
  * INTEGER-VALUED DOUBLES IS EXACT AND ORDER-FREE while the running
  * sum stays below 2^53 ≈ 9.0e15. At the ×1e4 fixed-point scale that
  * is ~9e11 currency units of total revenue per group — covers the
  * gate's sf1-synth tier with ~3000× headroom; a 100 TB deployment
  * crossing it switches the same expressions to DECIMAL(38,0) sums
  * (the privacy-audit envelope policy).
  *
  * Deliberately DOUBLE, not BIGINT: the dirty/fuzz gates plant
  * NaN/Inf/null prices, and this kernel propagates them EXACTLY like
  * the naive expression did (round(NaN)=NaN, NaN·x=NaN, sum→NaN;
  * null rows drop out of sum on both engines) — a BIGINT cast would
  * throw under ANSI on the same rows. Rounding of the ·100 products
  * agrees cross-engine: both see the identical IEEE product and both
  * round ties away from zero (Spark HALF_UP via shortest-repr
  * BigDecimal, DuckDB std::round).
  *
  * Oracle twin (keep in lockstep — same grid, same division):
  * {{{
  * sum(round(l_extendedprice*100, 0) * (100 - round(l_discount*100, 0))) / 10000.0
  * }}}
  */
object MoneyFx {

  /** x·100 as an exact integer-valued DOUBLE (cents grid). */
  def cents(c: Column): Column = round(c * 100, 0)

  /** Per-row ep·(1−disc) on the ×1e4 integer grid. */
  def discPriceX1e4(price: Column, disc: Column): Column =
    cents(price) * (lit(100.0) - cents(disc))

  /** Per-row ep·disc on the ×1e4 integer grid (TPC-H Q6 shape). */
  def priceTimesRateX1e4(price: Column, rate: Column): Column =
    cents(price) * cents(rate)

  /** Σ ep·(1−disc), exact and order-free, emitted as DOUBLE at true
    * scale with the suite's round(…, 4) output convention.
    */
  def sumDiscPrice(price: Column, disc: Column): Column =
    round(sum(discPriceX1e4(price, disc)) / 10000.0, 4)
}
