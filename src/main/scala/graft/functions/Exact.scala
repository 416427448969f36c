package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact (bit-reproducible) numeric helpers.
  *
  * Raw `sum(double)` is association-order-dependent, so a distributed sum
  * is not reproducible across engines (or even across runs with different
  * partitioning). Money math here is done by casting to decimal first:
  * decimal addition is exact and associative, so the final value is
  * identical regardless of partitioning — and identical to what any other
  * exact engine (e.g. the DuckDB oracle) computes. The final cast back to
  * double is correctly rounded on both engines, hence bit-identical.
  */
object Exact {
  /** double → decimal(18,2); rounding of a double at scale 2 is
    * unambiguous (decimal half-points are not dyadic rationals, so no
    * double sits exactly on a rounding boundary). */
  def dec2(c: Column): Column = c.cast(DecimalType(18, 2))

  def dec4(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Narrow decimal for factors in [0, ~10] so products stay within
    * precision 38 through two multiplications. */
  def frac4(c: Column): Column = c.cast(DecimalType(8, 4))

  /** Surface a decimal aggregate as double, bit-reproducibly: first
    * re-round to scale 4 (sums here keep unscaled < 2^52, so the decimal→
    * double conversion is a single correctly-rounded division in every
    * engine). Casting a scale-8+ decimal straight to double double-rounds
    * differently in Java BigDecimal vs DuckDB — observed 1-ulp drift.
    * Must use ROUND, not a decimal cast — DuckDB's decimal→decimal cast
    * truncates while Spark's rounds; ROUND is half-away-from-zero in both
    * engines. */
  def surface(aggregated: Column): Column =
    round(aggregated, 4).cast("double")

  /** Exact sum of a money column, surfaced as double. */
  def moneySum(c: Column): Column = sum(dec4(c)).cast("double")

  /** Exact average: exact decimal sum / count, both engines divide the
    * same double by the same bigint. */
  def moneyAvg(c: Column): Column = sum(dec4(c)).cast("double") / count(lit(1))

  /** l_extendedprice * (1 - l_discount), decimal-exact. */
  def discPrice(price: Column, discount: Column): Column =
    dec4(price) * frac4(lit(1) - discount)

  /** l_extendedprice * (1 - l_discount) * (1 + l_tax), decimal-exact. */
  def charge(price: Column, discount: Column, tax: Column): Column =
    dec4(price) * frac4(lit(1) - discount) * frac4(lit(1) + tax)

  /** Matching SQL fragments for the DuckDB oracle. */
  object sql {
    def dec2(c: String): String = s"CAST($c AS DECIMAL(18,2))"
    def dec4(c: String): String = s"CAST($c AS DECIMAL(18,4))"
    def frac4(c: String): String = s"CAST($c AS DECIMAL(8,4))"
    def moneySum(c: String): String = s"CAST(SUM(${dec4(c)}) AS DOUBLE)"
    def moneyAvg(c: String): String = s"CAST(SUM(${dec4(c)}) AS DOUBLE)/COUNT(*)"
    def surface(agg: String): String = s"CAST(ROUND($agg, 4) AS DOUBLE)"
    def discPrice(p: String, d: String): String =
      s"${dec4(p)} * ${frac4(s"1 - $d")}"
    def charge(p: String, d: String, t: String): String =
      s"${dec4(p)} * ${frac4(s"1 - $d")} * ${frac4(s"1 + $t")}"
  }
}
