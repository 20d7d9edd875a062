package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.sum
import org.apache.spark.sql.types.DecimalType

/** The repo-wide exact-aggregation contract, in ONE place so the precision
  * can never drift between modules: a double column is cast to
  * DECIMAL(25,6) (deterministic rounding), summed exactly (order-
  * independent integer arithmetic), and cast back to double. This is what
  * makes every aggregate bit-identical across partition counts, cluster
  * sizes, and engines — the property the correctness oracle hashes against.
  */
object Exact {
  def dsum(c: Column): Column = sum(c.cast(DecimalType(25, 6))).cast("double")
}
