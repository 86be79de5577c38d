package graft.impl

import org.apache.spark.sql.{Column, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate/scalar helpers that Spark's public API lacks as direct calls.
  * Exact percentile semantics follow the reference's collect-based UDAFs
  * (morpheus-spark-cypher/.../impl/PercentileUdafs.scala:41-76) but are
  * expressed as compositions over built-in aggregates so Catalyst still
  * plans a single hash aggregation.
  */
object GraftFunctions {

  /** Exact continuous percentile (linear interpolation). */
  def percentileCont(c: Column, p: Column): Column =
    call_function("percentile", c, p)

  /** Exact discrete percentile: the smallest value v such that at least a
    * fraction p of the rows are <= v. Collects the group to an array —
    * matches the reference's approach and is exact, but degrades when a
    * single group holds billions of rows.
    *
    * Scale path: set `spark.graft.percentileDisc.approx=true` (optionally
    * `spark.graft.percentileDisc.accuracy=N`, default 10000) to compute it
    * with approx_percentile instead — bounded memory per group at the cost
    * of rank error <= 1/accuracy, the right trade for 100-TB groups. Exact
    * remains the default. */
  def percentileDisc(c: Column, p: Column): Column = {
    val conf = org.apache.spark.sql.SparkSession.active.conf
    if (conf.getOption("spark.graft.percentileDisc.approx").exists(_.toBoolean)) {
      val acc = conf.getOption("spark.graft.percentileDisc.accuracy")
        .map(_.toInt).getOrElse(10000)
      call_function("approx_percentile", c, p, lit(acc))
    } else {
      val arr = array_sort(collect_list(c))
      element_at(arr, greatest(F.ceil(p * F.size(arr)).cast(IntegerType), lit(1)))
    }
  }
}
