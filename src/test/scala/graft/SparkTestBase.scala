package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local SparkSession across all suites (getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  // Overridable for the partition-count robustness sweep: results must be
  // identical at ANY partition count (a dependency on the default 4 is a
  // part-50-class bug — ordering by few-partition luck).
  lazy val spark: SparkSession = SparkSession.builder()
    .master(sys.env.getOrElse("GRAFT_TEST_MASTER", "local[4]"))
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions",
      sys.env.getOrElse("GRAFT_TEST_SHUFFLE", "4"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Run `body` with SQL confs temporarily overridden, restoring previous
    * values (or unsetting) afterwards. */
  def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Multiset compare helper (Bag semantics, like the reference's
    * okapi-testing Bag.scala). */
  def bag(rows: Seq[Seq[Any]]): Map[Seq[Any], Int] =
    rows.groupBy(identity).view.mapValues(_.size).toMap

  def dfBag(df: org.apache.spark.sql.DataFrame): Map[Seq[Any], Int] =
    bag(df.collect().toSeq.map(_.toSeq.map {
      case d: java.lang.Double => BigDecimal(d).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)
      case other => other
    }))
}
