package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession + result-comparison helpers. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSpec.session

  /** Rows normalized for order-insensitive comparison: columns sorted by
    * name, doubles rounded to 9 decimals to absorb sub-tolerance noise. */
  def normalize(df: DataFrame): Seq[Seq[(String, Any)]] = {
    val cols = df.columns.sorted
    df.collect().toSeq.map { r =>
      cols.toSeq.map { c =>
        val v = r.get(r.fieldIndex(c)) match {
          case d: java.lang.Double =>
            BigDecimal(d.doubleValue()).setScale(9,
              BigDecimal.RoundingMode.HALF_UP)
          case f: java.lang.Float =>
            BigDecimal(f.doubleValue()).setScale(6,
              BigDecimal.RoundingMode.HALF_UP)
          case bd: java.math.BigDecimal =>
            BigDecimal(bd.doubleValue()).setScale(9,
              BigDecimal.RoundingMode.HALF_UP)
          case i: java.lang.Integer => i.longValue(): java.lang.Long
          case x => x
        }
        (c, v)
      }
    }.sortBy(_.toString())
  }

  def assertSameRows(actual: DataFrame, expected: DataFrame,
      label: String = ""): Unit = {
    val a = normalize(actual)
    val e = normalize(expected)
    if (a != e) {
      val onlyA = a.diff(e).take(5)
      val onlyE = e.diff(a).take(5)
      fail(s"$label mismatch: ${a.size} vs ${e.size} rows\n" +
        s"  only in actual:   ${onlyA.mkString("; ")}\n" +
        s"  only in expected: ${onlyE.mkString("; ")}")
    }
  }

  def assertAllClose(actual: Map[Long, Double], expected: Map[Long, Double],
      tol: Double = 1e-6, label: String = ""): Unit = {
    assert(actual.keySet == expected.keySet,
      s"$label key sets differ: ${actual.keySet.diff(expected.keySet)} / " +
        s"${expected.keySet.diff(actual.keySet)}")
    for ((k, v) <- expected) {
      assert(math.abs(actual(k) - v) <= tol,
        s"$label vid=$k: got ${actual(k)}, want $v (tol $tol)")
    }
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
