package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every registered query runs on sf0.001 and has oracle coverage") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      withClue(s"query $name: ") { assert(df.columns.nonEmpty) }
      // force execution
      df.count()
    }
  }

  test("oracleSql keys are a subset of queries") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracleSql without matching query: $extra")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q1 aggregates to the 6 flag/status groups with exact decimal sums") {
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.nonEmpty && rows.size <= 6)
    rows.values.foreach { r =>
      assert(r.getAs[java.math.BigDecimal]("sum_qty").scale == 2)
      assert(r.getAs[java.math.BigDecimal]("sum_charge").scale == 6)
    }
  }

  test("q_topk_orders returns exactly 10 ordered rows") {
    val prices = SparkEntry.queries("q_topk_orders")(spark, sf)
      .collect().map(_.getAs[java.math.BigDecimal]("totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0).compareTo(p(1)) >= 0))
  }
}
