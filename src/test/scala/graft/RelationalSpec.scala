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

  test("q1 aggregates to the 6 flag/status groups (comparator-safe doubles)") {
    // aggregates stay decimal internally; the final output cast is DOUBLE
    // so the driver's pandas comparator sees float64 on both sides
    val rows = SparkEntry.queries("q1_pricing_summary")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(rows.nonEmpty && rows.size <= 6)
    rows.values.foreach { r =>
      assert(r.getAs[Double]("sum_qty") > 0)
      assert(r.getAs[Double]("sum_charge") > 0)
    }
  }

  test("q_topk_orders returns exactly 10 ordered rows") {
    val prices = SparkEntry.queries("q_topk_orders")(spark, sf)
      .collect().map(_.getAs[Double]("totalprice"))
    assert(prices.length == 10)
    assert(prices.sliding(2).forall(p => p(0) >= p(1)))
  }
}
