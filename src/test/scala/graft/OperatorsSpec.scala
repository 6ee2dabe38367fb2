package graft

import graft.chain.ChainDatasets
import graft.functions.Keccak
import graft.operators.SaltedJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("salted join equals plain join exactly") {
    val l = Tables(spark, sf, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_partkey"), col("l_quantity"))
    val o = Tables(spark, sf, "orders")
      .select(col("o_orderkey").as("k"), col("o_totalprice"))
    val plain = l.join(o, "k")
    val salted = SaltedJoin.join(l, o, "k", salts = 8)
    assert(salted.count() == plain.count())
    // same multiset of rows: compare an order-insensitive aggregate per key
    val a = plain.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("l_partkey")).as("sp")).collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val b = salted.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("l_partkey")).as("sp")).collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(a == b)
    // deterministic across runs
    assert(SaltedJoin.join(l, o, "k", salts = 8).count() == salted.count())
  }

  test("erc20 transfer from-filter pushes into topic position") {
    val dir = graft.queries.ChainQueries.FixDir
    val all = ChainDatasets.erc20Transfers(spark, dir)
    val someFrom = all.select("from_address").limit(1).collect()(0).getAs[Array[Byte]](0)
    val filtered = ChainDatasets.erc20Transfers(spark, dir, from = Some(someFrom))
    val n = filtered.count()
    assert(n > 0 && n < all.count())
    filtered.select("from_address").collect().foreach { r =>
      assert(java.util.Arrays.equals(r.getAs[Array[Byte]](0), someFrom))
    }
  }
}
