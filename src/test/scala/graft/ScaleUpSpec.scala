package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integrity of the true-sf1 scale harness (tools/ScaleUp): the scaled
  * corpus must preserve the source's per-key distributions while
  * growing every cardinality ×m — a broken key translation would make
  * the sf1 sidecar measure the wrong workload (orphaned foreign keys
  * turn joins into filters; colliding keys turn them quadratic). */
class ScaleUpSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val out: String = {
    val dir = Files.createTempDirectory("graft_scaleup_spec").toString
    graft.tools.ScaleUp.generate(spark, SparkTestSession.sf, dir, 3)
    dir
  }
  private def src(t: String) =
    spark.read.parquet(s"${SparkTestSession.sf}/$t.parquet")
  private def big(t: String) = spark.read.parquet(s"$out/$t.parquet")

  test("every fact table grows exactly xm; fixed dims stay put") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings"))
      assert(big(t).count() == 3 * src(t).count(), t)
    for (t <- Seq("region", "nation"))
      assert(big(t).count() == src(t).count(), t)
  }

  test("key translation keeps keys unique and foreign keys resolvable") {
    // primary keys stay unique after the shift
    for ((t, k) <- Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
        "part" -> "p_partkey", "documents" -> "doc_id",
        "embeddings" -> "vec_id"))
      assert(big(t).select(k).distinct().count() == big(t).count(), s"$t.$k")
    // every lineitem still joins to an order and a part — zero orphans
    val li = big("lineitem")
    assert(li.join(big("orders"),
      li("l_orderkey") === col("o_orderkey"), "left_anti").count() == 0L)
    assert(li.join(big("part"),
      li("l_partkey") === col("p_partkey"), "left_anti").count() == 0L)
    // and orders to customers
    assert(big("orders").join(big("customer"),
      col("o_custkey") === col("c_custkey"), "left_anti").count() == 0L)
  }

  test("per-replica join fan-out matches the source exactly") {
    // lines per order is a pure per-key property: replication with key
    // translation must reproduce the SOURCE histogram, just ×m keys
    def hist(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_orderkey").count()
        .groupBy("count").agg(count(lit(1)).as("orders"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hSrc = hist(src("lineitem"))
    val hBig = hist(big("lineitem"))
    assert(hBig.keySet == hSrc.keySet)
    hSrc.foreach { case (k, v) => assert(hBig(k) == 3 * v, s"fanout $k") }
  }

  test("content perturbation keeps duplicates intra-replica") {
    // exact-dup groups must not grow across replicas: the max md5 group
    // size stays the source's (every text of replica k>0 carries its
    // replica token, so cross-replica collisions are impossible)
    def maxGroup(df: org.apache.spark.sql.DataFrame) =
      df.groupBy(md5(col("text"))).count()
        .agg(max("count")).collect()(0).getLong(0)
    assert(maxGroup(big("documents")) == maxGroup(src("documents")))
    // and n_chars stays consistent with the perturbed text
    assert(big("documents")
      .filter(col("n_chars") =!= length(col("text"))).count() == 0L)
  }

  test("scaled corpus is splittable (no single 10x row group)") {
    for (t <- Seq("documents", "lineitem", "events"))
      assert(big(t).rdd.getNumPartitions > 1, s"$t not splittable")
  }
}
