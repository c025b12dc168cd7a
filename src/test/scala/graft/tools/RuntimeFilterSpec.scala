package graft.tools

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Runtime bloom-filter join pruning — the Spark 3.3+ optimizer feature
  * that matters most for selective fact-dimension joins at 100 TB: the
  * filtered (small) side builds a bloom filter that is pushed into the
  * large side's scan, so most fact rows die before the shuffle.
  *
  * Size thresholds are lowered to fire at test scale; production keeps the
  * defaults (creation side ≤ 100 MB) — the assertion here is that our
  * query shapes are ELIGIBLE (equi-join + selective filter), which is what
  * a 100× scale-up needs.
  */
class RuntimeFilterSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    TestSession.spark
    val s = TestSession.spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // force the non-broadcast path so the runtime filter is the only
    // pruning available (broadcast joins prune via DPP/reuse instead)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }
  private val sf = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter into the fact scan") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_totalprice > 400000")
    val j = li.join(ords, li("l_orderkey") === ords("o_orderkey"))
      .groupBy("l_returnflag").count()
    val plan = j.queryExecution.optimizedPlan.toString
    assert(plan.contains("bloom_filter") || plan.contains("BloomFilter"),
      s"no runtime bloom filter in optimized plan:\n${plan.take(2000)}")
  }
}
