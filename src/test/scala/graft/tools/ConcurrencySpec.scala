package graft.tools

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.{SparkEntry, SparkSpec}

/** Concurrent-submission safety: a shared SparkSession serves many callers
  * at once in production (FAIR pools, notebook servers, query services).
  * Every SparkEntry query is a pure (SparkSession, dir) => DataFrame
  * function — this spec proves that by racing a mixed batch of them on one
  * session and checking each result equals its sequential run.
  */
class ConcurrencySpec extends SparkSpec {

  test("a mixed query batch run concurrently equals the sequential results") {
    val names = Seq("q01_pricing_summary", "q03_star_join_agg", "q09_topk",
      "q17_wordcount", "q21_token_stats", "q49_rollup", "q57_cube",
      "q67_zorder")
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    }.toMap

    val pool = Executors.newFixedThreadPool(names.size)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val racing = names.map { n =>
        Future(n -> SparkEntry.queries(n)(spark, sf)
          .collect().map(_.toString).sorted.toSeq)
      }
      val got = Await.result(Future.sequence(racing), 5.minutes).toMap
      names.foreach { n =>
        assert(got(n) == sequential(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
