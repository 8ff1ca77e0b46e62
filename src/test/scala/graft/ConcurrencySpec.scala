package graft

import java.util.concurrent.Executors

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.scalatest.funsuite.AnyFunSuite

/** Concurrent analytics on one SparkSession (multi-tenant shape): four
  * different operator families submitted simultaneously must produce
  * exactly the single-threaded results — no cross-query state leaks
  * (session confs, temp views, codegen caches). */
class ConcurrencySpec extends AnyFunSuite {
  import SparkTestSession._

  test("four concurrent queries equal their sequential results") {
    val names = Seq("q1_pricing_summary", "q_dedup_minhash",
      "q_sim_bruteforce", "q_stream_sessions")
    val sequential = names.map { n =>
      n -> SparkEntry.queries(n)(spark, sf).collect().map(_.toString).sorted.toSeq
    }.toMap
    val pool = Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    try {
      val concurrent = Await.result(Future.sequence(names.map { n =>
        Future(n -> SparkEntry.queries(n)(spark, sf)
          .collect().map(_.toString).sorted.toSeq)
      }), Duration.Inf).toMap
      names.foreach { n =>
        assert(concurrent(n) === sequential(n), s"$n diverged under concurrency")
      }
    } finally pool.shutdown()
  }
}
