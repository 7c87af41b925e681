package graft

import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** The shared per-session memo: build-once semantics, failure eviction
  * (a transient error must not poison the key), and single-flight under
  * concurrency — the properties every index/pipeline cache site assumes. */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("once builds exactly once and returns the same instance") {
    val n = new AtomicInteger(0)
    val a = SessionCache.once(spark, "spec#once") { n.incrementAndGet(); new Object }
    val b = SessionCache.once(spark, "spec#once") { n.incrementAndGet(); new Object }
    assert(n.get == 1)
    assert(a eq b)
  }

  test("a failed build is evicted, not cached: the next call retries") {
    val n = new AtomicInteger(0)
    intercept[RuntimeException] {
      SessionCache.once(spark, "spec#fail") {
        n.incrementAndGet(); throw new RuntimeException("transient")
      }
    }
    val v = SessionCache.once(spark, "spec#fail") { n.incrementAndGet(); "ok" }
    assert(v == "ok" && n.get == 2)
  }

  test("concurrent callers are single-flight: one build, all get its value") {
    val n = new AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val out = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        gate.await()
        out.add(SessionCache.onceStrong(spark, "spec#flight") {
          n.incrementAndGet(); Thread.sleep(50); "built"
        })
      })
    }
    threads.foreach(_.start()); gate.countDown(); threads.foreach(_.join())
    assert(n.get == 1)
    assert(out.size == 8 && out.stream().allMatch(_ == "built"))
  }

  test("keys are namespaced: different keys build independently") {
    val a = SessionCache.once(spark, "spec#k1")("v1")
    val b = SessionCache.once(spark, "spec#k2")("v2")
    assert(a == "v1" && b == "v2")
  }
}
