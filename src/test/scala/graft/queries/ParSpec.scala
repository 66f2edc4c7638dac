package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Contract of the prewarm fan-out helper: every task runs, tasks overlap
  * in time, and a worker failure surfaces instead of silently degrading a
  * prewarm phase into a first-query rebuild. */
class ParSpec extends AnyFunSuite {

  test("all tasks run, and concurrently") {
    val ran = new AtomicInteger(0)
    // each task blocks until the OTHER has started — only true overlap
    // lets this complete before the timeout
    val aStarted = new CountDownLatch(1)
    val bStarted = new CountDownLatch(1)
    Par.all(
      "a" -> (() => {
        aStarted.countDown()
        assert(bStarted.await(30, TimeUnit.SECONDS), "b never started")
        ran.incrementAndGet(); ()
      }),
      "b" -> (() => {
        bStarted.countDown()
        assert(aStarted.await(30, TimeUnit.SECONDS), "a never started")
        ran.incrementAndGet(); ()
      }))
    assert(ran.get() == 2)
  }

  test("a worker failure is rethrown after all tasks complete") {
    val survivorRan = new AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Par.all(
        "boom" -> (() => throw new IllegalStateException("prewarm failed")),
        "survivor" -> (() => { survivorRan.incrementAndGet(); () }))
    }
    assert(e.getMessage == "prewarm failed")
    // the failure must not cancel siblings — their caches are still wanted
    assert(survivorRan.get() == 1)
  }
}
